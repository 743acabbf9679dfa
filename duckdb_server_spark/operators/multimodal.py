"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (beyond-reference capability).

The decode step is STUBBED — codec libraries (PIL/ffmpeg/librosa) are not
in this container — but the Spark-side plumbing is real and tested:
schema (binary payload + metadata struct), partition-preserving
``mapInPandas`` with Arrow batch transfer, and batch-shaped UDF signatures
that a real decoder would drop into unchanged.

Scale design: mapInPandas streams Arrow batches through Python without
materializing a partition; payloads never pass through the driver; the
metadata-only path (byte stats) is pure Column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("head_byte", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("modality", StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires a codec library not present here.

    Plug point: replace the raise with e.g. PIL.Image.open(BytesIO(payload)).
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "deterministic byte-level features are extracted instead"
    )


def _byte_features(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads.

    Stands in for decode→resize→embed: same batch shape, same signature —
    a real decoder replaces the body, nothing else changes.
    """
    for pdf in pdf_iter:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                    "int32"
                ),
                "byte_mean": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
                "modality": pdf["modality"],
            }
        )


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build the multimodal frame shape from the documents fixture: an
    opaque binary payload + modality tag (deterministic fake: the UTF-8
    bytes of the text stand in for image bytes)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("modality"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Distributed feature extraction via mapInPandas (Arrow batches)."""
    return binary_df.mapInPandas(_byte_features, FEATURE_SCHEMA)
