"""Structured Streaming capability extension (SURVEY.md §2.10).

The reference has no streaming surface (its only extensibility hook,
DoAction, is Unimplemented — main.go:121-124); this package adds the
Spark-native streaming operators the corpus's ``events`` table implies:
tumbling/sliding/session windows, watermarks, stateful dedup.

Design: every transformation is written against a DataFrame, so the SAME
code runs in batch mode (oracle-checkable against DuckDB) and as a
Structured Streaming query (readStream → transform → writeStream). The
``run_stream_to_memory`` harness executes the streaming path with an
available-now trigger, which drains all input and stops — deterministic,
so even the streaming path hash-matches the batch oracle.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.session import load_table


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Clamp ``spark.sql.shuffle.partitions`` while a streaming query starts.

    A stateful streaming query freezes the shuffle-partition count into its
    checkpoint as the state-store instance count at start; a session default
    sized for batch scans is pure state-store setup cost on a drained
    availableNow run (a stream-stream join opens 4 stores per partition —
    measured 6.3 s at 32 partitions vs 2.8 s at 8 on the test corpus). A
    production deployment sizes this to stream throughput per the
    checkpoint, not per session."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def tumbling_window(df: DataFrame, ts_col: str, width: str) -> DataFrame:
    """Tumbling event-time windows: groupBy(window(ts, width))."""
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window(df: DataFrame, ts_col: str, width: str, slide: str) -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "n_events")
    )


def session_window(df: DataFrame, ts_col: str, key: str, gap: str) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col(key), F.col("win.start").alias("session_start"), "n_events")
    )


def stateful_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Dedup by key — dropDuplicates works identically on batch and stream
    (streaming keeps key state; add a watermark to bound it)."""
    return df.dropDuplicates(keys)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    with_watermark: str | None = "1 hour",
    single_file: bool = False,
) -> DataFrame:
    """File-source stream over the events table.

    The streaming file source requires a directory, so the parquet file is
    staged into a temp dir once per (session, sf_dir). The ns→µs timestamp
    normalization from load_table is preserved by staging the normalized
    batch frame. ``single_file=True`` coalesces the staging to one file so
    an availableNow run is exactly one micro-batch (deterministic update-
    mode output for oracle checks).
    """
    import hashlib

    suffix = "_1f" if single_file else ""
    # Stable digest: hash() is salted per process, which re-staged (and
    # leaked) a directory for every fresh process.
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    staged = os.path.join(
        tempfile.gettempdir(), f"dss_stream_events_{key}{suffix}"
    )
    marker = os.path.join(staged, "_SUCCESS")
    batch = load_table(spark, sf_dir, "events")
    if single_file:
        batch = batch.coalesce(1)
    if not os.path.exists(marker):
        batch.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(batch.schema).parquet(staged)
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def run_stream_to_memory(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with an available-now trigger into a
    memory sink; returns the drained result as a batch DataFrame.

    This is the micro-batch analog of the reference's finite DoGet result
    stream (main.go:241-243): process everything available, then stop.
    State-store partitioning is clamped via ``state_partitions`` for every
    streaming run routed through here.
    """
    name = f"dss_sink_{uuid.uuid4().hex[:12]}"
    with state_partitions(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _capture_progress(q)
    return stream_df.sparkSession.table(name)


# metrics of the most recent drain: the 100 TB failure mode for
# streaming is UNBOUNDED STATE, not CPU — the scaling study (r11s band)
# and tests read this to assert the state store stays bounded by the
# watermark as input duration grows
_LAST_PROGRESS: dict = {}


def _capture_progress(q) -> None:
    state_rows = 0
    batches = 0
    try:
        batches = len(q.recentProgress)
        lp = q.lastProgress or {}
        for op in lp.get("stateOperators", []) or []:
            state_rows += int(op.get("numRowsTotal", 0) or 0)
    except Exception:  # metrics are best-effort; never fail the drain
        return
    _LAST_PROGRESS.clear()
    _LAST_PROGRESS.update(
        {"state_rows": state_rows, "batches": batches}
    )


def last_stream_progress() -> dict:
    """State-store metrics of the most recent ``run_stream_to_memory``
    drain: {'state_rows': total rows held across stateful operators at
    the final micro-batch, 'batches': micro-batch count}."""
    return dict(_LAST_PROGRESS)
