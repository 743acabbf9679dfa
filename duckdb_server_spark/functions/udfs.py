"""User-defined function surface (SURVEY.md §2.11).

The reference has no UDF API of its own — extensibility is DuckDB
extensions loaded at startup (main.go:77-105) plus the ``-init`` SQL hook
(main.go:107-111). The Spark-native equivalents, in preference order:

1. **Stay JVM-side** (``pyspark.sql.functions`` / Column expressions) —
   everything in ``functions/scalar.py`` and ``functions/vector.py``.
2. **Vectorized Pandas UDFs** (Arrow batch transfer) when Python is
   genuinely required — scalar Series→Series and grouped-agg forms below.
3. **Python UDTFs** for table-generating functions (the
   ``duckdb_extensions()``-style table function analog).

Row-at-a-time Python UDFs are deliberately absent: at 100 TB they are
10-100× slower than the Arrow path (SURVEY.md §4 vectorized-execution row).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# DataType objects (not DDL strings): string return types are parsed via
# the active session, which does not exist yet at import time.
_TOKENS_SCHEMA = StructType(
    [StructField("pos", IntegerType()), StructField("tok", StringType())]
)


@pandas_udf(DoubleType())
def sigmoid(v: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: logistic sigmoid over an Arrow batch.
    Stand-in for any numpy/pandas per-value transform (scoring models,
    normalizers) — one Python call per ~10k-row batch, not per row."""
    return 1.0 / (1.0 + (-v).map(math.exp))


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """Grouped-agg Pandas UDF (UDAF): exp(mean(ln(x))) per group. Spark
    runs it once per group with Arrow transfer; partial aggregation is not
    available for grouped-agg UDFs, so keep groups coarse at scale (or
    prefer the pure-SQL identity exp(avg(ln(x))) when expressible)."""
    import numpy as np

    return float(np.exp(np.log(v.astype(float)).mean()))


@udtf(returnType=_TOKENS_SCHEMA)
class FirstTokens:
    """Python UDTF (table function): emit the first 5 whitespace tokens of
    a text with their 1-based positions. The ``duckdb_extensions()``-style
    table-function analog (main.go:77), usable via LATERAL in Spark SQL."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split()[:5], start=1):
            yield i, tok


def register_udfs(spark: SparkSession) -> None:
    """Bootstrap-time registration — the ``LOAD <extension>`` analog
    (main.go:98-105): makes the Python surface callable from SQL."""
    spark.udf.register("sigmoid", sigmoid)
    spark.udf.register("geometric_mean", geometric_mean)
    spark.udtf.register("first_tokens", FirstTokens)
