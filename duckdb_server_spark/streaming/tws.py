"""transformWithStateInPandas (Spark 4.x arbitrary-state API) operator.

The reference has no streaming surface at all (its only extensibility
hook, DoAction, is Unimplemented — main.go:121-124); this is part of the
Spark-native streaming extension (SURVEY.md §2.10). Where
``applyInPandasWithState`` (streaming/__init__.py) is the legacy
per-group-state API, ``transformWithStateInPandas`` is its Spark 4
replacement: named state variables, timers, TTL, and a processor object
with an explicit lifecycle.

Runtime gate: the API's state-server protocol needs ``protobuf`` in the
Python environment and the RocksDB state-store provider. When absent
(this container ships no protobuf), ``user_rollup`` falls back to the
batch path — ``applyInPandas`` with the *same* per-group pandas logic —
so the declared query still runs and oracle-checks; the streaming wiring
(schemas, processor, update-mode trigger) is exercised wherever the
dependency exists.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

try:  # the TWS state protocol speaks protobuf to the JVM state server
    from google.protobuf import descriptor  # noqa: F401

    HAVE_TWS_DEPS = True
except ImportError:
    HAVE_TWS_DEPS = False

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mx", DoubleType())]
)

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _rollup_batches(prior_n: int, prior_mx: float | None, batches) -> tuple:
    """The per-key aggregation shared by both paths: fold pandas batches
    into (count, max). Count is integer-exact; max is order-insensitive —
    both safe for the hash-checked oracle."""
    n, mx = prior_n, prior_mx
    for pdf in batches:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        m = float(pdf["value"].max())
        mx = m if mx is None else max(mx, m)
    return n, mx


def make_processor():
    """Build the StatefulProcessor lazily (the class is only needed on
    the streaming path)."""
    from pyspark.sql.streaming import StatefulProcessor

    class UserRollup(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            prior = self.state.get() if self.state.exists() else (0, None)
            n, mx = _rollup_batches(prior[0], prior[1], rows)
            self.state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self):
            pass

    return UserRollup()


def user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rollup via transformWithStateInPandas when the
    environment supports it, else the same logic over batch
    ``applyInPandas``."""
    from duckdb_server_spark.session import load_table

    if HAVE_TWS_DEPS:
        from duckdb_server_spark.streaming import (
            read_events_stream,
            run_stream_to_memory,
        )

        old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
        try:
            stream = read_events_stream(
                spark, sf_dir, with_watermark=None, single_file=True
            )
            out = stream.groupBy("user_id").transformWithStateInPandas(
                make_processor(),
                outputStructType=OUT_SCHEMA,
                outputMode="Update",
                timeMode="None",
            )
            # single staged file + availableNow ⇒ exactly one micro-batch
            # ⇒ update-mode emits one final row per key (deterministic).
            return run_stream_to_memory(out, output_mode="update")
        finally:
            if old is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", old
                )

    def batch_rollup(pdf: pd.DataFrame) -> pd.DataFrame:
        n, mx = _rollup_batches(0, None, [pdf])
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n_events": [n], "max_value": [mx]}
        )

    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").applyInPandas(batch_rollup, OUT_SCHEMA)
