"""Streaming state-store bounds (round 11, VERDICT r10 item 4): the
100 TB failure mode for streaming is UNBOUNDED STATE, not CPU. These
tests extend the events time axis (3 epochs, each a full span + 1 h
apart) and assert the state store at drain end holds only what the
watermark keeps alive — NOT the whole input — via the progress capture
in streaming.last_stream_progress(). The r11s scaling band runs the
same shape at 10x/100x duration (tools/scaling_study.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def shifted_dir(spark, sf_dir, tmp_path_factory):
    """events replicated 3x with the time axis EXTENDED — input duration
    triples, the 1h watermark horizon does not."""
    base = str(tmp_path_factory.mktemp("stream_epochs"))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lo, hi = ev.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    stride = int(hi - lo) + 3600 + 600
    rep = spark.range(3).select(F.col("id").alias("__rep"))
    big = (
        ev.crossJoin(rep)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.unix_timestamp("ts") + F.col("__rep") * stride
            ),
        )
        .withColumn(
            "event_id", F.col("event_id") + F.col("__rep") * 100_000_000
        )
        .drop("__rep")
    )
    big.coalesce(4).write.parquet(os.path.join(base, "events.parquet"))
    return base


def test_watermark_append_state_bounded(spark, shifted_dir):
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_watermark_append,
    )
    from duckdb_server_spark.streaming import last_stream_progress

    out = st_stream_watermark_append(spark, shifted_dir)
    n_windows_emitted = out.count()
    prog = last_stream_progress()
    assert prog, "drain recorded no progress metrics"
    # the state store holds only the OPEN windows inside the final 1h
    # watermark horizon: ceil(1h / 10min) + 1 = 7 windows of state, no
    # matter how many epochs of input flowed through
    assert 0 < prog["state_rows"] <= 8, prog
    assert n_windows_emitted > 3 * prog["state_rows"]


def test_stream_join_state_bounded(spark, shifted_dir, sf_dir):
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_stream_join,
    )
    from duckdb_server_spark.streaming import last_stream_progress

    st_stream_stream_join(spark, shifted_dir).count()
    prog3 = last_stream_progress()
    st_stream_stream_join(spark, sf_dir).count()
    prog1 = last_stream_progress()
    assert prog3["state_rows"] > 0 and prog1["state_rows"] > 0
    # watermark-bounded join state: tripling the input DURATION must not
    # triple the retained state (both drains keep ~one horizon's rows;
    # allow generous slack for horizon-edge effects)
    assert prog3["state_rows"] <= int(prog1["state_rows"] * 1.5) + 8, (
        prog1,
        prog3,
    )


def test_warc_ingest_state_is_aggregate_groups_only(spark, sf_dir):
    # the ingest chain itself (WARC walk -> HTTP -> text) is stateless
    # mapInPandas; the only state is the final complete-mode aggregate,
    # whose rows equal its GROUP cardinality — not the input size
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_warc_ingest,
    )
    from duckdb_server_spark.streaming import last_stream_progress

    n_groups = st_stream_warc_ingest(spark, sf_dir).count()
    prog = last_stream_progress()
    assert 0 < prog["state_rows"] <= max(n_groups, 1) + 1, (
        prog,
        n_groups,
    )
