"""Round 12 (VERDICT r11 item 3): time-ordered streaming staging — the
multi-batch drain that retires the r11s availableNow caveat. The r11
band could only show FINAL state was bounded (everything arrived in one
micro-batch, so the join transiently buffered the whole input); here
events are staged one file per event-time slice with strictly
increasing mtimes and pulled one file per trigger, so the drain replays
the stream in time order, the watermark advances BETWEEN batches, and
``peak_state_rows`` — state at the WORST micro-batch — is the number a
live unbounded stream would actually hold."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark.streaming import (
    last_stream_progress,
    read_events_stream_time_ordered,
    run_stream_to_memory,
)


@pytest.fixture(scope="module")
def shifted_dir(spark, sf_dir, tmp_path_factory):
    """events replicated 3x with the time axis EXTENDED (the r11
    fixture shape): duration triples, the 1h watermark horizon and the
    ~5-day slice duration do not."""
    base = str(tmp_path_factory.mktemp("stream_epochs_to"))
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


def test_staging_is_one_file_per_slice_in_time_order(spark, sf_dir):
    import glob
    import tempfile

    import hashlib

    read_events_stream_time_ordered(spark, sf_dir)  # stage
    # resolve THIS sf_dir's staging dir by its key — the latest-mtime
    # dir can belong to the scaling study's duration-extended tiers
    # (more slices), whose staging lingers in the same tempdir
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    dirs = glob.glob(
        os.path.join(tempfile.gettempdir(),
                     f"dss_stream_events_{key}_to*")
    )
    staged = [d for d in dirs if os.path.exists(
        os.path.join(d, "_STAGED_OK"))]
    assert staged
    # pick the DEFAULT 5-day staging (suffix _to6 at this span) — the
    # r13 amortization test stages fatter-slice variants of the same
    # sf_dir into sibling dirs, so newest-mtime is no longer unique
    by_suffix = [x for x in staged if x.endswith("_to6")]
    d = by_suffix[0] if by_suffix else max(staged, key=os.path.getmtime)
    files = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    # 30-day span at ~5-day slices -> 6 files, mtimes strictly rising
    assert len(files) == 6
    mtimes = [os.path.getmtime(os.path.join(d, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # file k holds only timestamps >= file k-1's max (time-ordered)
    prev_max = None
    for f in files:
        pdf = spark.read.parquet(os.path.join(d, f)).agg(
            F.min("ts"), F.max("ts")
        ).first()
        if prev_max is not None:
            assert pdf[0] >= prev_max
        prev_max = pdf[1]


def test_multibatch_drain_matches_batch_join(spark, sf_dir, duck):
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_join_timeordered,
    )

    got = [tuple(r) for r in
           st_stream_join_timeordered(spark, sf_dir).collect()]
    exp = duck.execute(
        """
        SELECT a.event_id, b.event_id, a.user_id
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND a.event_type = 'click' AND b.event_type = 'purchase'
         AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
        ORDER BY 1, 2
        """
    ).fetchall()
    assert got == exp
    prog = last_stream_progress()
    # genuinely multi-batch: 6 slices per source + the closing batch
    assert prog["batches"] >= 6, prog


def test_peak_state_bounded_as_duration_grows(spark, sf_dir,
                                              shifted_dir):
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_join_timeordered,
    )

    n1 = st_stream_join_timeordered(spark, sf_dir).count()
    prog1 = last_stream_progress()
    n3 = st_stream_join_timeordered(spark, shifted_dir).count()
    prog3 = last_stream_progress()
    assert n3 >= 3 * n1  # 3 epochs of matches flowed through
    assert prog3["batches"] > prog1["batches"]  # more, same-sized batches
    assert prog1["peak_state_rows"] > 0
    # THE claim: tripling input duration must not grow the per-batch
    # peak state — each micro-batch holds ~one slice + one watermark
    # horizon regardless of how long the stream has been running
    assert prog3["peak_state_rows"] <= int(
        prog1["peak_state_rows"] * 1.5
    ) + 8, (prog1, prog3)


def test_peak_far_below_total_input(spark, shifted_dir):
    # the single-batch availableNow drain buffered ALL click+purchase
    # rows at its (only) batch; the time-ordered drain's peak must sit
    # far below that
    from duckdb_server_spark.catalog.streaming_analog import (
        st_stream_join_timeordered,
    )

    st_stream_join_timeordered(spark, shifted_dir).count()
    prog = last_stream_progress()
    ev = spark.read.parquet(os.path.join(shifted_dir, "events.parquet"))
    joinable = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).count()
    assert prog["peak_state_rows"] < joinable / 2, (prog, joinable)
