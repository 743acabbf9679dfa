"""Round 13 (VERDICT r12 item 5): micro-batch overhead amortization —
the small-scale pin for the SCALING.md r13s band. Same input, fatter
event-time slices → fewer triggers → lower wall-clock, while the
drained result is identical (progressive eviction must not change
answers) and peak in-flight state grows with slice volume (the
explicit latency/memory tradeoff). The 100× measurements live in
SCALING.md; this pins the mechanism at test scale.
"""

from __future__ import annotations

import os
import time

import pytest


@pytest.fixture()
def _slice_env():
    old = os.environ.get("DSS_STREAM_SLICE_DAYS")
    yield
    if old is None:
        os.environ.pop("DSS_STREAM_SLICE_DAYS", None)
    else:
        os.environ["DSS_STREAM_SLICE_DAYS"] = old


def _run(spark, sf_dir):
    from duckdb_server_spark.catalog import QUERIES, load_all
    from duckdb_server_spark.streaming import last_stream_progress

    load_all()
    t0 = time.perf_counter()
    rows = sorted(
        tuple(r)
        for r in QUERIES["st_stream_join_timeordered"](
            spark, sf_dir).collect()
    )
    sec = time.perf_counter() - t0
    return rows, sec, last_stream_progress()


def test_fatter_slices_fewer_triggers_same_answer(spark, sf_dir,
                                                  _slice_env):
    os.environ["DSS_STREAM_SLICE_DAYS"] = "5"
    rows_thin, sec_thin, prog_thin = _run(spark, sf_dir)
    os.environ["DSS_STREAM_SLICE_DAYS"] = "50"
    rows_fat, sec_fat, prog_fat = _run(spark, sf_dir)

    # identical drained result — batching must not change answers
    assert rows_fat == rows_thin and len(rows_thin) > 0
    # fewer triggers, and the per-batch overhead share falls: wall is
    # dominated by trigger count at this volume
    assert prog_fat["batches"] < prog_thin["batches"]
    assert sec_fat < sec_thin
    # state tradeoff: a fatter slice holds at least as much in flight
    assert prog_fat["peak_state_rows"] >= prog_thin["state_rows"]
    # the watermark-retained final state is batching-independent
    assert prog_fat["state_rows"] == prog_thin["state_rows"]
