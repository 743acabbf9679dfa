"""Round 17 optimization pins (optimization round 2 of 2).

Each test freezes the decision/semantics of an r17 optimization so a
later refactor cannot silently regress it:

- ``spread_small_scan``'s file-probe replacement makes the same
  repartition decisions as the old ``df.rdd.getNumPartitions()`` probe
  on the test corpus (VERDICT r16 item 7);
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark.operators import _parse_bytes, spread_small_scan

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_parse_bytes_spark_conf_forms():
    assert _parse_bytes("134217728b") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("128MB") == 128 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4096") == 4096
    assert _parse_bytes("16k") == 16384


def test_spread_small_scan_repartitions_single_file_corpus(spark):
    """The pinned corpus decision (VERDICT r16 item 7): every test
    parquet is one small file, so the scan must be spread to
    defaultParallelism — the same decision the old RDD probe made."""
    path = os.path.join(SF_DIR, "documents.parquet")
    if not (os.path.exists(path) or glob.glob(path + "/*")):
        pytest.skip("test corpus not present")
    df = spark.read.parquet(path).select("doc_id", "text")
    out = spread_small_scan(df)
    par = spark.sparkContext.defaultParallelism
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString() or (
        out is not df
    )
    # the old probe decided repartition(par); the new one must agree
    assert out.rdd.getNumPartitions() == par
    # and the rows are unchanged
    assert out.count() == df.count()


def test_spread_small_scan_noop_on_wide_input(spark, tmp_path):
    """An input with at least one file per core is already wide: no
    repartition, no added Exchange."""
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide.parquet")
    spark.range(0, 10_000).repartition(par + 2).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_small_scan(df)
    assert out is df


def test_spread_small_scan_non_file_source_left_alone(spark):
    df = spark.range(0, 100)
    assert spread_small_scan(df) is df


EDGE_TEXTS = [
    (0, "hello world the quick brown fox and the lazy dog"),
    (1, ""),
    (2, "   "),
    (3, "one"),
    (4, "the the the the the"),
    (5, "a  b\t\tc\nd"),
    (6, "THE AND OF TO IN"),
    (7, "the, and. of! to? in;"),
    (8, "x" * 30),
    (9, None),
    (10, "words with  punct-uation, 123 numbers & sym!bols"),
    (11, " leading and trailing "),
    (12, "to to to in in of"),
]


def _docs(spark):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType(), True),
    ])
    return spark.createDataFrame(EDGE_TEXTS, schema)


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda r: (r[0] is None, r[0])
    )


def test_text_quality_cols_equals_arrow_spelling(spark):
    """b20's r17 codegen form computes byte-identical values to the r5
    Arrow form it replaces, across the edge corpus AND the real test
    corpus (VERDICT r16 item 3)."""
    from duckdb_server_spark.operators import text as T

    docs = _docs(spark)
    assert _rows(T.text_quality_cols(docs, "text", "doc_id")) == _rows(
        T.text_quality_arrow(docs, "text", "doc_id")
    )
    path = os.path.join(SF_DIR, "documents.parquet")
    if os.path.exists(path) or glob.glob(path + "/*"):
        real = spark.read.parquet(path).select("doc_id", "text")
        assert _rows(T.text_quality_cols(real, "text", "doc_id")) == _rows(
            T.text_quality_arrow(real, "text", "doc_id")
        )


def test_quality_logreg_cols_equals_arrow_and_hof_spellings(spark):
    """b57's r17 lambda-free codegen form computes identical values to
    both earlier spellings (VERDICT r16 item 3)."""
    from duckdb_server_spark.operators import text as T

    docs = _docs(spark)
    new = _rows(T.quality_logreg_cols(docs, "text", "doc_id"))
    assert new == _rows(T.quality_logreg_arrow(docs, "text", "doc_id"))
    assert new == _rows(T.quality_logreg(docs, "text", "doc_id"))
    path = os.path.join(SF_DIR, "documents.parquet")
    if os.path.exists(path) or glob.glob(path + "/*"):
        real = spark.read.parquet(path).select("doc_id", "text")
        assert _rows(
            T.quality_logreg_cols(real, "text", "doc_id")
        ) == _rows(T.quality_logreg_arrow(real, "text", "doc_id"))


def test_a09b_partition_select_matches_full_sort():
    """a09b's O(n) two-rank selection returns byte-identical quantiles
    to the full-sort spelling it replaced (r17): np.partition places
    exact order statistics at the requested ranks."""
    import numpy as np

    rng = np.random.default_rng(0x17EE)
    for n in (1, 2, 3, 7, 100, 9973):
        for p in (0.5, 0.9, 0.0, 1.0, 0.37):
            x = rng.uniform(-1e6, 1e6, n)
            pos = p * (n - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            s = np.sort(x)
            old = float(s[lo] + (pos - lo) * (s[hi] - s[lo]))
            part = np.partition(x, [lo, hi])
            new = float(part[lo] + (pos - lo) * (part[hi] - part[lo]))
            assert new == old


def test_b20_and_b57_plans_have_no_python_nodes(spark):
    """The ArrowEvalPython stage is gone from both queries' plans
    (VERDICT r16 item 3 'done' criterion)."""
    from duckdb_server_spark import catalog

    catalog.load_all()
    for name in ("b20_text_quality", "b57_quality_classifier"):
        plan = (
            catalog.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name


# --- r17 sort-below-decode restructure (the range-sample double-eval fix) ---

_RESTRUCTURED = (
    "b34e_vorbis_pcm",        # decoded.orderBy → presort + sortWithinPartitions
    "b30b_png_decode",
    "b86_multimodal_census",
    "b76_multistream_corpus",
    "b49_repetition_filter",
)
_SHIELDED = (
    "a09b_median_percentile_vectorized",  # kernel-above-exchange: shield repartition
    "st_stream_tws_rollup",
    "b31b_jpeg_decode",
)


def test_decode_rows_python_stage_not_under_range_exchange(spark):
    """RangePartitioning's sample pass re-executes its child, so a
    Python decode stage must never sit under a range Exchange (r17;
    measured 2.05× on b34e). Presorted rows: the Python node must
    appear ABOVE the range exchange in the plan tree (parents print
    first). Shielded rows: a reusable non-range exchange must sit
    between the range exchange and the Python node."""
    from duckdb_server_spark import catalog

    catalog.load_all()
    for name in _RESTRUCTURED:
        plan = (
            catalog.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        py = min(
            (plan.find(k) for k in ("MapInPandas", "ArrowEvalPython")
             if plan.find(k) != -1),
            default=-1,
        )
        rng = plan.find("rangepartitioning")
        assert py != -1, name
        assert rng == -1 or py < rng, (
            f"{name}: Python stage under the range exchange again"
        )
    for name in _SHIELDED:
        plan = (
            catalog.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        rng = plan.find("rangepartitioning")
        py = min(
            (plan.find(k) for k in
             ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython")
             if plan.find(k) != -1),
            default=-1,
        )
        if py == -1 or rng == -1:
            continue  # TWS env path / fully-JVM plan — nothing to shield
        between = plan[rng:py]
        assert "hashpartitioning" in between or "Exchange" in between, (
            f"{name}: no reusable exchange shields the Python stage "
            f"from the range-sample pass"
        )


_WINDOW_SHIELDED = (
    "w01_ranking",
    "w03_value_functions",
    "w04_running_agg",
    "w07b_exclude_frames",
)


def test_window_rows_shielded_from_range_sample(spark):
    """The four big-table window rows carry a hash shield exchange
    between the window stage and the final range sort, so the sort's
    sample pass replays shuffle files instead of re-running Sort+Window
    (r17; measured w07b 4.61→2.58 s, w04 0.63→0.54 s at sf0.1)."""
    from duckdb_server_spark import catalog

    catalog.load_all()
    for name in _WINDOW_SHIELDED:
        plan = (
            catalog.QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString()
        )
        rng = plan.find("rangepartitioning")
        win = plan.find("Window")
        assert rng != -1 and win != -1, name
        between = plan[rng:win]
        assert "hashpartitioning" in between, (
            f"{name}: window stage unshielded under the range sort"
        )


def test_restructured_rows_emit_globally_sorted_output(spark):
    """The presorted/shielded spellings must still emit rows in the
    declared global order — collected output equals an explicit
    orderBy of itself."""
    from duckdb_server_spark import catalog

    catalog.load_all()
    for name in _RESTRUCTURED + _SHIELDED:
        df = catalog.QUERIES[name](spark, SF_DIR)
        key = df.columns[0]
        got = df.collect()
        want = df.orderBy(F.col(key).asc_nulls_last()).collect()
        assert got == want, f"{name}: output no longer globally sorted"
