#!/usr/bin/env python
"""Benchmark harness — the driver's per-round perf gate (BASELINE.md).

Runs the headline queries from the declared catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution uses the ``noop`` sink so the full physical plan runs on the
executors (scan → shuffle → agg) without driver-side materialization —
the honest analog of a 1000-executor run, unlike ``collect()`` which
rewards tiny results, or ``count()`` which lets Catalyst prune the work.

Ratio regression gate (round 14, VERDICT r13 item 5; recalibrated
round 15 per VERDICT r14 + BENCH_NOTES item 30): the accepted
``value_over_control`` quiet band is RATIO_BAND, where the ratio's
denominator is ``max(control, CONTROL_FLOOR)`` — the floor removes
the low-control false-positive mode where a quiet host's shrinking
control inflates the ratio past the band while the headline (which
has a fixed planning floor) holds still. A ratio outside the band by
>25% prints ``band_verdict: "regression-check-required"`` and demands
a per-query diff against the prior round's record before close-out —
value and control moving TOGETHER is host drift, value moving alone
is a plan regression.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: one per major operator family (SURVEY.md §2) —
# scan+agg, multi-way join, cube, windows, as-of, sessionization,
# percentiles, plus the beyond-reference pipeline ops when registered.
HEADLINE = [
    "q01_pricing_summary",   # S1+P+A: scan, filter, groupBy, sort
    "t03_shipping_priority", # TPC-H Q3 analog: 3-way join top-k
    "t05_region_supplier_volume",  # TPC-H Q5 analog: dimension chain
    "t10_returned_items",    # TPC-H Q10 analog
    "t07_volume_shipping",   # TPC-H Q7 analog: 6-way join, 2x broadcast dim
    "t18_large_volume_customer",  # TPC-H Q18 analog: semi join on HAVING set
    "t21_waiting_supplier",  # TPC-H Q21 analog: semi + anti join chain
    "j01_inner_join",        # J1: multi-table equi-join
    "j07_theta_join",        # J7: inequality join
    "j08_asof_join",         # J8: custom as-of rewrite
    "a06_cube",              # A6: grouping sets
    "a09b_median_percentile_vectorized",  # A9: exact ordered-set aggs (fast path)
    "w04_running_agg",       # W4/W5: window frames
    "st_session_window",     # §2.10: gaps-and-islands sessionization
    "b01_exact_dedup",       # beyond: exact dedup
    "b03_minhash_lsh_pairs", # beyond: MinHash LSH near-dup
    "b10_knn_bruteforce",    # beyond: cosine top-k
    "b20_text_quality",      # beyond: text quality scoring
    "b40_training_data_pipeline",  # beyond: filter -> dedup -> budget
    "b41_balanced_sample",   # beyond: per-language training-mix quota
    "b42_token_shards",      # beyond: token-budget shard packing
]

# Operators added after the round-1 baseline was recorded. Benched and
# reported under "extra_queries" but NOT summed into the headline total,
# so the round-over-round `value` comparison stays apples-to-apples
# against BASELINE.md's 21-query definition.
EXTRA = [
    "b06_substring_dedup",   # substring-level dedup (word-5-gram spans)
    "b43_token_topk",        # exact vocabulary head
    "a09c_distributed_quantiles",  # exact quantiles, no group materialization
    "s15_bucketed_join",     # zero-Exchange co-located join (staged layout)
    "s16_partition_pruning", # partition-pruned scan (staged layout)
    "a18_pivot_dynamic",     # dynamic pivot (distinct discovery pass)
    "w10_window_filter",     # windowed conditional aggregates
    "b46_unigram_lm_score",  # corpus-LM quality scoring (two-pass)
    "b49_repetition_filter", # Gopher-style repetition gate (r3)
    "b51_tfidf_topk",        # per-doc TF-IDF keywords (r3)
    "b15_pq_adc_topk",       # product-quantization ADC ANN (r3)
    "b52_dup_cluster_keep_best",  # dedup cluster resolution (r4)
    "b53_bloom_decontam",    # bloom-pruned decontamination (r4)
    "b54_ivfpq_topk",        # IVF+PQ composed ANN (r4)
    "b55_semdedup",          # cluster-scoped semantic dedup (r4)
    "b56_zorder_layout",     # Z-order layout report (r4)
    "b57_quality_classifier",  # frozen-weight logistic quality model (r4)
    "b58_fuzzy_dedup_e2e",   # LSH→Jaccard→components→resolve composite (r4)
    "b59_rag_chunks",        # overlapping token-window chunking (r4)
    "b60_kmeans_train",      # quantizer training (Lloyd's, 2 iters) (r4)
    "a20_funnel_analysis",   # ordered event funnel (r4)
    "a21_retention_cohorts", # weekly retention matrix (r4)
]


# Accepted value_over_control quiet band. Round-15 recalibration
# (VERDICT r14 "what's wrong" item 1, BENCH_NOTES item 30): the r14
# gate flagged most QUIET-host runs because a sub-0.6 s control
# shrinks faster than the headline's fixed planning floor. Two
# changes, both prescribed by the r14 notes: (1) the ratio denominator
# is max(control, CONTROL_FLOOR) — the floor is the observed quiet-
# host control median (r14 recorded controls: 0.505-0.767, median
# 0.65), so a freakishly fast control can no longer inflate the ratio;
# (2) the band is recomputed from the EIGHT recorded r14 (value,
# control) pairs under that normalization: 14.08 / 14.61 / 15.58 /
# 15.81 / 15.88 / 17.07 / 17.50 / 17.58 → band (13.5, 18.0) with
# margin. The control WORKLOAD itself stays frozen (r13 definition).
# Update ONLY with a recorded multi-run measurement on a quiet host.
RATIO_BAND = (13.5, 18.0)
CONTROL_FLOOR = 0.65


def _band_verdict(ratio: float | None) -> str:
    """Classify this run's floor-normalized ratio against the recorded
    quiet band: in-band / above-band / below-band are informational;
    >25% outside either edge demands a per-query diff before
    close-out (at the r15 band: ratio > 22.5 ≈ a +29% headline
    excursion at a floored control, or < 10.8)."""
    if ratio is None:
        return "no-control"
    lo, hi = RATIO_BAND
    if ratio > hi * 1.25 or ratio < lo / 1.25:
        return "regression-check-required"
    if ratio > hi:
        return "above-band"
    if ratio < lo:
        return "below-band"
    return "in-band"


def _cpu_ticks() -> dict[str, int] | None:
    """Snapshot the aggregate /proc/stat cpu line. Linux-only; returns
    None where the file is absent so bench still runs elsewhere."""
    try:
        with open("/proc/stat") as fh:
            first = fh.readline().split()
    except OSError:
        return None
    if not first or first[0] != "cpu":
        return None
    vals = [int(x) for x in first[1:]]
    keys = ("user", "nice", "system", "idle", "iowait", "irq",
            "softirq", "steal", "guest", "guest_nice")
    return dict(zip(keys, vals))


def _steal_probe(pre: dict[str, int] | None, post: dict[str, int] | None):
    """Hypervisor-steal measurement around the whole bench run (round 16,
    VERDICT r15 item 3 / BENCH_NOTES item 33): the r15 +9% excursion was
    only diagnosable by a MANUAL /proc/stat check because the arithmetic
    control under-reads steal relative to shuffle-heavy queries. This
    automates that check: ``steal_ratio`` = steal ticks / busy ticks
    (user+nice+system+steal) across the run. The r15 contended reading
    measured steal=1109 vs user=581 (ratio ≈ 0.6); quiet hosts read
    ≈ 0. Threshold 0.15 — well above scheduler noise, well below any
    contention big enough to move the headline — flags the run
    "host-contended" so an out-of-band verdict self-discharges."""
    if pre is None or post is None:
        return None, None, False
    d = {k: post[k] - pre[k] for k in pre}
    busy = d["user"] + d["nice"] + d["system"] + d["steal"]
    ratio = round(d["steal"] / busy, 4) if busy > 0 else 0.0
    return d["steal"], ratio, ratio >= 0.15


def _control_seconds(spark) -> float:
    """FROZEN host-speed control (round 13, VERDICT r12 item 4): a fixed
    synthetic plan — 200M-row range → hash project → filter →
    groupBy(id % 1001) sum/avg → top-100 sort — using only Spark
    built-ins over ``spark.range``, touching NO repo code and NO input
    files. Its cost depends on host/JVM state only, so
    ``value / control`` separates host drift from repo regression
    round-over-round: if the headline total moves but the ratio holds,
    the host moved, not the plans. DO NOT EDIT this workload — its
    definition being frozen across rounds is the point. Best-of-2 like
    the headline rows."""
    from pyspark.sql import functions as F

    best = float("inf")
    for _ in range(2):
        df = (
            spark.range(0, 200_000_000, 1, 32)
            .withColumn("k", F.col("id") % 1001)
            .withColumn("v", (F.col("id") * 2654435761) % 1000003)
            .filter(F.col("v") % 7 != 0)
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.avg("v").alias("a"))
            .orderBy(F.desc("s"))
            .limit(100)
        )
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from duckdb_server_spark import catalog
    from duckdb_server_spark.session import get_spark

    catalog.load_all()

    spark = get_spark(app_name="dss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    ticks_pre = _cpu_ticks()

    names = [n for n in HEADLINE if n in catalog.QUERIES]
    # Warm the JVM + parquet footers once so timings measure the plans.
    catalog.QUERIES[names[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # A/B/A interleave: control before AND after the measured set, so a
    # host-speed shift DURING the run is visible as pre/post spread.
    control_pre = _control_seconds(spark)

    timings: dict[str, float] = {}
    for name in names:
        # Best-of-2: the first run pays one-off whole-stage-codegen
        # compilation for this plan shape; the second is the steady-state
        # cost a resident server (the reference is a long-lived Flight
        # server, main.go:258-270) would pay per query.
        best = float("inf")
        for _ in range(2):
            df = catalog.QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    extra: dict[str, float] = {}
    for name in (n for n in EXTRA if n in catalog.QUERIES):
        best = float("inf")
        for _ in range(2):
            df = catalog.QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        extra[name] = round(best, 3)

    control_post = _control_seconds(spark)
    control = round(min(control_pre, control_post), 3)
    steal_ticks, steal_ratio, contended = _steal_probe(ticks_pre, _cpu_ticks())

    sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "sf": sf_val,
                # frozen synthetic host-speed control (see
                # _control_seconds): compare value_over_control across
                # rounds to separate host drift from plan regressions
                "control": control,
                "control_pre": control_pre,
                "control_post": control_post,
                # r15: the gate ratio divides by max(control, FLOOR)
                # so a quiet-host sub-floor control cannot inflate it
                # (BENCH_NOTES item 30); raw value/control is still
                # derivable from the recorded fields above
                "control_floor": CONTROL_FLOOR,
                "value_over_control": round(
                    total / max(control, CONTROL_FLOOR), 3)
                if control
                else None,
                "ratio_band": list(RATIO_BAND),
                "band_verdict": _band_verdict(
                    total / max(control, CONTROL_FLOOR)
                    if control else None),
                # r16 steal probe (VERDICT r15 item 3): hypervisor-steal
                # ticks across the run; ratio >= 0.15 annotates the
                # reading host-contended so an out-of-band verdict
                # self-discharges without a manual /proc/stat check
                "steal_ticks": steal_ticks,
                "steal_ratio": steal_ratio,
                "host_contended": contended,
            }
        )
    )

    if "--compare-duckdb" in sys.argv:
        # Transparency mode: time each oracle-backed headline query in
        # embedded DuckDB on the same parquet (the reference's engine at
        # the same scale). Prints a SECOND JSON line; the driver only
        # reads the first. Expect DuckDB to win at sf0.1 — a 600k-row
        # corpus is far below the scale where Spark's distribution pays
        # for its constant per-query overhead; the engine is designed
        # for the 100 TB regime the embedded engine cannot reach.
        import duckdb

        con = duckdb.connect()
        for tbl in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{tbl}.parquet')"
            )
        duck: dict[str, float] = {}
        for name in names:
            if name not in catalog.ORACLE:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(catalog.ORACLE[name]).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck[name] = round(best, 3)
        print(
            json.dumps(
                {
                    "metric": "duckdb_oracle_total",
                    "value": round(sum(duck.values()), 3),
                    "unit": "sec",
                    "queries": duck,
                    "sf": sf_val,
                }
            )
        )


if __name__ == "__main__":
    main()
