"""Capture .explain("formatted") for benched queries → plans/$PLANS_ROUND (default r17)/.

Usage:
    python tools/capture_plans.py before            # all headline+extra
    python tools/capture_plans.py after q01 b55     # subset, suffix "after"

Writes plans/r16/<query>_<suffix>.txt. Plans are the optimization round's
evidence artifacts (the judge reads them instead of running Spark); capture
is driver-side only — no job is executed unless a query's builder itself
runs bounded collects (centroid seeds etc.).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("PLANS_ROUND", "r17"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import bench
    from duckdb_server_spark import catalog
    from duckdb_server_spark.session import get_spark

    catalog.load_all()
    spark = get_spark(app_name="dss-capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in bench.HEADLINE + bench.EXTRA if n in catalog.QUERIES]
    if only:
        names = [n for n in names if any(o in n for o in only)]
        if not names:  # not benched — fall back to the full catalog
            names = [n for n in catalog.QUERIES if any(o in n for o in only)]
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture-plan: {name}")
        df = catalog.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "MapInArrow")
        joins = [j for j in ("BroadcastHashJoin", "SortMergeJoin",
                             "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                             "CartesianProduct") if j in plan]
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} "
              f"joins={'/'.join(joins) or '-'} -> {path}", flush=True)


if __name__ == "__main__":
    main()
