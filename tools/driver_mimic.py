"""Driver-mimic differential runner with per-query timing.

Mimics the round driver: fresh default-config SparkSession, walk
``__spark_entry__.queries()`` in registration order, run each query at
sf0.01, compare to the DuckDB oracle with a pandas canonicalizer that sorts
all columns (dtype-sensitive hash like the driver's), and print per-query
wall time so slow rows can be hunted down.

Usage:
    python tools/driver_mimic.py            # full catalog
    python tools/driver_mimic.py j03 w01    # substring filter on names
    python tools/driver_mimic.py --limit 60
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df):
    """Driver-style canonicalization: sort by every column, dtype-sensitive
    value hash. Raises on unsortable cells (e.g. raw list columns) exactly
    like the driver's pandas path."""
    import pandas as pd

    if len(df.columns) == 0:
        return ""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = []
    for col in df.columns:
        # Value reprs only, no dtype names: round-1 driver evidence shows
        # int32-vs-int64 passes but 9010-vs-9010.0 fails, i.e. the driver
        # hashes sorted value representations, not pandas dtypes.
        payload.append((col, [repr(v) for v in df[col].tolist()]))
    return hashlib.sha256(json.dumps(payload, default=repr).encode()).hexdigest()


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    limit = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--limit"):
            if "=" in a:
                limit = int(a.split("=", 1)[1])
            elif i + 1 < len(argv):  # space form: --limit 60
                limit = int(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    t0 = time.time()
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("driver_mimic")
        .getOrCreate()
    )
    print(f"session up in {time.time() - t0:.1f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)
    if args:
        names = [n for n in names if any(a in n for a in args)]
    if limit:
        names = names[:limit]

    results: dict[str, dict] = {}
    total = 0.0
    for i, name in enumerate(names):
        t1 = time.time()
        row: dict = {}
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            t_spark = time.time() - t1
            if name in osql:
                t2 = time.time()
                ddf = con.execute(osql[name]).fetchdf()
                t_oracle = time.time() - t2
                row = {
                    "rows_match": len(sdf) == len(ddf),
                    "hash_match": _canon(sdf) == _canon(ddf),
                    "spark_rows": len(sdf),
                    "oracle_rows": len(ddf),
                    "t_spark": round(t_spark, 2),
                    "t_oracle": round(t_oracle, 2),
                }
            else:
                row = {"spark_rows": len(sdf), "t_spark": round(t_spark, 2),
                       "err": "no_oracle"}
        except Exception as exc:  # noqa: BLE001
            row = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        dt = time.time() - t1
        total += dt
        row["t_total"] = round(dt, 2)
        results[name] = row
        status = (
            "PASS" if row.get("hash_match")
            else ("rows-only" if row.get("err") == "no_oracle" else "FAIL")
        )
        print(f"[{i + 1:3d}/{len(names)}] {dt:6.2f}s {status:9s} {name}", flush=True)

    print(f"\ntotal {total:.1f}s over {len(names)} queries "
          f"(mean {total / max(1, len(names)):.2f}s)")
    bad = {n: r for n, r in results.items()
           if r.get("err") not in (None, "no_oracle") or r.get("hash_match") is False}
    if bad:
        print("\nFAILURES:")
        for n, r in bad.items():
            print(f"  {n}: {r}")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["t_total"])[:15]
    print("\nSLOWEST:")
    for n, r in slow:
        print(f"  {r['t_total']:6.2f}s {n} (spark {r.get('t_spark')}, "
              f"oracle {r.get('t_oracle')})")
    with open("/tmp/driver_mimic.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
