"""Time individual declared queries in isolation (noop sink, best-of-N).

Usage: python tools/time_query.py [-nN] q01 b55 ...
Prints best/median of N (default 3) per query — bench.py methodology but
with more reps for A/B work on a noisy host.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = 3
    args = []
    for a in sys.argv[1:]:
        if a.startswith("-n"):
            # ADVICE r16: guard the digits before any Spark startup
            if not a[2:].isdigit():
                sys.exit(f"time_query: bad rep count {a!r} (use -nN)")
            reps = int(a[2:])
        else:
            args.append(a)
    if not args:
        sys.exit("time_query: no query name patterns given")

    from duckdb_server_spark import catalog
    from duckdb_server_spark.session import get_spark

    catalog.load_all()

    names = [n for n in catalog.QUERIES if any(a in n for a in args)]
    # ADVICE r16: fail before spinning up a Spark session, not after.
    if not names:
        sys.exit(f"time_query: no queries match {args}")

    spark = get_spark(app_name="dss-time-query")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/footers once (bench.py does the same).
    catalog.QUERIES[names[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite").save()
    for name in names:
        ts = []
        for _ in range(reps):
            df = catalog.QUERIES[name](spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: best={min(ts):.3f} med={statistics.median(ts):.3f} "
              f"all={[round(t, 3) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
