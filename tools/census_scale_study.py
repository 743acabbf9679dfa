"""Media-census scale band (round 15, VERDICT r14 item 4): b86 /
st_stream_media_census at 1x/10x/100x document tiers.

Each document becomes one of the ELEVEN mixed-media payload classes
(build_census_fixture) and flows through media_census — the exact
100 TB-sweep shape: per-payload CPU inside mapInPandas, zero shuffle
for the per-doc rows, one tiny count-by-(family, status) aggregate on
top. The study measures:

* batch wall-clock + docs/s per tier (fixture BUILD and census DECODE
  timed separately, because the synthetic fixture construction is
  study overhead a real sweep does not pay — it reads stored bytes);
* the streaming variant's state boundedness: complete-mode group
  count (≤ families x statuses, independent of input volume).

Usage: python tools/census_scale_study.py   (one JSON line per tier;
numbers recorded in SCALING.md group "r15c")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = (500, 5_000, 50_000)  # 1x / 10x / 100x of the sf0.01 corpus


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_server_spark.session import get_spark

    spark = get_spark(app_name="dss-census-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n_docs in TIERS:
        docs = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("DOC"), F.col("id").cast("string"),
                         F.lit("xx")).alias("text"),
            )
            .repartition(32)
        )

        def _fixture_only(pdf_iter):
            import pandas as _pd

            from duckdb_server_spark.operators.multimodal import (
                build_census_fixture,
            )

            for pdf in pdf_iter:
                sizes = []
                for doc_id, text_ in zip(pdf["doc_id"], pdf["text"]):
                    cs = (((text_ or "") + "x" * 6)[:6]).encode("latin-1")
                    sizes.append(len(build_census_fixture(doc_id, cs)))
                yield _pd.DataFrame({"n": sizes})

        def _census(pdf_iter):
            import pandas as _pd

            from duckdb_server_spark.operators.multimodal import (
                build_census_fixture,
                media_census,
            )

            for pdf in pdf_iter:
                fams, stats = [], []
                for doc_id, text_ in zip(pdf["doc_id"], pdf["text"]):
                    cs = (((text_ or "") + "x" * 6)[:6]).encode("latin-1")
                    out = media_census(build_census_fixture(doc_id, cs))
                    fams.append(out["family"])
                    stats.append(out["status"])
                yield _pd.DataFrame({"family": fams, "status": stats})

        # warm + fixture-build-only pass (the study overhead)
        t0 = time.perf_counter()
        docs.mapInPandas(_fixture_only, "n int").write.format(
            "noop").mode("overwrite").save()
        t_build = time.perf_counter() - t0

        # full build + census pass
        t0 = time.perf_counter()
        agg = (
            docs.mapInPandas(_census, "family string, status string")
            .groupBy("family", "status").count()
        )
        rows = agg.collect()
        t_full = time.perf_counter() - t0

        statuses = sorted((r["family"], r["status"], r["count"])
                          for r in rows)
        print(json.dumps({
            "tier_docs": n_docs,
            "build_only_sec": round(t_build, 2),
            "build_plus_census_sec": round(t_full, 2),
            "census_net_sec": round(t_full - t_build, 2),
            "docs_per_sec_full": round(n_docs / t_full),
            "n_status_groups": len(statuses),
            "all_decoded_or_classified": all(
                s[1] in ("decoded", "not-media")
                or s[1].startswith(("fail-closed:", "error:"))
                for s in statuses),
        }))


if __name__ == "__main__":
    main()
