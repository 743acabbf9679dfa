"""Fast-vs-exact Vorbis PCM profile at scale tiers (round 14,
VERDICT r13 item 3's "100x scale tier" measurement).

Builds N switched-stereo Ogg-Vorbis streams (the heaviest decode
shape: 2 channels, 2 long + 1 short block, coupling + window
switching) as a binary-payload DataFrame, decodes the whole corpus
through mapInPandas under each profile, and prints wall-clock +
throughput per tier. The oracle rows stay on the exact profile; this
study quantifies the fast profile as the 100 TB-sweep default.

Usage: python tools/codec_profile_study.py  (one line per tier;
numbers recorded in SCALING.md / BENCH_NOTES)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TIERS = (64, 640, 6400)  # 1x / 10x / 100x stream counts


def _build_stream(seed: int) -> bytes:
    from duckdb_server_spark.operators.vorbis import (
        Codebook,
        Floor1,
        Residue2,
        encode_ogg_vorbis,
        encode_vorbis_audio_multi_switched,
    )

    cs = bytes([65 + (seed + k) % 26 for k in range(6)])
    book_a = Codebook(1, 64, [6] * 64)
    book_b = Codebook(
        4, 16, [4] * 16, lookup_type=2, minimum=-3.0, delta=1.0,
        multiplicands=[(e + j) % 8 for e in range(16) for j in range(4)],
    )
    book_c = Codebook(4, 16, [4] * 16)
    books = [book_a, book_b, book_c]
    floor = Floor1([0], [3], [0], multiplier=1, rangebits=6,
                   x_list=[0, 64, 8, 16, 32])
    residue = Residue2(0, 256, 32, 2, 2, cascades=[0, 1],
                       books=[[-1] * 8, [1] + [-1] * 7])

    def posts(q, sh):
        return [(cs[0] * 5 + 17 * q + sh) % 160 + 16,
                (cs[1] * 7 + 29 * q + sh) % 160 + 16,
                (cs[2] + q) % 63 + 1, (cs[3] + 2 * q) % 63 + 1,
                (cs[4] + 3 * q) % 63 + 1]

    pkts = []
    for q, (bf, pf, nf) in enumerate([(1, 1, 0), (0, 0, 0), (1, 0, 1)]):
        n = 256 if bf else 64
        n_part = min(256, 2 * (n // 2)) // 32
        entries = [(cs[t % 6] + t + 13 * q) % 16
                   for t in range(n_part * 8)]
        pkts.append(encode_vorbis_audio_multi_switched(
            [posts(q, 0), posts(q, 31)], entries,
            [15] * math.ceil(n_part / 4), floor, residue, books,
            mode_num=bf, n_modes=2, blockflag=bf,
            prev_flag=pf, next_flag=nf))
    return encode_ogg_vorbis(pkts, books, floor, residue, channels=2,
                             coupling_steps=[(0, 1)], bs0_log2=6,
                             bs1_log2=8, mode_blockflags=(0, 1))


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("codec_profile_study").getOrCreate())

    def decode_kernel(profile):
        def body(pdf_iter):
            import pandas as pd

            from duckdb_server_spark.operators.vorbis import (
                decode_ogg_vorbis_pcm,
            )

            for pdf in pdf_iter:
                ids, csums = [], []
                for i, payload in zip(pdf["id"], pdf["payload"]):
                    out = decode_ogg_vorbis_pcm(bytes(payload),
                                                pcm_profile=profile)
                    ids.append(i)
                    csums.append(sum(abs(v) for c in out["pcm16"]
                                     for v in c))
                yield pd.DataFrame({"id": ids, "csum": csums})

        return body

    for n in TIERS:
        payloads = [(i, _build_stream(i)) for i in range(n)]
        df = spark.createDataFrame(payloads, "id long, payload binary") \
            .repartition(32).cache()
        df.count()
        results = {}
        for profile in ("exact", "fast"):
            t0 = time.perf_counter()
            agg = df.mapInPandas(decode_kernel(profile),
                                 "id long, csum long") \
                .agg({"csum": "sum"}).collect()[0][0]
            dt = time.perf_counter() - t0
            results[profile] = (dt, agg)
        (te, ce), (tf, cf) = results["exact"], results["fast"]
        assert ce == cf, f"profiles disagree at tier {n}: {ce} != {cf}"
        print(f"tier n={n}: exact {te:.2f}s ({n/te:.0f} streams/s), "
              f"fast {tf:.2f}s ({n/tf:.0f} streams/s), "
              f"speedup {te/tf:.1f}x, checksums equal")
        df.unpersist()


if __name__ == "__main__":
    main()
