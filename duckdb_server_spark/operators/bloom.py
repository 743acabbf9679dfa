"""Distributed Bloom filter as pure DataFrame/Column expressions.

Spark's own ``BloomFilterAggregate`` is optimizer-internal (it backs
runtime row-group filtering and is not SQL-registered in 4.1), and
``DataFrame.stat.bloomFilter`` materializes the filter on the driver.
This module builds the filter distributed instead: k positions per key
hash scan-side, one ``bit_or`` hash-agg over ≤ m/64 word rows, then a
single-row ``map<word, bits>`` that broadcasts to the probe side — no
driver round-trip, no Python in the path.

Primary use: pre-filtering a massive probe side before an exact
(semi-)join — e.g. train-span decontamination, where the bloom prunes
the 100 TB side down to candidate rows and the exact join only shuffles
survivors. Bloom filters have no false negatives, so ``bloom prune →
exact verify`` returns exactly the exact-join result; the false-positive
rate only governs how much work the verify stage sees.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 18  # 256 Kbit -> <= 4096 longs in the broadcast map
DEFAULT_HASHES = 3


def _positions(key: Column, m: int, k: int) -> list[Column]:
    """k bit positions for a 64-bit key: xxhash64 re-hashed under k seed
    literals (cheap codegen; independent enough for Bloom bounds)."""
    return [F.pmod(F.xxhash64(F.lit(s), key), F.lit(m)) for s in range(k)]


def _word_and_mask(pos: Column) -> tuple[Column, Column]:
    word = (pos / 64).cast("int")
    # F.shiftleft's Python signature takes only a literal shift; the SQL
    # function itself accepts a column — call it directly.
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word, mask


def bloom_build(
    df: DataFrame, key_col: str, m: int = DEFAULT_BITS, k: int = DEFAULT_HASHES
) -> DataFrame:
    """Build the filter over ``df[key_col]`` (64-bit hashes). Returns a
    ONE-row DataFrame with a single ``bloom`` column: map<int,bigint>
    from word index to its 64 bits (absent word = all zeros).

    Shape: explode k positions per key (scan-side Generate), hash-agg
    ``bit_or`` onto at most m/64 word rows (map-side combine does almost
    all the work), then collapse to one map row. The map is bounded by
    the m constant — e.g. m=2^18 -> <=4096 entries, ~48 KB — so
    ``F.broadcast`` of the single row is always safe."""
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key_col), m, k))).alias("__pos")
    )
    word, mask = _word_and_mask(F.col("__pos"))
    words = (
        pos.select(word.alias("__word"), mask.alias("__mask"))
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )
    return words.agg(
        F.map_from_arrays(
            F.collect_list("__word"), F.collect_list("__bits")
        ).alias("bloom")
    )


def bloom_might_contain(
    bloom_map: Column, key: Column, m: int = DEFAULT_BITS, k: int = DEFAULT_HASHES
) -> Column:
    """Membership test against a ``bloom_build`` map column (true =
    possibly present, false = definitely absent). Pure codegen: k map
    lookups + bitwise ANDs. ``m``/``k`` must match the build call."""
    checks = []
    for pos in _positions(key, m, k):
        word, mask = _word_and_mask(pos)
        bits = F.coalesce(F.element_at(bloom_map, word), F.lit(0).cast("long"))
        checks.append(bits.bitwiseAND(mask) != 0)
    return functools.reduce(operator.and_, checks)
