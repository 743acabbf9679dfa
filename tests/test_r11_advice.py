"""Round-11 ADVICE fixes, each with a live differential or exactness test:

* printf %N$ positional conversions — the cast template previously
  assigned casts in textual order, so printf('%2$s=%1$d', 7, 'k')
  rewrote to CAST('k' AS BIGINT) (runtime cast error / corrupt value);
  now each positional conversion casts args[N], sequential conversions
  keep their own ordinal counter, and conflicting casts fall back to
  the uncast native call.
* nested-comparison rewrite inside DML — INSERT INTO ... SELECT (and
  UPDATE/DELETE ... WHERE) previously skipped the rewrite wholesale, so
  an embedded [..] = [..] silently kept Spark's nested-NULL semantics;
  now the statement's query body is rewritten while the SET/assignment
  clause stays untouched.
* MP3 Layer III requantization band map — the r10 'line*21//576'
  placeholder is replaced by the real ISO 11172-3 Table B.8 long-block
  scalefactor-band boundaries per sample rate, with band 21 (the top
  run) taking scalefactor 0 per the spec.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql11(spark):
    register_dialect_functions(spark)
    return spark


def _match(spark, duck, sql: str):
    theirs = duck.execute(sql).fetchall()
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(spark, sql).collect()]
    a = sorted([str(x) for x in r] for r in ours)
    b = sorted([str(x) for x in r] for r in theirs)
    assert a == b, f"{sql!r}: {ours[:3]} != {theirs[:3]}"


# --- printf positional %N$ indices -------------------------------------------


def test_printf_positional_swapped(sql11, duck):
    _match(sql11, duck, "SELECT printf('%2$s=%1$d', 7, 'k') AS v")


def test_printf_positional_float_and_hex(sql11, duck):
    _match(
        sql11, duck,
        "SELECT printf('%2$x|%1$.2f', 1.5, 255) AS v",
    )


def test_printf_positional_repeated_arg(sql11, duck):
    _match(sql11, duck, "SELECT printf('%1$d+%1$d', 21) AS v")


def test_printf_sequential_still_casts(sql11, duck):
    _match(sql11, duck, "SELECT printf('%x %s %.1f', 255, 'a', 2.5) AS v")


def test_printf_positional_casts_decimal_arg(sql11, duck):
    # the bug's failure mode: a Decimal in the %f slot needs the cast
    # on THAT argument (Java Formatter rejects Decimal for %f); the
    # positional form must route the DOUBLE cast to args[1], not args[2]
    _match(
        sql11, duck,
        "SELECT printf('%2$s=%1$.1f', CAST(7.5 AS DECIMAL(5,1)), 'k')"
        " AS v",
    )


# --- nested comparisons inside DML query bodies -------------------------------


def _run_both_script(spark, duck, script, table):
    for st in script:
        duck.execute(st)
        execute_statement(spark, st)
    ours = sorted(
        [str(x) for x in r] for r in spark.table(table).collect()
    )
    theirs = sorted(
        [str(x) for x in r]
        for r in duck.execute(f"SELECT * FROM {table}").fetchall()
    )
    assert ours == theirs, f"{ours[:4]} != {theirs[:4]}"


def test_insert_select_nested_comparison(sql11, duck):
    # [1,NULL] = [1,2]: DuckDB short-circuits pairwise -> NULL; native
    # Spark array equality says false. The rewrite must reach the
    # SELECT body embedded in INSERT.
    script = [
        "CREATE TABLE r11nc (v BOOLEAN)",
        "INSERT INTO r11nc SELECT [1, NULL] = [1, 2]",
        "INSERT INTO r11nc SELECT [1, NULL, 3] < [1, NULL, 9]",
        "INSERT INTO r11nc SELECT [2] >= [1, 8]",
    ]
    _run_both_script(sql11, duck, script, "r11nc")


def test_update_where_nested_comparison(sql11, duck):
    script = [
        "CREATE TABLE r11up AS SELECT r.range AS i, [r.range, NULL]"
        " AS a FROM range(4) r",
        # the WHERE comparison needs DuckDB semantics (NULL pair ->
        # UNKNOWN -> row NOT updated); the SET '=' must stay untouched
        "UPDATE r11up SET i = i + 100 WHERE a = [1, NULL]",
        "CREATE TABLE r11up_out AS SELECT i FROM r11up",
    ]
    _run_both_script(sql11, duck, script, "r11up_out")


def test_delete_where_nested_comparison(sql11, duck):
    script = [
        "CREATE TABLE r11del AS SELECT r.range AS i,"
        " [r.range, r.range + 1] AS a FROM range(4) r",
        "DELETE FROM r11del WHERE a >= [2, 0]",
        "CREATE TABLE r11del_out AS SELECT i FROM r11del",
    ]
    _run_both_script(sql11, duck, script, "r11del_out")


# --- MP3 requantization band boundaries ---------------------------------------


def test_requantize_uses_real_band_edges():
    from duckdb_server_spark.operators.mp3_l3 import (
        decode_l3_subbands,
        write_l3_fixture,
    )

    # lines 0-3 are band 0 (sf 0 here), line 4 is band 1 (sf 1): under
    # the r10 placeholder map both lines sat in band 0 and came out at
    # equal magnitude; Table B.8 separates them by 2^-0.5
    sf = [0, 1] + [0] * 19
    blob = write_l3_fixture(
        [[(1, 0, 0, 0, 0), (1, 0, 0, 0, 0)], []],
        scalefac_compress=5,
        scalefacs=sf,
    )
    sb = decode_l3_subbands(blob)
    # both lines live in subband 0; energies of granule-1 window
    import math

    # decode the xr ratio directly instead: requantize is internal, so
    # probe through the module privately
    from duckdb_server_spark.operators.mp3_l3 import (
        _requantize,
        decode_l3_spectral,
    )

    fr = decode_l3_spectral(blob)[0]
    xr = _requantize(fr["granules"][0], fr["sample_rate"])
    assert xr[0] == 1.0
    assert xr[4] == pytest.approx(2.0 ** -0.5)
    assert sb["n_frames"] == 1


def test_requantize_band21_takes_zero_scalefactor():
    from duckdb_server_spark.operators.mp3_l3 import (
        _requantize,
        decode_l3_spectral,
        write_l3_fixture,
    )

    # 144 quads fill all 576 lines; the last quad's lines (572-575) sit
    # in band 21 (44.1 kHz edge 418) where no scalefactor applies
    quads = [(0, 0, 0, 0, 0)] * 143 + [(1, 0, 0, 0, 0)]
    blob = write_l3_fixture(
        [quads, []], scalefac_compress=5, scalefacs=[1] * 21
    )
    fr = decode_l3_spectral(blob)[0]
    xr = _requantize(fr["granules"][0], fr["sample_rate"])
    assert xr[572] == 1.0  # sf 0, gain 1 at global_gain 210


def test_sfb_long_tables_are_wellformed():
    from duckdb_server_spark.operators.mp3_l3 import SFB_LONG

    assert set(SFB_LONG) == {44100, 48000, 32000}
    for edges in SFB_LONG.values():
        assert len(edges) == 23
        assert edges[0] == 0 and edges[-1] == 576
        assert all(a < b for a, b in zip(edges, edges[1:]))
