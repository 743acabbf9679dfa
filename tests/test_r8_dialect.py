"""Dialect probe battery 7 — typed literals and temporal breadth
(VERDICT r7 task 4). Every execution test is differential: the
byte-identical statement runs on live DuckDB via the ``duck`` fixture
and the row sets must agree.

Covered corners:
- TIME literal ± INTERVAL arithmetic (Spark's TIME type has literals and
  comparisons but no arithmetic — folded at rewrite time, wrapping mod
  24 h like DuckDB);
- EXTRACT(EPOCH FROM …) (no EPOCH field in Spark);
- generic typed literals ``TYPE 'text'`` incl. DuckDB's DECIMAL(18,3)
  default width (Spark's CAST default DECIMAL(10,0) would silently
  truncate);
- readability underscores in numeric literals;
- UNPIVOT with multiple value columns and string-literal aliases;
- COLUMNS(*) / COLUMNS(* EXCLUDE …) / COLUMNS(lambda) incl. wrapped
  aggregate expansion with DuckDB's source-column naming;
- [NOT] MATERIALIZED CTE hints;
- multi-statement init scripts with interleaved PRAGMAs.
"""

from __future__ import annotations

import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    run_script,
    run_sql,
    serving_dialect,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_session(spark):
    from duckdb_server_spark.session import register_views

    register_dialect_functions(spark)
    register_views(spark, SF_DIR, ("nation", "region", "orders"))
    return spark


def _both(spark, duck, sql: str):
    with serving_dialect(True):
        ours = sorted(tuple(r) for r in run_sql(spark, sql).collect())
    theirs = sorted(duck.execute(sql).fetchall())
    return ours, theirs


def _match(spark, duck, sql: str):
    ours, theirs = _both(spark, duck, sql)
    assert ours == theirs, f"{sql!r}: {ours[:2]} != {theirs[:2]}"


# --- TIME ± INTERVAL -------------------------------------------------------


def test_time_plus_interval(sql_session, duck):
    _match(sql_session, duck, "SELECT TIME '13:45:30' + INTERVAL 30 MINUTE AS t")
    _match(sql_session, duck, "SELECT TIME '13:45:30' + INTERVAL '90' SECOND AS t")


def test_time_interval_wraps_midnight(sql_session, duck):
    _match(sql_session, duck, "SELECT TIME '23:30:00' + INTERVAL 90 MINUTE AS t")
    _match(sql_session, duck, "SELECT TIME '00:30:00' - INTERVAL '45' MINUTE AS t")


def test_time_interval_multi_unit_string(sql_session, duck):
    # day component is 0 mod 24 h; hours+minutes shift
    _match(
        sql_session,
        duck,
        "SELECT TIME '12:00:00' + INTERVAL '1 day 2 hours 30 minutes' AS t",
    )


def test_time_interval_commuted_and_chained(sql_session, duck):
    _match(sql_session, duck, "SELECT INTERVAL 2 HOUR + TIME '13:00:00' AS t")
    _match(
        sql_session,
        duck,
        "SELECT TIME '10:00:00' + INTERVAL 30 MINUTE + INTERVAL 15 MINUTE AS t",
    )


def test_time_interval_microseconds(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT TIME '10:00:00.123456' + INTERVAL 1 MICROSECOND AS t",
    )


# --- EXTRACT(EPOCH) --------------------------------------------------------


def test_extract_epoch(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT EXTRACT(EPOCH FROM TIMESTAMP '2024-01-01 00:00:10') AS ep",
    )
    _match(sql_session, duck, "SELECT EXTRACT(EPOCH FROM DATE '2024-01-01') AS ep")


def test_extract_epoch_on_column(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT o_orderkey, EXTRACT(EPOCH FROM CAST(o_orderdate AS TIMESTAMP)) AS ep "
        "FROM orders ORDER BY o_orderkey LIMIT 5",
    )


# --- typed literals --------------------------------------------------------


def test_decimal_typed_literal_default_width(sql_session, duck):
    # DuckDB: DECIMAL(18,3); Spark CAST default would be DECIMAL(10,0) = 12
    ours, theirs = _both(
        sql_session, duck, "SELECT DECIMAL '12.345' AS d, DECIMAL '12.345' * 2 AS d2"
    )
    assert ours == theirs
    assert float(ours[0][0]) == 12.345


def test_integer_family_typed_literals(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT INTEGER '42' AS i, BIGINT '9' AS b, SMALLINT '7' AS s, "
        "DOUBLE '1.5' AS d, FLOAT '2.5' AS f, BOOLEAN 'true' AS o",
    )


def test_bitstring_literal_value(sql_session, duck):
    _match(sql_session, duck, "SELECT BITSTRING '010101' AS b")


# --- numeric underscores ---------------------------------------------------


def test_underscore_numerics(sql_session, duck):
    _match(sql_session, duck, "SELECT 1_000_000 AS n, 1_000.5_5 AS f")
    _match(sql_session, duck, "SELECT 1_000_000 + 2_000 AS n")


def test_underscore_identifiers_untouched(sql_session, duck):
    # a column whose NAME contains digit_digit must not be rewritten
    _match(
        sql_session,
        duck,
        "SELECT n_nationkey AS k1_2 FROM nation ORDER BY k1_2 LIMIT 3",
    )


# --- UNPIVOT: multiple value columns + string aliases ---------------------


def test_unpivot_multi_value_columns(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT * FROM (SELECT 1 AS a1, 2 AS b1, 3 AS a2, 4 AS b2) "
        "UNPIVOT ((x, y) FOR g IN ((a1, b1) AS 'g1', (a2, b2) AS 'g2')) "
        "ORDER BY g",
    )


# --- COLUMNS star expressions ---------------------------------------------


def test_columns_lambda_like(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT COLUMNS(c -> c LIKE 'n_n%') FROM nation ORDER BY n_nationkey LIMIT 2",
    )
    _match(
        sql_session,
        duck,
        "SELECT COLUMNS(c -> c NOT LIKE '%name%') FROM nation "
        "ORDER BY n_nationkey LIMIT 2",
    )


def test_columns_wrapped_aggregate(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT min(COLUMNS(*)) FROM (SELECT n_nationkey, n_regionkey FROM nation)",
    )
    _match(sql_session, duck, "SELECT min(COLUMNS('n_(n|r).*key')) FROM nation")
    _match(
        sql_session,
        duck,
        "SELECT round(avg(COLUMNS(*)), 1) "
        "FROM (SELECT n_nationkey, n_regionkey FROM nation)",
    )


def test_columns_wrapped_aggregate_names_match_source(sql_session, duck):
    with serving_dialect(True):
        df = run_sql(
            sql_session,
            "SELECT min(COLUMNS(*)) FROM (SELECT n_nationkey, n_regionkey FROM nation)",
        )
    assert df.columns == ["n_nationkey", "n_regionkey"]


def test_columns_arithmetic_and_groupby(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT COLUMNS(*) + 1 FROM (SELECT n_nationkey AS a, n_regionkey AS b "
        "FROM nation) ORDER BY a LIMIT 2",
    )
    _match(
        sql_session,
        duck,
        "SELECT n_regionkey, min(COLUMNS('n_nat.*')) FROM nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey",
    )


def test_columns_star_exclude(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT COLUMNS(* EXCLUDE (n_name)) FROM nation ORDER BY n_nationkey LIMIT 1",
    )
    with pytest.raises(Exception, match="EXCLUDE"):
        with serving_dialect(True):
            run_sql(
                sql_session,
                "SELECT COLUMNS(* EXCLUDE (nope)) FROM nation",
            ).collect()


def test_columns_in_cte_consumer(sql_session, duck):
    _match(
        sql_session,
        duck,
        "WITH w AS (SELECT n_nationkey, n_regionkey FROM nation) "
        "SELECT max(COLUMNS(*)) FROM w",
    )


# --- MATERIALIZED CTE hints -----------------------------------------------


def test_materialized_cte_hints(sql_session, duck):
    _match(
        sql_session,
        duck,
        "WITH c AS MATERIALIZED (SELECT n_regionkey, count(*) AS n FROM nation "
        "GROUP BY n_regionkey), d AS NOT MATERIALIZED (SELECT * FROM c WHERE n > 3) "
        "SELECT * FROM d ORDER BY n_regionkey",
    )


# --- init scripts with interleaved PRAGMAs --------------------------------


def test_init_script_interleaved_pragmas(sql_session):
    from duckdb_server_spark.dialect import dialect_state

    results = run_script(
        sql_session,
        """
        PRAGMA threads=4;
        SET memory_limit='1GB';
        CREATE OR REPLACE TEMPORARY VIEW r8_init AS
            SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey;
        PRAGMA enable_progress_bar;
        SELECT current_setting('threads') AS t;
        """,
    )
    state = dialect_state(sql_session)
    assert state.settings.get("threads") == "4"
    assert state.settings.get("memory_limit") == "1GB"
    rows = sql_session.table("r8_init").collect()
    assert len(rows) == 5
    final = results[-1].collect()
    assert str(final[0]["t"]) == "4"  # DuckDB types threads as BIGINT


# --- regression guards: surrounding surface unchanged ----------------------


def test_battery7_leaves_core_sql_alone(sql_session, duck):
    _match(
        sql_session,
        duck,
        "SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1%' "
        "ORDER BY o_orderkey LIMIT 3",
    )
    _match(
        sql_session,
        duck,
        "SELECT count(*) AS n FROM orders WHERE o_orderdate >= DATE '1994-01-01'",
    )
    _match(
        sql_session,
        duck,
        "SELECT TIMESTAMP '2024-03-10 12:00:00' - INTERVAL '90' MINUTE AS ts",
    )
