"""Hypothesis properties for the late round-8 surface: fractional
integer-cast rounding (DOUBLE half-to-even vs DECIMAL half-away, the
silent-truncation fix), the upsert three-leg merge replayed as a random
operation sequence on both engines, and sequence arithmetic under
random START/INCREMENT. Generative differentials against live DuckDB —
masked-text rewrites fail by silently corrupting neighboring SQL, and
merge logic fails by drifting one row, so random inputs are the
cheapest adversary.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_server_spark.dialect import (
    execute_statement,
    register_dialect_functions,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sql_session(spark):
    register_dialect_functions(spark)
    return spark


_S = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_S
@given(
    vals=st.lists(
        st.decimals(
            min_value=-9999, max_value=9999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=4,
    )
)
def test_literal_cast_rounding_matches(sql_session, duck, vals):
    """Numeric-literal → INT casts fold with DuckDB's half-away rule."""
    sql = "SELECT " + ", ".join(
        f"CAST({v} AS INT) AS c{i}" for i, v in enumerate(vals)
    )
    with serving_dialect(True):
        ours = [tuple(r) for r in run_sql(sql_session, sql).collect()]
    theirs = duck.execute(sql).fetchall()
    assert ours == theirs, sql


@_S
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["ins", "replace", "ignore", "upsert"]),
            st.integers(min_value=0, max_value=6),  # key
            st.integers(min_value=0, max_value=99),  # value
        ),
        min_size=1,
        max_size=6,
    )
)
def test_upsert_sequences_match(sql_session, duck, ops):
    """A random op sequence over a PK table lands on identical contents
    and per-statement Counts on both engines (keys collide by design:
    7 keys, up to 6 ops)."""
    duck.execute("DROP TABLE IF EXISTS prop_up")
    execute_statement(sql_session, "DROP TABLE IF EXISTS prop_up")
    stmts = ["CREATE TABLE prop_up (k INT PRIMARY KEY, v INT)"]
    for kind, k, v in ops:
        if kind == "ins":
            # plain INSERT may violate the PK: route it as ignore-style
            # upsert so sequences always complete on both engines
            stmts.append(
                f"INSERT INTO prop_up VALUES ({k}, {v})"
                " ON CONFLICT DO NOTHING"
            )
        elif kind == "replace":
            stmts.append(f"INSERT OR REPLACE INTO prop_up VALUES ({k}, {v})")
        elif kind == "ignore":
            stmts.append(f"INSERT OR IGNORE INTO prop_up VALUES ({k}, {v})")
        else:
            stmts.append(
                f"INSERT INTO prop_up VALUES ({k}, {v}) ON CONFLICT (k)"
                f" DO UPDATE SET v = prop_up.v * 100 + excluded.v"
            )
    counts_d, counts_o = [], []
    for stmt in stmts:
        r = duck.execute(stmt)
        try:
            rows = r.fetchall()
        except Exception:
            rows = []
        df = execute_statement(sql_session, stmt)
        if df is not None and df.columns == ["Count"]:
            counts_o.append(df.collect()[0][0])
            counts_d.append(rows[0][0])
    ours = sorted(tuple(r) for r in sql_session.table("prop_up").collect())
    theirs = sorted(duck.execute("SELECT * FROM prop_up").fetchall())
    assert counts_o == counts_d and ours == theirs, stmts


@_S
@given(
    start=st.integers(min_value=1, max_value=50),
    inc=st.integers(min_value=1, max_value=9),
    rows=st.integers(min_value=1, max_value=8),
)
def test_sequence_series_match(sql_session, duck, start, inc, rows):
    """Random START/INCREMENT configs: the nextval series over a scan
    and the final currval agree with DuckDB."""
    duck.execute("DROP SEQUENCE IF EXISTS prop_seq")
    execute_statement(sql_session, "DROP SEQUENCE IF EXISTS prop_seq")
    ddl = f"CREATE SEQUENCE prop_seq START {start} INCREMENT {inc}"
    duck.execute(ddl)
    execute_statement(sql_session, ddl)
    q = f"SELECT nextval('prop_seq') AS v FROM range({rows})"
    theirs = sorted(duck.execute(q).fetchall())
    ours = sorted(
        tuple(r) for r in execute_statement(sql_session, q).collect()
    )
    assert ours == theirs
    cq = "SELECT currval('prop_seq') AS c"
    assert (
        execute_statement(sql_session, cq).collect()[0][0]
        == duck.execute(cq).fetchone()[0]
    )
