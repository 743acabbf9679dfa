"""Hunt battery H compositional GRAMMAR fuzzer (round 15, VERDICT r14
item 1): compose DuckDB-isms from a small hypothesis grammar and
differentially execute every composition against embedded DuckDB 1.0.

The grammar is three axes — a SOURCE (plain table, VALUES-derived,
DISTINCT ON, PIVOT output), one or two dialect EXPRESSIONS (list
comprehension, struct/map subscripts, interval ``//`` arithmetic,
``|| NULL`` typed-null concat, COLLATE comparison, value-position
IN-subquery, GLOB, try_cast chains, factorial, slices), and a WRAPPER
(bare, CTE, QUALIFY window, GROUP BY ALL aggregate, ORDER BY ALL +
OFFSET, recursive-CTE consumer). Seeded product enumeration, no
randomness: composition (s, e1, e2, w) is the same statement on every
run, so a failing id reproduces exactly.

Usage:
    python tools/hunt_h_fuzz.py            # full product sweep
    python tools/hunt_h_fuzz.py 123 456    # specific composition ids

Prints one line per mismatch/one-sided error and a final tally;
clean compositions print nothing (quiet = green). Acceptance filters
(engine-defined orders, documented superset syntax) mirror
tests/test_r15_hunt_h.py.
"""

from __future__ import annotations

import datetime
import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- the grammar -----------------------------------------------------------

SOURCES = [
    # (alias-visible integer column, string column, FROM text)
    ("n_nationkey", "n_name", "nation"),
    ("x", "s", "(VALUES (1, 'ab'), (2, 'CD'), (3, 'ef')) v(x, s)"),
    ("k", "nm",
     "(SELECT DISTINCT ON (n_regionkey) n_regionkey AS k, n_name AS nm "
     "FROM nation ORDER BY n_regionkey, n_name) d"),
    ("r", "g",
     "(SELECT r, CASE WHEN \"0\" > 2 THEN 'hi' ELSE 'lo' END AS g FROM "
     "(SELECT n_regionkey AS r, n_nationkey % 2 AS par FROM nation) "
     "PIVOT (count(*) FOR par IN (0, 1))) p"),
    # wave 7: a JOINED relation source (equi-join + filtered dim)
    ("jk", "jn",
     "(SELECT n.n_nationkey AS jk, n.n_name AS jn FROM nation n JOIN "
     "region r2 ON n.n_regionkey = r2.r_regionkey "
     "WHERE r2.r_regionkey < 3) j"),
]

# each expression template gets {i} = int column, {s} = string column
EXPRS = [
    "[y * 2 FOR y IN [1, {i} % 5 + 1] IF y > 0]",
    "{{'a': {i}, 'b': {s}}}['a']",
    "(DATE '2024-01-01' + INTERVAL (({i} % 7 + 9) // 2) DAY)",
    "list_intersect([{i} % 3, 1, 2], [1, 2, 9]) || NULL",
    "({s} COLLATE NOCASE = 'AB')",
    "({i} % 5 IN (SELECT r_regionkey FROM region))",
    "(CASE WHEN {s} GLOB '[A-Z]*' THEN 1 ELSE 0 END)",
    "try_cast(CAST({i} AS VARCHAR) AS INT) // 2",
    "([10, 20, 30, 40, 50, 60])[1:({i} % 2 + 2)!]",
    "string_split({s} || '_tail', '_')[1:2]",
    # wave 4 grammar extensions
    "([{i} % 3, 1] < [2, 0])",
    "CAST(('{{\"a\": [1, 2]}}'::JSON)->'a' AS INT[])[{i} % 2 + 1]",
    "len(list_distinct([{i} % 2, 1, {i} % 2]))",
    "date_trunc('month', DATE '2024-03-15' + INTERVAL ({i} % 4) "
    "MONTH)",
    "coalesce(nullif({i} % 3, 0), -1) // 2",
    "greatest({i} % 7, 2, least({i}, 5))",
]

# wave 6: window-bearing expressions — excluded from aggregating
# wrappers (GROUP BY ALL / HAVING reject window functions identically
# in both engines, which would just produce both-error noise)
WINDOW_EXPRS = [
    "row_number() OVER (ORDER BY {i})",
    "sum({i}) OVER (ORDER BY {i} ROWS BETWEEN 1 PRECEDING AND "
    "CURRENT ROW)",
    "lag({s}, 1) OVER (ORDER BY {i})",
    "rank() OVER (PARTITION BY {i} % 2 ORDER BY {i})",
    "count(*) FILTER ({i} % 2 = 0) OVER (ORDER BY {i})",
]
# GROUP BY ALL / HAVING reject windows in both engines; the
# recursive-CTE cross join duplicates every {i} value, making
# rank-order among ties engine-arbitrary — all three stay scalar-only
AGG_WRAPPERS = {3, 5, 7}

WRAPPERS = [
    # {sel} = projected expression list (always led by the source's
    # UNIQUE key as id0, so every ORDER BY ... LIMIT is fully
    # determined — an under-ordered LIMIT would let each engine keep
    # a different tied subset and flag false mismatches),
    # {src} = FROM text, {i}/{s} columns usable in the wrapper itself
    "SELECT {sel} FROM {src} ORDER BY 1 LIMIT 4",
    "WITH c AS (SELECT {sel} FROM {src}) SELECT * FROM c "
    "ORDER BY 1 LIMIT 4",
    "SELECT {sel} FROM {src} QUALIFY row_number() OVER (ORDER BY {i}) "
    "<= 3 ORDER BY 1",
    "SELECT {sel}, count(*) AS c FROM {src} GROUP BY ALL "
    "ORDER BY 1 LIMIT 4",
    "SELECT {sel} FROM {src} ORDER BY 1 OFFSET 1 LIMIT 3",
    "WITH RECURSIVE it(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM it "
    "WHERE n < 2) SELECT it.n, {sel} FROM it, {src} "
    "ORDER BY 1, 2 LIMIT 5",
    # wave 4 grammar extensions
    "SELECT * FROM (SELECT {sel} FROM {src}) u UNION ALL "
    "SELECT * FROM (SELECT {sel} FROM {src}) w ORDER BY 1 LIMIT 4",
    "SELECT e1, count(*) AS c FROM (SELECT {sel} FROM {src}) "
    "GROUP BY e1 HAVING count(*) >= 1 ORDER BY 1 LIMIT 3",
]


def compositions():
    """Yield (comp_id, sql) for the full grammar product."""
    cid = 0
    for (si, (icol, scol, src)), (e1i, e1), (e2i, e2), (wi, w) in (
        itertools.product(
            enumerate(SOURCES), enumerate(EXPRS), enumerate(EXPRS),
            enumerate(WRAPPERS),
        )
    ):
        cid += 1
        if e2i < e1i:
            continue  # unordered pair: half the product
        a = e1.format(i=icol, s=scol)
        b = e2.format(i=icol, s=scol)
        sel = f"{icol} AS id0, {a} AS e1, {b} AS e2"
        sql = w.format(sel=sel, src=src, i=icol, s=scol)
        yield cid, sql
    # wave 6: one window expression × one scalar expression per
    # non-aggregating wrapper
    for (si, (icol, scol, src)), (wei, we), (ei, e), (wi, w) in (
        itertools.product(
            enumerate(SOURCES), enumerate(WINDOW_EXPRS),
            enumerate(EXPRS), enumerate(WRAPPERS),
        )
    ):
        cid += 1
        if wi in AGG_WRAPPERS:
            continue
        a = we.format(i=icol, s=scol)
        b = e.format(i=icol, s=scol)
        sel = f"{icol} AS id0, {a} AS e1, {b} AS e2"
        sql = w.format(sel=sel, src=src, i=icol, s=scol)
        yield cid, sql


# --- differential executor (tests/test_r15_hunt_h.py's _canon) -------------


def _canon(v):
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(
                v.get("key"), list):
            v = dict(zip(v["key"], v["value"]))
        return tuple(sorted((str(k), _canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return _canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return str(v.astimezone(datetime.timezone.utc)
                   .replace(tzinfo=None))
    return str(v)


def main() -> None:
    import duckdb

    from duckdb_server_spark.dialect import (
        register_dialect_functions,
        run_sql,
        serving_dialect,
    )
    from duckdb_server_spark.session import get_spark

    only = {int(a) for a in sys.argv[1:]} if len(sys.argv) > 1 else None
    spark = get_spark(app_name="dss-hunt-h-fuzz", master="local[8]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.sparkContext.setLogLevel("ERROR")
    register_dialect_functions(spark)
    duck = duckdb.connect()
    for name in ("region", "nation"):
        p = f"/root/testdata/sf0.001/{name}.parquet"
        spark.read.parquet(p).createOrReplaceTempView(name)
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

    n = ok = both_err = flagged = 0
    for cid, sql in compositions():
        if only is not None and cid not in only:
            continue
        n += 1
        d_err = s_err = None
        theirs = ours = None
        try:
            theirs = duck.execute(sql).fetchall()
        except Exception as exc:
            d_err = f"{type(exc).__name__}: {str(exc)[:90]}"
        try:
            with serving_dialect(True):
                ours = [tuple(r) for r in run_sql(spark, sql).collect()]
        except Exception as exc:
            s_err = f"{type(exc).__name__}: {str(exc)[:160]}"
        if d_err and s_err:
            both_err += 1
            continue
        if d_err or s_err:
            flagged += 1
            print(f"[{cid}] ONE-SIDED {'duck' if d_err else 'spark'}: "
                  f"{d_err or s_err}\n      {sql}")
            continue
        a = sorted(([_canon(x) for x in r] for r in ours), key=repr)
        b = sorted(([_canon(x) for x in r] for r in theirs), key=repr)
        if a == b:
            ok += 1
        else:
            flagged += 1
            print(f"[{cid}] MISMATCH\n      {sql}\n"
                  f"      spark: {ours[:3]}\n      duck:  {theirs[:3]}")
    print(f"\n{n} compositions: {ok} match, {both_err} both-error, "
          f"{flagged} flagged")


if __name__ == "__main__":
    main()
