"""Battery-F exploratory hunt: live DuckDB-vs-dialect differentials.

Probe surfaces (VERDICT r12 item 1): MAP functions / map_entries
ordering, DISTINCT ON + ORDER BY under the null-default pass,
correlated aggregates in HAVING, COLLATE inside expressions, TIME /
timestamptz arithmetic, plus GROUPING SETS, struct/list comparison and
misc corners. Prints a divergence report; fixes get pinned in
tests/test_r13_hunt_f.py.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    # --- MAP type ------------------------------------------------------
    "SELECT MAP {'a': 1, 'b': 2} AS m",
    "SELECT map_keys(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT map_values(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT map_entries(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT cardinality(MAP {'a': 1, 'b': 2}) AS v",
    "SELECT MAP {'a': 1, 'b': 2}['a'] AS v",
    "SELECT MAP {'a': 1, 'b': 2}['z'] AS v",
    "SELECT element_at(MAP {'a': 1, 'b': 2}, 'b') AS v",
    "SELECT map_from_entries([{'k': 'x', 'v': 1}, {'k': 'y', 'v': 2}]) AS v",
    "SELECT map_concat(MAP {'a': 1}, MAP {'b': 2}) AS v",
    "SELECT map([1, 2], ['x', 'y']) AS v",
    "SELECT map()['a'] AS v",
    "SELECT map_extract(MAP {'a': 1, 'b': 2}, 'a') AS v",
    "SELECT MAP {1: 'one', 5: 'five'}[5] AS v",
    "SELECT map_keys(map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2})) AS v",
    "SELECT map_values(map_concat(MAP {'a': 1, 'b': 9}, MAP {'b': 2})) AS v",
    # --- DISTINCT ON ---------------------------------------------------
    "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name",
    "SELECT DISTINCT ON (n_regionkey) n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name DESC",
    "SELECT DISTINCT ON (o_custkey % 5) o_custkey % 5 AS k, o_orderkey FROM orders ORDER BY o_custkey % 5, o_orderkey",
    "SELECT DISTINCT ON (r_regionkey % 2) r_regionkey % 2 AS k, r_name FROM region ORDER BY r_regionkey % 2, r_name DESC",
    # DISTINCT ON with nullable sort key exercises the null-default pass
    "SELECT DISTINCT ON (x) x, y FROM (VALUES (1, 'a'), (NULL, 'b'), (1, 'c'), (NULL, 'd')) t(x, y) ORDER BY x, y",
    "SELECT DISTINCT ON (x) x, y FROM (VALUES (1, 'a'), (NULL, 'b'), (1, 'c'), (NULL, 'd')) t(x, y) ORDER BY x DESC, y",
    # --- correlated aggregates in HAVING -------------------------------
    "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY n_regionkey HAVING count(*) > (SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM nation GROUP BY n_regionkey) s) ORDER BY n_regionkey",
    "SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 1.5 * (SELECT avg(o_totalprice) FROM orders) * count(*) ORDER BY o_custkey LIMIT 5",
    "SELECT r_regionkey, (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS c FROM region ORDER BY r_regionkey",
    "SELECT n_regionkey, max(n_nationkey) AS m FROM nation GROUP BY n_regionkey HAVING max(n_nationkey) > any(SELECT n_nationkey FROM nation WHERE n_regionkey = 0) ORDER BY n_regionkey",
    # --- COLLATE inside expressions ------------------------------------
    "SELECT 'HELLO' COLLATE NOCASE = 'hello' AS v",
    "SELECT 'a' COLLATE NOCASE IN ('A', 'B') AS v",
    "SELECT CASE WHEN 'X' COLLATE NOCASE = 'x' THEN 1 ELSE 0 END AS v",
    "SELECT count(*) AS v FROM nation WHERE n_name COLLATE NOCASE = lower(n_name)",
    "SELECT 'héllo' COLLATE NOACCENT = 'hello' AS v",
    "SELECT 'HÉLLO' COLLATE NOCASE.NOACCENT = 'hello' AS v",
    "SELECT max(n_name COLLATE NOCASE) AS v FROM nation",
    "SELECT DISTINCT upper(x COLLATE NOCASE) AS v FROM (VALUES ('a'), ('A')) t(x) ORDER BY v",
    # --- TIME / timestamptz arithmetic ---------------------------------
    "SELECT TIME '11:30:00' + INTERVAL 2 HOUR AS v",
    "SELECT TIME '23:30:00' + INTERVAL 2 HOUR AS v",
    "SELECT TIME '01:30:00' - INTERVAL 3 HOUR AS v",
    "SELECT TIMESTAMPTZ '2024-03-01 12:00:00+00' AS v",
    "SELECT TIMESTAMP '2024-03-01 12:00:00' AT TIME ZONE 'UTC' AS v",
    "SELECT TIMESTAMPTZ '2024-03-01 12:00:00+02' - TIMESTAMPTZ '2024-03-01 10:00:00+00' AS v",
    "SELECT age(TIMESTAMP '2024-03-15 10:00:00', TIMESTAMP '2022-01-10 08:30:00') AS v",
    "SELECT date_diff('minute', TIME '10:00:00', TIME '11:30:00') AS v",
    "SELECT date_diff('hour', TIMESTAMPTZ '2024-01-01 00:00:00+00', TIMESTAMPTZ '2024-01-02 03:00:00+00') AS v",
    "SELECT date_trunc('hour', TIMESTAMPTZ '2024-03-01 12:34:56+00') AS v",
    "SELECT TIME '10:11:12.345678' AS v",
    "SELECT date_part('epoch', TIMESTAMPTZ '2024-03-01 12:00:00+00') AS v",
    "SELECT TIMESTAMP '2024-02-29 12:00:00' + INTERVAL 1 YEAR AS v",
    "SELECT DATE '2024-01-31' + INTERVAL 1 MONTH AS v",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' - INTERVAL '90' MINUTE AS v",
    # --- GROUPING SETS / ROLLUP / CUBE ---------------------------------
    "SELECT n_regionkey, count(*) AS c FROM nation GROUP BY ROLLUP (n_regionkey) ORDER BY n_regionkey NULLS LAST",
    "SELECT n_regionkey, n_nationkey % 2 AS par, count(*) AS c FROM nation GROUP BY CUBE (n_regionkey, par) ORDER BY n_regionkey NULLS LAST, par NULLS LAST",
    "SELECT n_regionkey, grouping(n_regionkey) AS g, count(*) AS c FROM nation GROUP BY GROUPING SETS ((n_regionkey), ()) ORDER BY n_regionkey NULLS LAST",
    # --- struct / list comparison and misc -----------------------------
    "SELECT {'a': 1, 'b': 'x'} = {'a': 1, 'b': 'x'} AS v",
    "SELECT [1, 2, 3] < [1, 2, 4] AS v",
    "SELECT [1, 2] < [1, 2, 0] AS v",
    "SELECT [1, NULL] = [1, NULL] AS v",
    "SELECT {'a': NULL} = {'a': NULL} AS v",
    "SELECT list_sort([[2], [1, 0], []]) AS v",
    "SELECT [1, 2, 3] BETWEEN [1, 2] AND [2] AS v",
    # --- misc corners ---------------------------------------------------
    "SELECT generate_series(1, 10, 3) AS v",
    "SELECT generate_series(5, 1, -2) AS v",
    "SELECT range(DATE '2024-01-01', DATE '2024-01-10', INTERVAL 3 DAY) AS v",
    "SELECT unnest(generate_series(1, 3)) AS v",
    "SELECT bit_count(255::BIGINT) AS v",
    "SELECT xor(5, 3) AS v",
    "SELECT 5 # 3 AS v",
    "SELECT 5 & 3 AS v, 5 | 3 AS w, ~5 AS x, 1 << 4 AS y, 256 >> 3 AS z",
    "SELECT gen_random_uuid() IS NOT NULL AS v",
    "SELECT uuid() != uuid() AS v",
]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from duckdb_server_spark.dialect import (
        register_dialect_functions,
        run_sql,
        serving_dialect,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("hunt_f")
        .getOrCreate()
    )
    register_dialect_functions(spark)
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
            spark.read.parquet(path).createOrReplaceTempView(name)

    spark.sparkContext.setLogLevel("FATAL")

    def canon(v):
        """DuckDB's client returns MAP as {'key': [...], 'value': [...]};
        Spark returns a dict. Fold both to sorted item tuples."""
        if isinstance(v, dict):
            if set(v.keys()) == {"key", "value"} and isinstance(
                    v.get("key"), list):
                v = dict(zip(v["key"], v["value"]))
            return tuple(sorted(
                ((str(k), canon(x)) for k, x in v.items())))
        if hasattr(v, "asDict"):  # pyspark Row
            return canon(v.asDict())
        if isinstance(v, (list, tuple)):
            return tuple(canon(x) for x in v)
        return str(v)

    n_ok = n_diff = n_oerr = n_serr = 0
    for sql in PROBES:
        try:
            theirs = con.execute(sql).fetchall()
        except Exception as exc:
            print(f"ORACLE-ERR  {sql}\n    {type(exc).__name__}: {exc}")
            n_oerr += 1
            continue
        try:
            with serving_dialect(True):
                ours = [tuple(r) for r in run_sql(spark, sql).collect()]
        except Exception as exc:
            msg = str(exc).split("\n")[0][:160]
            print(f"SPARK-ERR   {sql}\n    {type(exc).__name__}: {msg}")
            n_serr += 1
            continue
        a = sorted([canon(x) for x in r] for r in ours)
        b = sorted([canon(x) for x in r] for r in theirs)
        if a != b:
            print(f"DIVERGE     {sql}\n    ours:   {ours[:3]}\n    theirs: {theirs[:3]}")
            n_diff += 1
        else:
            n_ok += 1
    print(f"\n== ok={n_ok} diverge={n_diff} spark_err={n_serr} oracle_err={n_oerr}")


if __name__ == "__main__":
    main()
