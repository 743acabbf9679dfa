"""Round-15 ADVICE pins.

1. (medium) breadth._LIST_NULL_CONCAT_RE matched the bracket group of
   a SUBSCRIPT, so ``arr[1] || NULL`` rewrote to ``arrif(false, [1],
   NULL)`` — the base identifier glued onto if(), unparseable or
   wrong. A negative lookbehind (identifier char / ``)`` / ``]`` /
   ``}`` / mask marker) restricts the match to standalone list
   literals; subscript results keep the native NULL-propagating
   ``||``, which is also DuckDB's answer (element || NULL → NULL).
2. (medium) EXECUTE arguments that are expressions spliced verbatim
   into ``$N`` sites: DuckDB binds the EVALUATED value, so ``EXECUTE
   q(1+1)`` against ``SELECT $1 * 2`` is 4 — the bare textual splice
   gave ``1+1*2`` = 3. render_sql_literal now parenthesizes _RawSQL
   values (harmless around list/typed literals).
3. (low) media_census mapped environment faults (ImportError from an
   absent numpy, MemoryError, RecursionError) to ``error:malformed``,
   reporting infra failure as data corruption. Those now re-raise;
   data faults still produce status rows, never exceptions.
4. (low) _rewrite_in_subquery_3vl triple-planning of the subquery
   body is documented as an accepted cost (the single-scan lowering
   needs a correlated scalar-aggregate subquery Spark rejects) —
   pinned here only that the rewrite still answers correctly on a
   moderately expensive body.
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_server_spark.dialect import (
    register_dialect_functions,
    rewrite,
    run_script,
    run_sql,
    serving_dialect,
)


@pytest.fixture(scope="module")
def sqls(spark):
    register_dialect_functions(spark)
    return spark


def _both(spark, sql: str):
    if ";" in sql:
        duck = duckdb.connect()
        for part in (p for p in sql.split(";") if p.strip()):
            cur = duck.execute(part)
        dd = sorted(map(tuple, cur.fetchall()), key=repr)
        with serving_dialect(True):
            sp = sorted(
                map(tuple, run_script(spark, sql)[-1].collect()), key=repr
            )
    else:
        dd = sorted(map(tuple, duckdb.sql(sql).fetchall()), key=repr)
        with serving_dialect(True):
            sp = sorted(map(tuple, run_sql(spark, sql).collect()), key=repr)
    assert repr(sp) == repr(dd), f"{sql!r}: spark={sp} duckdb={dd}"
    return sp


class TestListNullConcatSubscript:
    @pytest.mark.parametrize("sql", [
        # subscript base: identifier, paren group, chained subscript
        "SELECT l[1] || NULL AS r FROM (SELECT ['a','b'] AS l) t",
        "SELECT ([1,2])[1] || NULL AS r",
        "SELECT m[1][1] || NULL AS r FROM (SELECT [['x']] AS m) t",
        # standalone literals must STILL rewrite (typed NULL)
        "SELECT [1,2] || NULL AS r",
        "SELECT NULL || [3,4] AS r",
        "SELECT ['a'] || NULL AS r",
        # literal-subscript mix in one statement
        "SELECT [1,2] || NULL AS a, l[2] || NULL AS b"
        " FROM (SELECT [7, 8] AS l) t",
    ])
    def test_subscript_vs_literal(self, sqls, sql):
        _both(sqls, sql)

    def test_no_glued_identifier_in_rewrite(self):
        out = rewrite("SELECT arr[1] || NULL FROM t")
        assert "arrif" not in out


class TestExecuteExpressionBinding:
    @pytest.mark.parametrize("sql", [
        "PREPARE q AS SELECT $1 * 2 AS r; EXECUTE q(1+1)",
        "PREPARE q AS SELECT $1 + $1 AS r; EXECUTE q(3*2)",
        "PREPARE q AS SELECT -$1 AS r; EXECUTE q(1-3)",
        "PREPARE q AS SELECT $1[2] AS r; EXECUTE q([10,20,30])",
        "PREPARE q AS SELECT $1 AS r; EXECUTE q(TIMESTAMP '2024-01-02"
        " 03:04:05')",
        "PREPARE q AS SELECT $1 * $2 AS r; EXECUTE q(1+1, 2+3)",
    ])
    def test_value_semantics(self, sqls, sql):
        _both(sqls, sql)


class TestCensusEnvironmentFaults:
    def test_importerror_reraises(self, monkeypatch):
        from duckdb_server_spark.operators import multimodal

        def boom(payload, pcm_profile="fast"):
            raise ImportError("numpy unavailable")

        import duckdb_server_spark.operators.vorbis as vorbis

        monkeypatch.setattr(vorbis, "decode_ogg_vorbis_pcm", boom)
        ogg = b"OggS" + b"\x00" * 24 + b"\x01vorbis" + b"\x00" * 16
        with pytest.raises(ImportError):
            multimodal.media_census(ogg)

    def test_data_fault_still_status_row(self):
        from duckdb_server_spark.operators import multimodal

        # a truncated Ogg-Vorbis header is a DATA fault: status row
        ogg = b"OggS" + b"\x00" * 24 + b"\x01vorbis" + b"\x00" * 4
        out = multimodal.media_census(ogg)
        assert out["family"] == "ogg-vorbis"
        assert out["status"].startswith(("error:", "fail-closed:"))

    def test_not_media_unchanged(self):
        from duckdb_server_spark.operators import multimodal

        out = multimodal.media_census(b"plain text payload")
        assert out["status"] == "not-media"


class TestInSubquery3VLCost:
    def test_correct_on_aggregating_body(self, sqls):
        # the triple-planned body is an aggregate — accepted cost,
        # answer must stay exact
        _both(
            sqls,
            "SELECT 5 IN (SELECT max(x) FROM (VALUES (1), (5), (NULL))"
            " v(x)) AS r",
        )
        _both(
            sqls,
            "SELECT 7 IN (SELECT sum(x) FROM (VALUES (1), (2)) v(x)"
            " HAVING sum(x) IS NOT NULL) AS r",
        )
