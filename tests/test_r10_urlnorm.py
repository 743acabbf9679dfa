"""URL canonicalization (operators/urlnorm.py): pure-expression rules
probed against hand-computed expectations; stays JVM-side (no Python
UDF in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_server_spark.operators.urlnorm import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonicalize_url(F.col("url")).alias("c")
    ).collect()
    return [r.c for r in rows]


def test_case_port_fragment_utm_and_sorting(spark):
    got = _canon(spark, [
        "https://Example.TEST:443/doc/9?utm_source=x&q=abc#frag",
        "HTTPS://example.test/doc/9?q=abc&utm_campaign=y",
        "http://Host.com:80?b=2&a=1",
        "http://host.com:8080/p?a=1",
        "https://h.io/path/?z=9&y=8&utm_medium=m#x",
        "https://h.io/only#frag",
    ])
    assert got == [
        "https://example.test/doc/9?q=abc",
        "https://example.test/doc/9?q=abc",
        "http://host.com/?a=1&b=2",
        "http://host.com:8080/p?a=1",
        "https://h.io/path/?y=8&z=9",
        "https://h.io/only",
    ]


def test_default_port_is_scheme_aware(spark):
    got = _canon(spark, [
        "http://a.io:443/x",   # 443 is NOT http's default — kept
        "https://a.io:80/x",   # 80 is NOT https' default — kept
    ])
    assert got == ["http://a.io:443/x", "https://a.io:80/x"]


def test_emptied_query_drops_question_mark(spark):
    got = _canon(spark, ["https://a.io/p?utm_source=s&utm_term=t"])
    assert got == ["https://a.io/p"]


def test_no_python_udf_in_plan(spark):
    df = spark.range(1).select(
        canonicalize_url(F.lit("https://X.io:443/a?b=1#c")).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
