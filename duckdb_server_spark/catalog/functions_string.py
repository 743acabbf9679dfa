"""String scalar functions — the reference's declared list (main.go:520-521):
SUBSTR TRIM LTRIM RTRIM LENGTH REPLACE UPPER LOWER INSTR — plus the
DuckDB-core string surface exercised by the test corpus text columns
(SURVEY.md §2.9): split_part, contains, starts_with, left/right, lpad/rpad,
repeat, reverse, levenshtein, regexp_extract/replace, concat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


@query(
    "fn_string_declared",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 3, 8) AS sub_name,
           trim('  ' || p_name || ' ') AS trimmed,
           ltrim('xx' || p_name, 'x') AS l_trimmed,
           rtrim(p_name || 'zz', 'z') AS r_trimmed,
           length(p_name) AS name_len,
           replace(p_name, ' ', '_') AS snake_name,
           upper(p_name) AS upper_name,
           lower(p_brand) AS lower_brand,
           instr(p_name, 'a') AS first_a
    FROM part
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def fn_string_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact declared string list (main.go:520-521), same 1-based
    semantics: substr/instr are 1-based in both engines; instr→0 if absent."""
    p = t(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.substring(name, 3, 8).alias("sub_name"),
        F.trim(F.concat(F.lit("  "), name, F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("xx"), name), F.lit("x")).alias("l_trimmed"),
        F.rtrim(F.concat(name, F.lit("zz")), F.lit("z")).alias("r_trimmed"),
        F.length(name).alias("name_len"),
        F.replace(name, F.lit(" "), F.lit("_")).alias("snake_name"),
        F.upper(name).alias("upper_name"),
        F.lower(F.col("p_brand")).alias("lower_brand"),
        F.instr(name, "a").alias("first_a"),
    ).orderBy(F.col("p_partkey").asc_nulls_last())


@query(
    "fn_string_extended",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS first_word,
           split_part(text, ' ', 3) AS third_word,
           contains(text, 'scan') AS has_scan,
           starts_with(text, 'the') AS starts_the,
           left(text, 5) AS first5,
           right(text, 5) AS last5,
           lpad(lang, 5, '.') AS lang_padded,
           rpad(source, 8, '-') AS source_padded,
           repeat(lang, 3) AS lang3,
           reverse(lang) AS gnal,
           levenshtein(lang, 'en') AS lang_dist,
           regexp_extract(text, '[a-z]+', 0) AS first_token,
           regexp_replace(text, '\\s+', '|', 'g') AS piped,
           lang || ':' || source AS lang_source
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id ASC NULLS LAST
    """,
)
def fn_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    text = F.col("text")
    return d.select(
        "doc_id",
        F.split_part(text, F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(text, F.lit(" "), F.lit(3)).alias("third_word"),
        F.contains(text, F.lit("scan")).alias("has_scan"),
        F.startswith(text, F.lit("the")).alias("starts_the"),
        F.left(text, F.lit(5)).alias("first5"),
        F.right(text, F.lit(5)).alias("last5"),
        F.lpad(F.col("lang"), 5, ".").alias("lang_padded"),
        F.rpad(F.col("source"), 8, "-").alias("source_padded"),
        F.repeat(F.col("lang"), 3).alias("lang3"),
        F.reverse(F.col("lang")).alias("gnal"),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lang_dist"),
        F.regexp_extract(text, "[a-z]+", 0).alias("first_token"),
        F.regexp_replace(text, r"\s+", "|").alias("piped"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("lang_source"),
    ).orderBy(F.col("doc_id").asc_nulls_last())


@query(
    "fn_string_accents",
    oracle="""
    SELECT s, strip_accents(s) AS plain
    FROM (VALUES ('café'), ('naïve'), ('Zürich'), ('São Paulo'),
                 ('ŌŘŃŏ'), ('plain ascii')) t(s)
    ORDER BY s ASC NULLS LAST
    """,
)
def fn_string_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strip_accents (DuckDB core, SURVEY.md §2.9) — Spark has no
    built-in, so the shim is a single translate() over a Latin accent
    table (functions/scalar.py): stays in whole-stage codegen, no UDF.
    Checked on inline accented VALUES, identical rows in both engines.

    ('Ř' decomposes to R in DuckDB and in the table; chars outside the
    table — e.g. ß — are not accents and pass through both engines.)"""
    from duckdb_server_spark.functions.scalar import strip_accents

    rows = [("café",), ("naïve",), ("Zürich",), ("São Paulo",),
            ("ŌŘŃŏ",), ("plain ascii",)]
    return (
        spark.createDataFrame(rows, "s string")
        .select("s", strip_accents(F.col("s")).alias("plain"))
        .orderBy(F.col("s").asc_nulls_last())
    )


@query(
    "fn_levenshtein",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, lag(p_name) OVER (ORDER BY p_partkey ASC))
             AS dist_prev
    FROM part
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (both engines ship ``levenshtein`` natively;
    reachable in the reference via SQL passthrough main.go:229) —
    compared against the previous part name in key order, the
    fuzzy-matching primitive for catalog/entity cleanup. Stays in
    codegen; the lag window shuffles once on the sort key."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("p_partkey").asc())
    return (
        t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.levenshtein(F.col("p_name"), F.lag("p_name").over(w)).alias(
                "dist_prev"
            ),
        )
        .orderBy(F.col("p_partkey").asc_nulls_last())
    )


@query(
    "fn_regexp_extract_all",
    oracle=r"""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '[a-z]*ue[a-z]*'),
                                    ','), '') AS ue_words
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id ASC NULLS LAST
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all`` — identical function name and semantics in
    both engines; array result serialized to a string on both sides
    (FIXTURES.md: raw list cells break the driver's canonicalizer).
    DuckDB's array_to_string is NULL on an empty list where Spark's
    concat_ws is '' — COALESCE pins the no-match rows to ''."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.concat_ws(
                ",",
                # idx=0 = whole match (Spark defaults to capture group 1,
                # DuckDB's regexp_extract_all defaults to group 0).
                F.regexp_extract_all(F.col("text"), F.lit("[a-z]*ue[a-z]*"), 0),
            ).alias("ue_words"),
        )
        .orderBy(F.col("doc_id").asc_nulls_last())
    )
