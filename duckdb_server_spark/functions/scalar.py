"""DuckDB scalar-function name shims (SURVEY.md §2.9).

The reference's declared numeric functions (main.go:515-519) and string
functions (main.go:520-521) nearly all exist in ``pyspark.sql.functions``
under the same name; this module records that mapping and implements the
divergences:

- numeric ``TRUNC`` — Spark's ``trunc`` is date-only, so ``trunc_numeric``
  scale-shifts with floor (sign-correct truncation toward zero);
- ``GLOB`` (main.go:428) — no Spark operator; translated glob→anchored regex;
- ``CURRENT_TIME`` (main.go:398) — no Spark TIME type; formatted string.

Everything stays JVM-side (Column expressions only — no Python UDFs) so the
whole layer is eligible for whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Declared numeric surface (main.go:515-519) → pyspark.sql.functions name.
# None ⇒ needs the custom helper below.
DUCKDB_TO_SPARK_FUNCTIONS: dict[str, str | None] = {
    "acos": "acos", "acosh": "acosh", "asin": "asin", "asinh": "asinh",
    "atan": "atan", "atan2": "atan2", "atanh": "atanh",
    "ceil": "ceil", "ceiling": "ceiling", "cos": "cos", "cosh": "cosh",
    "degrees": "degrees", "exp": "exp", "floor": "floor",
    "ln": "log", "log": "log10", "log10": "log10", "log2": "log2",
    "mod": "pmod", "pi": None, "pow": "pow", "power": "power",
    "radians": "radians", "sin": "sin", "sinh": "sinh", "sqrt": "sqrt",
    "tan": "tan", "tanh": "tanh", "trunc": None,
    # Declared string surface (main.go:520-521).
    "substr": "substring", "trim": "trim", "ltrim": "ltrim",
    "rtrim": "rtrim", "length": "length", "replace": "replace",
    "upper": "upper", "lower": "lower", "instr": "instr",
}


def trunc_numeric(col: Column, digits: int = 0) -> Column:
    """DuckDB ``trunc(x[, d])``: truncate toward zero to ``d`` decimals.

    Spark's ``trunc`` is date-only; this is the numeric equivalent built
    from floor/ceil so it stays in codegen. Negative inputs truncate toward
    zero (DuckDB semantics), which plain ``floor`` would get wrong.
    """
    scale = F.lit(10.0) ** F.lit(digits)
    shifted = col * scale
    toward_zero = F.when(col < 0, F.ceil(shifted)).otherwise(F.floor(shifted))
    return toward_zero / scale


def glob_to_regex(pattern: str) -> str:
    """Translate a DuckDB GLOB pattern (main.go:428) to an anchored regex.

    ``*`` → ``.*``, ``?`` → ``.``, ``[...]`` character classes pass through
    (with ``[!`` → ``[^``); all other regex metacharacters are escaped.
    """
    out = ["^"]
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j < n:  # well-formed class
                inner = pattern[i + 1 : j]
                if inner.startswith("!"):
                    inner = "^" + inner[1:]
                out.append("[" + inner.replace("\\", "\\\\") + "]")
                i = j
            else:  # dangling '[' — literal
                out.append("\\[")
        else:
            if c in ".^$+{}()|\\":
                out.append("\\" + c)
            else:
                out.append(c)
        i += 1
    out.append("$")
    return "".join(out)


def glob_match(col: Column, pattern: str) -> Column:
    """``col GLOB pattern`` as a Spark predicate (rlike on the translation)."""
    return col.rlike(glob_to_regex(pattern))


def current_time_string() -> Column:
    """``CURRENT_TIME`` (main.go:398): Spark has no TIME type — the
    reference-compatible rendering is an HH:mm:ss string of now()."""
    return F.date_format(F.current_timestamp(), "HH:mm:ss")


# DuckDB strip_accents does full NFD decomposition; Spark has no
# built-in. A translate() table covers the Latin-1 + Latin-Extended
# range the corpus can contain — one codegen'd expression, no UDF.
_ACCENTED = (
    "àáâãäåāăąèéêëēĕėęěìíîïĩīĭįòóôõöōŏőùúûüũūŭůçćĉċčñńņňýÿŷ"
    "ŕŗřśŝşšźżžţťďĝğġģĥĵŵ"
    "ÀÁÂÃÄÅĀĂĄÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÒÓÔÕÖŌŎŐÙÚÛÜŨŪŬŮÇĆĈĊČÑŃŅŇÝŸŶ"
    "ŔŖŘŚŜŞŠŹŻŽŢŤĎĜĞĠĢĤĴŴ"
)
_PLAIN = (
    "aaaaaaaaaeeeeeeeeeiiiiiiiioooooooouuuuuuuucccccnnnnyyy"
    "rrrsssszzzttdgggghjw"
    "AAAAAAAAAEEEEEEEEEIIIIIIIIOOOOOOOOUUUUUUUUCCCCCNNNNYYY"
    "RRRSSSSZZZTTDGGGGHJW"
)
assert len(_ACCENTED) == len(_PLAIN)


def strip_accents(col: Column) -> Column:
    """DuckDB ``strip_accents`` analog via a 1:1 translate table
    (SURVEY.md §2.9 string row)."""
    return F.translate(col, _ACCENTED, _PLAIN)
