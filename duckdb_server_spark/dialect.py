"""DuckDB-dialect SQL acceptance — the verbatim-SQL parity layer.

The reference's entire query capability is *verbatim DuckDB SQL* over the
wire: a Flight ticket carries raw SQL (main.go:199) straight into
``sql.Query`` on the embedded engine (main.go:229). A migrating user
therefore points an existing DuckDB client at the server and expects
``quantile_cont(...)``, ``SELECT * EXCLUDE (c)``, ``ASOF JOIN``,
``QUALIFY`` … to just work. Spark SQL parses most of DuckDB's surface
already (GROUP BY ALL, ORDER BY ALL, ``* EXCEPT``, lambdas); this module
closes the remaining dialect gap with

1. **registered SQL UDF aliases** (:func:`register_dialect_functions`) for
   DuckDB names whose Spark spelling differs but whose shape is a plain
   scalar call — pure ``RETURN <expression>`` bodies, so they inline into
   the Catalyst plan and stay inside whole-stage codegen (zero Python);
2. **a pre-parse string rewrite** (:func:`rewrite`) for constructs Spark's
   parser rejects outright: ``* EXCLUDE`` / ``* REPLACE``, ``QUALIFY``,
   the ``GLOB`` operator, DuckDB-only function names (``list_transform``,
   ``quantile_cont``, numeric ``trunc``, …), double-quoted identifiers,
   and ``ASOF JOIN`` (rewritten to the LEAD-bounded interval join — the
   same scale-safe spelling operators/asof.py uses);
3. **a statement router** (:func:`execute_statement` /
   :func:`run_script`) for DuckDB init-script statements that have no
   Spark equivalent: ``SET``/``INSTALL``/``LOAD``/``CREATE SECRET`` map
   onto engine config and the capability registry, ``CREATE VIEW``
   becomes a temp view over the rewritten query — so the reference's own
   bootstrap SQL (k8s/main.yaml:100-135) executes unmodified.

The serving entry point is :func:`run_sql`: try the statement as Spark
SQL first (native queries pay zero overhead — the rewrite never touches
them), and only on parse/analysis failure rewrite and retry. All
rewrites are string→string before parsing, so Catalyst sees an ordinary
query and every optimization (pushdown, pruning, AQE) applies untouched.
"""

from __future__ import annotations

import datetime as _dt
import re
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class DialectError(ValueError):
    """A rewrite determined the statement is DuckDB-dialect but cannot
    be served faithfully. Unlike generic rewrite failures — where the
    input may simply have been Spark-dialect all along — falling back
    to native Spark here would silently run DIFFERENT semantics (e.g.
    Spark's 32-bit Murmur3 for DuckDB's hash()), so run_sql re-raises
    instead of retrying."""

# ---------------------------------------------------------------------------
# literal / identifier masking
# ---------------------------------------------------------------------------

_PLACEHOLDER = "\x00{}\x00"
_PLACEHOLDER_RE = re.compile("\x00(\\d+)\x00")


def _mask(sql: str) -> tuple[str, list[str]]:
    """Replace string literals and quoted identifiers with placeholders so
    every downstream regex can ignore quoting. Double-quoted identifiers
    (DuckDB/ANSI) are converted to backticks (Spark) on restore; ``--`` and
    ``/* */`` comments are dropped."""
    out: list[str] = []
    table: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # '' escape
                        j += 2
                        continue
                    break
                j += 1
            table.append(sql[i : j + 1])
            out.append(_PLACEHOLDER.format(len(table) - 1))
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if sql[j] == '"':
                    if j + 1 < n and sql[j + 1] == '"':
                        j += 2
                        continue
                    break
                j += 1
            ident = sql[i + 1 : j].replace('""', '"')
            table.append("`" + ident.replace("`", "``") + "`")
            out.append(_PLACEHOLDER.format(len(table) - 1))
            i = j + 1
        elif c == "`":  # already-Spark identifier: mask as-is
            j = i + 1
            while j < n and sql[j] != "`":
                j += 1
            table.append(sql[i : j + 1])
            out.append(_PLACEHOLDER.format(len(table) - 1))
            i = j + 1
        elif c == "-" and sql[i : i + 2] == "--":
            j = sql.find("\n", i)
            i = n if j < 0 else j
        elif c == "/" and sql[i : i + 2] == "/*":
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out), table


def _unmask(sql: str, table: list[str]) -> str:
    return _PLACEHOLDER_RE.sub(lambda m: table[int(m.group(1))], sql)


def _literal_value(token: str) -> str | None:
    """The python string behind a masked single-quote literal, else None."""
    if token.startswith("'") and token.endswith("'"):
        return token[1:-1].replace("''", "'")
    return None


# ---------------------------------------------------------------------------
# balanced-paren helpers (operate on masked SQL)
# ---------------------------------------------------------------------------


def _matching_paren(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parentheses in SQL")


def _split_top_commas(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _find_top_keyword(s: str, words: tuple[str, ...], start: int = 0) -> tuple[int, str]:
    """First depth-0 occurrence of any keyword in ``words`` at/after
    ``start``; returns (index, matched word) or (-1, "")."""
    pat = re.compile(r"\b(" + "|".join(words) + r")\b", re.IGNORECASE)
    depth = 0
    i = start
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return i, m.group(1).upper()
        i += 1
    return -1, ""


# ---------------------------------------------------------------------------
# individual rewrites (masked SQL in, masked SQL out)
# ---------------------------------------------------------------------------

# DuckDB name → Spark name for functions Spark has under a different
# spelling. ``trunc`` maps to the registered dd_trunc SQL UDF because
# Spark's builtin trunc is date-only (functions/scalar.py:40); renames are
# dialect-path-only, so Spark-native queries keep Spark semantics.
_FN_RENAMES = {
    "list_transform": "transform",
    "list_apply": "transform",
    "row": "struct",
    "prefix": "startswith",
    "suffix": "endswith",
    "array_unique": "dd_list_unique",
    "ucase": "upper",
    "lcase": "lower",
    "list_value": "array",
    "array_value": "array",
    "list_pack": "array",
    "list_reverse": "reverse",
    "array_reverse": "reverse",
    "array_cat": "concat",
    # (list_extract / array_extract are _template rewrites: DuckDB
    # returns NULL for index 0 / out of range where Spark's element_at
    # raises under ANSI)
    "approx_quantile": "approx_percentile",
    # reservoir_quantile is sampling-approximate in DuckDB; the t-digest
    # here matches exactly on small groups, approximately at scale
    "reservoir_quantile": "approx_percentile",
    "format_bytes": "dd_format_bytes",
    "formatreadablesize": "dd_format_bytes",
    "formatreadabledecimalsize": "dd_format_bytes_dec",
    # DuckDB ≥1.1 url_encode/url_decode are RFC-3986 percent coding:
    # space is %20 (not +) and + is literal; Spark's builtins are
    # form-encoding — the dd_ wrappers adjust both directions
    "url_encode": "dd_url_encode",
    "url_decode": "dd_url_decode",
    "list_filter": "filter",
    "array_transform": "transform",
    "array_filter": "filter",
    "quantile_cont": "percentile",
    "regexp_matches": "regexp_like",
    "trunc": "dd_trunc",
    "list_contains": "array_contains",
    "list_has": "array_contains",
    "array_has": "array_contains",
    # DuckDB strlen is BYTE length (length() is the character count)
    "strlen": "octet_length",
    # grapheme-cluster slicing ≈ codepoint slicing for composed text
    # (Spark has no grapheme segmenter; combining sequences diverge)
    "left_grapheme": "left",
    "right_grapheme": "right",
    "list_unique": "dd_list_unique",
    "string_split_regex": "split",
    "str_split_regex": "split",
    "regexp_split_to_array": "split",
    "array_to_string": "array_join",
    "list_sort": "array_sort",
    "array_length": "size",
    # string-distance family (r7): levenshtein is native; the rest are
    # SQL/pandas shims registered in register_dialect_functions
    # DuckDB levenshtein counts UTF-8 BYTES; Spark's builtin counts
    # characters — silently one-off on every non-ASCII operand
    "levenshtein": "dd_lev_bytes",
    "editdist3": "dd_lev_bytes",
    "suffix": "endswith",
    "hamming": "dd_hamming",
    "mismatches": "dd_hamming",
    "jaccard": "dd_jaccard",
    "jaro_similarity": "dd_jaro",
    "jaro_winkler_similarity": "dd_jaro_winkler",
    "to_base64": "base64",
    "from_base64": "unbase64",
    "regexp_escape": "dd_regexp_escape",
    "damerau_levenshtein": "dd_damerau",
    # r7 batch 3 (second probe battery)
    "to_hex": "hex",
    "from_hex": "unhex",
    "ord": "ascii",
    "unicode": "dd_unicode",
    "substring_grapheme": "substring",  # grapheme≡char for BMP text
    "regexp_full_match": "dd_regexp_full_match",
    "fdiv": "dd_fdiv",
    "fmod": "dd_fmod",
    "even": "dd_even",
    "signbit": "dd_signbit",
    "isfinite": "dd_isfinite",
    "isinf": "dd_isinf",
    # favg is templated (DECIMAL-exact, bit-equal to DuckDB's Neumaier)
    "nfc_normalize": "dd_nfc_normalize",
    "gamma": "dd_libm_gamma",
    "lgamma": "dd_libm_lgamma",
    "nextafter": "dd_libm_nextafter",
    "chr": "char",
    # r7 batch 4 (JSON / nested probe battery)
    "apply": "transform",
    "array_reverse": "reverse",
    "json_valid": "dd_json_valid",
    "json_keys": "dd_json_keys",
    "json_merge_patch": "dd_json_merge_patch",
    "json_structure": "dd_json_structure",
    "json_extract": "dd_json_extract",
    "json_extract_path": "dd_json_extract",
# (list_distinct is a _template rewrite: DuckDB drops NULLs; element
# ORDER is its internal hash order — set-equal, order-unspecified)
    "list_position": "array_position",
    "list_indexof": "array_position",
    "strpos": "instr",
    "list_min": "array_min",
    "list_max": "array_max",
    # DuckDB's list/str aliases with direct Spark equivalents (``len`` is
    # polymorphic and handled structurally by _rewrite_len).
    "unnest": "explode",
    "week": "weekofyear",
    "list": "collect_list",
    "string_agg": "listagg",
    "group_concat": "listagg",
    "arg_max": "max_by",
    "arg_min": "min_by",
    "argmax": "max_by",
    "argmin": "min_by",
    "starts_with": "startswith",
    "ends_with": "endswith",
    "json_extract_string": "get_json_object",
    "list_intersect": "array_intersect",
    # (list_concat / list_cat / array_concat are _template rewrites:
    # DuckDB SKIPS NULL list arguments — concat would return NULL)
    "list_append": "array_append",
    "array_push_back": "array_append",
    # (list_prepend / array_prepend / array_push_front are _template
    # rewrites: DuckDB's argument order is (elem, list), Spark's is
    # (array, elem))
    "list_zip": "dd_list_zip",
    "gen_random_uuid": "uuid",
    "greatest_common_divisor": "dd_gcd",
    "gcd": "dd_gcd",
    "least_common_multiple": "dd_lcm",
    "lcm": "dd_lcm",
}

_FN_RENAME_RE = re.compile(
    r"\b(" + "|".join(_FN_RENAMES) + r")\s*\(", re.IGNORECASE
)


def _rewrite_fn_names(s: str) -> str:
    return _FN_RENAME_RE.sub(lambda m: _FN_RENAMES[m.group(1).lower()] + "(", s)


def _find_top_kw_sq(s: str, words: tuple[str, ...], start: int = 0) -> int:
    """Like :func:`_find_top_keyword` but also treats ``[`` / ``]`` as
    depth — needed wherever nested list comprehensions can appear."""
    pat = re.compile(r"\b(" + "|".join(words) + r")\b", re.IGNORECASE)
    depth = 0
    for i in range(start, len(s)):
        c = s[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0 and pat.match(s, i):
            return i
    return -1


def _rewrite_list_comprehension(s: str) -> str:
    """DuckDB list comprehension ``[expr FOR v IN lst IF cond]`` →
    ``transform(filter(lst, v -> cond), v -> expr)`` (filter first, then
    projection — DuckDB's evaluation order; the IF clause is optional).
    Runs BEFORE the list-literal/subscript rewrites so comprehension
    brackets are never mistaken for either; nested comprehensions
    resolve on the re-scan after each outer rewrite."""
    pos = 0
    while True:
        i = s.find("[", pos)
        if i < 0:
            return s
        close = None
        depth = 0
        for j in range(i, len(s)):
            if s[j] == "[":
                depth += 1
            elif s[j] == "]":
                depth -= 1
                if depth == 0:
                    close = j
                    break
        if close is None:
            return s
        body = s[i + 1 : close]
        fi = _find_top_kw_sq(body, ("FOR",))
        if fi < 0:
            pos = i + 1
            continue
        expr = body[:fi].strip()
        rest = body[fi + 3 :]
        im = _find_top_kw_sq(rest, ("IN",))
        if im < 0:
            pos = i + 1
            continue
        var = rest[:im].strip()
        tail = rest[im + 2 :]
        ci = _find_top_kw_sq(tail, ("IF",))
        if ci >= 0:
            lst, cond = tail[:ci].strip(), tail[ci + 2 :].strip()
            src = f"filter({lst}, {var} -> {cond})"
        else:
            src = tail.strip()
        repl = f"transform({src}, {var} -> {expr})"
        s = s[:i] + repl + s[close + 1 :]
        pos = i  # re-scan: expr/lst may hold nested comprehensions
    return s


def _rewrite_list_literals(s: str) -> str:
    """DuckDB list literal ``[a, b, c]`` → ``array(a, b, c)``. A bracket
    directly after an identifier, ``)``, ``]``, or a masked literal is
    list *indexing* (1-based in DuckDB, no direct Spark spelling) — left
    untouched and surfaced as a parse error rather than silently shifted."""
    out = []
    prev = ""  # immediately preceding character (whitespace counts)
    stack = []  # True where '[' was rewritten to array(
    for c in s:
        if c == "[":
            # Indexing only when the bracket abuts its operand
            # (ident char, ')', ']', or a masked literal terminator).
            is_literal = not (prev.isalnum() or prev in ")]_\x00")
            stack.append(is_literal)
            out.append("array(" if is_literal else "[")
        elif c == "]":
            converted = stack.pop() if stack else False
            out.append(")" if converted else "]")
        else:
            out.append(c)
        prev = c
    return "".join(out)


# string_split expands TEXTUALLY (not via the registered SQL UDF): Spark
# 4.1 mis-binds lambda variables over an inlined SQL-UDF result under
# aggregation (transform(string_split(min(x)), e -> ...) yields NULL
# elements), and `split` + \Q..\E literal-quoting is what the UDF body
# does anyway. The UDF stays registered for direct Spark-dialect callers.
_STRING_SPLIT_RE = re.compile(
    r"\b(string_split|str_split|string_to_array)\s*\(", re.IGNORECASE
)


def _rewrite_string_split(s: str, table: list[str]) -> str:
    while True:
        m = _STRING_SPLIT_RE.search(s)
        if not m:
            return s
        open_idx = s.index("(", m.end() - 1)
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) != 2:
            raise ValueError("string_split expects (string, separator)")
        table.append("'\\\\Q'")
        q = _PLACEHOLDER.format(len(table) - 1)
        table.append("'\\\\E'")
        e = _PLACEHOLDER.format(len(table) - 1)
        repl = f"split({args[0]}, concat({q}, {args[1]}, {e}))"
        s = s[: m.start()] + repl + s[close + 1 :]


# DuckDB regexp_replace replaces the FIRST match unless the 'g' flag is
# given; Spark is always-global with no flags argument. Drop a literal
# 'g' flag (semantics align with Spark's default) and fold a literal 'i'
# into the pattern as (?i). Non-global DuckDB calls (no 'g') would need
# first-match-only semantics Spark lacks — surfaced as an error.
_REGEXP_REPLACE_RE = re.compile(r"\bregexp_replace\s*\(", re.IGNORECASE)


def _rewrite_regexp_replace(s: str, table: list[str]) -> str:
    pos = 0
    while True:
        m = _REGEXP_REPLACE_RE.search(s, pos)
        if not m:
            return s
        open_idx = s.index("(", m.end() - 1)
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) == 3:
            # DuckDB's flagless form replaces only the FIRST match
            # (battery 34 — Spark's builtin always replaces all)
            repl = (f"dd_regexp_replace_first({args[0]}, {args[1]}, "
                    f"{args[2]})")
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len("dd_regexp_replace_first(")
            continue
        if len(args) != 4:
            pos = close
            continue
        flag_ph = _PLACEHOLDER_RE.fullmatch(args[3])
        flags = _literal_value(table[int(flag_ph.group(1))]) if flag_ph else None
        if flags is None or not set(flags) <= {"g", "i", "s"}:
            raise ValueError(f"unsupported regexp_replace flags: {args[3]!r}")
        pat = args[1]
        inline = "".join(c for c in flags if c != "g")
        if inline:
            pat_ph = _PLACEHOLDER_RE.fullmatch(pat)
            pat_lit = _literal_value(table[int(pat_ph.group(1))]) if pat_ph else None
            if pat_lit is None:
                raise ValueError("regexp_replace flag folding needs a literal pattern")
            table.append("'(?" + inline + ")" + pat_lit.replace("'", "''") + "'")
            pat = _PLACEHOLDER.format(len(table) - 1)
        if "g" not in flags:
            # flags but no 'g': still first-match-only
            repl = (f"dd_regexp_replace_first({args[0]}, {pat}, "
                    f"{args[2]})")
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len("dd_regexp_replace_first(")
            continue
        repl = f"regexp_replace({args[0]}, {pat}, {args[2]})"
        s = s[: m.start()] + repl + s[close + 1 :]
        # resume INSIDE the replacement: args[0] may hold a nested
        # 4-arg regexp_replace that still needs its flags dropped
        pos = m.start() + 1


_LIST_AGG_RE = re.compile(r"\b(list_aggregate|list_aggr|array_aggregate)\s*\(", re.IGNORECASE)

# list_aggregate(l, 'fname') → Spark array expression. sum/avg accumulate
# in DOUBLE (DuckDB widens to HUGEINT for integer lists; callers needing
# exact integer sums should use aggregate() directly).
_LIST_AGG_MAP = {
    "min": "array_min({l})",
    "max": "array_max({l})",
    "count": "size(filter({l}, x -> x IS NOT NULL))",
    "sum": "aggregate({l}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)",
    "avg": (
        "aggregate({l}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        " / size(filter({l}, x -> x IS NOT NULL))"
    ),
}


def _rewrite_list_aggregate(s: str, table: list[str]) -> str:
    while True:
        m = _LIST_AGG_RE.search(s)
        if not m:
            return s
        open_idx = s.index("(", m.end() - 1)
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) not in (2, 3):
            raise ValueError("list_aggregate expects (list, 'function_name')")
        lit = _PLACEHOLDER_RE.fullmatch(args[1])
        fname = _literal_value(table[int(lit.group(1))]) if lit else None
        fl = (fname or "").lower()
        if fl in ("string_agg", "group_concat") and len(args) in (2, 3):
            sep = args[2] if len(args) == 3 else _masked_literal(table, ",")
            repl = (
                f"(array_join(transform(filter({args[0]}, "
                f"__dd_x -> __dd_x IS NOT NULL), "
                f"__dd_x -> CAST(__dd_x AS STRING)), {sep}))"
            )
        elif fl == "histogram" and len(args) == 2:
            e = args[0]
            repl = (
                f"(map_from_entries(transform(array_sort(array_distinct("
                f"filter({e}, __dd_x -> __dd_x IS NOT NULL))), "
                f"__dd_x -> struct(__dd_x, CAST(size(filter({e}, "
                f"__dd_y -> __dd_y = __dd_x)) AS BIGINT)))))"
            )
        elif fname is not None and fl in _LIST_AGG_MAP and len(args) == 2:
            repl = "(" + _LIST_AGG_MAP[fl].format(l=args[0]) + ")"
        else:
            raise ValueError(
                f"unsupported list_aggregate function: {args[1]!r}"
            )
        s = s[: m.start()] + repl + s[close + 1 :]


# star EXCLUDE — but not window-frame EXCLUDE (CURRENT ROW / TIES / GROUP /
# NO OTHERS), which is a different production Spark lacks entirely.
_EXCLUDE_PAREN_RE = re.compile(
    r"\bEXCLUDE\s*\(([^()]*)\)", re.IGNORECASE
)
_EXCLUDE_BARE_RE = re.compile(
    r"\bEXCLUDE\s+(?!CURRENT\b|TIES\b|GROUP\b|NO\b)([A-Za-z_]\w*)",
    re.IGNORECASE,
)


def _rewrite_exclude(s: str) -> str:
    s = _EXCLUDE_PAREN_RE.sub(lambda m: "EXCEPT (" + m.group(1) + ")", s)
    return _EXCLUDE_BARE_RE.sub(lambda m: "EXCEPT (" + m.group(1) + ")", s)


# star REPLACE: `* [EXCEPT (...)] REPLACE (expr AS col, ...)` →
# `* EXCEPT (cols...), expr AS col, ...` (replaced columns move to the end
# of the projection; set-semantics consumers are unaffected).
_STAR_REPLACE_RE = re.compile(
    r"\*\s*(?:EXCEPT\s*\(([^()]*)\)\s*)?REPLACE\s*\(", re.IGNORECASE
)


def _rewrite_star_replace(s: str, spark=None) -> str:
    while True:
        m = _STAR_REPLACE_RE.search(s)
        if not m:
            return s
        open_idx = s.index("(", m.end() - 1)
        close = _matching_paren(s, open_idx)
        items = _split_top_commas(s[open_idx + 1 : close])
        names, exprs = [], []
        for item in items:
            am = re.search(r"\s+AS\s+([A-Za-z_]\w*|\x00\d+\x00)\s*$", item, re.IGNORECASE)
            if not am:
                raise ValueError(f"star REPLACE item needs 'expr AS col': {item!r}")
            names.append(am.group(1))
            exprs.append(item)
        except_cols = [c.strip() for c in (m.group(1) or "").split(",") if c.strip()]
        # DuckDB keeps each replaced column at its ORIGINAL position.
        # With a session, resolve the FROM source's column order and
        # splice the replacement expressions in place; without one (or
        # when the source is not a plain table), fall back to the
        # EXCEPT-and-append form — same values, appended order.
        # The ordered path is only safe when the top-level FROM clause is a
        # SINGLE plain relation (no JOIN / comma / subquery — otherwise the
        # resolved column list covers only part of the star) AND every
        # replaced/EXCEPT name resolves in it; anything else falls back to
        # the value-correct EXCEPT-and-append form.
        ordered = None
        if spark is not None:
            from_idx, _ = _find_top_keyword(s, ("FROM",), start=close + 1)
            if from_idx >= 0:
                end_idx, _ = _find_top_keyword(
                    s,
                    ("WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW",
                     "ORDER", "LIMIT", "UNION", "INTERSECT", "EXCEPT"),
                    start=from_idx + 4,
                )
                src = s[from_idx + 4 : end_idx if end_idx >= 0 else len(s)]
                sm = re.fullmatch(
                    r"\s*([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?[A-Za-z_]\w*)?\s*;?\s*",
                    src,
                )
                cols = None
                if sm:
                    try:
                        cols = spark.table(sm.group(1)).columns
                    except Exception:
                        cols = None
                if cols:
                    cols_l = {c.lower() for c in cols}
                    needed = [n.lower() for n in names] + [
                        c.lower() for c in except_cols
                    ]
                    if all(n in cols_l for n in needed):
                        by_name = dict(zip([n.lower() for n in names], exprs))
                        excl_l = {c.lower() for c in except_cols}
                        ordered = ", ".join(
                            by_name.get(c.lower(), c)
                            for c in cols
                            if c.lower() not in excl_l
                        )
        if ordered is not None:
            repl = ordered
        else:
            repl = (
                "* EXCEPT (" + ", ".join(except_cols + names) + "), "
                + ", ".join(exprs)
            )
        s = s[: m.start()] + repl + s[close + 1 :]


# GLOB operator: `expr GLOB 'pat'` / `expr NOT GLOB 'pat'` → RLIKE on the
# translated anchored regex (functions/scalar.py:53).
_GLOB_RE = re.compile(r"\bGLOB\s*\x00(\d+)\x00", re.IGNORECASE)


def _rewrite_glob(s: str, table: list[str]) -> str:
    from duckdb_server_spark.functions.scalar import glob_to_regex

    def sub(m: re.Match) -> str:
        pat = _literal_value(table[int(m.group(1))])
        if pat is None:
            raise ValueError("GLOB requires a string-literal pattern")
        table.append("'" + glob_to_regex(pat).replace("'", "''").replace("\\", "\\\\") + "'")
        return "RLIKE " + _PLACEHOLDER.format(len(table) - 1)

    return _GLOB_RE.sub(sub, s)


def _rewrite_qualify(s: str) -> str:
    """`SELECT <sel> FROM ... QUALIFY <pred> [ORDER BY/LIMIT ...]` →
    compute the predicate as a projected column inside a subquery, filter
    outside — the standard expansion (window functions cannot sit in
    WHERE). Works with CTE prefixes: the WITH list is parenthesized, so
    the first depth-0 SELECT/FROM belong to the main query block."""
    q_idx, _ = _find_top_keyword(s, ("QUALIFY",))
    if q_idx < 0:
        return s
    tail_idx, _ = _find_top_keyword(s, ("ORDER", "LIMIT"), start=q_idx + 7)
    pred = s[q_idx + 7 : tail_idx if tail_idx >= 0 else len(s)].strip()
    tail = s[tail_idx:] if tail_idx >= 0 else ""
    # The tail moves outside the wrapping subquery, where the FROM aliases
    # no longer exist — strip `alias.` qualifiers (the subquery exposes the
    # select list unqualified). Ordering by a non-projected column through
    # QUALIFY is not supported.
    tail = re.sub(r"\b[A-Za-z_]\w*\s*\.\s*(?=[A-Za-z_])", "", tail)
    head = s[:q_idx].rstrip()

    sel_idx, _ = _find_top_keyword(head, ("SELECT",))
    from_idx, _ = _find_top_keyword(head, ("FROM",), start=sel_idx)
    if sel_idx < 0 or from_idx < 0:
        raise ValueError("QUALIFY rewrite: could not locate main SELECT ... FROM")
    inner = (
        head[:from_idx].rstrip()
        + ", ("
        + pred
        + ") AS __dss_qualify "
        + head[from_idx:]
    )
    return (
        "SELECT * EXCEPT (__dss_qualify) FROM ("
        + inner
        + ") __dss_q WHERE __dss_qualify "
        + tail
    )


# --- ASOF JOIN -------------------------------------------------------------

def _scrub_bare_star(s: str) -> str:
    """If the main query block projects a bare ``*``, exclude the helper
    column the ASOF rewrite added to the right side. Depth-0 only — CTE
    bodies and the inserted subquery (which uses ``__r.*``) are inside
    parentheses and untouched."""
    idx, _ = _find_top_keyword(s, ("SELECT",))
    if idx < 0:
        return s
    m = re.match(
        r"SELECT\s+\*(?!\s*EXCEPT)(?=\s*,|\s+FROM)", s[idx:], re.IGNORECASE
    )
    if m:
        s = s[:idx] + "SELECT * EXCEPT (__asof_bound)" + s[idx + m.end():]
    return s


_ASOF_HEAD_RE = re.compile(
    r"\bASOF\s+(?P<kind>LEFT\s+)?JOIN\s*", re.IGNORECASE
)
_COLREF_RE = re.compile(r"^([A-Za-z_]\w*)\.([A-Za-z_]\w*)$")


def _rewrite_asof(s: str) -> str:
    """DuckDB ``ASOF JOIN`` → LEAD/LAG-bounded interval join.

    ``L ASOF JOIN R ON L.k = R.k AND L.ts >= R.ts`` matches each left row
    to the single right row with the greatest ``R.ts <= L.ts`` per key.
    Equivalent interval spelling: extend each right row with the next
    timestamp in its key group, then equi-join with the half-open interval
    predicate — one window over the (small) right side plus a hash join,
    the same plan shape as operators/asof.py builds (reference keyword:
    main.go:380). Matches nearest-per-key uniquely, so no dedup needed.
    """
    while True:
        m = _ASOF_HEAD_RE.search(s)
        if not m:
            return s
        # right side: a table name, a masked identifier, or a
        # parenthesized subquery/VALUES with an optional column-list alias
        pos = m.end()
        colalias = None
        if pos < len(s) and s[pos] == "(":
            close = _matching_paren(s, pos)
            rtable = s[pos : close + 1]
            pos2 = close + 1
        else:
            tm = re.match(r"[A-Za-z_]\w*|\x00\d+\x00", s[pos:])
            if not tm:
                raise ValueError("ASOF JOIN: unparseable right-side source")
            rtable = tm.group(0)
            pos2 = pos + tm.end()
        am = re.match(
            r"\s+(?:AS\s+)?(?!ON\b)([A-Za-z_]\w*)(\s*\(([^)]*)\))?",
            s[pos2:], re.IGNORECASE,
        )
        alias = None
        if am:
            alias, colalias = am.group(1), am.group(3)
            pos2 += am.end()
        if rtable.startswith("(") and alias is None:
            raise ValueError("ASOF JOIN: a subquery source needs an alias")
        ralias = alias or rtable
        onm = re.match(r"\s+ON\b", s[pos2:], re.IGNORECASE)
        if not onm:
            raise ValueError("ASOF JOIN: expected ON after the right side")
        # ON condition: up to the next depth-0 clause keyword.
        cond_start = pos2 + onm.end()
        cond_end, _ = _find_top_keyword(
            s,
            ("WHERE", "GROUP", "ORDER", "LIMIT", "QUALIFY", "JOIN", "LEFT",
             "RIGHT", "FULL", "INNER", "CROSS", "UNION", "INTERSECT",
             "EXCEPT", "WINDOW", "HAVING", "ASOF"),
            start=cond_start,
        )
        if cond_end < 0:
            cond_end = len(s)
        # The ON clause may sit inside a parenthesized FROM: stop at a
        # depth-underflowing ')'.
        depth = 0
        for i in range(cond_start, cond_end):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth < 0:
                    cond_end = i
                    break
        cond = s[cond_start:cond_end].strip()

        eqs, ineq = [], None
        for part in re.split(r"\bAND\b", cond, flags=re.IGNORECASE):
            part = part.strip()
            im = re.match(r"^(\S+)\s*(>=|<=|>|<)\s*(\S+)$", part)
            em = re.match(r"^(\S+)\s*=\s*(\S+)$", part)
            if im:
                if ineq is not None:
                    raise ValueError("ASOF JOIN: more than one inequality in ON")
                ineq = im.groups()
            elif em:
                eqs.append(em.groups())
            else:
                raise ValueError(f"ASOF JOIN: unsupported ON term: {part!r}")
        if ineq is None:
            raise ValueError("ASOF JOIN requires an inequality in ON")

        def right_col(ref: str) -> str | None:
            cm = _COLREF_RE.match(ref)
            if cm and cm.group(1).lower() == ralias.lower():
                return cm.group(2)
            return None

        lhs, op, rhs = ineq
        r_ts, l_ts = right_col(rhs), lhs
        if r_ts is None:  # inequality written right-side-first; flip it
            r_ts, l_ts = right_col(lhs), rhs
            op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
        if r_ts is None:
            raise ValueError("ASOF JOIN: inequality must reference the right table")

        part_cols = []
        for a, b in eqs:
            rc = right_col(a) or right_col(b)
            if rc is None:
                raise ValueError("ASOF JOIN: equality must reference the right table")
            part_cols.append(rc)

        over = "PARTITION BY " + ", ".join(part_cols) + " " if part_cols else ""
        if op in (">=", ">"):  # backward: bound by the NEXT right timestamp
            bound_fn, bound_op = "LEAD", {">": ">=", ">=": ">"}[op]
        else:  # forward: bound by the PREVIOUS right timestamp
            bound_fn, bound_op = "LAG", {"<": "<=", "<=": "<"}[op]
        inner_alias = f"__r({colalias})" if colalias else "__r"
        sub = (
            f"(SELECT __r.*, {bound_fn}(__r.{r_ts}) OVER ({over}ORDER BY "
            f"__r.{r_ts}) AS __asof_bound FROM {rtable} {inner_alias}) {ralias}"
        )
        join_kind = "LEFT JOIN" if m.group("kind") else "JOIN"
        new_cond = (
            cond
            + f" AND ({ralias}.__asof_bound IS NULL OR "
            + f"{ralias}.__asof_bound {bound_op} {l_ts})"
        )
        s = (
            s[: m.start()]
            + f"{join_kind} {sub} ON {new_cond}"
            + s[cond_end:]
            )
        s = _scrub_bare_star(s)


# DuckDB list subscripts are 1-based with NULL out-of-range; Spark's []
# is 0-based and (under ANSI) throws. ``try_element_at`` is the exact
# Spark spelling of DuckDB's semantics — 1-based, negative-from-end, NULL
# out-of-range — and it also covers map access, so EVERY subscript on the
# dialect path rewrites to it (expressions included: ``words[i + 1]``).
# ``l[a:b]`` slices (1-based, inclusive end) become ``slice``.


def _expr_start(s: str, idx: int) -> int:
    """Start of the base expression ending at ``idx`` (exclusive): walks
    back over identifier chars, dots, mask placeholders, and balanced
    paren/bracket groups — so ``f(x)[1]`` and ``a.b[2][3]`` resolve."""
    i = idx
    while i > 0:
        c = s[i - 1]
        if c in ")]":
            depth, j = 0, i - 1
            while j >= 0:
                if s[j] in ")]":
                    depth += 1
                elif s[j] in "([":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            i = j
        elif c.isalnum() or c in "_.\x00":
            i -= 1
        else:
            break
    return i


def _rewrite_subscripts(
    s: str,
    kinds: dict[str, str] | None = None,
    table: list[str] | None = None,
) -> str:
    def _is_map_base(base: str) -> bool:
        # a map literal has already been rewritten to map(...) /
        # map_from_arrays(...) by this point; typed columns resolve
        # through the catalog kinds. Strip balanced outer parens —
        # `(MAP {...})[k]` walks back to a paren-wrapped base.
        b = base.strip()
        while b.startswith("(") and _matching_paren(b, 0) == len(b) - 1:
            b = b[1:-1].strip()
        if re.match(
            r"(?i)^map(_from_arrays|_from_entries|_concat)?\s*\(", b
        ):
            return True
        if kinds and re.fullmatch(r"[A-Za-z_][\w.]*", b):
            return kinds.get(b.split(".")[-1].lower()) == "map"
        return False

    def _is_string_base(base: str) -> bool:
        mm = re.fullmatch(r"\x00(\d+)\x00", base)
        if mm:
            # _mask also masks double-quoted identifiers — only a
            # single-quote entry is a string LITERAL; a quoted identifier
            # falls through to the kinds lookup on its unquoted name
            entry = table[int(mm.group(1))] if table is not None else "'"
            if entry.startswith("'"):
                return True
            if kinds and entry.startswith('"'):
                return kinds.get(entry[1:-1].lower()) == "string"
            return False
        if kinds and re.fullmatch(r"[A-Za-z_][\w.]*", base):
            return kinds.get(base.split(".")[-1].lower()) == "string"
        return False

    while True:
        for m in re.finditer(r"\[([^\[\]]*)\]", s):
            start = m.start()
            if start == 0:
                continue
            prev_c = s[start - 1]
            if prev_c not in ")]" and not (prev_c.isalnum() or prev_c in "_\x00"):
                continue  # list literal (handled earlier) or stray bracket
            content = m.group(1).strip()
            if not content:
                continue
            base_start = _expr_start(s, start)
            base = s[base_start:start]
            if not base:
                continue
            if re.fullmatch(r"(?i)array", base.split(".")[-1]):
                # postgres-style ARRAY[...] literal, not a subscript
                s = s[: base_start] + f"array({content})" + s[m.end() :]
                break
            if content.count(":") == 2:
                # stepped slice l[a:b:c] — 1-based, inclusive both ends,
                # clamped; -1 end means the last element
                a, b, c = (p.strip() for p in content.split(":"))
                a = a or "1"
                if not b or not c:
                    raise ValueError("stepped slice needs an end and a step")
                if re.fullmatch(r"-\d+", c):
                    raise ValueError("negative slice steps are not supported")
                repl = _step_slice_expr(base, a, b, c)
            elif ":" in content:
                a, _, b = content.partition(":")
                a, b = a.strip() or "1", b.strip()
                if _is_string_base(base):
                    # string base (literal or schema-resolved column):
                    # DuckDB slices strings with the same inclusive
                    # 1-based window → substr; a negative end counts
                    # from the last character ('abcdef'[2:-2] = 'bcde')
                    if not b:
                        repl = f"substr({base}, {a})"
                    else:
                        end = (
                            f"CASE WHEN ({b}) < 0 THEN length({base}) "
                            f"+ ({b}) + 1 ELSE ({b}) END"
                        )
                        repl = (
                            f"substr({base}, {a}, ({end}) - ({a}) + 1)"
                        )
                else:
                    length = (
                        f"size({base}) - ({a}) + 1"
                        if not b
                        else _slice_length(base, a, b)
                    )
                    repl = f"slice({base}, {a}, {length})"
            elif _is_string_base(base):
                # single-character string subscript (DuckDB: '' for [0],
                # negative wraps from the end — substr matches both)
                if content == "0":
                    repl = f"substr({base}, 2, 0)"
                else:
                    repl = f"substr({base}, {content}, 1)"
            elif _is_map_base(base):
                # DuckDB map[key] yields the LIST of matches — [] for a
                # missing key, [v] when present (even a NULL v); a NULL
                # key matches nothing
                repl = (
                    f"transform(filter(map_entries({base}), "
                    f"__dd_e -> __dd_e.key = ({content})), "
                    f"__dd_e -> __dd_e.value)"
                )
            elif content == "0":
                # DuckDB's 1-based [0] is out of range → NULL; Spark's
                # element_at treats 0 as always-invalid even in try form
                repl = f"try_element_at({base}, CAST(NULL AS INT))"
            elif re.fullmatch(r"-?\d+|\x00\d+\x00", content):
                # integer literal or masked string key: pass through
                repl = f"try_element_at({base}, {content})"
            else:
                # expression index: Spark wants INT (DuckDB computes
                # BIGINT) and a runtime 0 must read as NULL, not an error
                repl = (
                    f"try_element_at({base}, "
                    f"nullif(CAST({content} AS INT), 0))"
                )
            s = s[:base_start] + repl + s[m.end() :]
            break
        else:
            return s


def _step_slice_expr(arr: str, a: str, b: str, c: str) -> str:
    """DuckDB stepped slice: elements at positions a, a+c, … ≤ end,
    inclusive and clamped; a negative end counts from the last element.
    ``slice(arr, 1, 0)`` supplies a correctly-typed empty result when
    the window is empty (Spark's sequence errors on start > stop)."""
    lo = f"greatest(({a}), 1)"
    end = (
        f"least(CASE WHEN ({b}) < 0 THEN size({arr}) + ({b}) + 1 "
        f"ELSE ({b}) END, size({arr}))"
    )
    return (
        f"CASE WHEN {lo} <= {end} THEN "
        f"transform(sequence({lo}, {end}, ({c})), "
        f"__dd_i -> element_at({arr}, CAST(__dd_i AS INT))) "
        f"ELSE slice({arr}, 1, 0) END"
    )


_SLICE_RE = re.compile(r"\b(?:list_slice|array_slice)\s*\(", re.IGNORECASE)


def _slice_length(arr: str, a: str, b: str) -> str:
    """Length argument for Spark ``slice`` from DuckDB's (start, end):
    inclusive end, a negative end counts from the end of the list, and an
    inverted window is empty (Spark errors on a negative length)."""
    return (
        f"greatest(0, (CASE WHEN ({b}) < 0 THEN size({arr}) + ({b}) + 1 "
        f"ELSE ({b}) END) - ({a}) + 1)"
    )


def _rewrite_slice(
    s: str,
    table: list[str] | None = None,
    kinds: dict[str, str] | None = None,
) -> str:
    """``list_slice(l, a, b)`` (1-based, inclusive end) → Spark
    ``slice(l, a, length)`` (1-based start + length). A STRING first
    argument (literal or schema-resolved column) slices with substr —
    DuckDB's array_slice is polymorphic over VARCHAR."""

    def is_string(base: str) -> bool:
        t = base.strip()
        mm = re.fullmatch(r"\x00(\d+)\x00", t)
        if mm and table is not None:
            entry = table[int(mm.group(1))]
            if entry.startswith("'"):
                return True
            if kinds and entry.startswith('"'):
                return kinds.get(entry[1:-1].lower()) == "string"
            return False
        if kinds and re.fullmatch(r"[A-Za-z_][\w.]*", t):
            return kinds.get(t.split(".")[-1].lower()) == "string"
        return False

    while m := _SLICE_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) == 4:
            arr, a, b, c = args
            if re.fullmatch(r"\s*-\d+\s*", c):
                raise ValueError("negative slice steps are not supported")
            repl = _step_slice_expr(arr, a, b, c)
        elif len(args) == 3:
            arr, a, b = args
            if is_string(arr):
                end = (
                    f"(CASE WHEN ({b}) < 0 THEN length({arr}) + ({b}) + 1 "
                    f"ELSE ({b}) END)"
                )
                repl = f"substr({arr}, {a}, greatest(0, {end} - ({a}) + 1))"
            else:
                repl = f"slice({arr}, {a}, {_slice_length(arr, a, b)})"
        else:
            raise ValueError("list_slice expects 3 or 4 arguments")
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


_RANGE_TF_ALIAS_RE = re.compile(
    r"\b(range|generate_series)\s*\(", re.IGNORECASE
)
_CLAUSE_KEYWORDS = (
    "WHERE", "GROUP", "ORDER", "LIMIT", "JOIN", "ON", "LEFT", "RIGHT",
    "FULL", "CROSS", "INNER", "UNION", "HAVING", "AND", "OR", "AS",
    "QUALIFY", "WINDOW",
)


def _range_expr(args: list[str]) -> str:
    """Scalar ``range`` (end-exclusive): empty list when start >= end.
    Pure built-ins (Generate-safe, codegen) — a bare ``sequence(a, b)``
    would count DOWNWARD for an empty DuckDB range."""
    if len(args) == 1:
        a, b = "0", args[0]
    elif len(args) == 2:
        a, b = args
    else:
        a, b, step = args
        if any(re.match(r"(?i)\s*(DATE|TIMESTAMP)\b", x) for x in (a, b)):
            # temporal range is end-EXCLUSIVE; sequence is inclusive —
            # drop the endpoint when the step lands on it
            return (
                f"filter(sequence(CAST({a} AS TIMESTAMP), "
                f"CAST({b} AS TIMESTAMP), {step}), "
                f"x -> x != CAST({b} AS TIMESTAMP))"
            )
        # either step sign: ceil((b-a)/step) elements starting at a; the
        # sequence stop is pulled toward a so Spark never sees an
        # illegal-direction sequence for an empty range. Step 0 errors in
        # DuckDB; here it reads NULL.
        n = (
            f"greatest(0, CAST(ceil((CAST(({b}) AS DOUBLE) - ({a})) "
            f"/ ({step})) AS INT))"
        )
        stop = (
            f"CASE WHEN ({step}) > 0 THEN greatest(({a}), ({b}) - 1) "
            f"ELSE least(({a}), ({b}) + 1) END"
        )
        return (
            f"CASE WHEN ({step}) = 0 THEN CAST(NULL AS ARRAY<BIGINT>) "
            f"ELSE slice(sequence(({a}), {stop}, ({step})), 1, {n}) END"
        )
    return (
        f"slice(sequence(({a}), greatest(({a}) + 1, ({b})) - 1), 1, "
        f"greatest(0, ({b}) - ({a})))"
    )


def _series_expr(args: list[str]) -> str:
    """Scalar ``generate_series`` (end-inclusive): empty when start > end;
    the 3-arg (stepped / timestamp interval) form maps to ``sequence``
    directly — same inclusive semantics."""
    if len(args) == 3:
        if any(re.match(r"(?i)\s*DATE\b", a) for a in args[:2]):
            # DuckDB's date series yields TIMESTAMPs; Spark's sequence
            # over DATEs yields DATEs — lift the endpoints
            args = [
                f"CAST({a} AS TIMESTAMP)" if i < 2 else a
                for i, a in enumerate(args)
            ]
        return f"sequence({', '.join(args)})"
    if len(args) == 1:
        a, b = "0", args[0]
    else:
        a, b = args
    return (
        f"slice(sequence(({a}), greatest(({a}), ({b}))), 1, "
        f"greatest(0, ({b}) - ({a}) + 1))"
    )


def _rewrite_range(s: str) -> str:
    """DuckDB ``range`` / ``generate_series`` in both positions.

    Table function: ``FROM range(a, b) [AS] t(j)`` → a derived table
    renaming Spark's ``id`` output column; bare ``FROM range(...)``
    exposes the DuckDB default column name. A comma-joined form
    (``FROM t, range(1, 6) i``) counts as a table function when its alias
    is referenced qualified elsewhere. Scalar forms inline to guarded
    slice/sequence expressions (:func:`_range_expr` /
    :func:`_series_expr`).
    """
    out = []
    pos = 0
    for m in _RANGE_TF_ALIAS_RE.finditer(s):
        if m.start() < pos:
            continue
        fname = m.group(1).lower()
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        default_col = fname  # DuckDB names the output column after the fn
        # token before the call decides the position: FROM/JOIN/, → table
        before = s[: m.start()].rstrip()
        prev = re.search(r"(\bFROM|\bJOIN|,)\s*$", before, re.IGNORECASE)
        prev_kw = prev.group(0).strip().upper() if prev else ""
        after = s[close + 1 :]
        am = re.match(
            r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s*\(\s*([A-Za-z_]\w*)\s*\)", after
        )
        bm = re.match(r"\s*(?:AS\s+)?([A-Za-z_]\w*)", after)
        bare_alias = (
            bm.group(1)
            if bm and bm.group(1).upper() not in _CLAUSE_KEYWORDS
            else None
        )
        temporal = any(
            re.match(r"(?i)\s*(DATE|TIMESTAMP)\b", a) for a in args[:2]
        )
        if fname == "range" and temporal and len(args) == 3:
            # DuckDB's temporal range is end-EXCLUSIVE; Spark sequence is
            # inclusive — drop the endpoint if the step lands on it
            # (direction-agnostic: intermediates can never equal the end)
            a0, a1, stp = args
            seq = (
                f"filter(sequence(CAST({a0} AS TIMESTAMP), "
                f"CAST({a1} AS TIMESTAMP), {stp}), "
                f"x -> x != CAST({a1} AS TIMESTAMP))"
            )
            inner = f"(SELECT explode({seq}) AS id)"
        elif fname == "range":
            inner = f"range({', '.join(args)})"
        else:
            inner = f"(SELECT explode({_series_expr(args)}) AS id)"
        if am and prev:
            repl = f"(SELECT id AS {am.group(2)} FROM {inner}) {am.group(1)}"
            out.append(s[pos : m.start()] + repl)
            pos = close + 1 + am.end()
        elif prev_kw in ("FROM", "JOIN") or (
            prev_kw == ","
            and bare_alias
            and re.search(rf"\b{bare_alias}\s*\.", s)
        ):
            repl = (
                f"(SELECT id AS {default_col} FROM {inner}) "
                f"{bare_alias if bare_alias else default_col}"
            )
            out.append(s[pos : m.start()] + repl)
            pos = close + 1 + (bm.end() if bare_alias else 0)
        else:
            # scalar list form
            if fname == "range":
                repl = _range_expr(args)
            else:
                repl = _series_expr(args)
            out.append(s[pos : m.start()] + repl)
            pos = close + 1
    out.append(s[pos:])
    return "".join(out)


# DuckDB ``len`` is polymorphic (string length / list length); Spark
# splits it into ``length`` (string) and ``size`` (array). No textual
# rewrite can type the argument, so dispatch on structure: a known
# list-producing head function → size; a known string head → length; a
# bare name that is a lambda binder in this statement → length (the
# element of a word list); a handful of conventional array column names →
# size; default → length (DuckDB documents len as the string function,
# list len is the overload).
_LEN_RE = re.compile(r"\blen\s*\(", re.IGNORECASE)
_LEN_ARRAY_HEADS = {
    "string_split", "str_split", "string_split_regex", "str_split_regex",
    "regexp_split_to_array", "string_to_array", "split", "sequence",
    "range", "generate_series", "array", "list_value", "list_filter",
    "list_transform", "list_distinct", "list_intersect", "list_concat",
    "list_cat", "list_sort", "list_reverse_sort", "list_slice",
    "array_slice", "slice", "list_zip", "dd_list_zip", "dd_range",
    "dd_generate_series", "regexp_extract_all", "map_keys", "map_values",
    "flatten", "array_distinct", "array_intersect", "filter", "transform",
    "collect_list", "array_agg", "zip_with", "list",
}
_LEN_STRING_HEADS = {
    "regexp_replace", "trim", "ltrim", "rtrim", "lower", "upper", "substr",
    "substring", "replace", "translate", "repeat", "concat_ws", "md5",
    "left", "right", "format", "printf", "strip_accents",
}
_LEN_ARRAY_NAMES = {"w", "words", "embedding", "tokens", "toks", "shingles"}


def _column_kinds(spark, masked: str) -> dict[str, str]:
    """Column name (lowercased) → kind ('array' / 'string' / 'other'),
    resolved from the session catalog schema of every relation referenced
    at a FROM/JOIN position in the (masked) statement. Names whose kind
    conflicts across the referenced tables are dropped (the heuristic
    takes over). This is what makes ``len()`` dispatch and string
    subscripting schema-aware instead of guessing from names."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        MapType,
        ShortType,
        StringType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    kinds: dict[str, str] = {}
    conflicted: set[str] = set()
    for m in re.finditer(
        r"\b(?:FROM|JOIN)\s+([A-Za-z_][\w.]*)", masked, re.IGNORECASE
    ):
        ref = m.group(1)
        if ref.upper() in ("LATERAL", "VALUES", "UNNEST", "SELECT"):
            continue
        try:
            schema = spark.table(ref).schema
        except Exception:
            continue  # subquery alias / CTE name / missing — heuristic
        for f in schema.fields:
            nm = f.name.lower()
            if isinstance(f.dataType, ArrayType):
                k = "array"
            elif isinstance(f.dataType, MapType):
                k = "map"
            elif isinstance(f.dataType, StringType):
                k = "string"
            elif isinstance(f.dataType, DateType):
                k = "date"
            elif isinstance(f.dataType, (TimestampType, TimestampNTZType)):
                k = "timestamp"
            elif isinstance(f.dataType, BinaryType):
                k = "binary"
            elif isinstance(f.dataType, (DoubleType, FloatType)):
                k = "double"
            elif isinstance(f.dataType, DecimalType):
                k = "decimal"
            elif isinstance(f.dataType, LongType):
                k = "bigint"
            elif isinstance(f.dataType, IntegerType):
                k = "int"
            elif isinstance(f.dataType, ShortType):
                k = "smallint"
            elif isinstance(f.dataType, ByteType):
                k = "tinyint"
            elif isinstance(f.dataType, BooleanType):
                k = "boolean"
            elif isinstance(f.dataType, StructType):
                # field names ride along for the nested-comparison
                # rewrite (kind prefix-matched via startswith)
                k = "struct:" + ",".join(
                    sf.name for sf in f.dataType.fields
                )
            else:
                k = "other"
            if nm in kinds and kinds[nm] != k:
                conflicted.add(nm)
            kinds[nm] = k
    for nm in conflicted:
        kinds.pop(nm, None)
    return kinds


def _rewrite_len(s: str, kinds: dict[str, bool] | None = None) -> str:
    binders = {
        b.group(1).lower() for b in re.finditer(r"([A-Za-z_]\w*)\s*->", s)
    }
    while m := _LEN_RE.search(s):
        close = _matching_paren(s, m.end() - 1)
        arg = s[m.end() : close].strip()
        fn = "length"
        head = re.match(r"([A-Za-z_]\w*)\s*\(", arg)
        if head and head.group(1).lower() in _LEN_ARRAY_HEADS:
            fn = "size"
        elif head and head.group(1).lower() in _LEN_STRING_HEADS:
            fn = "length"
        elif head and head.group(1).lower() == "cast" and re.search(
            r"(?i)AS\s+[A-Za-z]+\s*\[\s*\d*\s*\]\s*\)\s*$"
            r"|ARRAY\s*<", arg
        ):
            fn = "size"  # cast to a list type
        elif re.search(r"\[[^\]]*:[^\]]*\]\s*$", arg):
            fn = "size"  # slice result is a list
        elif re.fullmatch(r"[A-Za-z_][\w.]*", arg):
            name = arg.split(".")[-1].lower()
            if name in binders:
                fn = "length"
            elif kinds is not None and name in kinds:
                fn = "size" if kinds[name] == "array" else "length"
            elif name in _LEN_ARRAY_NAMES:
                fn = "size"
        s = s[: m.start()] + fn + "(" + s[m.end() :]
    return s


# DuckDB casts hex strings to integers (``CAST('0x' || substr(md5(t), 1,
# 8) AS BIGINT)`` is its idiomatic text→int hash); Spark needs conv().
_HEX_CAST_RE = re.compile(
    r"CAST\s*\(\s*\(\s*(\x00\d+\x00)\s*\|\|", re.IGNORECASE
)
# the paren-less spelling: CAST('0x' || expr AS BIGINT)
_HEX_CAST_BARE_RE = re.compile(
    r"CAST\s*\(\s*(\x00\d+\x00)\s*\|\|", re.IGNORECASE
)


def _top_level_as(s: str, start: int, end: int) -> int | None:
    """Index of the first depth-0 ``AS`` keyword in s[start:end]."""
    depth = 0
    i = start
    while i < end:
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i : i + 2].upper() == "AS":
            before = s[i - 1] if i else " "
            after = s[i + 2] if i + 2 < len(s) else " "
            if not (before.isalnum() or before in "_\x00") and not (
                after.isalnum() or after in "_\x00"
            ):
                return i
        i += 1
    return None


def _rewrite_hex_cast(s: str, table: list[str]) -> str:
    pos = 0
    while m := _HEX_CAST_RE.search(s, pos):
        if _literal_value(_unmask(m.group(1), table)) != "0x":
            pos = m.end()
            continue
        cast_open = s.index("(", m.start())
        cast_close = _matching_paren(s, cast_open)
        inner_open = s.index("(", cast_open + 1)
        inner_close = _matching_paren(s, inner_open)
        expr = s[m.end() : inner_close].strip()
        as_m = re.match(
            r"\s*AS\s+(BIGINT|HUGEINT|INTEGER|INT|UBIGINT)\s*\)",
            s[inner_close + 1 : cast_close + 1],
            re.IGNORECASE,
        )
        if not as_m:
            pos = m.end()
            continue
        s = (
            s[: m.start()]
            + f"CAST(conv({expr}, 16, 10) AS BIGINT)"
            + s[cast_close + 1 :]
        )
    pos = 0
    while m := _HEX_CAST_BARE_RE.search(s, pos):
        if _literal_value(_unmask(m.group(1), table)) != "0x":
            pos = m.end()
            continue
        cast_open = s.index("(", m.start())
        cast_close = _matching_paren(s, cast_open)
        as_at = _top_level_as(s, m.end(), cast_close)
        if as_at is None or not re.match(
            r"AS\s+(BIGINT|HUGEINT|INTEGER|INT|UBIGINT)\s*$",
            s[as_at : cast_close].strip(),
            re.IGNORECASE,
        ):
            pos = m.end()
            continue
        expr = s[m.end() : as_at].strip()
        s = (
            s[: m.start()]
            + f"CAST(conv({expr}, 16, 10) AS BIGINT)"
            + s[cast_close + 1 :]
        )
    return s


# Spark regexp_extract_all defaults to group 1 and rejects group-less
# patterns; DuckDB defaults to group 0 (the full match).
_REGEXP_EXTRACT_ALL_RE = re.compile(r"\bregexp_extract_all\s*\(", re.IGNORECASE)


def _rewrite_regexp_extract_all(s: str) -> str:
    pos = 0
    while m := _REGEXP_EXTRACT_ALL_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) == 2:
            s = s[:close] + ", 0" + s[close:]
        pos = close + 1
    return s


# Window frame EXCLUDE clauses (CURRENT ROW / TIES / GROUP / NO OTHERS)
# have no Spark parser support. For SUM/COUNT the exclusion is algebraic
# — subtract the excluded rows' contribution from the plain-frame
# aggregate — which is exactly the DataFrame spelling catalog/windows.py
# uses for the declared w07b. The peers ("ties") sum is a second window
# partitioned by (partition keys, order-by values).
_EXCLUDE_FRAME_RE = re.compile(
    r"\bEXCLUDE\s+(CURRENT\s+ROW|TIES|GROUP|NO\s+OTHERS)", re.IGNORECASE
)


def _window_spec_parts(spec: str) -> tuple[str, str]:
    """(partition keys, order-by value exprs) from a window spec."""
    pm = re.search(r"\bPARTITION\s+BY\s+(.*?)(?=\bORDER\b|\bROWS\b|\bRANGE\b|\bGROUPS\b|$)",
                   spec, re.IGNORECASE | re.DOTALL)
    om = re.search(r"\bORDER\s+BY\s+(.*?)(?=\bROWS\b|\bRANGE\b|\bGROUPS\b|$)",
                   spec, re.IGNORECASE | re.DOTALL)
    parts = pm.group(1).strip().rstrip(",") if pm else ""
    orders = ""
    if om:
        keys = []
        for item in _split_top_commas(om.group(1)):
            keys.append(re.sub(
                r"\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$", "", item,
                flags=re.IGNORECASE,
            ))
        orders = ", ".join(keys)
    return parts, orders


def _rewrite_exclude_frames(s: str) -> str:
    while m := _EXCLUDE_FRAME_RE.search(s):
        kind = re.sub(r"\s+", " ", m.group(1).upper())
        depth = 0
        over_open = None
        for i in range(m.start() - 1, -1, -1):
            c = s[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    over_open = i
                    break
                depth -= 1
        if over_open is None or not re.search(
            r"\bOVER\s*$", s[:over_open], re.IGNORECASE
        ):
            raise ValueError("EXCLUDE frame clause outside a window spec")
        over_close = _matching_paren(s, over_open)
        spec = (s[over_open + 1 : m.start()] + s[m.end() : over_close]).strip()
        if kind == "NO OTHERS":  # the default — just drop the clause
            s = s[:over_open] + "(" + spec + ")" + s[over_close + 1 :]
            continue
        # the aggregate call preceding OVER
        over_kw = re.search(r"\bOVER\s*$", s[:over_open], re.IGNORECASE)
        agg_close = s[: over_kw.start()].rstrip()
        agg_close_idx = len(agg_close) - 1
        if agg_close[agg_close_idx] != ")":
            raise ValueError("EXCLUDE: cannot locate the aggregate call")
        depth = 0
        agg_open = None
        for i in range(agg_close_idx, -1, -1):
            c = agg_close[i]
            if c == ")":
                depth += 1
            elif c == "(":
                depth -= 1
                if depth == 0:
                    agg_open = i
                    break
        fm = re.search(r"([A-Za-z_]\w*)\s*$", agg_close[:agg_open])
        fn = fm.group(1).lower()
        fn_start = fm.start(1)
        arg = agg_close[agg_open + 1 : agg_close_idx].strip()
        if fn not in ("sum", "count"):
            raise ValueError(f"EXCLUDE {kind}: only sum/count supported")
        # soundness guards: subtracting the current row (or its peers)
        # from the frame total is only valid when they are IN the frame.
        frame_m = re.search(
            r"\b(ROWS|RANGE|GROUPS)\s+(BETWEEN\s+)?(.*)$", spec,
            re.IGNORECASE | re.DOTALL,
        )
        frame_body = frame_m.group(3).upper() if frame_m else ""
        if frame_m and (
            re.search(r"\bBETWEEN\s+\S+.*PRECEDING\s+AND\s+\S+\s+PRECEDING",
                      "BETWEEN " + frame_body)
            or re.search(r"^\S+\s+FOLLOWING\s+AND", frame_body)
            or frame_body.startswith("CURRENT ROW AND")
            and "PRECEDING" in frame_body
        ):
            raise ValueError(
                f"EXCLUDE {kind}: frame does not contain the current row"
            )
        frame_kind = frame_m.group(1).upper() if frame_m else "RANGE"
        if kind in ("TIES", "GROUP") and frame_kind == "ROWS":
            # a ROWS frame can cut through the peer group; the partition-
            # wide peers window would over-subtract
            raise ValueError(
                f"EXCLUDE {kind} over a ROWS frame is not supported "
                "(peers may lie outside the frame)"
            )
        # Exact NULL bookkeeping: COUNT subtracts excluded NON-NULL
        # arguments (count(*) subtracts rows) and is never NULL; SUM is
        # NULL exactly when zero non-null arguments remain after the
        # exclusion, else frame-total minus the excluded contributions.
        parts, orders = _window_spec_parts(spec)
        peer_keys = ", ".join(k for k in (parts, orders) if k)
        star = arg in ("*", "1", "")
        argc = "1" if star else arg
        cnt = f"count({argc}) OVER ({spec})"
        pcnt = f"count({argc}) OVER (PARTITION BY {peer_keys})"
        curc = (
            "1" if star else f"(CASE WHEN ({arg}) IS NULL THEN 0 ELSE 1 END)"
        )
        if fn == "count":
            if kind == "CURRENT ROW":
                repl = f"({cnt} - {curc})"
            elif kind == "TIES":
                repl = f"({cnt} - {pcnt} + {curc})"
            else:  # GROUP
                repl = f"({cnt} - {pcnt})"
        else:  # sum
            cur_val = f"coalesce(({arg}), 0)"
            base = f"coalesce(sum({arg}) OVER ({spec}), 0)"
            psum = f"coalesce(sum({arg}) OVER (PARTITION BY {peer_keys}), 0)"
            if kind == "CURRENT ROW":
                remaining = f"{cnt} - {curc}"
                expr = f"{base} - {cur_val}"
            elif kind == "TIES":
                remaining = f"{cnt} - {pcnt} + {curc}"
                expr = f"{base} - {psum} + {cur_val}"
            else:  # GROUP
                remaining = f"{cnt} - {pcnt}"
                expr = f"{base} - {psum}"
            repl = f"(CASE WHEN {remaining} > 0 THEN {expr} ELSE NULL END)"
        s = s[:fn_start] + repl + s[over_close + 1 :]
    return s


# DuckDB 2-arg trim functions are (string, chars); Spark's are
# (chars, string) — swap.
_TRIM_SWAP_RE = re.compile(r"\b([lr]?trim)\s*\(", re.IGNORECASE)


_XOR_RE = re.compile(r"\bxor\s*\(", re.IGNORECASE)


def _rewrite_xor(s: str) -> str:
    """``xor(a, b)`` → the ``^`` operator, inlined (a SQL UDF would be
    rejected inside Generate/explode)."""
    while m := _XOR_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) != 2:
            raise ValueError("xor expects 2 arguments")
        repl = (
            f"(CAST({args[0]} AS BIGINT) ^ CAST({args[1]} AS BIGINT))"
        )
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


def _rewrite_trim_swap(s: str) -> str:
    pos = 0
    while m := _TRIM_SWAP_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) == 2:
            repl = f"{m.group(1)}({args[1]}, {args[0]})"
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len(repl)
        else:
            pos = close + 1
    return s


# strftime(ts, '%Y-%m-%d') → date_format with the pattern translated
# from C tokens to java.time tokens.
_STRFTIME_RE = re.compile(r"\bstrftime\s*\(", re.IGNORECASE)
_STRFTIME_TOKENS = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%j": "DDD", "%a": "EEE",
    "%A": "EEEE", "%b": "MMM", "%B": "MMMM", "%p": "a", "%%": "%",
    "%f": "SSSSSS", "%g": "SSS",
    # locale date/time: DuckDB pins the ISO renderings (probed live)
    "%x": "yyyy-MM-dd", "%X": "HH:mm:ss", "%c": "yyyy-MM-dd HH:mm:ss",
}
# no-pad (dash) variants — single-letter java.time patterns
_STRFTIME_TOKENS3 = {
    "%-d": "d", "%-m": "M", "%-H": "H", "%-I": "h", "%-M": "m",
    "%-S": "s", "%-j": "D",
}


def _strftime_to_java(fmt: str) -> str:
    out: list[str] = []
    lit: list[str] = []  # pending literal-letter run

    def flush() -> None:
        if lit:
            # ONE quoted run — adjacent single-char quotes ('y''e') read
            # as escaped quote characters in java.time patterns
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    i = 0
    while i < len(fmt):
        tok3 = fmt[i : i + 3]
        tok = fmt[i : i + 2]
        if tok3 in _STRFTIME_TOKENS3:
            flush()
            out.append(_STRFTIME_TOKENS3[tok3])
            i += 3
        elif tok in _STRFTIME_TOKENS:
            flush()
            out.append(_STRFTIME_TOKENS[tok])
            i += 2
        elif fmt[i] == "%":
            raise ValueError(f"strftime: unsupported token {tok!r}")
        elif fmt[i].isalpha() or fmt[i] == "'":
            lit.append(fmt[i])
            i += 1
        else:
            flush()
            out.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


# week-number tokens have no legal java.time pattern in Spark 3+ (week
# fields throw); they splice as expression segments instead. Formulas
# follow python/DuckDB strftime: %U Sunday-based week 00.., %W Monday-
# based, %V ISO week, %G ISO year.
_STRFTIME_WEEK_EXPRS = {
    "%U": (
        "lpad(CAST(CAST(floor((dayofyear({x}) + 6 - (dayofweek({x}) - 1))"
        " / 7) AS INT) AS STRING), 2, '0')"
    ),
    "%W": (
        "lpad(CAST(CAST(floor((dayofyear({x}) + 6 - pmod(dayofweek({x})"
        " + 5, 7)) / 7) AS INT) AS STRING), 2, '0')"
    ),
    "%V": "lpad(CAST(weekofyear({x}) AS STRING), 2, '0')",
    "%G": "CAST(extract(YEAROFWEEK FROM {x}) AS STRING)",
    # %w Sunday=0..Saturday=6; %u ISO Monday=1..Sunday=7 (probed live)
    "%w": "CAST(dayofweek({x}) - 1 AS STRING)",
    "%u": "CAST(extract(DAYOFWEEK_ISO FROM {x}) AS STRING)",
    # %n nanoseconds: micros zero-extended (DuckDB stores microseconds)
    "%n": "concat(date_format({x}, 'SSSSSS'), '000')",
}
_STRFTIME_WEEK_RE = re.compile("(" + "|".join(_STRFTIME_WEEK_EXPRS) + ")")


def _strftime_concat(fmt: str, ts: str, table: list[str]) -> str:
    """A format containing week tokens -> concat() of date_format runs
    and week-number expressions."""
    parts = []
    for piece in _STRFTIME_WEEK_RE.split(fmt):
        if not piece:
            continue
        if piece in _STRFTIME_WEEK_EXPRS:
            parts.append(_STRFTIME_WEEK_EXPRS[piece].format(x=ts))
        else:
            table.append(
                "'" + _strftime_to_java(piece).replace("'", "''") + "'"
            )
            parts.append(
                f"date_format({ts}, {_PLACEHOLDER.format(len(table) - 1)})"
            )
    return "concat(" + ", ".join(parts) + ")"


def _rewrite_strftime(s: str, table: list[str]) -> str:
    while m := _STRFTIME_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) != 2:
            raise ValueError("strftime expects (ts, format)")
        ph = _PLACEHOLDER_RE.fullmatch(args[1].strip())
        fmt = _literal_value(table[int(ph.group(1))]) if ph else None
        if fmt is None:
            raise ValueError("strftime needs a literal format")
        if _STRFTIME_WEEK_RE.search(fmt):
            repl = _strftime_concat(fmt, args[0], table)
        else:
            table.append(
                "'" + _strftime_to_java(fmt).replace("'", "''") + "'"
            )
            jph = _PLACEHOLDER.format(len(table) - 1)
            repl = f"date_format({args[0]}, {jph})"
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


# date_diff('day', a, b) — DuckDB quotes the unit, Spark wants a bare
# keyword in the same position. date_part is NOT rewritten: Spark's
# date_part takes the field as a string literal, so DuckDB's spelling
# already works.
_DATEDIFF_RE = re.compile(r"\b(date_?diff)\s*\(", re.IGNORECASE)


# DuckDB date_diff counts BOUNDARY CROSSINGS of the unit, not complete
# units elapsed (date_diff('month', Jan-31, Feb-01) = 1; the elapsed
# variant is date_sub, which _template maps to timestampdiff). Spark's
# date_diff/timestampdiff are elapsed-units, so each unit needs its own
# truncate-and-subtract expression — otherwise month/hour diffs near a
# boundary silently disagree by one.
_DD_UNIT_CANON = {
    "year": "year", "years": "year", "y": "year", "yr": "year", "yrs": "year",
    "quarter": "quarter", "quarters": "quarter",
    "month": "month", "months": "month", "mon": "month", "mons": "month",
    "week": "week", "weeks": "week",
    "day": "day", "days": "day", "d": "day", "dayofmonth": "day",
    "hour": "hour", "hours": "hour", "h": "hour", "hr": "hour", "hrs": "hour",
    "minute": "minute", "minutes": "minute", "min": "minute", "mins": "minute",
    "second": "second", "seconds": "second", "s": "second", "sec": "second",
    "secs": "second",
    "millisecond": "millisecond", "milliseconds": "millisecond",
    "ms": "millisecond", "msec": "millisecond",
    "microsecond": "microsecond", "microseconds": "microsecond",
    "us": "microsecond",
    "decade": "decade", "decades": "decade",
    "century": "century", "centuries": "century",
    "millennium": "millennium", "millennia": "millennium",
}
_DD_TIME_MICROS = {
    "hour": 3_600_000_000,
    "minute": 60_000_000,
    "second": 1_000_000,
    "millisecond": 1_000,
    "microsecond": 1,
}


def _date_diff_boundary(unit: str, a: str, b: str) -> str | None:
    u = _DD_UNIT_CANON.get(unit.lower())
    if u is None:
        return None
    if u == "year":
        return f"CAST(year({b}) - year({a}) AS BIGINT)"
    if u == "quarter":
        return (
            f"CAST((year({b}) - year({a})) * 4 "
            f"+ (quarter({b}) - quarter({a})) AS BIGINT)"
        )
    if u == "month":
        return (
            f"CAST((year({b}) - year({a})) * 12 "
            f"+ (month({b}) - month({a})) AS BIGINT)"
        )
    if u == "week":
        # both engines truncate weeks to Monday
        return (
            f"CAST(datediff(date_trunc('WEEK', {b}), "
            f"date_trunc('WEEK', {a})) DIV 7 AS BIGINT)"
        )
    if u == "day":
        return f"CAST(datediff(CAST({b} AS DATE), CAST({a} AS DATE)) AS BIGINT)"
    if u in _DD_TIME_MICROS:
        unit_us = _DD_TIME_MICROS[u]
        tr = u.upper()
        return (
            f"CAST((unix_micros(CAST(date_trunc('{tr}', {b}) AS TIMESTAMP)) "
            f"- unix_micros(CAST(date_trunc('{tr}', {a}) AS TIMESTAMP))) "
            f"DIV {unit_us} AS BIGINT)"
        )
    if u == "decade":
        return f"CAST(FLOOR(year({b}) / 10) - FLOOR(year({a}) / 10) AS BIGINT)"
    # DuckDB's date_diff buckets centuries/millennia at year/100 and
    # year/1000 (1999→2000 crosses, 2000→2001 does not) — NOT the
    # extract('century') proper-century convention; probed on live 1.0
    if u == "century":
        return (
            f"CAST(FLOOR(year({b}) / 100) "
            f"- FLOOR(year({a}) / 100) AS BIGINT)"
        )
    if u == "millennium":
        return (
            f"CAST(FLOOR(year({b}) / 1000) "
            f"- FLOOR(year({a}) / 1000) AS BIGINT)"
        )
    return None


def _rewrite_datediff_units(s: str, table: list[str]) -> str:
    pos = 0
    while m := _DATEDIFF_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        ph = _PLACEHOLDER_RE.fullmatch(args[0].strip()) if args else None
        unit = _literal_value(table[int(ph.group(1))]) if ph else None
        repl = (
            _date_diff_boundary(unit, args[1], args[2])
            if unit is not None and len(args) == 3
            else None
        )
        if repl is not None:
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len(repl)
        else:
            pos = close + 1
    return s


# struct_pack(k := v, …) → named_struct('k', v, …); map([ks], [vs]) →
# map_from_arrays; map_extract keeps DuckDB's list-of-matches shape so a
# trailing [1] subscript still picks the value.
_STRUCT_PACK_RE = re.compile(r"\bstruct_pack\s*\(", re.IGNORECASE)
_MAP_FN_RE = re.compile(r"\bmap\s*\(", re.IGNORECASE)
_MAP_EXTRACT_RE = re.compile(r"\bmap_extract\s*\(", re.IGNORECASE)


def _rewrite_struct_map(s: str, table: list[str]) -> str:
    while m := _STRUCT_PACK_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        parts = []
        for item in _split_top_commas(s[open_idx + 1 : close]):
            km = re.match(r"^([A-Za-z_]\w*)\s*:=\s*(.+)$", item, re.DOTALL)
            if not km:
                raise ValueError("struct_pack expects name := value pairs")
            table.append("'" + km.group(1) + "'")
            parts.append(_PLACEHOLDER.format(len(table) - 1))
            parts.append(km.group(2).strip())
        s = s[: m.start()] + f"named_struct({', '.join(parts)})" + s[close + 1 :]
    while m := _MAP_EXTRACT_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) != 2:
            raise ValueError("map_extract expects (map, key)")
        # DuckDB's list-of-matches shape: [] for a missing key (NOT
        # [NULL]), [v] when present — entries-filter preserves both
        repl = (
            f"transform(filter(map_entries({args[0]}), "
            f"__dd_e -> __dd_e.key = ({args[1]})), "
            f"__dd_e -> __dd_e.value)"
        )
        s = s[: m.start()] + repl + s[close + 1 :]
    pos = 0
    while m := _MAP_FN_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        # DuckDB's map() function only takes two LIST arguments; a
        # scalar 2-arg map(k, v) can only come from our own single-entry
        # MAP {k: v} literal rewrite — leave that as Spark's variadic map
        if len(args) == 2 and not re.match(
            r"(?i)^\s*(\x00\d+\x00|-?\d)", args[0]
        ):
            repl = f"map_from_arrays({args[0]}, {args[1]})"
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len(repl)
        else:
            pos = close + 1
    return s


# Ordered aggregates: DuckDB allows ORDER BY inside any aggregate.
# ``list(v ORDER BY k)`` → sort collect_list(struct(k, v)) and project —
# deterministic, still one hash aggregate. ``string_agg(x, d ORDER BY k)``
# → Spark 4's listagg WITHIN GROUP.
_ORDERED_AGG_RE = re.compile(
    r"\b(list|array_agg|collect_list|string_agg|group_concat|"
    r"any_value|arbitrary|first|last|sum|avg|min|max|count|"
    r"bool_and|bool_or)\s*\(",
    re.IGNORECASE,
)


def _parse_order_keys(order_part: str) -> list[tuple[str, bool, bool]]:
    """ORDER BY item list → [(expr, desc, nulls_last)]. DuckDB's default
    null order is NULLS LAST for both directions (default_null_order)."""
    keys = []
    for item in _split_top_commas(order_part):
        nl = True
        nm = re.search(r"\s+NULLS\s+(FIRST|LAST)\s*$", item, re.IGNORECASE)
        if nm:
            nl = nm.group(1).upper() == "LAST"
            item = item[: nm.start()]
        desc = False
        dm = re.search(r"\s+(ASC|DESC)\s*$", item, re.IGNORECASE)
        if dm:
            desc = dm.group(1).upper() == "DESC"
            item = item[: dm.start()]
        keys.append((item.strip(), desc, nl))
    return keys


def _order_comparator(keys: list[tuple[str, bool, bool]]) -> str:
    """A (l, r) -> int lambda implementing the full multi-key ordering —
    per-key direction and null placement made explicit (Spark's plain
    array_sort could honor neither)."""
    expr = "0"
    for i, (_, desc, nulls_last) in reversed(list(enumerate(keys))):
        f = f"_o{i}"
        lt, gt = ("1", "-1") if desc else ("-1", "1")
        null_l, null_r = ("1", "-1") if nulls_last else ("-1", "1")
        expr = (
            f"CASE WHEN l.{f} IS NULL AND r.{f} IS NULL THEN {expr} "
            f"WHEN l.{f} IS NULL THEN {null_l} "
            f"WHEN r.{f} IS NULL THEN {null_r} "
            f"WHEN l.{f} < r.{f} THEN {lt} "
            f"WHEN l.{f} > r.{f} THEN {gt} ELSE {expr} END"
        )
    return f"(l, r) -> {expr}"


_FILTER_SHORT_RE = re.compile(r"\)\s*FILTER\s*\(", re.IGNORECASE)


def _rewrite_filter_shorthand(s: str) -> str:
    """DuckDB allows ``agg(x) FILTER (cond)`` without the WHERE keyword;
    Spark requires ``FILTER (WHERE cond)``. The leading ``)`` anchors to
    aggregate position, so the list higher-order ``filter(...)`` function
    is never touched."""
    pos = 0
    while m := _FILTER_SHORT_RE.search(s, pos):
        if re.match(r"\s*WHERE\b", s[m.end() :], re.IGNORECASE):
            pos = m.end()
            continue
        s = s[: m.end()] + "WHERE " + s[m.end() :]
        pos = m.end() + len("WHERE ")
    return s


_WIN_DISTINCT_RE = re.compile(
    r"\b(count|sum|avg)\s*\(\s*DISTINCT\b", re.IGNORECASE
)


def _rewrite_windowed_distinct(s: str) -> str:
    """``count/sum/avg(DISTINCT e) OVER (…)`` — Spark rejects DISTINCT
    window functions outright; the frame's distinct multiset is
    ``array_distinct(collect_list(e) OVER (…))``, and the aggregate
    folds over that list (zero-of-type init keeps integer sums integer).
    Non-window DISTINCT aggregates are untouched (Spark-native)."""
    pos = 0
    while m := _WIN_DISTINCT_RE.search(s, pos):
        fn = m.group(1).lower()
        open_idx = s.index("(", m.start())
        close = _matching_paren(s, open_idx)
        om = re.match(r"\s*OVER\s*\(", s[close + 1 :], re.IGNORECASE)
        if not om:
            pos = close + 1
            continue
        over_open = close + 1 + om.end() - 1
        over_close = _matching_paren(s, over_open)
        e = re.sub(
            r"(?i)^\s*DISTINCT\s+", "", s[open_idx + 1 : close], count=1
        )
        over = s[close + 1 : over_close + 1]
        dl = f"array_distinct(collect_list({e}){over})"
        if fn == "count":
            repl = f"size({dl})"
        else:
            total = (
                f"aggregate({dl}, "
                f"(try_element_at({dl}, 1) - try_element_at({dl}, 1)), "
                f"(__dd_a, __dd_e) -> __dd_a + __dd_e)"
            )
            repl = (
                total
                if fn == "sum"
                else f"(CAST({total} AS DOUBLE) / nullif(size({dl}), 0))"
            )
        s = s[: m.start()] + repl + s[over_close + 1 :]
        pos = m.start() + len(repl)
    return s


_MEDIAN_RE = re.compile(r"\bmedian\s*\(", re.IGNORECASE)


def _rewrite_median(s: str, kinds: dict[str, str] | None) -> str:
    """DuckDB's median() also accepts temporal and string columns —
    temporal medians interpolate (two dates average to a 12:00
    TIMESTAMP), string medians take the lower-middle element
    (quantile_disc). Numeric medians are Spark-native (same interpolated
    value). Fires only when the column kind is catalog-resolved."""
    pos = 0
    while m := _MEDIAN_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        arg = s[open_idx + 1 : close].strip()
        kind = None
        if re.match(r"(?i)^(DATE|TIMESTAMP)\s", arg):
            kind = "timestamp"
        elif kinds and re.fullmatch(r"[A-Za-z_][\w.]*", arg):
            kind = kinds.get(arg.split(".")[-1].lower())
        if re.match(r"\s*OVER\b", s[close + 1 :], re.IGNORECASE):
            if kind in ("date", "timestamp", "string"):
                raise ValueError(
                    "windowed median is supported for numeric columns only"
                )
            # Spark's median rejects window frames; exact percentile
            # computes the identical interpolated value and accepts them
            repl = f"percentile({arg}, 0.5)"
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len(repl)
            continue
        if kind in ("date", "timestamp"):
            repl = (
                f"timestamp_micros(CAST(percentile(unix_micros("
                f"CAST({arg} AS TIMESTAMP)), 0.5) AS BIGINT))"
            )
        elif kind == "string":
            # lower-middle of the sorted values; collect is bounded by
            # the group itself (an exact string median is a
            # full-materialization op in any engine)
            repl = (
                f"element_at(array_sort(collect_list({arg})), "
                f"CAST(ceil(count({arg}) / 2.0) AS INT))"
            )
        else:
            pos = close + 1
            continue
        s = s[: m.start()] + repl + s[close + 1 :]
        pos = m.start() + len(repl)
    return s


def _rewrite_ordered_aggs(s: str) -> str:
    pos = 0
    while m := _ORDERED_AGG_RE.search(s, pos):
        fn = m.group(1).lower()
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        inner = s[open_idx + 1 : close]
        if fn in ("any_value", "arbitrary", "first", "last") and re.match(
            r"\s*OVER\b", s[close + 1 :], re.IGNORECASE
        ):
            pos = close + 1  # window form — Spark-native first/last
            continue
        ob_idx, _ = _find_top_keyword(inner, ("ORDER",))
        if ob_idx < 0:
            if fn == "arbitrary":
                # DuckDB's arbitrary() is Spark's any_value()
                s = s[: m.start()] + "any_value(" + inner + s[close:]
                pos = m.start() + len("any_value(") + len(inner) + 1
                continue
            if fn in ("list", "array_agg") and "DISTINCT" not in inner.upper():
                # DuckDB's list()/array_agg() KEEP null elements; Spark's
                # collect_list drops them. Wrapping in a struct preserves
                # them (a struct with a null field is itself non-null).
                repl = (
                    f"transform(collect_list(struct({inner.strip()} AS _v)),"
                    f" x -> x._v)"
                )
                s = s[: m.start()] + repl + s[close + 1 :]
                pos = m.start() + len(repl)
                continue
            pos = close + 1
            continue
        expr_part = inner[:ob_idx].rstrip()
        if fn in ("min", "max", "count", "bool_and", "bool_or"):
            # order-INSENSITIVE aggregates: DuckDB accepts the ORDER BY
            # clause and ignores it — strip it (battery 35)
            repl = f"{fn}({expr_part})"
            s = s[: m.start()] + repl + s[close + 1 :]
            pos = m.start() + len(repl)
            continue
        order_part = re.sub(
            r"^ORDER\s+BY\s+", "", inner[ob_idx:], flags=re.IGNORECASE
        ).strip()
        keys = _parse_order_keys(order_part)
        if fn in ("string_agg", "group_concat"):
            args = _split_top_commas(expr_part)
            delim = args[1] if len(args) > 1 else "','"
            # Spark's ASC default is NULLS FIRST; DuckDB's is NULLS LAST
            # — spell the null placement explicitly
            order_sql = ", ".join(
                f"{k} {'DESC' if d else 'ASC'} NULLS {'LAST' if nl else 'FIRST'}"
                for k, d, nl in keys
            )
            repl = (
                f"listagg({args[0]}, {delim}) WITHIN GROUP "
                f"(ORDER BY {order_sql})"
            )
        elif (
            fn in ("list", "array_agg", "collect_list")
            and (dm := re.match(r"DISTINCT\s+(.*)$", expr_part,
                                re.IGNORECASE | re.DOTALL))
        ):
            # list(DISTINCT e ORDER BY e): dedup + sort in one pass.
            # (collect_set drops a NULL element that DuckDB would keep —
            # acceptable for the key-typed columns this form is used on.)
            e = dm.group(1).strip()
            if len(keys) != 1 or keys[0][0] != e:
                raise ValueError(
                    "list(DISTINCT …) supports ordering by the element only"
                )
            repl = f"array_sort(collect_set({e}))"
            if keys[0][1]:
                repl = f"reverse({repl})"
        else:
            fields = ", ".join(
                [f"{k} AS _o{i}" for i, (k, _, _) in enumerate(keys)]
                + [f"{expr_part} AS _v"]
            )
            sorted_expr = (
                f"array_sort(collect_list(struct({fields})), "
                f"{_order_comparator(keys)})"
            )
            repl = f"transform({sorted_expr}, x -> x._v)"
            if fn in ("any_value", "arbitrary", "first"):
                repl = f"element_at({repl}, 1)"
            elif fn == "last":
                repl = f"element_at({repl}, -1)"
            elif fn in ("sum", "avg"):
                # sum(x ORDER BY k): a SEQUENTIAL left-to-right fold in
                # key order — float results are order-dependent, which
                # is the only reason to write this form. Zero-of-type
                # init keeps integer sums integer; NULLs are skipped;
                # empty → NULL (try_element_at init), like DuckDB.
                vals = f"filter({repl}, __dd_v -> __dd_v IS NOT NULL)"
                zero = (
                    f"(try_element_at({vals}, 1) - try_element_at({vals}, 1))"
                )
                agg = (
                    f"aggregate({vals}, {zero}, "
                    f"(__dd_a, __dd_e) -> __dd_a + __dd_e)"
                )
                repl = (
                    agg
                    if fn == "sum"
                    else f"(CAST({agg} AS DOUBLE) / nullif(size({vals}), 0))"
                )
        s = s[: m.start()] + repl + s[close + 1 :]
        pos = m.start() + len(repl)
    return s


# DuckDB zips same-length generators in one SELECT, so
# ``generate_subscripts(X, 1) …, unnest(X)`` walks an array with indices.
# Spark's one-generator-per-select equivalent is posexplode via LATERAL
# VIEW: the pair rewrites to (__dd_pos + 1) / __dd_val over a lateral
# posexplode appended to the FROM source.
_GENSUB_RE = re.compile(r"\bgenerate_subscripts\s*\(", re.IGNORECASE)
_SRC_END_KEYWORDS = ("WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION")


def _depth_at(s: str, idx: int) -> int:
    return s[:idx].count("(") - s[:idx].count(")")


_LATERAL_UNNEST_RE = re.compile(
    r"(,|\bCROSS\s+JOIN\b)\s*unnest\s*\(", re.IGNORECASE
)


def _rewrite_lateral_unnest(s: str) -> str:
    """Comma-join / CROSS JOIN table-function unnest:
    ``FROM t, unnest(t.arr) u(x)`` → ``FROM t LATERAL VIEW
    explode(t.arr) u AS x``. Without a column alias DuckDB names the
    output after the unnested column itself."""
    pos = 0
    while m := _LATERAL_UNNEST_RE.search(s, pos):
        # only the FROM-clause position is a table function: the nearest
        # preceding SELECT/FROM keyword at this depth must be FROM (a
        # select-list ", unnest(x)" — the generate_subscripts zip form —
        # stays for the scalar-unnest rewrite)
        d = _depth_at(s, m.start())
        clause = None
        for km in re.finditer(r"\b(SELECT|FROM)\b", s[: m.start()], re.IGNORECASE):
            if _depth_at(s, km.start()) == d:
                clause = km.group(1).upper()
        if clause != "FROM":
            pos = m.end()
            continue
        open_idx = s.index("(", m.end() - 1)
        close = _matching_paren(s, open_idx)
        expr = s[open_idx + 1 : close]
        after = s[close + 1 :]
        am = re.match(
            r"\s*(?:AS\s+)?([A-Za-z_]\w*)\s*(?:\(\s*([A-Za-z_]\w*)\s*\))?",
            after,
        )
        alias = am.group(1) if am and am.group(1) and am.group(1).upper() not in _CLAUSE_KEYWORDS else None
        col = am.group(2) if am else None
        consumed = am.end() if alias else 0
        if col is None:
            # default output name: the unnested column's own name
            nm = re.search(r"([A-Za-z_]\w*)\s*$", expr.strip())
            col = nm.group(1) if nm else "unnest"
        repl = f" LATERAL VIEW explode({expr}) {alias or '__dd_un'} AS {col} "
        s = s[: m.start()] + repl + s[close + 1 + consumed :]
    return s


def _rewrite_generate_subscripts(s: str) -> str:
    while m := _GENSUB_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        gs_args = _split_top_commas(s[open_idx + 1 : close])
        x = gs_args[0].strip()
        d = _depth_at(s, m.start())
        um_probe = re.search(
            rf"\bunnest\s*\(\s*{re.escape(x)}\s*\)",
            s[: m.start()] + s[close + 1 :],
            re.IGNORECASE,
        )
        if um_probe is None:
            # standalone set-returning form: the subscripts of dim 1
            if len(gs_args) > 1 and gs_args[1].strip() not in ("1", ""):
                raise ValueError(
                    "generate_subscripts supports dimension 1 only"
                )
            if re.search(r"\bunnest\s*\(",
                         s[: m.start()] + s[close + 1 :], re.IGNORECASE):
                # DuckDB ZIPS all set-returning functions in one SELECT
                # positionally; with a textually different unnest
                # argument the pairing cannot be reconstructed here —
                # fail closed rather than emit an unzipped cross shape
                # (battery 35)
                raise DialectError(
                    "generate_subscripts can only zip with an unnest of "
                    "the SAME expression"
                )
            s = (
                s[: m.start()]
                + f"explode(sequence(1, size({x})))"
                + s[close + 1 :]
            )
            continue
        s = s[: m.start()] + "(__dd_pos + 1)" + s[close + 1 :]
        um = re.search(
            rf"\bunnest\s*\(\s*{re.escape(x)}\s*\)", s, re.IGNORECASE
        )
        s = s[: um.start()] + "__dd_val" + s[um.end() :]
        # locate this SELECT's FROM at the same depth, then the end of its
        # source clause; append the lateral posexplode there
        from_m = None
        for fm in re.finditer(r"\bFROM\b", s[um.start() :], re.IGNORECASE):
            pos = um.start() + fm.start()
            if _depth_at(s, pos) == d:
                from_m = pos + 4
                break
        if from_m is None:
            raise ValueError("generate_subscripts: no FROM clause found")
        end = len(s)
        for km in re.finditer(
            r"\b(" + "|".join(_SRC_END_KEYWORDS) + r")\b|\)", s[from_m:],
            re.IGNORECASE,
        ):
            pos = from_m + km.start()
            if _depth_at(s, pos) == d:
                # same-depth clause keyword, or the ')' closing this
                # subquery (its depth before consuming it is d)
                end = pos
                break
        s = (
            s[:end].rstrip()
            + f" LATERAL VIEW posexplode({x}) __dd_pe AS __dd_pos, __dd_val "
            + s[end:]
        )
    return s


_TIME_BUCKET_RE = re.compile(r"\btime_bucket\s*\(", re.IGNORECASE)
_INTERVAL_MICROS = {
    "microsecond": 1, "microseconds": 1, "us": 1,
    "millisecond": 1_000, "milliseconds": 1_000, "ms": 1_000,
    "second": 1_000_000, "seconds": 1_000_000,
    "minute": 60_000_000, "minutes": 60_000_000,
    "hour": 3_600_000_000, "hours": 3_600_000_000,
}
_INTERVAL_DAYS = {"day": 1, "days": 1, "week": 7, "weeks": 7}
_INTERVAL_MONTHS = {
    "month": 1, "months": 1, "quarter": 3, "quarters": 3,
    "year": 12, "years": 12,
}
# DuckDB origin: 2000-01-03 (a Monday) for day/week AND sub-day widths
# (probed on live 1.0: 7-day bucket of 2020-01-08 → 2020-01-06, a
# Monday; 17-minute bucket of 2000-01-01 00:00 → 1999-12-31 23:50,
# which only the 01-03 origin produces); month widths use 2000-01-01.
_TB_EPOCH_ORIGIN = 946_857_600_000_000  # 2000-01-03 00:00:00 UTC in μs


def _tb_temporal_kind(x: str, table: list[str], kinds) -> str | None:
    """'date' / 'timestamp' for a time_bucket operand, from literal
    spelling, an explicit cast, or the catalog kinds table."""
    t = x.strip()
    if re.match(r"(?i)^DATE\s*\x00", t) or re.search(
        r"(?i)(::\s*DATE|AS\s+DATE\s*\))\s*$", t
    ):
        return "date"
    if re.match(r"(?i)^TIMESTAMP(_NTZ)?\s*\x00", t) or re.search(
        r"(?i)(::\s*TIMESTAMP(_NTZ)?|AS\s+TIMESTAMP(_NTZ)?\s*\))\s*$", t
    ):
        return "timestamp"
    if re.fullmatch(r"[A-Za-z_][\w.]*", t) and kinds:
        k = kinds.get(t.split(".")[-1].lower())
        if k in ("date", "timestamp"):
            return k
    return None


def _rewrite_time_bucket(
    s: str, table: list[str], kinds: dict[str, str] | None = None
) -> str:
    """``time_bucket(width, x[, origin])`` → integer pmod-floor bucketing
    with DuckDB's origins (2000-01-03 for day/week widths, 2000-01-01
    otherwise), month widths via add_months, and the output typed to the
    input (DATE in → DATE out) — resolved from literal spelling, casts,
    or the catalog kinds table; unresolvable operands fail closed."""
    while m := _TIME_BUCKET_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if len(args) not in (2, 3):
            raise ValueError("time_bucket expects (INTERVAL, x[, origin])")
        im = re.match(
            r"(?i)^INTERVAL\s+(?:(\x00\d+\x00)|(\d+)\s+([A-Za-z]+))$",
            args[0].strip(),
        )
        if not im:
            raise ValueError(
                "time_bucket: first argument must be an INTERVAL literal"
            )
        if im.group(1):
            lit = _literal_value(_unmask(im.group(1), table)) or ""
            parts = lit.split()
            if len(parts) != 2:
                raise ValueError(f"time_bucket: unsupported interval {lit!r}")
            n, unit = int(parts[0]), parts[1].lower()
        else:
            n, unit = int(im.group(2)), im.group(3).lower()
        x = args[1].strip()
        xt = _tb_temporal_kind(x, table, kinds)
        if xt is None:
            raise ValueError(
                "time_bucket: cannot resolve operand type (cast to DATE "
                "or TIMESTAMP explicitly)"
            )
        origin = args[2].strip() if len(args) == 3 else None
        if origin is not None and _tb_temporal_kind(origin, table, kinds) is None:
            raise ValueError(
                "time_bucket: origin must be a DATE/TIMESTAMP literal"
            )
        if unit in _INTERVAL_MONTHS:
            months = n * _INTERVAL_MONTHS[unit]
            o = origin or "DATE '2000-01-01'"
            mdiff = (
                f"(12 * (year({x}) - year({o})) + month({x}) - month({o}))"
            )
            base = (
                f"add_months(CAST({o} AS DATE), "
                f"{mdiff} - pmod({mdiff}, {months}))"
            )
        elif unit in _INTERVAL_DAYS:
            days = n * _INTERVAL_DAYS[unit]
            o = origin or "DATE '2000-01-03'"
            dd = f"datediff(CAST({x} AS DATE), CAST({o} AS DATE))"
            base = (
                f"date_add(CAST({o} AS DATE), {dd} - pmod({dd}, {days}))"
            )
        elif unit in _INTERVAL_MICROS:
            mus = n * _INTERVAL_MICROS[unit]
            if xt == "date":
                if 86_400_000_000 % mus:
                    raise ValueError(
                        "time_bucket: sub-day width must divide a day "
                        "for DATE input"
                    )
                s = s[: m.start()] + f"({x})" + s[close + 1 :]
                continue
            o_us = (
                f"unix_micros(CAST({origin} AS TIMESTAMP))"
                if origin
                else str(_TB_EPOCH_ORIGIN)
            )
            delta = f"(unix_micros(CAST({x} AS TIMESTAMP)) - {o_us})"
            base = (
                f"timestamp_micros({delta} - pmod({delta}, {mus}) + {o_us})"
            )
            s = s[: m.start()] + base + s[close + 1 :]
            continue
        else:
            raise ValueError(f"time_bucket: unsupported unit {unit!r}")
        repl = base if xt == "date" else f"CAST({base} AS TIMESTAMP)"
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


_DYN_INTERVAL_RE = re.compile(r"\bINTERVAL\s*\(", re.IGNORECASE)
# unit → make_dt_interval / make_ym_interval argument template ({e} is
# the dynamic count). DuckDB: INTERVAL (expr) UNIT — Spark intervals
# only take literal counts, so this becomes a constructor call.
_DYN_INTERVAL_UNITS = {
    "year": "make_ym_interval({e})", "years": "make_ym_interval({e})",
    "quarter": "make_ym_interval(0, 3 * ({e}))",
    "quarters": "make_ym_interval(0, 3 * ({e}))",
    "month": "make_ym_interval(0, {e})", "months": "make_ym_interval(0, {e})",
    "week": "make_dt_interval(7 * ({e}))",
    "weeks": "make_dt_interval(7 * ({e}))",
    "day": "make_dt_interval({e})", "days": "make_dt_interval({e})",
    "hour": "make_dt_interval(0, {e})", "hours": "make_dt_interval(0, {e})",
    "minute": "make_dt_interval(0, 0, {e})",
    "minutes": "make_dt_interval(0, 0, {e})",
    "second": "make_dt_interval(0, 0, 0, {e})",
    "seconds": "make_dt_interval(0, 0, 0, {e})",
    "millisecond": "make_dt_interval(0, 0, 0, CAST({e} AS DECIMAL(28,6)) / 1000)",
    "milliseconds": "make_dt_interval(0, 0, 0, CAST({e} AS DECIMAL(28,6)) / 1000)",
    "microsecond": "make_dt_interval(0, 0, 0, CAST({e} AS DECIMAL(28,6)) / 1000000)",
    "microseconds": "make_dt_interval(0, 0, 0, CAST({e} AS DECIMAL(28,6)) / 1000000)",
}


# to_<unit>() interval constructors → the same templates; the ym-only
# long units scale months directly
_TO_INTERVAL_UNIT = {
    "to_years": "year", "to_months": "month", "to_weeks": "week",
    "to_days": "day", "to_hours": "hour", "to_minutes": "minute",
    "to_seconds": "second", "to_milliseconds": "millisecond",
    "to_microseconds": "microsecond", "to_decades": "decade",
    "to_centuries": "century", "to_millennia": "millennium",
}
_TO_YM_SCALE = {"to_decades": 120, "to_centuries": 1200, "to_millennia": 12000}


def _rewrite_dyn_interval(s: str) -> str:
    """DuckDB's dynamic interval ``INTERVAL (expr) UNIT`` → the matching
    make_dt_interval/make_ym_interval constructor (Spark interval
    literals only take constant counts). Runs after time_bucket so
    literal widths inside it are untouched."""
    pos = 0
    while m := _DYN_INTERVAL_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        um = re.match(r"\s*([A-Za-z]+)\b", s[close + 1 :])
        tmpl = um and _DYN_INTERVAL_UNITS.get(um.group(1).lower())
        if not tmpl:
            pos = close + 1
            continue
        expr = s[open_idx + 1 : close].strip()
        repl = tmpl.format(e=expr)
        s = s[: m.start()] + repl + s[close + 1 + um.end() :]
        pos = m.start() + len(repl)
    return s


_DISTINCT_ON_RE = re.compile(
    r"\bSELECT\s+DISTINCT\s+ON\s*\(", re.IGNORECASE
)


def _rewrite_distinct_on(s: str) -> str:
    """``SELECT DISTINCT ON (keys) cols FROM … ORDER BY …`` → row_number
    window over the keys in the statement's ORDER BY order — DuckDB keeps
    the first row per key group under that ordering. Text before the
    SELECT (a WITH clause, an enclosing query) is preserved, the rewrite
    segment stops at the paren closing an enclosing subquery, and a
    trailing LIMIT/OFFSET stays on the outer query rather than being
    spliced into the window ordering."""
    while m := _DISTINCT_ON_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        keys = ", ".join(_split_top_commas(s[open_idx + 1 : close]))
        rest = s[close + 1 :]
        # this SELECT's clauses end where an enclosing subquery closes
        seg_end, depth = len(rest), 0
        for i, c in enumerate(rest):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    seg_end = i
                    break
        seg, suffix = rest[:seg_end], rest[seg_end:]
        om_idx, _ = _find_top_keyword(seg, ("ORDER",))
        if om_idx < 0:
            raise ValueError("DISTINCT ON requires an ORDER BY to be deterministic")
        select_from = seg[:om_idx]
        order_clause = seg[om_idx:].strip()
        lim_idx, _ = _find_top_keyword(order_clause, ("LIMIT", "OFFSET"))
        tail = ""
        if lim_idx >= 0:
            tail = " " + order_clause[lim_idx:].strip()
            order_clause = order_clause[:lim_idx].strip()
        order_list = re.sub(
            r"^ORDER\s+BY\s+", "", order_clause, flags=re.IGNORECASE
        )
        fm_idx, _ = _find_top_keyword(select_from, ("FROM",))
        if fm_idx < 0:
            raise ValueError("DISTINCT ON: no FROM clause")
        sel = select_from[:fm_idx].strip()
        source = select_from[fm_idx + len("FROM"):].strip()
        repl = (
            f"SELECT {sel} FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY {keys} ORDER BY {order_list}) AS __dd_don "
            f"FROM {source}) WHERE __dd_don = 1 {order_clause}{tail}"
        )
        s = s[: m.start()] + repl + suffix
    return s


_FILTER_WHERE_RE = re.compile(r"\bFILTER\s*\(\s*WHERE\b", re.IGNORECASE)


def _rewrite_window_filter(s: str) -> str:
    """``agg(x) FILTER (WHERE c) OVER w`` → ``agg(CASE WHEN c THEN x END)
    OVER w`` (Spark supports aggregate FILTER but not on windows). The
    plain-aggregate form is left for Spark's native FILTER support. The
    aggregate call is located by paren matching (not a paren-free regex),
    so arguments like ``sum(a*(b+1))`` rewrite correctly; DISTINCT under
    a windowed FILTER has no Spark spelling and fails closed."""
    pos = 0
    while m := _FILTER_WHERE_RE.search(s, pos):
        filt_open = s.index("(", m.start())
        filt_close = _matching_paren(s, filt_open)
        after = s[filt_close + 1 :]
        if not re.match(r"\s*OVER\b", after, re.IGNORECASE):
            pos = filt_close + 1  # plain aggregate FILTER — native Spark
            continue
        # the aggregate call sits immediately before FILTER; walk back
        # from its closing paren to the matching open
        head = s[: m.start()].rstrip()
        if not head.endswith(")"):
            pos = filt_close + 1
            continue
        arg_close, depth, arg_open = len(head) - 1, 0, -1
        for i in range(len(head) - 1, -1, -1):
            if head[i] == ")":
                depth += 1
            elif head[i] == "(":
                depth -= 1
                if depth == 0:
                    arg_open = i
                    break
        fm = (
            re.search(r"([A-Za-z_]\w*)\s*$", head[:arg_open])
            if arg_open > 0
            else None
        )
        if not fm:
            pos = filt_close + 1
            continue
        fn = fm.group(1)
        arg = head[arg_open + 1 : arg_close].strip()
        if re.match(r"DISTINCT\b", arg, re.IGNORECASE):
            raise ValueError(
                "FILTER with DISTINCT over a window has no Spark equivalent"
            )
        cond = s[m.end() : filt_close].strip()
        if arg in ("*", "1") or arg == "":
            inner = f"CASE WHEN {cond} THEN 1 END"
            fn_call = f"count({inner})" if fn.lower() == "count" else f"{fn}({inner})"
        else:
            fn_call = f"{fn}(CASE WHEN {cond} THEN {arg} END)"
        start_idx = fm.start(1)
        s = s[:start_idx] + fn_call + s[filt_close + 1 :]
        pos = start_idx + len(fn_call)
    return s


# A comma-joined parenthesized VALUES whose rows reference the left
# table's columns is implicit-lateral in DuckDB; Spark needs the LATERAL
# keyword, and its inline tables only accept foldable expressions — so
# each row becomes a SELECT in a UNION ALL chain (correlated refs are
# legal there). Uncorrelated VALUES take the same shape harmlessly.
_LATERAL_VALUES_RE = re.compile(r",\s*\(\s*(VALUES)\b", re.IGNORECASE)


def _rewrite_lateral_values(s: str) -> str:
    while m := _LATERAL_VALUES_RE.search(s):
        open_paren = s.index("(", m.start())
        close = _matching_paren(s, open_paren)
        body = s[m.end() : close].strip()
        rows = []
        for row in _split_top_commas(body):
            row = row.strip()
            if not (row.startswith("(") and row.endswith(")")):
                raise ValueError("VALUES rows must be parenthesized")
            rows.append(_split_top_commas(row[1:-1]))
        width = len(rows[0])
        selects = [
            "SELECT "
            + ", ".join(
                f"{cell} AS _c{i}" for i, cell in enumerate(row)
            )
            if ri == 0
            else "SELECT " + ", ".join(row)
            for ri, row in enumerate(rows)
        ]
        if any(len(r) != width for r in rows):
            raise ValueError("VALUES rows have uneven width")
        repl = ", LATERAL (" + " UNION ALL ".join(selects) + ")"
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


# ---------------------------------------------------------------------------
# r7 breadth batch: struct/map literals, function templates, POSITIONAL JOIN
# ---------------------------------------------------------------------------


def _matching_brace(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "{":
            depth += 1
        elif s[i] == "}":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced braces in SQL")


_STRUCT_KEY_RE = re.compile(r"^(\x00\d+\x00|[A-Za-z_]\w*)\s*:\s*(.*)$", re.DOTALL)


def _rewrite_struct_literals(s: str, table: list[str]) -> str:
    """DuckDB struct literals ``{'k': v, ...}`` → ``named_struct('k', v,
    ...)`` and map literals ``MAP {k: v, ...}`` → ``map(k, v, ...)``.
    Operates innermost-first so nesting resolves naturally; string keys
    are already masked, bare-identifier keys become string literals.
    Braces cannot appear anywhere else in masked DuckDB SQL (list
    comprehensions are rewritten earlier), so an unparseable brace body
    fails closed."""
    while True:
        open_idx = -1
        for i, c in enumerate(s):
            if c == "{":
                open_idx = i
            elif c == "}" and open_idx >= 0:
                break
        else:
            return s
        close = _matching_brace(s, open_idx)
        body = s[open_idx + 1 : close]
        head = s[:open_idx].rstrip()
        is_map = bool(re.search(r"\bMAP$", head, re.IGNORECASE))
        parts = []
        for pair in _split_top_commas(body):
            m = _STRUCT_KEY_RE.match(pair) if not is_map else None
            if is_map:
                ci = pair.find(":")
                if ci < 0:
                    raise ValueError(f"bad map literal entry {pair!r}")
                parts.append((pair[:ci].strip(), pair[ci + 1 :].strip()))
            elif m:
                key = m.group(1)
                if not key.startswith("\x00"):
                    table.append(f"'{key}'")
                    key = f"\x00{len(table) - 1}\x00"
                parts.append((key, m.group(2).strip()))
            else:
                raise ValueError(f"bad struct literal entry {pair!r}")
        inner = ", ".join(f"{k}, {v}" for k, v in parts)
        if is_map:
            start = re.search(r"\bMAP$", head, re.IGNORECASE).start()
            s = s[:start] + f"map({inner})" + s[close + 1 :]
        else:
            s = s[:open_idx] + f"named_struct({inner})" + s[close + 1 :]


def _masked_literal(table: list[str], text: str) -> str:
    table.append("'" + text.replace("'", "''") + "'")
    return f"\x00{len(table) - 1}\x00"


_TS_UNITS = {
    "year", "quarter", "month", "week", "day", "hour", "minute", "second",
    "millisecond", "microsecond",
}
_DOW_FIELDS = {"dow", "dayofweek", "weekday"}

# DuckDB fmt-style format(): {} / {:d} / {:s} / {:.Nf} holes → printf
_FMT_HOLE_RE = re.compile(r"\{(:[^}]*)?\}")


def _fmt_to_printf(fmt: str) -> tuple[str, list[str | None]]:
    """fmt-style template → (printf template, per-hole cast types).
    Java's Formatter rejects Decimal for %d/%f, so holes with a typed
    spec report the SQL type their argument must be cast to."""
    out = fmt.replace("%", "%%")
    casts: list[str | None] = []

    def hole(m):
        spec = m.group(1)
        if spec in (None, ":", ":s"):
            casts.append(None)
            return "%s"
        if spec == ":d":
            casts.append("BIGINT")
            return "%d"
        if spec in (":x", ":X", ":o"):
            casts.append("BIGINT")
            return "%" + spec[1:]
        pm = re.fullmatch(r":\.(\d+)f", spec)
        if pm:
            casts.append("DOUBLE")
            return f"%.{pm.group(1)}f"
        raise ValueError(f"format(): unsupported spec {{{spec}}}")

    return _FMT_HOLE_RE.sub(hole, out), casts


_DUCK_DDL_TYPES = {
    "VARCHAR": "string", "TEXT": "string", "STRING": "string",
    "BIGINT": "bigint", "INT8": "bigint", "LONG": "bigint",
    "INTEGER": "int", "INT": "int", "INT4": "int",
    "SMALLINT": "smallint", "INT2": "smallint", "TINYINT": "tinyint",
    "DOUBLE": "double", "FLOAT8": "double", "FLOAT": "float",
    "REAL": "float", "BOOLEAN": "boolean", "BOOL": "boolean",
    "DATE": "date", "TIMESTAMP": "timestamp_ntz", "UUID": "string",
}


def _duck_json_spec_to_ddl(spec) -> str:
    """DuckDB from_json structure spec ('["BIGINT"]', '{"a":"VARCHAR"}')
    → Spark DDL type string; unknown type names fail closed."""
    if isinstance(spec, str):
        t = spec.strip().upper()
        if t.startswith("DECIMAL"):
            return t.lower()
        if t not in _DUCK_DDL_TYPES:
            raise ValueError(f"from_json: unsupported type {spec!r}")
        return _DUCK_DDL_TYPES[t]
    if isinstance(spec, list):
        if len(spec) != 1:
            raise ValueError("from_json: list spec needs one element type")
        return f"array<{_duck_json_spec_to_ddl(spec[0])}>"
    if isinstance(spec, dict):
        fields = ",".join(
            f"{k}:{_duck_json_spec_to_ddl(v)}" for k, v in spec.items()
        )
        return f"struct<{fields}>"
    raise ValueError("from_json: unsupported structure spec")


def _arg_list_items(arg: str) -> list[str] | None:
    """Items of a list-valued argument in either pre-rewrite ``[a, b]``
    or post-rewrite ``array(a, b)`` spelling; None if not a list."""
    t = arg.strip()
    if t.startswith("[") and t.endswith("]"):
        return [x.strip() for x in _split_top_commas(t[1:-1])]
    if re.match(r"(?i)^array\s*\(", t) and t.endswith(")"):
        open_idx = t.index("(")
        if _matching_paren(t, open_idx) == len(t) - 1:
            return [
                x.strip()
                for x in _split_top_commas(t[open_idx + 1 : -1])
            ]
    return None


def _flatten_named_struct(expr: str) -> str:
    """Textually flatten nested named_struct literals to their leaf
    (key, value) pairs — DuckDB's recursive struct unnest keeps the
    LEAF field names. Non-struct values pass through untouched."""
    m = re.match(r"(?i)\s*named_struct\s*\(", expr)
    if not m:
        return expr
    close = _matching_paren(expr, m.end() - 1)
    items = _split_top_commas(expr[m.end() : close])
    pairs: list[str] = []
    for i in range(0, len(items) - 1, 2):
        key, val = items[i].strip(), items[i + 1].strip()
        if re.match(r"(?i)\s*named_struct\s*\(", val):
            inner = _flatten_named_struct(val)
            im = re.match(r"(?i)\s*named_struct\s*\(", inner)
            iclose = _matching_paren(inner, im.end() - 1)
            pairs.extend(
                x.strip()
                for x in _split_top_commas(inner[im.end() : iclose])
            )
        else:
            pairs.extend((key, val))
    return "named_struct(" + ", ".join(pairs) + ")"


def _template(fn: str, args: list[str], table: list[str]) -> str | None:
    """Structural rewrites for DuckDB functions whose Spark equivalent
    needs argument reshaping (not just a rename). Returns None to leave
    the call untouched (native or out of scope)."""
    if fn == "to_base" and len(args) == 2:
        return f"conv({args[0]}, 10, {args[1]})"
    if fn == "printf" and len(args) >= 2:
        # Java's Formatter rejects Decimal args for %d/%x/%f — cast each
        # argument to the type its conversion demands (probed: DuckDB
        # printf('%x', 255) = 'ff'; Spark format_string errors uncast)
        lit = (
            _literal_value(_unmask(args[0].strip(), table))
            if re.fullmatch(r"\x00\d+\x00", args[0].strip())
            else None
        )
        if lit is not None:
            convs = re.findall(
                r"%(?:(\d+)\$)?[-+ #0,(]*\d*(?:\.\d+)?([a-zA-Z%])", lit
            )
            # %N$ positional conversions cast args[N], not the next
            # textual argument (probed: DuckDB printf('%2$s=%1$d', 7,
            # 'k') = 'k=7'); sequential conversions consume their own
            # ordinal counter, matching Java Formatter. Conflicting
            # casts for one argument → leave the call native.
            n_args = len(args) - 1
            casts: list[str | None] = [None] * n_args
            seq = 0
            for pos, c in convs:
                if c == "%":
                    continue
                if c in "diuxXo":
                    want = "BIGINT"
                elif c in "eEfgGaA":
                    want = "DOUBLE"
                else:
                    want = None
                idx = int(pos) - 1 if pos else seq
                if not pos:
                    seq += 1
                if idx < 0 or idx >= n_args:
                    return None
                if want:
                    if casts[idx] not in (None, want):
                        return None
                    casts[idx] = want
            vals = [
                f"CAST({a} AS {t})" if t else a
                for a, t in zip(args[1:], casts)
            ]
            return f"format_string({args[0]}, {', '.join(vals)})"
        return None
    if (
        fn in ("substr", "substring")
        and len(args) == 3
        and re.fullmatch(r"-\d+", args[2].strip())
    ):
        # DuckDB: a NEGATIVE length extends BACKWARDS from the start
        # position (clamped at 1): substr('hello', 4, -2) = 'el',
        # substr('hello', 3, -99) = 'he' (probed live). Spark returns ''.
        # Literal negative lengths only — positive literals (the hot
        # path) stay native.
        sarg, a, c = args[0], args[1], int(args[2])
        p = (f"(CASE WHEN ({a}) < 0 THEN length({sarg}) + ({a}) + 1 "
             f"ELSE ({a}) END)")
        start = f"greatest({p} + {c}, 1)"
        return f"substring({sarg}, {start}, {p} - {start})"
    if fn == "sign" and len(args) == 1:
        # DuckDB returns TINYINT (-1/0/1) for every input type; Spark's
        # signum returns DOUBLE
        return f"CAST(sign({args[0]}) AS INT)"
    if fn in ("dayofweek", "weekday") and len(args) == 1:
        # DuckDB: Sunday=0..Saturday=6; Spark's dayofweek is Sunday=1
        return f"(dayofweek({args[0]}) - 1)"
    if fn in ("list_extract", "array_extract") and len(args) == 2:
        # DuckDB: 1-based, index 0 and out-of-range give NULL, negative
        # counts from the end; Spark's element_at RAISES on 0 under ANSI
        return f"try_element_at({args[0]}, nullif({args[1]}, 0))"
    if fn in ("list_contains", "list_has", "array_has") and len(args) == 2:
        if args[1].strip().upper() == "NULL":
            # a bare NULL needle fails Spark analysis (untyped); DuckDB
            # returns NULL
            return "CAST(NULL AS BOOLEAN)"
        # DuckDB IGNORES NULL elements: list_contains([1,NULL], 2) is
        # false; Spark's array_contains is three-valued (NULL). A NULL
        # list or needle stays NULL on both.
        return (
            f"CASE WHEN ({args[0]}) IS NULL OR ({args[1]}) IS NULL "
            f"THEN CAST(NULL AS BOOLEAN) "
            f"ELSE coalesce(array_contains({args[0]}, {args[1]}), false) "
            f"END"
        )
    if fn in ("list_concat", "list_cat", "array_concat") and len(args) >= 2:
        # DuckDB SKIPS NULL list arguments (list_concat([1], NULL) is
        # [1]); only all-NULL returns NULL. Spark concat propagates NULL.
        live = [a for a in args if a.strip().upper() != "NULL"]
        if not live:
            return "NULL"
        if len(live) == 1:
            return f"({live[0]})"
        null_all = " AND ".join(f"({a}) IS NULL" for a in live)
        body = ", ".join(f"coalesce({a}, array())" for a in live)
        return f"CASE WHEN {null_all} THEN NULL ELSE concat({body}) END"
    if fn == "flatten" and len(args) == 1:
        # DuckDB flatten skips NULL sublists; Spark returns NULL
        return (f"flatten(filter({args[0]}, "
                f"__dd_fl -> __dd_fl IS NOT NULL))")
    if fn in ("json_extract", "json_extract_path",
              "json_extract_string") and len(args) == 2:
        is_str = fn == "json_extract_string"
        arg1 = args[1].strip()
        if arg1.startswith("[") and arg1.endswith("]"):
            # a LIST of paths → list of per-path extracts. Spark rejects
            # Python UDFs inside lambda bodies, so expand the literal
            # list into one shim call per element.
            shim = "dd_json_extract_str" if is_str else "dd_json_extract"
            paths = _split_top_commas(arg1[1:-1])
            return ("array(" + ", ".join(
                f"{shim}({args[0]}, {p.strip()})" for p in paths
            ) + ")")
        lit = (
            _literal_value(_unmask(arg1, table))
            if re.fullmatch(r"\x00\d+\x00", arg1)
            else None
        )
        if lit is not None and "[*]" in lit:
            # wildcard paths return a LIST of matches
            shim = ("dd_json_extract_str_list" if is_str
                    else "dd_json_extract_list")
            return f"{shim}({args[0]}, {args[1]})"
        if is_str:
            # exotic literal paths (JSON Pointer, from-end index, bare
            # key) take the full walker; the $-dotted subset keeps the
            # JVM get_json_object fast path (the _FN_RENAMES route)
            if lit is not None and not re.fullmatch(
                r"\$(\.\w+|\[\d+\]|\['[^']*'\])*", lit
            ):
                return f"dd_json_extract_str({args[0]}, {args[1]})"
            return None
        return None  # plain dd_json_extract rename applies
    if fn == "json_array_length" and len(args) == 2:
        return f"json_array_length(dd_json_extract({args[0]}, {args[1]}))"
    if fn == "list_reduce" and len(args) == 2:
        lst, lam = args
        return (
            f"aggregate(slice({lst}, 2, greatest(size({lst}) - 1, 0)), "
            f"element_at({lst}, 1), {lam})"
        )
    if fn in ("date_sub", "datesub") and len(args) == 3:
        unit = (_literal_value(_unmask(args[0], table)) or "").lower().rstrip("s")
        if unit not in _TS_UNITS:
            return None
        return f"timestampdiff({unit.upper()}, {args[1]}, {args[2]})"
    if (
        fn in ("datepart", "date_part")
        and len(args) == 2
        and (names := _arg_list_items(args[0])) is not None
    ):
        # list form datepart(['year','month'], x) → struct of parts
        pairs = []
        for ph in names:
            ph = ph.strip()
            if _literal_value(_unmask(ph, table)) is None:
                return None  # field names must be literals
            sub = _template(fn, [ph, args[1]], table) or f"datepart({ph}, {args[1]})"
            pairs.append(f"{ph}, CAST({sub} AS BIGINT)")
        return "named_struct(" + ", ".join(pairs) + ")"
    if fn in ("datepart", "date_part") and len(args) == 2:
        field = (_literal_value(_unmask(args[0], table)) or "").lower()
        if field in _DOW_FIELDS:
            return f"(dayofweek({args[1]}) - 1)"
        if field == "isodow":
            lit = _masked_literal(table, "DAYOFWEEK_ISO")
            return f"date_part({lit}, {args[1]})"
        return None
    if fn == "log" and len(args) == 1:
        # DuckDB's 1-arg log is LOG BASE 10 (ln is ln); Spark's is the
        # natural log — a silent wrong answer without this. 2-arg
        # log(base, x) agrees on both engines.
        return f"log10({args[0]})"
    if fn == "yearweek" and len(args) == 1:
        # ISO year * 100 + ISO week (202001 for 2020-01-01)
        return (
            f"CAST(extract(YEAROFWEEK FROM {args[0]}) * 100 "
            f"+ weekofyear({args[0]}) AS BIGINT)"
        )
    if fn == "isoyear" and len(args) == 1:
        return f"CAST(extract(YEAROFWEEK FROM {args[0]}) AS BIGINT)"
    if fn == "julian" and len(args) == 1:
        # DuckDB's julian(): 1970-01-01 00:00 → 2440588.0 (calendar-day
        # anchored, not the astronomical noon-epoch 2440587.5)
        return (
            f"(unix_micros(CAST({args[0]} AS TIMESTAMP)) "
            f"/ CAST(86400000000 AS DOUBLE) + 2440588.0)"
        )
    if fn == "era" and len(args) == 1:
        return f"(CASE WHEN year({args[0]}) > 0 THEN 1 ELSE 0 END)"
    if fn == "century" and len(args) == 1:
        # extract convention: 2001 → 21, 2000 → 20 (proper centuries —
        # unlike date_diff's year/100 bucket counting)
        return f"CAST(ceil(year({args[0]}) / 100.0) AS BIGINT)"
    if fn == "millennium" and len(args) == 1:
        return f"CAST(ceil(year({args[0]}) / 1000.0) AS BIGINT)"
    if fn == "decade" and len(args) == 1:
        return f"CAST(floor(year({args[0]}) / 10.0) AS BIGINT)"
    if fn == "epoch_ms" and len(args) == 1:
        return f"unix_millis(CAST({args[0]} AS TIMESTAMP))"
    if fn == "epoch_us" and len(args) == 1:
        return f"unix_micros(CAST({args[0]} AS TIMESTAMP))"
    if fn == "epoch_ns" and len(args) == 1:
        return f"(unix_micros(CAST({args[0]} AS TIMESTAMP)) * 1000)"
    if fn in ("string_agg", "group_concat") and len(args) == 1:
        # DuckDB's 1-arg default separator is ',' (Spark listagg: '');
        # the ORDER BY-inside form stays for the ordered-agg rewrite,
        # which applies the same default
        if re.search(r"\bORDER\s+BY\b", args[0], re.IGNORECASE):
            return None
        comma = _masked_literal(table, ",")
        return f"listagg({args[0]}, {comma})"
    if fn == "regexp_matches" and len(args) == 3:
        # flags argument → inline (?ims) groups; 'c' (case-sensitive,
        # the default) and 'g' (find-anywhere is already the semantics)
        # drop; unknown flags fail closed
        flags = _literal_value(_unmask(args[2], table))
        pat = _literal_value(_unmask(args[1], table))
        if flags is None or pat is None:
            raise ValueError("regexp_matches: flags must be a literal")
        inline = ""
        for f in flags:
            if f in "ims":
                inline += f
            elif f not in "cg":
                raise ValueError(f"regexp_matches: unsupported flag {f!r}")
        newpat = _masked_literal(
            table, (f"(?{inline})" if inline else "") + pat
        )
        return f"regexp_like({args[0]}, {newpat})"
    if fn == "timezone" and len(args) == 2:
        # timezone(tz, x) — DuckDB's function spelling of AT TIME ZONE:
        # same instant-vs-wall-clock dispatch on the operand's spelling
        tz, x = args
        if re.match(r"(?i)^\s*TIMESTAMPTZ\b", x) or re.search(
            r"(?i)::\s*TIMESTAMPTZ\s*$", x
        ):
            return f"from_utc_timestamp({x}, {tz})"
        return f"to_utc_timestamp({x}, {tz})"
    if fn in (
        "parse_filename", "parse_dirpath", "parse_path", "parse_dirname"
    ) and (1 <= len(args) <= 3):
        # optional args: a trim_extension boolean (parse_filename only)
        # and/or a separator spec; DuckDB's default is both slashes
        trim, sep_spec = False, None
        for extra in args[1:]:
            txt = _unmask(extra, table).strip()
            if txt.lower() in ("true", "false"):
                trim = txt.lower() == "true"
                continue
            lit = _literal_value(txt)
            if lit is None:
                raise ValueError(f"{fn}: unsupported argument {txt!r}")
            sep_spec = lit.lower()
        if sep_spec in (None, "system", "both_slash"):
            cls = r"/\\\\"
        elif sep_spec == "forward_slash":
            cls = "/"
        elif sep_spec == "backslash":
            cls = r"\\\\"
        else:
            raise ValueError(f"{fn}: unknown separator {sep_spec!r}")
        p = args[0]
        empty = _masked_literal(table, "")
        if fn == "parse_filename":
            pat = _masked_literal(table, f"([^{cls}]*)$")
            expr = f"regexp_extract({p}, {pat}, 1)"
            if trim:
                ext = _masked_literal(table, r"\\.[^.]*$")
                expr = f"regexp_replace({expr}, {ext}, {empty})"
            return expr
        if fn == "parse_dirpath":
            # everything before the LAST separator ('' when none);
            # an all-separator path is its own dirpath (probed: DuckDB
            # parse_dirpath('/') = '/', but parse_dirpath('/a') = '')
            root = _masked_literal(table, f"^[{cls}]+$")
            tail = _masked_literal(table, f"[{cls}][^{cls}]*$")
            has = _masked_literal(table, f"[{cls}]")
            return (
                f"(CASE WHEN {p} RLIKE {root} THEN {p} "
                f"WHEN {p} RLIKE {has} "
                f"THEN regexp_replace({p}, {tail}, {empty}) "
                f"ELSE {empty} END)"
            )
        if fn == "parse_dirname":
            # topmost directory: the separator itself for an absolute
            # path, the first component otherwise ('' when no separator)
            lead = _masked_literal(table, f"^[{cls}]")
            has = _masked_literal(table, f"[{cls}]")
            first = _masked_literal(table, f"^([^{cls}]*)")
            return (
                f"(CASE WHEN {p} RLIKE {lead} THEN substr({p}, 1, 1) "
                f"WHEN {p} RLIKE {has} "
                f"THEN regexp_extract({p}, {first}, 1) "
                f"ELSE {empty} END)"
            )
        # parse_path: components list; an absolute path keeps its
        # leading separator as the first element, repeats collapse
        sep_re = _masked_literal(table, f"[{cls}]")
        lead = _masked_literal(table, f"^[{cls}]")
        comps = f"filter(split({p}, {sep_re}), __dd_p -> __dd_p != {empty})"
        return (
            f"(CASE WHEN {p} RLIKE {lead} "
            f"THEN concat(array(substr({p}, 1, 1)), {comps}) "
            f"ELSE {comps} END)"
        )
    if fn == "make_time" and len(args) == 3:
        # Spark's TIME type has literals but no constructor function yet
        # — fold literal arguments to a TIME literal (out-of-range
        # values then fail at literal parse, matching DuckDB's error);
        # column arguments stay unsupported (fail closed)
        try:
            h, mi, sec = int(args[0]), int(args[1]), float(args[2])
        except ValueError:
            raise ValueError("make_time: only literal arguments are supported")
        micros = (h * 3600 + mi * 60) * 1_000_000 + round(sec * 1_000_000)
        lit = _masked_literal(table, _fmt_time_micros(micros))
        return f"TIME {lit}"
    if fn == "make_timestamp" and len(args) == 1:
        # DuckDB's 1-arg form takes epoch microseconds
        return f"timestamp_micros({args[0]})"
    if fn in ("bin", "to_binary") and len(args) == 1:
        arg = args[0].strip()
        if (
            re.fullmatch(r"\x00\d+\x00", arg)
            and _literal_value(_unmask(arg, table)) is not None
        ):
            # string literal: 8 bits per UTF-8 byte (DuckDB bin/
            # to_binary on VARCHAR), via hex() nibble expansion
            empty = _masked_literal(table, "")
            return (
                f"array_join(transform(filter(split(hex({arg}), {empty}), "
                f"__dd_d -> __dd_d <> {empty}), "
                f"__dd_d -> lpad(conv(__dd_d, 16, 2), 4, "
                f"{_masked_literal(table, '0')})), {empty})"
            )
        if fn == "to_binary":
            # numeric: DuckDB to_binary aliases bin (Spark's native
            # to_binary would silently hex-DECODE instead)
            return f"bin({arg})"
        return None
    if fn == "struct_insert" and len(args) >= 2:
        base0 = args[0].strip()
        new_fields = []
        for item in args[1:]:
            km = re.match(
                r"^([A-Za-z_]\w*)\s*:=\s*(.+)$", item.strip(), re.DOTALL
            )
            if not km:
                raise ValueError("struct_insert expects name := value pairs")
            new_fields.append((km.group(1), km.group(2).strip()))
        nm = re.match(r"(?i)^named_struct\s*\(", base0)
        if nm and base0.endswith(")"):
            # struct LITERAL base ({'a': 1} arrives as named_struct(...)):
            # rebuild with the appended fields
            inner = base0[base0.index("(") + 1 : -1]
            parts = _split_top_commas(inner)
            if len(parts) % 2 == 0:
                for name, val in new_fields:
                    parts += [_masked_literal(table, name), val]
                return "named_struct(" + ", ".join(parts) + ")"
        if not re.fullmatch(r"[A-Za-z_][\w.]*", base0):
            raise ValueError(
                "struct_insert: base must be a struct column reference "
                "or a struct literal"
            )
        parts = [f"{base0}.*"]
        parts += [f"{val} AS {name}" for name, val in new_fields]
        return f"struct({', '.join(parts)})"
    if fn == "bitstring" and len(args) == 2:
        # BIT strings are carried as '0'/'1' text (the typed-literal
        # rewrite already strips BIT '…' to its display string)
        msg = _masked_literal(
            table, "bitstring: length must be >= input length"
        )
        zero = _masked_literal(table, "0")
        return (
            f"(CASE WHEN length({args[0]}) > ({args[1]}) "
            f"THEN raise_error({msg}) "
            f"ELSE lpad({args[0]}, {args[1]}, {zero}) END)"
        )
    if fn == "get_bit" and len(args) == 2:
        # 0-based from the left; out-of-range fails (ANSI cast of '')
        return f"CAST(substr({args[0]}, ({args[1]}) + 1, 1) AS INT)"
    if fn == "set_bit" and len(args) == 3:
        return (
            f"concat(substr({args[0]}, 1, ({args[1]})), "
            f"CAST({args[2]} AS STRING), substr({args[0]}, ({args[1]}) + 2))"
        )
    if fn == "bit_position" and len(args) == 2:
        # bit_position(needle, haystack): 1-based, 0 when absent
        return f"instr({args[1]}, {args[0]})"
    if fn == "bitstring_agg" and len(args) in (1, 3):
        # BIT with bits set at (v - lo) over [lo, hi]. The 3-arg form is
        # exact parity; the 1-arg form uses the GROUP's own min/max —
        # DuckDB 1.0 reads table-segment statistics there (bounds that
        # ignore WHERE filters), which is engine-internal and not
        # reproducible. Output width is hi-lo+1, so the collect_set is
        # bounded by the result size itself.
        x = f"CAST({args[0]} AS BIGINT)"
        lo = f"CAST({args[1]} AS BIGINT)" if len(args) == 3 else f"min({x})"
        hi = f"CAST({args[2]} AS BIGINT)" if len(args) == 3 else f"max({x})"
        one = _masked_literal(table, "1")
        zero = _masked_literal(table, "0")
        empty = _masked_literal(table, "")
        return (
            f"concat_ws({empty}, transform(sequence({lo}, {hi}), "
            f"__dd_i -> CASE WHEN array_contains(collect_set({x}), __dd_i) "
            f"THEN {one} ELSE {zero} END))"
        )
    if fn == "epoch" and len(args) == 1:
        # DuckDB epoch() keeps fractional seconds and returns DOUBLE;
        # TIME literals fold to seconds-since-midnight
        folded = _time_epoch_seconds(args[0], table)
        if folded is not None:
            return f"({folded})"
        return (
            f"(unix_micros(CAST({args[0]} AS TIMESTAMP)) / "
            f"CAST(1000000 AS DOUBLE))"
        )
    if fn == "to_timestamp" and len(args) == 1:
        # DuckDB: seconds-since-epoch (DOUBLE) → TIMESTAMPTZ; collected
        # naive, so NTZ matches. (String input is invalid in DuckDB.)
        return f"CAST(timestamp_seconds({args[0]}) AS TIMESTAMP_NTZ)"
    if fn in _TO_INTERVAL_UNIT and len(args) == 1:
        # DuckDB interval constructors (to_days(n), to_years(n), …) →
        # the make_dt_interval / make_ym_interval equivalents; year/month
        # forms stay calendar-aware in arithmetic
        unit = _TO_INTERVAL_UNIT[fn]
        if unit in _DYN_INTERVAL_UNITS:
            return _DYN_INTERVAL_UNITS[unit].format(e=args[0])
        return f"make_ym_interval({_TO_YM_SCALE[fn]} * ({args[0]}))"
    if fn == "age" and len(args) in (1, 2):
        # DuckDB/Postgres age(): year/month/day interval breakdown with
        # borrow-from-the-start-month; dd_age_seconds replays DuckDB's
        # algorithm AND its client 30-day-month flattening (probed on
        # live 1.0), returned as a day-time interval
        a = args[0]
        b = args[1] if len(args) == 2 else None
        if b is None:
            a, b = "current_date()", a
        return (
            f"make_dt_interval(0, 0, 0, dd_age_seconds("
            f"CAST({a} AS TIMESTAMP_NTZ), CAST({b} AS TIMESTAMP_NTZ)))"
        )
    if (
        fn == "element_at"
        and len(args) == 2
        and re.match(r"(?i)^map\s*[({]", args[0].strip())
    ):
        # DuckDB element_at(map, k) returns the LIST of matches (its
        # map_extract shape — [] for a missing key); literal maps only —
        # typed columns keep Spark's scalar element_at
        return (
            f"transform(filter(map_entries({args[0]}), "
            f"__dd_e -> __dd_e.key = ({args[1]})), "
            f"__dd_e -> __dd_e.value)"
        )
    if fn in ("list_sort", "array_sort") and len(args) in (2, 3):
        # direction/null-order string args; DuckDB defaults NULLS LAST
        direc = (_literal_value(_unmask(args[1], table)) or "").upper()
        nulls = (
            (_literal_value(_unmask(args[2], table)) or "").upper()
            if len(args) == 3
            else "NULLS LAST"
        )
        l = args[0]
        if direc == "ASC":
            return f"sort_array({l})" if nulls == "NULLS FIRST" else f"array_sort({l})"
        if direc == "DESC":
            return (
                f"reverse(array_sort({l}))"
                if nulls == "NULLS FIRST"
                else f"sort_array({l}, false)"
            )
        return None
    if fn == "from_json" and len(args) == 2:
        spec_text = _literal_value(_unmask(args[1], table))
        if spec_text is None:
            return None
        import json as _json

        try:
            spec = _json.loads(spec_text.replace("\\\\", "\\"))
        except ValueError:
            return None
        ddl = _duck_json_spec_to_ddl(spec)
        lit = _masked_literal(table, ddl)
        return f"from_json({args[0]}, {lit})"
    if fn in (
        "like_escape", "not_like_escape", "ilike_escape", "not_ilike_escape"
    ) and len(args) == 3:
        s_, p_, e_ = args
        if fn.endswith("ilike_escape"):
            expr = f"(lower({s_}) LIKE lower({p_}) ESCAPE {e_})"
        else:
            expr = f"({s_} LIKE {p_} ESCAPE {e_})"
        return f"(NOT {expr})" if fn.startswith("not_") else expr
    if fn == "json_group_array" and len(args) == 1:
        # list(…) keeps DuckDB's ORDER BY-inside-aggregate support (the
        # ordered-agg rewrite runs later and the name renames to
        # collect_list); insertion order without ORDER BY is engine-
        # specific in both systems
        return f"to_json(list({args[0]}))"
    if fn == "json_group_object" and len(args) == 2:
        return (
            f"to_json(map_from_entries(list(struct({args[0]}, {args[1]}))))"
        )
    if fn == "array_length" and len(args) == 2:
        if args[1].strip() != "1":
            raise ValueError("array_length: only dimension 1 is supported")
        return f"size({args[0]})"
    if (
        fn == "regexp_extract"
        and len(args) == 3
        and (names := _arg_list_items(args[2])) is not None
    ):
        # named-group list form → struct of the capture groups
        pairs = []
        for i, ph in enumerate(names):
            ph = ph.strip()
            if _literal_value(_unmask(ph, table)) is None:
                return None
            pairs.append(
                f"{ph}, regexp_extract({args[0]}, {args[1]}, {i + 1})"
            )
        return "named_struct(" + ", ".join(pairs) + ")"
    if fn == "json_quote" and len(args) == 1:
        a = args[0].strip()
        if re.fullmatch(r"\x00\d+\x00", a):
            return f"dd_json_quote({a})"  # string value → quoted JSON
        if re.fullmatch(r"-?\d+(\.\d+)?", a):
            return _masked_literal(table, a)  # numeric → its JSON text
        return None  # typed columns need type context — fail closed
    if fn == "chr" and len(args) == 1:
        # DuckDB chr() takes a Unicode CODE POINT; Spark's chr is
        # mod-256 Latin-1 — silent mojibake beyond 255. Java's %c
        # formats a code point.
        return f"format_string('%c', CAST({args[0]} AS INT))"
    if fn == "bar" and len(args) in (3, 4):
        w = args[3] if len(args) == 4 else "80"
        return f"dd_bar({args[0]}, {args[1]}, {args[2]}, {w})"
    if fn in ("list_prepend", "array_prepend") and len(args) == 2:
        # DuckDB: (elem, list); Spark: (array, elem)
        return f"array_prepend({args[1]}, {args[0]})"
    if fn == "array_push_front" and len(args) == 2:
        return f"array_prepend({args[0]}, {args[1]})"
    if fn == "typeof" and len(args) == 1:
        return f"dd_typeof_name(typeof({args[0]}))"
    if fn == "version" and not args:
        lit = _masked_literal(table, "v1.0.0")
        return lit
    if fn == "txid_current" and not args:
        # serving is read-only single-transaction (the reference's
        # DoAction transactions are Unimplemented, main.go:121-124)
        return "CAST(0 AS BIGINT)"
    if fn == "bit_count" and len(args) == 1:
        # DuckDB counts bits within the VALUE'S OWN type width; Spark
        # promotes to 64-bit. Mask explicit narrow casts and plain
        # integer literals (DuckDB types those INTEGER); other shapes
        # keep Spark's 64-bit reading.
        a = args[0].strip()
        widths = {
            "tinyint": 0xFF, "int1": 0xFF,
            "smallint": 0xFFFF, "int2": 0xFFFF, "short": 0xFFFF,
            "integer": 0xFFFFFFFF, "int": 0xFFFFFFFF, "int4": 0xFFFFFFFF,
            "signed": 0xFFFFFFFF,
        }
        cm = re.fullmatch(
            r"(?is)CAST\s*\(.*\s+AS\s+(\w+)\s*\)", a
        ) or re.fullmatch(r"(?is).*::\s*(\w+)", a)
        if cm and cm.group(1).lower() in widths:
            return f"bit_count(({a}) & {widths[cm.group(1).lower()]})"
        if re.fullmatch(r"-?\d+", a) and abs(int(a)) <= 2**31 - 1:
            return f"bit_count(({a}) & {0xFFFFFFFF})"
        return None
    if fn == "list_distinct" and len(args) == 1:
        # DuckDB dedups AND drops NULLs; its element order is internal
        # hash order, so only the value SET is contractual
        return f"array_distinct(filter({args[0]}, __dd_x -> __dd_x IS NOT NULL))"
    if fn in ("strptime", "try_strptime") and len(args) == 2:
        fmt = _literal_value(_unmask(args[1], table))
        if fmt is None:
            raise ValueError("strptime needs a literal format")
        lit = _masked_literal(table, _strftime_to_java(fmt))
        spark_fn = "try_to_timestamp" if fn.startswith("try") else "to_timestamp"
        return f"{spark_fn}({args[0]}, {lit})"
    if fn == "struct_extract" and len(args) == 2:
        key = _literal_value(_unmask(args[1], table))
        if key is None:
            return None
        return f"({args[0]}).`" + key.replace("`", "``") + "`"
    if fn == "current_schema" and not args:
        return _masked_literal(table, "main")
    if fn == "current_database" and not args:
        return _masked_literal(table, "memory")
    if fn == "kurtosis_pop" and len(args) == 1:
        # DuckDB's population excess kurtosis IS Spark's native kurtosis
        # (the replacement is never rescanned, so the sample-correction
        # arm below cannot re-fire on it)
        return f"kurtosis({args[0]})"
    if fn == "sem" and len(args) == 1:
        # standard error of the mean — probed: DuckDB uses the
        # POPULATION stddev over sqrt(n) (ratio test at n=1500)
        return f"(stddev_pop({args[0]}) / sqrt(count({args[0]})))"
    if fn == "kurtosis" and len(args) == 1:
        # DuckDB reports SAMPLE excess kurtosis; Spark's is population.
        # Exact single-pass combination (equal up to float ulp):
        # g2* = (n-1)/((n-2)(n-3)) · ((n+1)·g2 + 6); the nullif keeps
        # n ≤ 3 at NULL (DuckDB) instead of an ANSI division error
        e = args[0]
        n = f"count({e})"
        return (
            f"((({n} - 1) / nullif(({n} - 2) * ({n} - 3), 0)) * "
            f"(({n} + 1) * kurtosis({e}) + 6))"
        )
    if fn == "skewness" and len(args) == 1:
        # DuckDB reports SAMPLE skewness G1 = g1 · √(n(n-1)) / (n-2);
        # Spark's skewness is the population g1 — a silent value
        # divergence at every n. NULL for n < 3, like DuckDB.
        e = args[0]
        n = f"count({e})"
        return (
            f"(skewness({e}) * sqrt({n} * ({n} - 1.0)) / "
            f"nullif({n} - 2.0, 0.0))"
        )
    if fn == "histogram" and len(args) == 1:
        e = args[0]
        return (
            f"map_from_entries(transform("
            f"array_sort(array_distinct(collect_list({e}))), "
            f"x -> struct(x, CAST(size(filter(collect_list({e}), "
            f"y -> y = x)) AS BIGINT))))"
        )
    if fn in ("quantile_disc", "quantile") and len(args) == 2:
        x, p = args
        disc = (
            f"element_at(array_sort(collect_list({x})), "
            f"CAST(greatest(1, ceil((%s) * size(collect_list({x})))) AS INT))"
        )
        if p.lstrip().startswith(("[", "array")):
            # list form: one sorted collect, one element pick per p
            return (
                f"transform({p}, __dd_p -> " + (disc % "__dd_p") + ")"
            )
        return disc % f"({p})"
    if fn == "list_count" and len(args) == 1:
        # DuckDB: non-NULL element count
        return f"size(filter({args[0]}, __dd_x -> __dd_x IS NOT NULL))"
    if fn == "setseed" and len(args) == 1:
        # engine-RNG seeding is a session no-op here (sampling queries
        # use the portable md5 draw, never engine RNG)
        return "CAST(NULL AS STRING)"
    if fn == "format" and args:
        fmt = _literal_value(_unmask(args[0], table))
        if fmt is None:
            raise ValueError("format() needs a literal format string")
        printf, casts = _fmt_to_printf(fmt)
        lit = _masked_literal(table, printf)
        vals = [
            f"CAST({a} AS {c})" if c else a
            for a, c in zip(args[1:], casts)
        ] + list(args[1 + len(casts) :])
        rest = ", ".join(vals)
        return f"format_string({lit}{', ' + rest if rest else ''})"
    if fn in ("list_reverse_sort", "array_reverse_sort") and len(args) == 1:
        # DuckDB default is DESC NULLS LAST: reverse of ASC NULLS FIRST
        # (array_sort would put NULLs last pre-reverse → NULLs FIRST)
        return f"reverse(sort_array({args[0]}))"
    if fn in ("date_trunc", "datetrunc") and len(args) == 2:
        part = (_literal_value(_unmask(args[0], table)) or "").lower()
        if part in ("year", "quarter", "month", "week", "day", "decade",
                    "century", "millennium", "yearweek", "isoyear"):
            # DuckDB returns DATE for date-granular truncation (even on
            # TIMESTAMP input); Spark always returns TIMESTAMP
            return f"CAST(date_trunc({args[0]}, {args[1]}) AS DATE)"
        return None
    if fn == "encode" and len(args) == 1:
        return f"CAST({args[0]} AS BINARY)"   # DuckDB: VARCHAR → BLOB
    if fn == "decode" and len(args) == 1:
        return f"CAST({args[0]} AS STRING)"   # DuckDB: BLOB → VARCHAR
        # (decode is strict UTF-8; the \xHH-escaped rendering belongs to
        # CAST(blob AS VARCHAR), handled via the binary column kind)
    if fn == "isodow" and len(args) == 1:
        lit = _masked_literal(table, "DAYOFWEEK_ISO")
        return f"date_part({lit}, {args[0]})"
    if fn == "today" and not (args and args[0].strip()):
        return "current_date()"
    if fn in ("timezone_hour", "timezone_minute") and len(args) == 1:
        # the session is UTC-pinned (X122): every instant's offset is 0
        return "CAST(0 AS BIGINT)"
    if fn == "date_add" and len(args) == 2 and re.match(
        r"(?i)\s*(INTERVAL\b|to_(?:year|month|week|day|hour|minute|"
        r"second|milli|micro|decade|centur|millenni))", args[1]
    ):
        # DuckDB's date_add(date, INTERVAL) collides with Spark's
        # (date, int-days); re-spell as arithmetic so the DATE ± INTERVAL
        # typing rewrite applies
        return f"(CAST({args[0]} AS TIMESTAMP) + {args[1]})"
    if fn == "current_schemas" and len(args) == 1:
        # DuckDB 1.0's literal answer for its default search path
        return (
            f"CASE WHEN ({args[0]}) THEN "
            f"array('main', 'main', 'main', 'pg_catalog') "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
    if fn == "md5_number_lower" and len(args) == 1:
        return f"dd_md5_u64(md5({args[0]}), 17)"
    if fn == "md5_number_upper" and len(args) == 1:
        return f"dd_md5_u64(md5({args[0]}), 1)"
    if fn == "json_type" and len(args) in (1, 2):
        inner = (
            args[0]
            if len(args) == 1
            else f"dd_json_extract({args[0]}, {args[1]})"
        )
        return f"dd_json_type({inner})"
    if fn == "json_contains" and len(args) == 2:
        return f"dd_json_contains({args[0]}, {args[1]})"
    if fn in ("json_array", "json_object"):
        # serialize each argument AS ITS OWN TYPE: to_json needs a
        # container, so wrap in a 1-element array and strip brackets
        def _jval(a: str) -> str:
            return (
                f"substr(to_json(array({a})), 2, "
                f"length(to_json(array({a}))) - 2)"
            )

        # punctuation as MASKED literals — raw quotes in emitted text
        # would be re-parsed by the list/struct-literal rewrites
        lb, rb = _masked_literal(table, "["), _masked_literal(table, "]")
        comma = _masked_literal(table, ",")
        if fn == "json_array":
            if not args or (len(args) == 1 and not args[0].strip()):
                return _masked_literal(table, "[]")
            return (
                f"concat({lb}, concat_ws({comma}, "
                + ", ".join(_jval(a) for a in args)
                + f"), {rb})"
            )
        if len(args) % 2:
            raise ValueError("json_object expects key/value pairs")
        colon = _masked_literal(table, ":")
        pairs = [
            f"concat({_jval(args[i])}, {colon}, {_jval(args[i + 1])})"
            for i in range(0, len(args), 2)
        ]
        lc, rc = _masked_literal(table, "{"), _masked_literal(table, "}")
        return (
            f"concat({lc}, concat_ws({comma}, "
            + ", ".join(pairs)
            + f"), {rc})"
        )
    if fn == "sha256" and len(args) == 1:
        return f"sha2({args[0]}, 256)"
    if fn in ("left", "right") and len(args) == 2:
        e, n = args
        neg = n.lstrip().startswith("-") or not re.fullmatch(r"\d+", n.strip())
        if not neg:
            return None  # literal non-negative count — native
        if fn == "left":
            # DuckDB: negative count drops that many from the END
            return (
                f"(CASE WHEN ({n}) < 0 THEN substr({e}, 1, "
                f"greatest(0, length({e}) + ({n}))) "
                f"ELSE left({e}, {n}) END)"
            )
        return (
            f"(CASE WHEN ({n}) < 0 THEN substr({e}, 1 - ({n})) "
            f"ELSE right({e}, {n}) END)"
        )
    if fn in ("dayname", "monthname") and len(args) == 1:
        lit = _masked_literal(table, "EEEE" if fn == "dayname" else "MMMM")
        return f"date_format({args[0]}, {lit})"
    if fn == "geomean" and len(args) == 1:
        return f"exp(avg(ln({args[0]})))"
    if fn in ("fsum", "sumkahan", "kahan_sum", "favg") and len(args) == 1:
        # DuckDB's Kahan/Neumaier-compensated sums return the correctly-
        # rounded DOUBLE. A DECIMAL(38,15) accumulation is exact to
        # 1e-15 — far inside double spacing at any representable sum —
        # so the final cast lands on the identical double.
        acc = f"CAST(sum(CAST({args[0]} AS DECIMAL(38,15))) AS DOUBLE)"
        if fn == "favg":
            # DuckDB finalizes favg as (compensated double sum) / n —
            # the division itself is double arithmetic
            return f"({acc} / count({args[0]}))"
        return acc
    if len(args) == 2 and fn in ("divide", "multiply", "add", "subtract"):
        op = {"divide": "//", "multiply": "*", "add": "+", "subtract": "-"}[fn]
        return f"(({args[0]}) {op} ({args[1]}))"
    # ---- list_* conveniences with no 1:1 Spark spelling ----
    if fn in ("list_sum", "list_avg") and len(args) == 1:
        # element-typed sum: zero-of-type init (first - first) keeps int
        # lists integer, matching DuckDB; NULL elements are ignored.
        # DECIMAL-literal lists fail closed (Spark's aggregate() cannot
        # type a growing-precision fold; DuckDB would return a Decimal
        # that can never repr-match anyway)
        nn = f"filter({args[0]}, x -> x IS NOT NULL)"
        zero = f"(try_element_at({nn}, 1) - try_element_at({nn}, 1))"
        total = f"aggregate({nn}, {zero}, (s, x) -> s + x)"
        if fn == "list_sum":
            return total
        return f"(CAST({total} AS DOUBLE) / size({nn}))"
    if fn == "list_any_value" and len(args) == 1:
        return f"try_element_at(filter({args[0]}, x -> x IS NOT NULL), 1)"
    if fn == "list_has_all" and len(args) == 2:
        # DuckDB IGNORES NULL elements in the needle list and never
        # matches on NULL (probed: list_has_all([1],[NULL]) = true,
        # list_has_all([1,NULL],[2]) = false); a NULL list argument
        # propagates NULL. Set algebra (array_except over the
        # NULL-compacted needle) rather than a lambda so untyped
        # ARRAY<NULL> literals coerce instead of failing analysis —
        # the old forall/array_contains form also returned NULL for
        # needle-NULL cases, a silent divergence.
        hay, needle = args
        if hay.strip().upper() == "NULL" or needle.strip().upper() == "NULL":
            return "CAST(NULL AS BOOLEAN)"
        return (
            f"CASE WHEN ({hay}) IS NULL OR ({needle}) IS NULL THEN NULL "
            f"ELSE size(array_except(array_compact({needle}), {hay})) = 0 "
            "END"
        )
    if fn == "list_has_any" and len(args) == 2:
        # same ignore-NULL-elements contract; empty overlap is false
        a0, a1 = args
        if a0.strip().upper() == "NULL" or a1.strip().upper() == "NULL":
            return "CAST(NULL AS BOOLEAN)"
        return (
            f"CASE WHEN ({a0}) IS NULL OR ({a1}) IS NULL THEN NULL "
            f"ELSE coalesce(arrays_overlap(array_compact({a0}), "
            f"array_compact({a1})), false) END"
        )
    if fn == "list_select" and len(args) == 2:
        return (
            f"transform({args[1]}, i -> "
            f"try_element_at({args[0]}, CAST(i AS INT)))"
        )
    if fn == "list_where" and len(args) == 2:
        return (
            f"transform(filter(zip_with({args[0]}, {args[1]}, "
            f"(x, m) -> struct(x, m)), p -> p.m), p -> p.x)"
        )
    if fn == "list_grade_up" and len(args) == 1:
        lst = args[0]
        return (
            f"transform(array_sort(zip_with({lst}, "
            f"sequence(1, size({lst})), (x, i) -> struct(x, i))), p -> p.i)"
        )
    if fn == "list_resize" and len(args) in (2, 3):
        lst, n = args[0], args[1]
        fill = args[2] if len(args) == 3 else "NULL"
        return (
            f"slice(transform(sequence(1, greatest({n}, 1)), i -> "
            f"CASE WHEN i <= size({lst}) THEN element_at({lst}, i) "
            f"ELSE {fill} END), 1, {n})"
        )
    if fn in ("list_dot_product", "list_inner_product", "array_dot_product",
          "array_inner_product") and len(args) == 2:
        return (
            f"aggregate(zip_with({args[0]}, {args[1]}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (s, v) -> s + v)"
        )
    if fn in ("list_cosine_similarity", "array_cosine_similarity") and len(args) == 2:
        a, b = args
        dot = (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), CAST(0 AS DOUBLE), (s, v) -> s + v)"
        )
        def norm(v: str) -> str:
            return (
                f"sqrt(aggregate({v}, CAST(0 AS DOUBLE), "
                f"(s, x) -> s + CAST(x AS DOUBLE) * x))"
            )
        return f"({dot} / ({norm(a)} * {norm(b)}))"
    if fn in ("list_distance", "array_distance") and len(args) == 2:
        return (
            f"sqrt(aggregate(zip_with({args[0]}, {args[1]}, (x, y) -> "
            f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            f"CAST(0 AS DOUBLE), (s, v) -> s + v))"
        )
    # ---- top-n aggregate forms (DuckDB max/min/arg_max with a count) ----
    if fn in ("max", "min") and len(args) == 2:
        sorted_ = f"array_sort(collect_list({args[0]}))"
        if fn == "max":
            sorted_ = f"reverse({sorted_})"
        return f"slice({sorted_}, 1, {args[1]})"
    if fn in ("max_by", "min_by", "arg_max", "arg_min") and len(args) == 3:
        x, y, n = args
        sorted_ = f"array_sort(collect_list(struct({y} AS k, {x} AS v)))"
        if fn in ("max_by", "arg_max"):
            sorted_ = f"reverse({sorted_})"
        return f"transform(slice({sorted_}, 1, {n}), p -> p.v)"
    if fn == "json" and len(args) == 1:
        return f"dd_json_canon({args[0]})"
    if fn == "unnest" and len(args) == 1 and re.match(
        r"(?i)\s*(named_struct|struct)\s*\(", args[0]
    ):
        # unnest(STRUCT) expands the fields into columns — Spark's
        # inline over a one-element array is the exact shape
        return f"inline(array({args[0]}))"
    if fn == "unnest" and len(args) == 2:
        om = re.match(r"(?i)(recursive|max_depth)\s*:=", args[1].strip())
        if not om:
            return None
        arg = args[0]
        if re.match(r"(?i)\s*named_struct\s*\(", arg):
            # a struct literal: flatten nested structs to their leaf
            # fields (DuckDB keeps the leaf names), then expand
            return f"inline(array({_flatten_named_struct(arg)}))"
        if "named_struct(" in arg:
            # array<struct> recursively unnests into one column per field
            return f"inline({arg})"
        if arg.lstrip().startswith("[["):
            return f"explode(flatten({arg}))"  # one nesting level
        raise ValueError(
            "unnest(recursive := true) is supported for struct and "
            "struct-array and nested-list literals"
        )
    return None


_TEMPLATE_RE = re.compile(
    r"\b(to_base|list_reduce|date_sub|datesub|datepart|date_part|epoch|"
    r"list_extract|array_extract|list_contains|list_has|array_has|"
    r"list_concat|list_cat|array_concat|flatten|dayofweek|weekday|"
    r"printf|sign|substr|substring|"
    r"json_extract|json_extract_path|json_extract_string|"
    r"json_array_length|"
    r"to_timestamp|strptime|try_strptime|list_distinct|list_prepend|array_prepend|array_push_front|typeof|version|txid_current|bit_count|chr|bar|struct_extract|current_schema|"
    r"current_database|kurtosis|histogram|quantile_disc|quantile|format|"
    r"list_reverse_sort|array_reverse_sort|dayname|monthname|geomean|"
    r"divide|multiply|add|"
    r"subtract|fsum|sumkahan|kahan_sum|favg|skewness|bitstring_agg|"
    r"kurtosis_pop|sem|"
    r"date_trunc|datetrunc|json_quote|"
    r"encode|decode|sha256|left|right|unnest|isodow|current_schemas|"
    r"md5_number_lower|md5_number_upper|list_count|setseed|"
    r"json_type|json_contains|json_array|json_object|today|"
    r"timezone_hour|timezone_minute|date_add|"
    r"list_sum|list_avg|list_any_value|"
    r"list_has_all|list_has_any|list_select|list_where|list_grade_up|list_resize|"
    r"list_dot_product|list_inner_product|list_cosine_similarity|"
    r"array_dot_product|array_inner_product|array_cosine_similarity|"
    r"array_distance|list_sort|from_json|json_group_array|json_group_object|"
    r"like_escape|not_like_escape|ilike_escape|not_ilike_escape|"
    r"list_distance|max|min|max_by|min_by|arg_max|arg_min|json|"
    r"age|array_length|regexp_extract|element_at|log|yearweek|isoyear|"
    r"julian|era|century|millennium|decade|epoch_ms|epoch_us|epoch_ns|"
    r"parse_filename|parse_dirpath|parse_dirname|parse_path|"
    r"bin|to_binary|make_time|make_timestamp|"
    r"timezone|string_agg|group_concat|regexp_matches|"
    r"struct_insert|bitstring|get_bit|set_bit|bit_position|"
    r"to_years|to_months|to_decades|to_centuries|to_millennia|to_weeks|"
    r"to_days|to_hours|to_minutes|to_seconds|to_milliseconds|"
    r"to_microseconds)\s*\(",
    re.IGNORECASE,
)


_DATE_OPERAND = (
    r"(?:DATE\s+\x00\d+\x00"                       # DATE '...' literal
    r"|(?:\x00\d+\x00|[A-Za-z_][\w.]*)\s*::\s*DATE\b"  # expr::DATE cast
    r"|CAST\s*\(\s*\x00\d+\x00\s+AS\s+DATE\s*\)"   # CAST(lit AS DATE)
    r"|[A-Za-z_][\w.]*)"
)
_DATE_MINUS_RE = re.compile(
    rf"({_DATE_OPERAND})\s*-\s*({_DATE_OPERAND})", re.IGNORECASE
)
_DATE_PLUS_IVAL_RE = re.compile(
    rf"({_DATE_OPERAND})\s*([+-])\s*"
    r"(INTERVAL\s+(?:\x00\d+\x00|\d+)(?:\s+[A-Za-z]+)?"
    r"|INTERVAL\s*\("
    r"|make_dt_interval\s*\(|make_ym_interval\s*\()",
    re.IGNORECASE,
)


def _is_date_operand(tok: str, kinds: dict[str, str] | None) -> bool:
    if re.match(r"(?i)DATE\s", tok):
        return True
    if re.search(r"(?i)::\s*DATE\s*$", tok) or re.match(r"(?i)CAST\s*\(", tok):
        return True
    return bool(kinds) and kinds.get(tok.split(".")[-1].lower()) == "date"


def _rewrite_date_arith(s: str, kinds: dict[str, str] | None) -> str:
    """DuckDB's date arithmetic differs from Spark's in RESULT TYPE:
    DATE - DATE is a BIGINT day count (Spark: interval), and
    DATE + INTERVAL is a TIMESTAMP (Spark: date). Rewrites fire only
    when operands are provably dates — DATE literals or columns whose
    catalog type is DateType — so ordinary numeric subtraction is
    untouched."""
    pos = 0
    while m := _DATE_MINUS_RE.search(s, pos):
        a, b = m.group(1), m.group(2)
        if _is_date_operand(a, kinds) and _is_date_operand(b, kinds):
            repl = f"datediff({a}, {b})"
            s = s[: m.start()] + repl + s[m.end() :]
            pos = m.start() + len(repl)
        else:
            pos = m.start() + len(a) + 1
    pos = 0
    while m := _DATE_PLUS_IVAL_RE.search(s, pos):
        a, op, ival = m.group(1), m.group(2), m.group(3)
        end = m.end()
        if ival.endswith("("):
            # a paren form — INTERVAL (expr) UNIT or a to_*(…) call:
            # take the full call, and for INTERVAL also the unit word
            close = _matching_paren(s, end - 1)
            ival = s[m.start(3) : close + 1]
            end = close + 1
            if ival.upper().startswith("INTERVAL"):
                um = re.match(r"\s*[A-Za-z]+", s[end:])
                if not um:
                    pos = end
                    continue
                ival += s[end : end + um.end()]
                end += um.end()
        if _is_date_operand(a, kinds):
            # DuckDB: DATE ± INTERVAL is a TIMESTAMP (Spark keeps DATE)
            repl = f"CAST({a} {op} {ival} AS TIMESTAMP)"
            s = s[: m.start()] + repl + s[end:]
            pos = m.start() + len(repl)
        else:
            pos = end
    return s


_HASH_CALL_RE = re.compile(r"(?<![\w.])hash\s*\(", re.IGNORECASE)
# DuckDB hashes every sub-32-bit integer at its 32-bit unsigned promotion
# (probed live: hash(CAST(-7 AS SMALLINT)) == hash(CAST(-7 AS INTEGER))),
# so SMALLINT/TINYINT mask at 32 bits, not their storage width.
_HASH_INT_WIDTH = {"bigint": 64, "int": 32, "smallint": 32, "tinyint": 32}


def _hash_operand(arg: str, table: list[str],
                  kinds: dict[str, str] | None):
    """One hash() operand → ('lit', digits) folded at rewrite time, or
    ('expr', sql) producing the digit string at run time. None when the
    operand's DuckDB type cannot be proven (caller fails closed)."""
    a = arg.strip()
    up = a.upper()
    if up == "NULL":
        return ("lit", str(_DD_NULL_HASH))
    if up in ("TRUE", "FALSE"):
        return ("lit", str(_dd_murmur_fin(1 if up == "TRUE" else 0)))
    if re.fullmatch(r"\x00\d+\x00", a):  # string literal
        lit = _literal_value(_unmask(a, table))
        if lit is None:
            return None
        return ("lit", str(_dd_murmur64a(str(lit).encode())))
    if m := re.fullmatch(r"(?is)DATE\s+(\x00\d+\x00)", a):
        lit = _literal_value(_unmask(m.group(1), table))
        try:
            days = (_dt.date.fromisoformat(str(lit)) - _dt.date(1970, 1, 1)).days
        except (TypeError, ValueError):
            return None
        return ("lit", str(_dd_murmur_fin(days & 0xFFFFFFFF)))
    if m := re.fullmatch(r"(?is)TIMESTAMP\s+(\x00\d+\x00)", a):
        lit = _literal_value(_unmask(m.group(1), table))
        try:
            ts = _dt.datetime.fromisoformat(str(lit))
        except (TypeError, ValueError):
            return None
        micros = (ts - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
        return ("lit", str(_dd_murmur_fin(micros)))
    if re.fullmatch(r"[+-]?\d+", a):  # integer literal at DuckDB's width
        v = int(a)
        width = 32 if -(1 << 31) <= v < (1 << 31) else 64
        return ("lit", str(_dd_murmur_fin(v & ((1 << width) - 1))))
    if re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+", a):
        # scientific notation is a DOUBLE literal: hash the IEEE bits
        import struct as _struct

        bits = _struct.unpack("<Q", _struct.pack("<d", float(a)))[0]
        return ("lit", str(_dd_murmur_fin(bits)))
    if m := re.fullmatch(r"([+-]?)(\d*)\.(\d*)", a):  # decimal literal
        if not (m.group(2) or m.group(3)):
            return None
        # DuckDB's literal precision counts the WRITTEN digits (leading
        # zeros included: '-0.000000001' is DECIMAL(10,9) -> int64
        # storage; '-00.5' is DECIMAL(3,1)). Storage int16/int32 hash at
        # their 32-bit promotion; int64 at 64; int128 (precision > 18)
        # fails closed. Probed live against DuckDB (test battery 31).
        precision = len(m.group(2)) + len(m.group(3))
        if precision > 18:
            return None
        digits = (m.group(2) + m.group(3)) or "0"
        v = int(digits) * (-1 if m.group(1) == "-" else 1)
        width = 32 if precision <= 9 else 64
        return ("lit", str(_dd_murmur_fin(v & ((1 << width) - 1))))
    if re.fullmatch(r"[A-Za-z_][\w.]*", a) and kinds:
        k = kinds.get(a.split(".")[-1].lower())
        if k in ("string", "binary"):
            return ("expr", f"dd_hash_str({a})")
        if k in _HASH_INT_WIDTH:
            w = _HASH_INT_WIDTH[k]
            inner = (f"CAST({a} AS BIGINT)" if w == 64
                     else f"CAST({a} AS BIGINT) & {(1 << w) - 1}")
            return ("expr", f"dd_hash_u64(CAST({inner} AS STRING))")
        if k == "boolean":
            return ("expr", f"dd_hash_u64(CAST(CAST({a} AS BIGINT) AS STRING))")
        if k == "date":
            return ("expr", "dd_hash_u64(CAST(CAST(unix_date("
                            f"{a}) AS BIGINT) & 4294967295 AS STRING))")
        if k == "timestamp":
            # NTZ columns cast through the UTC-pinned session (identity)
            return ("expr", "dd_hash_u64(CAST(unix_micros(CAST("
                            f"{a} AS TIMESTAMP)) AS STRING))")
        if k == "double":
            return ("expr", f"dd_hash_dbl({a}, {a} IS NULL)")
    return None


def _rewrite_hash(s: str, table: list[str],
                  kinds: dict[str, str] | None) -> str:
    """DuckDB's ``hash()`` (UBIGINT, its own murmur finalizer per type
    width / MurmurHash64A for strings — NOT Spark's 32-bit Murmur3).
    Literal operands fold at rewrite time; typed columns route through
    the dd_hash_* shims; multi-arg combines left-to-right with DuckDB's
    CombineHash. Unprovable operand types fail closed."""
    pos = 0
    while m := _HASH_CALL_RE.search(s, pos):
        close = _matching_paren(s, m.end() - 1)
        args = _split_top_commas(s[m.end() : close])
        parts = [_hash_operand(x, table, kinds) for x in args if x.strip()]
        if not parts or any(p is None for p in parts):
            raise DialectError(
                "hash(): operand type cannot be proven — literals and "
                "typed columns are supported; cast or alias the operand"
            )
        kind, acc = parts[0]
        for k2, nxt in parts[1:]:
            if kind == "lit" and k2 == "lit":
                acc = str(
                    ((int(acc) * _DD_HASH_COMBINE_K) & _DD_HASH_MASK)
                    ^ int(nxt)
                )
            else:
                lhs = acc if kind == "expr" else _masked_literal(table, acc)
                rhs = nxt if k2 == "expr" else _masked_literal(table, nxt)
                acc = f"dd_hash_combine({lhs}, {rhs})"
                kind = "expr"
        final = acc if kind == "expr" else _masked_literal(table, acc)
        repl = f"CAST({final} AS DECIMAL(20, 0))"
        s = s[: m.start()] + repl + s[close + 1 :]
        pos = m.start() + len(repl)
    return s


_COLLATE_RE = re.compile(r"\s+COLLATE\s+([A-Za-z_][\w.]*)", re.IGNORECASE)
def _collate_keys() -> dict[str, str]:
    # strip_accents inlines its translate body — Spark rejects SQL UDFs
    # inside Sort expressions, and ORDER BY is a primary COLLATE site
    from duckdb_server_spark.functions.scalar import _ACCENTED, _PLAIN

    return {
        "nocase": "lower({})",
        "noaccent": f"translate({{}}, '{_ACCENTED}', '{_PLAIN}')",
        "nfc": "dd_nfc_normalize({})",
    }
_CMP_OP_RE = re.compile(r"(<=|>=|<>|!=|=|<|>)")


def _collate_key(expr: str, names: str) -> str:
    """Compose the collation key expression for a dotted collation
    spec (``NOCASE.NOACCENT`` applies left to right)."""
    out = expr
    keys = _collate_keys()
    for name in names.split("."):
        tpl = keys.get(name.lower())
        if tpl is None:
            raise ValueError(f"unsupported collation: {name}")
        out = tpl.format(out)
    return out


def _rewrite_collate(s: str, table: list[str]) -> str:
    """Expression-level COLLATE: a collated comparison applies the
    collation key (NOCASE → lower, NOACCENT → strip_accents, NFC) to
    BOTH operands — the value itself is never changed, matching
    DuckDB's compare-under-collation semantics. Outside a comparison,
    only ORDER BY / GROUP BY keys are supported (the key replaces the
    sort key; the projected value is untouched); any other position
    fails closed rather than silently transforming a projected value."""
    while m := _COLLATE_RE.search(s):
        names = m.group(1)
        lstart = _primary_back(s, m.start())
        operand = s[lstart : m.start()].strip()
        if not operand:
            raise ValueError("COLLATE without an operand")
        key = _collate_key(operand, names)
        # comparison on the RIGHT of the collation?
        right = s[m.end() :]
        rm = re.match(r"\s*(<=|>=|<>|!=|=|<|>)\s*", right)
        if rm:
            rop_start = m.end() + rm.end()
            rop_end = _primary_fwd(s, rop_start)
            other = s[rop_start:rop_end].strip()
            repl = f"{key} {rm.group(1)} {_collate_key(other, names)}"
            s = s[:lstart] + repl + s[rop_end:]
            continue
        # comparison on the LEFT of the operand?
        j = lstart - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        lm = re.search(r"(<=|>=|<>|!=|=|<|>)$", s[: j + 1])
        if lm:
            lop_end = lm.start()
            while lop_end > 0 and s[lop_end - 1] in " \t\n":
                lop_end -= 1
            lop_start = _primary_back(s, lop_end)
            other = s[lop_start:lop_end].strip()
            repl = (f"{_collate_key(other, names)} {lm.group(1)} {key}")
            s = s[:lop_start] + repl + s[m.end() :]
            continue
        # ORDER BY / GROUP BY key position: nearest clause keyword
        # before the operand must be ORDER BY / GROUP BY (commas allowed)
        head = s[:lstart]
        km = None
        for km2 in re.finditer(
            r"\b(ORDER\s+BY|GROUP\s+BY|SELECT|WHERE|HAVING|FROM|ON)\b",
            head,
            re.IGNORECASE,
        ):
            km = km2
        if km and km.group(1).upper().replace(" ", "")[:7] in (
            "ORDERBY",
            "GROUPBY",
        ):
            s = s[:lstart] + key + s[m.end() :]
            continue
        raise DialectError(
            "COLLATE is supported in comparisons and ORDER BY/GROUP BY "
            "keys; other positions would change the projected value"
        )
    return s


_SIMILAR_TO_RE = re.compile(
    r"\b(NOT\s+)?SIMILAR\s+TO\s+(\x00\d+\x00)", re.IGNORECASE
)
# postfix factorial: a number/identifier followed by ! (not != / !~)
_POSTFIX_FACT_RE = re.compile(r"\b([A-Za-z_]\w*|\d+)\s*!(?![=~])")


def _rewrite_similar_to(s: str, table: list[str]) -> str:
    """``x [NOT] SIMILAR TO 'pat'`` → ``x [NOT] RLIKE '^(?:pat)$'`` —
    DuckDB's SIMILAR TO is a full-match POSIX regex, not SQL92
    wildcards. Literal patterns only (fail closed otherwise)."""
    while m := _SIMILAR_TO_RE.search(s):
        pat = _literal_value(_unmask(m.group(2), table))
        if pat is None:
            raise ValueError("SIMILAR TO requires a literal pattern")
        lit = _masked_literal(table, f"^(?:{pat})$")
        neg = "NOT " if m.group(1) else ""
        s = s[: m.start()] + f"{neg}RLIKE {lit}" + s[m.end() :]
    if re.search(r"\bSIMILAR\s+TO\b", s, re.IGNORECASE):
        raise ValueError("SIMILAR TO requires a literal pattern")
    return s


_POWER_OP_RE = re.compile(r"\*\*|\^")


def _rewrite_power(s: str) -> str:
    """DuckDB's ``^`` and ``**`` are EXPONENTIATION (XOR is the xor()
    function); Spark's ``^`` is bitwise XOR — without this rewrite
    ``2 ^ 3`` silently returns 1. Left-associative, matching DuckDB.
    The ``^@`` starts-with operator resolves FIRST (its ^ is not a
    power)."""
    while m := re.search(r"\^@", s):
        i = m.start()
        j = i - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        start = _primary_back(s, j + 1)
        left = s[start : j + 1]
        r_end = _primary_end(s, m.end())
        right = s[m.end() : r_end].strip()
        if not left.strip() or not right:
            raise ValueError("cannot parse ^@ starts-with operands")
        s = s[:start] + f"startswith({left}, {right})" + s[r_end:]
    while m := _POWER_OP_RE.search(s):
        i = m.start()
        j = i - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        start = _primary_back(s, j + 1)
        left = s[start : j + 1]
        r_end = _primary_end(s, m.end())
        right = s[m.end() : r_end].strip()
        if not left.strip() or not right:
            raise ValueError("cannot parse ^/** exponentiation operands")
        repl = f"power({left}, {right})"
        s = s[:start] + repl + s[r_end:]
    return s


# PostgreSQL-style operators DuckDB accepts: ~~ LIKE, !~~ NOT LIKE,
# ~~* ILIKE, !~~* NOT ILIKE, ~ full-match regex, !~ negated full-match
_TILDE_REGEX_RE = re.compile(r"(!?)~\s*(\x00\d+\x00)")


def _rewrite_tilde_ops(s: str, table: list[str]) -> str:
    s = re.sub(r"!~~\*", " NOT ILIKE ", s)
    s = re.sub(r"~~\*", " ILIKE ", s)
    s = re.sub(r"!~~", " NOT LIKE ", s)
    s = re.sub(r"~~", " LIKE ", s)
    while m := _TILDE_REGEX_RE.search(s):
        pat = _literal_value(_unmask(m.group(2), table))
        if pat is None:
            break
        lit = _masked_literal(table, f"^(?:{pat})$")
        neg = "NOT " if m.group(1) else ""
        s = s[: m.start()] + f" {neg}RLIKE {lit}" + s[m.end() :]
    return s


# DuckDB JSON extraction operators: ``x -> 'key'`` (JSON result, quoted
# strings) and ``x ->> 'key'`` (text result). '->' is ALSO lambda syntax,
# so the rewrite requires an unambiguous left operand: a string literal,
# a dotted (qualified) identifier, a :: cast, or a paren group that is
# not a lambda parameter list. Bare single identifiers stay untouched
# (fail closed — a lambda param and a JSON column are indistinguishable
# there without type context).
_JSON_ARROW_RE = re.compile(r"(->>|->)\s*(\x00\d+\x00|\d+)")


def _rewrite_json_arrows(s: str, table: list[str]) -> str:
    while m := _JSON_ARROW_RE.search(s):
        op, rhs = m.group(1), m.group(2)
        j = m.start() - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        end = j + 1
        start = _primary_back(s, end)
        left = s[start:end].strip()
        ok = bool(
            re.fullmatch(r"\x00\d+\x00", left)  # string literal
            or re.fullmatch(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)+", left)  # t.col
            or re.search(r"::\s*[A-Za-z_]\w*(\s*\(.*\))?$", left)  # cast
            or (
                left.endswith(")")
                and not re.fullmatch(
                    r"\(\s*[A-Za-z_]\w*(\s*,\s*[A-Za-z_]\w*)*\s*\)", left
                )  # paren group that is not a lambda parameter list
            )
        )
        if not ok:
            break
        fn = "json_extract_string" if op == "->>" else "json_extract"
        # a bare integer rhs is a JSON array index (matching $[n]); a
        # bare key becomes an explicit quoted path so BOTH backends
        # (pandas shim for ->, get_json_object for ->>) resolve it
        if rhs.isdigit():
            path = _masked_literal(table, f"$[{rhs}]")
        else:
            lit = _literal_value(_unmask(rhs, table))
            if lit is None:
                break
            if lit.startswith("$"):
                path = rhs
            elif op == "->>":
                path = _masked_literal(table, f"$['{lit}']")
            else:
                path = _masked_literal(table, f'$."{lit}"')
        # arrows run AFTER _rewrite_templates — route through the same
        # path logic (wildcards, pointers, from-end indexes) explicitly
        repl = _template(fn, [left, path], table)
        if repl is None:
            repl = f"{fn}({left}, {path})"
        s = s[:start] + repl + s[m.end() :]
    return s


_ANY_ALL_RE = re.compile(
    r"(=|<>|!=|<=|>=|<|>)\s*(ANY|SOME|ALL)\s*\(", re.IGNORECASE
)


def _rewrite_any_all(s: str) -> str:
    """Quantified comparisons over subqueries. ``= ANY`` / ``<> ALL``
    map exactly to IN / NOT IN; other operators become correlated
    (NOT) EXISTS — true/false agree with DuckDB everywhere except the
    SQL-standard NULL corner (no match but NULL rows present), where
    EXISTS yields false instead of NULL."""
    while m := _ANY_ALL_RE.search(s):
        op, quant = m.group(1), m.group(2).upper()
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        sub = s[open_idx + 1 : close]
        if not re.match(r"\s*(SELECT|VALUES|WITH)\b", sub, re.IGNORECASE):
            raise ValueError("ANY/ALL is supported over subqueries only")
        if op == "=" and quant in ("ANY", "SOME"):
            s = s[: m.start()] + f" IN ({sub})" + s[close + 1 :]
            continue
        if op in ("<>", "!=") and quant == "ALL":
            s = s[: m.start()] + f" NOT IN ({sub})" + s[close + 1 :]
            continue
        j = m.start() - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        start = _primary_back(s, j + 1)
        left = s[start : j + 1]
        if not left.strip():
            raise ValueError("cannot parse ANY/ALL left operand")
        if quant in ("ANY", "SOME"):
            repl = (
                f"EXISTS (SELECT 1 FROM ({sub}) __dd_q(__v) "
                f"WHERE ({left}) {op} __v)"
            )
        else:
            repl = (
                f"NOT EXISTS (SELECT 1 FROM ({sub}) __dd_q(__v) "
                f"WHERE NOT (({left}) {op} __v))"
            )
        s = s[:start] + repl + s[close + 1 :]
    return s


_IGNORE_NULLS_IN_ARGS_RE = re.compile(
    r"\s+(IGNORE|RESPECT)\s+NULLS\s*\)", re.IGNORECASE
)


def _rewrite_ignore_nulls(s: str) -> str:
    """DuckDB spells null treatment INSIDE the window-function call
    (``first_value(x IGNORE NULLS)``); Spark wants it after the call
    (``first_value(x) IGNORE NULLS``). Pure position move."""
    while m := _IGNORE_NULLS_IN_ARGS_RE.search(s):
        s = s[: m.start()] + f") {m.group(1).upper()} NULLS" + s[m.end() :]
    return s


_WINDOW_CLAUSE_RE = re.compile(r"\bWINDOW\s+", re.IGNORECASE)


def _rewrite_window_chain(s: str) -> str:
    """Named-window chaining: ``WINDOW w1 AS (…), w2 AS (w1 ORDER BY …)``
    — DuckDB lets a definition extend an earlier named window; Spark
    requires self-contained definitions, so references inline."""
    for m in _WINDOW_CLAUSE_RE.finditer(s):
        pos = m.end()
        defs: dict[str, str] = {}
        spans: list[tuple[int, int, str, str]] = []
        while True:
            dm = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s*\(", s[pos:], re.IGNORECASE)
            if not dm:
                break
            name = dm.group(1)
            open_idx = pos + dm.end() - 1
            close = _matching_paren(s, open_idx)
            body = s[open_idx + 1 : close].strip()
            rm = re.match(r"([A-Za-z_]\w*)\b(.*)$", body, re.DOTALL)
            if rm and rm.group(1) in defs:
                body = (defs[rm.group(1)] + " " + rm.group(2).strip()).strip()
            defs[name] = body
            spans.append((open_idx + 1, close, name, body))
            after = re.match(r"\s*,", s[close + 1 :])
            if not after:
                break
            pos = close + 1 + after.end()
        # splice expanded bodies back (reverse order keeps offsets valid)
        for start, end, _name, body in reversed(spans):
            s = s[:start] + body + s[end:]
        break  # one WINDOW clause per statement level is the common case
    return s


# --- battery 8: standard fetch/limit forms, set-returning split ------------

_FETCH_RE = re.compile(
    r"\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY", re.IGNORECASE
)
_OFFSET_ROWS_RE = re.compile(r"\b(OFFSET\s+\d+)\s+ROWS?\b", re.IGNORECASE)
_OFFSET_LIMIT_RE = re.compile(
    r"\b(OFFSET\s+\d+)\s+(LIMIT\s+\d+)\b", re.IGNORECASE
)


def _rewrite_fetch_limit(s: str) -> str:
    """SQL-standard ``OFFSET n ROWS FETCH NEXT m ROWS ONLY`` → Spark's
    ``LIMIT m OFFSET n`` (standard clause order puts OFFSET first; Spark
    only parses LIMIT-then-OFFSET)."""
    s = _FETCH_RE.sub(lambda m: f"LIMIT {m.group(1) or 1}", s)
    s = _OFFSET_ROWS_RE.sub(r"\1", s)
    return _OFFSET_LIMIT_RE.sub(r"\2 \1", s)


_PERCENT_LIMIT_RE = re.compile(
    r"\bLIMIT\s+(\d+(?:\.\d+)?)\s*(?:%|\bPERCENT\b)\s*;?\s*$", re.IGNORECASE
)


def _rewrite_percent_limit(s: str) -> str:
    """DuckDB ``LIMIT p%`` takes the first p percent of the result. The
    row count isn't known at plan time, so the rewrite ranks against a
    windowed total: requires a deterministic top-level ORDER BY (DuckDB
    without one is an arbitrary subset — fail closed, never silently
    pick rows)."""
    m = _PERCENT_LIMIT_RE.search(s)
    if not m:
        return s
    body = s[: m.start()].rstrip()
    om = None
    for cand in re.finditer(r"\bORDER\s+BY\s+", body, re.IGNORECASE):
        head = body[: cand.start()]
        if head.count("(") + head.count("[") == head.count(")") + head.count("]"):
            om = cand
    if om is None:
        raise ValueError("percent LIMIT requires a top-level ORDER BY")
    keys = body[om.end() :].strip()
    if re.fullmatch(r"\d+(\s+(ASC|DESC))?(\s+NULLS\s+(FIRST|LAST))?", keys, re.IGNORECASE):
        raise ValueError("percent LIMIT does not support positional ORDER BY")
    inner = body[: om.start()].rstrip()
    pct = m.group(1)
    return (
        f"SELECT * EXCEPT (__dd_rn, __dd_cnt) FROM ("
        f"SELECT *, row_number() OVER (ORDER BY {keys}) AS __dd_rn, "
        f"count(*) OVER () AS __dd_cnt FROM ({inner}) __dd_pq) "
        f"WHERE __dd_rn <= floor(__dd_cnt * {pct} / 100.0) "
        f"ORDER BY {keys}"
    )


_REGEXP_SPLIT_TT_RE = re.compile(
    r"\bregexp_split_to_table\s*\(", re.IGNORECASE
)


def _rewrite_regexp_split_to_table(s: str) -> str:
    """Postgres-style set-returning ``regexp_split_to_table(str, pat)``
    → ``explode(split(str, pat))`` (both regex-split)."""
    while m := _REGEXP_SPLIT_TT_RE.search(s):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        inner = s[open_idx + 1 : close]
        s = s[: m.start()] + f"explode(split({inner}))" + s[close + 1 :]
    return s


# --- battery 7: typed literals, numeric spellings, temporal breadth --------

# DuckDB generic typed literals ``TYPE 'text'`` are CAST(text AS TYPE).
# Spark only knows the DATE/TIMESTAMP/TIME/INTERVAL/X forms natively, and
# its CAST defaults differ where DuckDB's carry parameters (plain DECIMAL
# is DECIMAL(18,3) in DuckDB but DECIMAL(10,0) in Spark — a silent value
# change without the explicit width).
_TYPED_LITERAL_CAST: dict[str, str] = {
    "decimal": "DECIMAL(18,3)",
    "numeric": "DECIMAL(18,3)",
    "hugeint": "DECIMAL(38,0)",
    "uhugeint": "DECIMAL(38,0)",
    "integer": "INT",
    "int": "INT",
    "int4": "INT",
    "signed": "INT",
    "bigint": "BIGINT",
    "int8": "BIGINT",
    "long": "BIGINT",
    "smallint": "SMALLINT",
    "int2": "SMALLINT",
    "short": "SMALLINT",
    "tinyint": "TINYINT",
    "int1": "TINYINT",
    "utinyint": "SMALLINT",
    "usmallint": "INT",
    "uinteger": "BIGINT",
    "ubigint": "DECIMAL(20,0)",
    "double": "DOUBLE",
    "float8": "DOUBLE",
    "float": "FLOAT",
    "float4": "FLOAT",
    "real": "FLOAT",
    "boolean": "BOOLEAN",
    "bool": "BOOLEAN",
    "logical": "BOOLEAN",
    "varchar": "STRING",
    "text": "STRING",
    "string": "STRING",
    "bpchar": "STRING",
    "blob": "BINARY",
    "bytea": "BINARY",
    "varbinary": "BINARY",
    # instant type: Spark's TIMESTAMP is LTZ and the session is pinned
    # UTC, so a TIMESTAMPTZ literal (offset spelling included) parses to
    # the same instant DuckDB stores
    "timestamptz": "TIMESTAMP",
}

_TYPED_LITERAL_RE = re.compile(
    r"\b([A-Za-z_]\w*)\s+(\x00\d+\x00)"
)


_CONCAT_FN_RE = re.compile(r"\bconcat\s*\(", re.IGNORECASE)


def _rewrite_concat_nullskip(s: str, table: list[str]) -> str:
    """DuckDB's ``concat()`` stringifies EVERY argument (lists render as
    their display text) and SKIPS NULLs — Spark's concat returns NULL if
    any argument is NULL. ``concat_ws('')`` over per-argument string
    casts reproduces both behaviors. Runs before any other rewrite, so
    only user-authored concat calls are touched — rewrite-emitted
    concat/concat_ws stays Spark-native. The ``||`` operator keeps its
    NULL-propagating standard semantics on both engines."""
    pos = 0
    while m := _CONCAT_FN_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        if not args or not args[0].strip():
            pos = close + 1
            continue
        empty = _masked_literal(table, "")
        parts = ", ".join(f"CAST({a.strip()} AS STRING)" for a in args)
        repl = f"concat_ws({empty}, {parts})"
        s = s[: m.start()] + repl + s[close + 1 :]
        pos = m.start() + len(repl)
    return s


_USING_SAMPLE_RE = re.compile(
    r"\b(?:USING\s+SAMPLE|TABLESAMPLE)\s+"
    r"(?:(bernoulli|system|reservoir)\s*\(\s*([^()]+?)\s*\)"
    r"|(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?)"
    r"(\s*REPEATABLE\s*\(\s*\d+\s*\))?",
    re.IGNORECASE,
)


def _rewrite_using_sample(s: str) -> str:
    """DuckDB sampling clauses — ``USING SAMPLE 10%``, ``USING SAMPLE
    50 ROWS``, ``USING SAMPLE reservoir(5%) REPEATABLE (42)``, and the
    ``TABLESAMPLE bernoulli(10%)`` spelling — → Spark's
    ``TABLESAMPLE (… PERCENT|ROWS) [REPEATABLE (seed)]``. Sample
    MEMBERSHIP is engine-RNG on both systems (the o08b precedent:
    rows-only verification by nature); the clause shape, unit semantics,
    and seed stability are what carries over. Spark-native
    ``TABLESAMPLE (10 PERCENT)`` is already parenthesized and never
    matches."""

    def sub(m: re.Match) -> str:
        method, marg, num, unit, rep = m.groups()
        if method:
            am = re.match(
                r"^(\d+(?:\.\d+)?)\s*(%|PERCENT\b|ROWS\b)?$",
                marg.strip(),
                re.IGNORECASE,
            )
            if not am:
                raise ValueError(
                    f"unsupported sample spec: {m.group(0)!r}"
                )
            num, unit = am.group(1), am.group(2)
        u = (unit or "").upper().replace("%", "PERCENT") or "ROWS"
        spec = f"{num} {u}"
        return f"TABLESAMPLE ({spec}){rep or ''}"

    return _USING_SAMPLE_RE.sub(sub, s)


_AT_TZ_RE = re.compile(r"\bAT\s+TIME\s+ZONE\s*", re.IGNORECASE)


def _rewrite_at_time_zone(s: str) -> str:
    """``ts AT TIME ZONE 'tz'``. DuckDB: a NAIVE timestamp interprets as
    wall-clock in tz and becomes an instant (→ to_utc_timestamp under
    the UTC-pinned session); a TIMESTAMPTZ converts to tz wall-clock
    (→ from_utc_timestamp). The instant branch is detected from the
    operand's own spelling (TIMESTAMPTZ literal / ::TIMESTAMPTZ cast) —
    every other operand takes the naive branch, which is also what the
    engine's UTC-relabelled parquet timestamps ARE."""
    while m := _AT_TZ_RE.search(s):
        end0 = m.start()
        while end0 > 0 and s[end0 - 1] in " \t\n":
            end0 -= 1
        start = _primary_back(s, end0)
        kw = re.search(
            r"(?i)\b(TIMESTAMPTZ|TIMESTAMP|TIMETZ|TIME|DATE)\s*$", s[:start]
        )
        if kw:
            start = kw.start(1)
        operand = s[start:end0].strip()
        tz_end = _primary_end(s, m.end())
        tz = s[m.end() : tz_end].strip()
        if not operand or not tz:
            raise ValueError("AT TIME ZONE: could not parse operands")
        if re.match(r"(?i)^TIMESTAMPTZ\b", operand) or re.search(
            r"(?i)::\s*TIMESTAMPTZ$", operand
        ):
            repl = f"from_utc_timestamp({operand}, {tz})"
        else:
            repl = f"to_utc_timestamp({operand}, {tz})"
        s = s[:start] + repl + s[tz_end:]
    return s


_IDX_LAMBDA_FNS_RE = re.compile(
    r"\b(list_transform|list_apply|array_transform|apply|list_filter|"
    r"array_filter|filter)\s*\(",
    re.IGNORECASE,
)


def _rewrite_indexed_lambdas(s: str) -> str:
    """DuckDB's two-parameter list lambdas get a 1-BASED element index
    (``list_transform(l, (x, i) -> …)``); Spark's index parameter is
    0-based — a silent off-by-one on every indexed lambda. Rename the
    index parameter and substitute ``(__dd_ix + 1)`` in the body."""
    pos = 0
    n = 0
    while m := _IDX_LAMBDA_FNS_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        lm = (
            re.match(
                r"^\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\)\s*->\s*(.+)$",
                args[1],
                re.DOTALL,
            )
            if len(args) == 2
            else None
        )
        if not lm:
            pos = m.end()
            continue
        v, ix, body = lm.groups()
        # a unique parameter name per lambda — nested indexed lambdas
        # must not shadow the outer rename
        p = f"__dd_ix{n}"
        n += 1
        body = re.sub(rf"\b{re.escape(ix)}\b", f"({p} + 1)", body)
        inner = f"{args[0]}, ({v}, {p}) -> {body}"
        s = s[: open_idx + 1] + inner + s[close:]
        pos = m.end()
    return s


def _rewrite_typed_literals(s: str, table: list[str]) -> str:
    """``DECIMAL '12.345'`` → ``CAST('12.345' AS DECIMAL(18,3))`` etc.;
    BIT/BITSTRING literals keep their display string (Spark has no BIT
    type; downstream bit ops then fail closed instead of mis-typing)."""

    def sub(m: re.Match) -> str:
        kw = m.group(1).lower()
        if kw in ("bit", "bitstring"):
            lit = _literal_value(_unmask(m.group(2), table))
            if lit is not None and re.fullmatch(r"[01]+", lit):
                return m.group(2)
            return m.group(0)
        target = _TYPED_LITERAL_CAST.get(kw)
        if target is None:
            return m.group(0)
        return f"CAST({m.group(2)} AS {target})"

    return _TYPED_LITERAL_RE.sub(sub, s)


_UNDERSCORE_NUM_RE = re.compile(
    r"(?<![\w.\x00])(\d[\d_]*(?:\.[\d_]+)?)(?![\w\x00])"
)


def _rewrite_underscore_numerics(s: str) -> str:
    """DuckDB accepts ``1_000_000`` readability underscores (digits on
    both sides); Spark parses the token as an identifier. Strip the
    underscores — only between digits, so identifiers are untouched."""

    def sub(m: re.Match) -> str:
        tok = m.group(1)
        if "_" not in tok:
            return tok
        if re.search(r"(^|[^0-9])_|_([^0-9]|$)", tok):
            return tok  # malformed (leading/trailing/dot-adjacent) — leave
        return tok.replace("_", "")

    return _UNDERSCORE_NUM_RE.sub(sub, s)


_MATERIALIZED_CTE_RE = re.compile(
    r"\bAS\s+(?:NOT\s+)?MATERIALIZED\s*\(", re.IGNORECASE
)


def _rewrite_materialized_cte(s: str) -> str:
    """``WITH c AS [NOT] MATERIALIZED (…)`` — a pure optimizer hint in
    DuckDB; Spark's CTEs are always inlined by the optimizer, so the
    hint drops (Q3's cache() path is the engine's materialization)."""
    return _MATERIALIZED_CTE_RE.sub("AS (", s)


# the explicit unit set keeps a trailing alias (AS …) out of the match,
# and the (?!\s+TO\b) guard keeps multi-field qualifiers (YEAR TO MONTH,
# DAY TO HOUR) out of the fold — those fall through untouched
_IV_UNIT = (
    r"(?:microseconds?|us|milliseconds?|ms|seconds?|minutes?|hours?"
    r"|days?|weeks?|months?|years?)"
)
_TIME_ARITH_RE = re.compile(
    r"\bTIME\s+(\x00\d+\x00)\s*([+-])\s*INTERVAL\s+"
    rf"(?:(\x00\d+\x00)|(\d+))(?:\s*({_IV_UNIT})\b)?(?!\s+TO\b)",
    re.IGNORECASE,
)
_INTERVAL_FIRST_RE = re.compile(
    rf"\bINTERVAL\s+(?:(\x00\d+\x00)|(\d+))(?:\s*({_IV_UNIT})\b)?(?!\s+TO\b)"
    r"\s*\+\s*TIME\s+(\x00\d+\x00)",
    re.IGNORECASE,
)
# DATE 'd' + TIME 't' (either order) → TIMESTAMP literal; and
# TIMESTAMP 'x'::TIME / CAST(TIMESTAMP 'x' AS TIME) → TIME literal.
# Literal folds only — Spark's TIME type has no runtime constructors,
# and the fail-closed policy for column operands stands.
_DATE_PLUS_TIME_RE = re.compile(
    r"\bDATE\s+(\x00\d+\x00)\s*\+\s*TIME\s+(\x00\d+\x00)", re.IGNORECASE
)
_TIME_PLUS_DATE_RE = re.compile(
    r"\bTIME\s+(\x00\d+\x00)\s*\+\s*DATE\s+(\x00\d+\x00)", re.IGNORECASE
)
_TS_TO_TIME_CAST_RE = re.compile(
    r"\bTIMESTAMP\s+(\x00\d+\x00)\s*::\s*TIME\b"
    r"|\bCAST\s*\(\s*TIMESTAMP\s+(\x00\d+\x00)\s+AS\s+TIME\s*\)",
    re.IGNORECASE,
)
_DATE_LIT_RE = re.compile(r"^\s*(\d{4})-(\d{2})-(\d{2})\s*$")

_INTERVAL_UNIT_MICROS = {
    "microsecond": 1,
    "microseconds": 1,
    "us": 1,
    "millisecond": 1_000,
    "milliseconds": 1_000,
    "ms": 1_000,
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    # a whole number of days/weeks/months/years leaves the time of day
    # unchanged (the shift is 0 mod 24 h) — DuckDB semantics
    "day": 0,
    "days": 0,
    "week": 0,
    "weeks": 0,
    "month": 0,
    "months": 0,
    "year": 0,
    "years": 0,
}

_DAY_MICROS = 86_400_000_000


def _parse_interval_micros(text: str, unit: str) -> int | None:
    """Interval literal → microseconds mod one day; None if unsupported."""
    unit = unit.lower()
    if unit:
        if unit not in _INTERVAL_UNIT_MICROS:
            return None
        try:
            n = int(text)
        except ValueError:
            return None
        return n * _INTERVAL_UNIT_MICROS[unit]
    # string form: '1 day 2 hours 30 minutes'
    total = 0
    pos = 0
    for m in re.finditer(r"(-?\d+)\s*([A-Za-z]+)", text):
        if text[pos : m.start()].strip():
            return None
        u = m.group(2).lower()
        if u not in _INTERVAL_UNIT_MICROS:
            return None
        total += int(m.group(1)) * _INTERVAL_UNIT_MICROS[u]
        pos = m.end()
    if text[pos:].strip():
        return None
    return total


def _parse_time_micros(text: str) -> int | None:
    m = re.fullmatch(r"(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,6}))?)?", text.strip())
    if not m:
        return None
    h, mi = int(m.group(1)), int(m.group(2))
    sec = int(m.group(3) or 0)
    frac = (m.group(4) or "").ljust(6, "0")
    if h > 23 or mi > 59 or sec > 59:
        return None
    return ((h * 60 + mi) * 60 + sec) * 1_000_000 + int(frac)


def _fmt_time_micros(us: int) -> str:
    us %= _DAY_MICROS
    sec, frac = divmod(us, 1_000_000)
    h, rem = divmod(sec, 3600)
    mi, s = divmod(rem, 60)
    base = f"{h:02d}:{mi:02d}:{s:02d}"
    if frac:
        base += (".%06d" % frac).rstrip("0")
    return base


def _fold_time_arithmetic(s: str, table: list[str]) -> str:
    """``TIME 'x' ± INTERVAL …`` (literals both sides) folds to the
    resulting TIME literal at rewrite time — Spark's TIME type has
    literals and comparisons but no arithmetic yet, and DuckDB's result
    wraps modulo 24 h, which the fold reproduces exactly. Column-based
    TIME arithmetic stays unsupported (analysis error, never a silent
    wrong answer). Chained ``+ INTERVAL`` terms fold iteratively."""

    def fold(
        time_mask: str, op: str, iv_mask: str | None, iv_num: str | None, unit: str
    ) -> str | None:
        t = _literal_value(_unmask(time_mask, table))
        tm = _parse_time_micros(t) if t is not None else None
        if tm is None:
            return None
        iv_text = (
            _literal_value(_unmask(iv_mask, table)) if iv_mask else iv_num
        )
        if iv_text is None:
            return None
        iv = _parse_interval_micros(iv_text, unit or "")
        if iv is None:
            return None
        result = tm + iv if op == "+" else tm - iv
        lit = _masked_literal(table, _fmt_time_micros(result))
        return f"TIME {lit}"

    while m := _TIME_ARITH_RE.search(s):
        repl = fold(m.group(1), m.group(2), m.group(3), m.group(4), m.group(5))
        if repl is None:
            break
        s = s[: m.start()] + repl + s[m.end() :]
    while m := _INTERVAL_FIRST_RE.search(s):
        repl = fold(m.group(4), "+", m.group(1), m.group(2), m.group(3))
        if repl is None:
            break
        s = s[: m.start()] + repl + s[m.end() :]

    def date_time_fold(date_mask: str, time_mask: str) -> str | None:
        d = _literal_value(_unmask(date_mask, table))
        t = _literal_value(_unmask(time_mask, table))
        if d is None or t is None or not _DATE_LIT_RE.match(d):
            return None
        tm = _parse_time_micros(t)
        if tm is None:
            return None
        lit = _masked_literal(
            table, f"{d.strip()} {_fmt_time_micros(tm)}"
        )
        return f"TIMESTAMP {lit}"

    for pat, order in ((_DATE_PLUS_TIME_RE, (1, 2)),
                       (_TIME_PLUS_DATE_RE, (2, 1))):
        while m := pat.search(s):
            repl = date_time_fold(m.group(order[0]), m.group(order[1]))
            if repl is None:
                break
            s = s[: m.start()] + repl + s[m.end() :]
    while m := _TS_TO_TIME_CAST_RE.search(s):
        ts = _literal_value(_unmask(m.group(1) or m.group(2), table))
        if ts is None:
            break
        parts = ts.strip().split(" ", 1)
        tm = _parse_time_micros(parts[1]) if len(parts) == 2 else None
        if tm is None:
            break
        lit = _masked_literal(table, _fmt_time_micros(tm))
        s = s[: m.start()] + f"TIME {lit}" + s[m.end() :]
    return s


_EXTRACT_EPOCH_RE = re.compile(r"\bEXTRACT\s*\(\s*EPOCH\s+FROM\b", re.IGNORECASE)


_TIME_LIT_INNER_RE = re.compile(
    r"^TIME\s+(\x00\d+\x00)$", re.IGNORECASE
)


def _time_epoch_seconds(inner: str, table: list[str]) -> str | None:
    """Seconds-since-midnight for a TIME literal expression, as the SQL
    text of a DOUBLE literal (DuckDB's EXTRACT(EPOCH FROM TIME) /
    epoch(TIME) result); None when not a TIME literal."""
    tm = _TIME_LIT_INNER_RE.match(inner.strip())
    if not tm:
        return None
    t = _literal_value(_unmask(tm.group(1), table))
    us = _parse_time_micros(t) if t is not None else None
    if us is None:
        return None
    return f"CAST({us} AS DOUBLE) / 1000000"


def _rewrite_extract_epoch(s: str, table: list[str] | None = None) -> str:
    """``EXTRACT(EPOCH FROM x)`` → fractional epoch seconds as DOUBLE
    (DuckDB's result type); Spark has no EPOCH extract field. TIME
    literals fold to their seconds-since-midnight (Spark cannot cast
    TIME at runtime)."""
    while m := _EXTRACT_EPOCH_RE.search(s):
        open_idx = s.index("(", m.start())
        close = _matching_paren(s, open_idx)
        inner = s[m.end() : close].strip()
        repl = (
            _time_epoch_seconds(inner, table) if table is not None else None
        )
        if repl is None:
            repl = (
                f"CAST(unix_micros(CAST(({inner}) AS TIMESTAMP)) AS DOUBLE)"
                f" / 1000000"
            )
        s = s[: m.start()] + repl + s[close + 1 :]
    return s


_UNPIVOT_CLAUSE_RE = re.compile(
    r"\bUNPIVOT\s*(?:(?:INCLUDE|EXCLUDE)\s+NULLS\s*)?\(", re.IGNORECASE
)


def _rewrite_unpivot_aliases(s: str, table: list[str]) -> str:
    """Inside an UNPIVOT clause DuckDB spells IN-list aliases as string
    literals (``(a1, b1) AS 'g1'``); Spark wants identifiers. The value
    surfaced in the name column is identical either way."""
    pos = 0
    while m := _UNPIVOT_CLAUSE_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        body = s[open_idx : close + 1]

        def alias_sub(am: re.Match) -> str:
            lit = _literal_value(_unmask(am.group(1), table))
            if lit is None or not re.fullmatch(r"[\w ]+", lit):
                return am.group(0)
            return f"AS `{lit}`"

        new_body = re.sub(
            r"\bAS\s+(\x00\d+\x00)", alias_sub, body, flags=re.IGNORECASE
        )
        s = s[:open_idx] + new_body + s[close + 1 :]
        pos = open_idx + len(new_body)
    return s


_FROM_FIRST_PAREN_RE = re.compile(r"\(\s*FROM\b", re.IGNORECASE)


def _rewrite_from_first_subquery(s: str) -> str:
    """DuckDB FROM-first subqueries: ``(FROM t WHERE …)`` →
    ``(SELECT * FROM t WHERE …)``. Spark parses the TOP-LEVEL
    FROM-first form natively but rejects it inside parentheses; no
    other SQL production begins a paren group with FROM. Groups that
    carry their own trailing SELECT are left for Spark's native
    transform syntax."""
    pos = 0
    while m := _FROM_FIRST_PAREN_RE.search(s, pos):
        close = _matching_paren(s, m.start())
        inner = s[m.start() + 1 : close]
        if not re.search(r"\bSELECT\b", inner, re.IGNORECASE):
            insert_at = m.start() + 1
            s = s[:insert_at] + "SELECT * " + s[insert_at:]
            pos = insert_at + len("SELECT * ")
        else:
            pos = m.start() + 1
    return s


def _rewrite_postfix_factorial(s: str) -> str:
    """DuckDB's postfix ``x!`` → ``factorial(x)`` for simple operands
    (numbers/identifiers); other shapes fall through to a parse error
    rather than silently changing meaning."""
    out = s
    while m := _POSTFIX_FACT_RE.search(out):
        out = out[: m.start()] + f"factorial({m.group(1)})" + out[m.end() :]
    return out


def _rewrite_templates(s: str, table: list[str]) -> str:
    pos = 0
    while m := _TEMPLATE_RE.search(s, pos):
        fn = m.group(1).lower()
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        # resolve nested template calls inside the arguments first, then
        # splice — the replacement itself is never rescanned (kurtosis'
        # expansion legitimately contains kurtosis())
        inner = _rewrite_templates(s[open_idx + 1 : close], table)
        args = _split_top_commas(inner)
        repl = _template(fn, args, table)
        if repl is None:
            s = s[: open_idx + 1] + inner + s[close:]
            pos = open_idx + 1 + len(inner) + 1
            continue
        s = s[: m.start()] + repl + s[close + 1 :]
        pos = m.start() + len(repl)
    return s


_POSITIONAL_RE = re.compile(
    r"\bFROM\s+([A-Za-z_][\w.]*)\s+POSITIONAL\s+JOIN\s+([A-Za-z_][\w.]*)",
    re.IGNORECASE,
)


def _rewrite_positional_join(s: str, spark) -> str:
    """``FROM a POSITIONAL JOIN b`` → rank-paired FULL join (DuckDB pads
    the shorter side with NULLs). Without this rewrite Spark parses
    POSITIONAL as a table alias and silently returns a CROSS join — so
    any unsupported shape fails closed instead of falling through.
    Row order follows the scan via monotonically_increasing_id, which is
    DuckDB's contract too (file order, not a semantic ordering)."""
    while m := _POSITIONAL_RE.search(s):
        if spark is None:
            raise ValueError("POSITIONAL JOIN requires a session")
        names = (m.group(1), m.group(2))
        sides = []
        for name, alias in zip(names, ("l", "r")):
            cols = spark.table(name).columns
            sides.append(
                [f"{alias}.`{c}`" for c in cols]
            )
        col_list = ", ".join(sides[0] + sides[1])

        def ranked(tbl: str) -> str:
            return (
                f"(SELECT *, row_number() OVER (ORDER BY __dd_mid) AS __dd_rn "
                f"FROM (SELECT *, monotonically_increasing_id() AS __dd_mid "
                f"FROM {tbl}))"
            )

        repl = (
            f"FROM (SELECT {col_list} FROM {ranked(names[0])} l "
            f"FULL JOIN {ranked(names[1])} r ON l.__dd_rn = r.__dd_rn) __dd_pj"
        )
        s = s[: m.start()] + repl + s[m.end() :]
    if re.search(r"\bPOSITIONAL\s+JOIN\b", s, re.IGNORECASE):
        raise ValueError(
            "POSITIONAL JOIN is supported only between plain table "
            "references (no aliases/subqueries)"
        )
    return s


def rewrite(sql: str, spark=None, duckdb_first: bool = False) -> str:
    """Full DuckDB→Spark dialect rewrite (string to string, no parsing).
    Safe only for DuckDB-dialect input — e.g. ``trunc`` is renamed to the
    numeric shim and subscripts shift to 0-based — which is why
    :func:`run_sql` tries native Spark first. When a session is supplied,
    polymorphic dispatch (``len``) resolves argument types from the
    catalog schemas of the referenced tables instead of name heuristics.
    ``duckdb_first`` (the serving mode) additionally routes the
    libm-divergent numeric family through bit-identical shims."""
    masked, table = _mask(sql)
    # DuckDB string literals are escape-free ('\s+' is backslash-s-plus);
    # Spark's parser processes backslash escapes ('\s+' becomes s-plus).
    # Double every backslash in the ORIGINAL literals so Spark
    # reconstructs the byte-identical string — regex patterns survive.
    # Entries appended by later rewrites are authored Spark-escaped.
    for i, entry in enumerate(table):
        if entry.startswith("'"):
            table[i] = entry.replace("\\", "\\\\")
    masked = _rewrite_concat_nullskip(masked, table)
    masked = _rewrite_list_comprehension(masked)
    masked = _rewrite_struct_literals(masked, table)
    masked = _rewrite_positional_join(masked, spark)
    masked = _rewrite_list_set_ops(masked)
    masked = _rewrite_dot_calls(masked)
    masked = _rewrite_templates(masked, table)
    masked = _rewrite_similar_to(masked, table)
    masked = _rewrite_collate(masked, table)
    masked = _rewrite_underscore_numerics(masked)
    masked = _rewrite_materialized_cte(masked)
    masked = _rewrite_fetch_limit(masked)
    masked = _rewrite_percent_limit(masked)
    masked = _rewrite_regexp_split_to_table(masked)
    masked = _rewrite_using_sample(masked)
    masked = _rewrite_at_time_zone(masked)
    masked = _rewrite_indexed_lambdas(masked)
    masked = _fold_time_arithmetic(masked, table)
    masked = _rewrite_typed_literals(masked, table)
    masked = _rewrite_extract_epoch(masked, table)
    masked = _rewrite_unpivot_aliases(masked, table)
    masked = _rewrite_postfix_factorial(masked)
    masked = _rewrite_power(masked)
    masked = _rewrite_at_abs(masked)
    masked = _rewrite_tilde_ops(masked, table)
    masked = _rewrite_json_arrows(masked, table)
    masked = _rewrite_any_all(masked)
    masked = _rewrite_ignore_nulls(masked)
    masked = _rewrite_filter_shorthand(masked)
    masked = _rewrite_window_chain(masked)
    masked = _rewrite_windowed_distinct(masked)
    masked = _rewrite_list_literals(masked)
    kinds = _column_kinds(spark, masked) if spark is not None else None
    masked = _rewrite_nested_comparisons(masked, table, kinds)
    # drop the DML filter-context markers (balanced: name( -> ( )
    masked = re.sub(r"(?i)__dd_boolctx\s*\(", "(", masked)
    masked = _rewrite_len(masked, kinds)
    masked = _rewrite_median(masked, kinds)
    masked = _rewrite_date_arith(masked, kinds)
    masked = _rewrite_hash(masked, table, kinds)
    masked = _rewrite_string_split(masked, table)
    masked = _rewrite_regexp_replace(masked, table)
    masked = _rewrite_regexp_extract_all(masked)
    masked = _rewrite_slice(masked, table, kinds)
    masked = _rewrite_lateral_unnest(masked)
    masked = _rewrite_generate_subscripts(masked)
    masked = _rewrite_from_first_subquery(masked)
    masked = _rewrite_range(masked)
    masked = _rewrite_time_bucket(masked, table, kinds)
    masked = _rewrite_dyn_interval(masked)
    masked = _rewrite_hex_cast(masked, table)
    masked = _rewrite_trim_swap(masked)
    masked = _rewrite_xor(masked)
    masked = _rewrite_strftime(masked, table)
    masked = _rewrite_datediff_units(masked, table)
    masked = _rewrite_interval_varchar(masked, table)
    masked = _rewrite_nested_cast_types(masked)
    masked = _rewrite_struct_map(masked, table)
    masked = _rewrite_ordered_aggs(masked)
    masked = _rewrite_lateral_values(masked)
    # a VARCHAR cast of a BINARY column takes DuckDB's escaped blob
    # rendering (dd_blob_str), not the raw-bytes reinterpretation
    if kinds and any(k == "binary" for k in kinds.values()):
        def _bin_cast(mm: re.Match) -> str:
            col = mm.group(1)
            if kinds.get(col.split(".")[-1].lower()) == "binary":
                return f"dd_blob_str({col})"
            return mm.group(0)

        masked = re.sub(
            r"\bCAST\s*\(\s*([A-Za-z_][\w.]*)\s+AS\s+(?:VARCHAR|STRING)"
            r"\s*\)",
            _bin_cast,
            masked,
            flags=re.IGNORECASE,
        )
        masked = re.sub(
            r"\b([A-Za-z_][\w.]*)\s*::\s*(?:VARCHAR|STRING)\b",
            _bin_cast,
            masked,
            flags=re.IGNORECASE,
        )
    # DuckDB ROUNDS numeric→integer casts where Spark truncates — a
    # silent off-by-one on every fractional cast. DOUBLE/FLOAT round
    # half-to-even (rint), DECIMAL rounds half away from zero (round);
    # both probed on live 1.0. Bare-column operands resolve through the
    # catalog kinds; numeric literals fold at rewrite time (decimal
    # rule). Complex expressions stay untouched (type unknowable from
    # text) — the covered shapes are the serving-path hot ones.
    _INT_TYPES = (
        r"(?:TINYINT|SMALLINT|INTEGER|INT[1248]|INT|BIGINT|SHORT|LONG"
        r"|SIGNED|UTINYINT|USMALLINT|UINTEGER|UBIGINT|HUGEINT)"
    )

    def _cast_round(mm: re.Match) -> str:
        col, ty = mm.group(1), mm.group(2)
        if re.fullmatch(r"[+-]?\d+\.\d+", col):
            import decimal as _dec

            v = _dec.Decimal(col).quantize(
                _dec.Decimal(1), rounding=_dec.ROUND_HALF_UP
            )
            return f"CAST({v} AS {ty})"
        kind = (kinds or {}).get(col.split(".")[-1].lower())
        if kind == "double":
            return f"CAST(rint({col}) AS {ty})"
        if kind == "decimal":
            return f"CAST(round({col}) AS {ty})"
        return mm.group(0)

    masked = re.sub(
        rf"\bCAST\s*\(\s*([A-Za-z_][\w.]*|[+-]?\d+\.\d+)\s+AS\s+"
        rf"({_INT_TYPES})\s*\)",
        _cast_round,
        masked,
        flags=re.IGNORECASE,
    )
    masked = re.sub(
        rf"\b([A-Za-z_][\w.]*|\d+\.\d+)\s*::\s*({_INT_TYPES})\b(?!\w)",
        _cast_round,
        masked,
        flags=re.IGNORECASE,
    )
    masked = re.sub(r"\bAS\s+VARCHAR\b(?!\s*\()", "AS STRING", masked,
                    flags=re.IGNORECASE)
    masked = re.sub(r"::\s*VARCHAR\b(?!\s*\()", "::STRING", masked,
                    flags=re.IGNORECASE)
    # literal blob casts decode DuckDB's \xNN escapes into a hex literal
    # (Spark's X'…') — a plain CAST(AS BINARY) would keep the backslash
    # bytes verbatim, a silent value divergence
    def _blob_lit(mm: re.Match) -> str:
        # NB: the literal table has already been backslash-doubled for
        # Spark's escaping parser (see above), so DuckDB's \xNN arrives
        # here as \\xNN
        lit = _literal_value(table[int(mm.group(1))])
        if lit is None or not re.search(r"\\\\x[0-9A-Fa-f]{2}", lit):
            return mm.group(0)
        raw = re.sub(
            r"\\\\x([0-9A-Fa-f]{2})",
            lambda h: chr(int(h.group(1), 16)),
            lit,
        )
        raw = raw.replace("\\\\", "\\").encode("latin-1", errors="ignore")
        return f"X'{raw.hex()}'"

    masked = re.sub(
        r"\x00(\d+)\x00\s*::\s*BLOB\b", _blob_lit, masked,
        flags=re.IGNORECASE,
    )
    masked = re.sub(
        r"\bCAST\s*\(\s*\x00(\d+)\x00\s+AS\s+BLOB\s*\)", _blob_lit, masked,
        flags=re.IGNORECASE,
    )
    masked = re.sub(r"::\s*BLOB\b", "::BINARY", masked, flags=re.IGNORECASE)
    # BIT strings are carried as '0'/'1' text (typed-literal rewrite);
    # `AS BIT` is left alone — 'bit' is a plausible column alias
    masked = re.sub(r"::\s*BIT\b", "::STRING", masked, flags=re.IGNORECASE)
    masked = re.sub(
        r"(::\s*|\bAS\s+)TIMESTAMPTZ\b", r"\1TIMESTAMP", masked,
        flags=re.IGNORECASE,
    )
    # HUGEINT (int128) has no JVM primitive: DECIMAL(38,0) covers the
    # integer-arithmetic uses (the ddl.py CREATE TABLE map agrees)
    masked = re.sub(
        r"(::\s*|\bAS\s+)U?HUGEINT\b", r"\1DECIMAL(38,0)", masked,
        flags=re.IGNORECASE,
    )
    # fixed-size array types (FLOAT[3]) and bare array types (INT[]) in
    # cast position → Spark ARRAY<T>; subscripts never follow :: or AS.
    # Looped so nested lists (INT[][]) resolve innermost-out.
    _ARRAY_TYPE_RE = re.compile(
        r"(::\s*|\bAS\s+)((?:ARRAY<)*[A-Za-z]+>*)\s*\[\s*\d*\s*\]",
        re.IGNORECASE,
    )
    while _ARRAY_TYPE_RE.search(masked):
        masked = _ARRAY_TYPE_RE.sub(
            lambda mm: f"{mm.group(1)}ARRAY<{mm.group(2)}>", masked
        )

    masked = re.sub(r"\bAS\s+BLOB\b", "AS BINARY", masked, flags=re.IGNORECASE)
    # ::JSON is a validating store-as-text cast in DuckDB (original
    # spacing preserved) — dropping it keeps the text identical; invalid
    # JSON then fails at USE time rather than cast time
    masked = re.sub(r"::\s*JSON\b", "", masked, flags=re.IGNORECASE)
    # DuckDB `a // b` integer division → Spark DIV (both truncate toward
    # zero on integers: -7//2 = -3 on each engine; DuckDB 1.0's decimal
    # `//` is effectively float division — integer operands are the
    # portable surface)
    masked = masked.replace("//", " DIV ")
    masked = _rewrite_fn_names(masked)
    if duckdb_first:
        masked = _rewrite_libm(masked)
    masked = _rewrite_list_aggregate(masked, table)
    masked = _rewrite_subscripts(masked, kinds, table)
    masked = _rewrite_distinct_on(masked)
    masked = _rewrite_window_filter(masked)
    masked = _rewrite_exclude_frames(masked)
    masked = _rewrite_exclude(masked)
    masked = _rewrite_star_replace(masked, spark)
    masked = _rewrite_glob(masked, table)
    masked = _rewrite_asof(masked)
    masked = _rewrite_qualify(masked)
    return _unmask(masked, table)


# ---------------------------------------------------------------------------
# SQL-UDF aliases (JVM-side: RETURN <expr> bodies inline into the plan)
# ---------------------------------------------------------------------------

_DIALECT_FUNCTIONS = (
    # DuckDB's BLOB → VARCHAR rendering: bytes 32..126 except backslash
    # are literal, everything else (and backslash) is \xHH uppercase —
    # one aggregate() fold over the hex spelling, pure JVM expressions
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_blob_str(b BINARY)
       RETURNS STRING
       RETURN CASE WHEN b IS NULL THEN NULL ELSE aggregate(
         sequence(1, CAST(length(hex(b)) / 2 AS INT), 1),
         CAST('' AS STRING),
         (acc, i) -> concat(acc,
           CASE WHEN conv(substr(hex(b), i * 2 - 1, 2), 16, 10)
                     BETWEEN 32 AND 126
                 AND conv(substr(hex(b), i * 2 - 1, 2), 16, 10) != 92
                THEN chr(conv(substr(hex(b), i * 2 - 1, 2), 16, 10))
                ELSE concat('\\\\x', substr(hex(b), i * 2 - 1, 2)) END))
       END""",
    # DuckDB json_type classification: container/string kinds from the
    # first character, numerics split UBIGINT/BIGINT/DOUBLE like DuckDB
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_json_type(j STRING)
       RETURNS STRING
       RETURN CASE WHEN j IS NULL THEN NULL ELSE
         CASE left(trim(j), 1)
           WHEN '{' THEN 'OBJECT'
           WHEN '[' THEN 'ARRAY'
           WHEN '"' THEN 'VARCHAR'
           ELSE CASE
             WHEN trim(j) IN ('true', 'false') THEN 'BOOLEAN'
             WHEN trim(j) = 'null' THEN 'NULL'
             WHEN trim(j) RLIKE '^-[0-9]+$' THEN 'BIGINT'
             WHEN trim(j) RLIKE '^[0-9]+$' THEN 'UBIGINT'
             ELSE 'DOUBLE' END END END""",
    # md5_number family: the md5 digest's 8-byte halves as LITTLE-ENDIAN
    # unsigned integers (DuckDB reads the digest as a uint128 LE)
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_md5_u64(h STRING, off INT)
       RETURNS DECIMAL(20, 0)
       RETURN CAST(conv(concat(
         substr(h, off + 14, 2), substr(h, off + 12, 2),
         substr(h, off + 10, 2), substr(h, off + 8, 2),
         substr(h, off + 6, 2), substr(h, off + 4, 2),
         substr(h, off + 2, 2), substr(h, off, 2)), 16, 10)
         AS DECIMAL(20, 0))""",
    # numeric trunc-toward-zero (DuckDB trunc is 1-arg; keep a scale arg
    # for generality) — mirrors functions/scalar.py:trunc_numeric.
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_trunc(x DOUBLE, d INT DEFAULT 0)
       RETURNS DOUBLE
       RETURN CASE WHEN x < 0 THEN ceil(x * power(10, d))
                   ELSE floor(x * power(10, d)) END / power(10, d)""",
    # string_split family: DuckDB splits on a LITERAL separator; Spark's
    # split takes a regex — \Q..\E quoting makes the separator literal.
    """CREATE OR REPLACE TEMPORARY FUNCTION string_split(s STRING, sep STRING)
       RETURNS ARRAY<STRING>
       RETURN split(s, concat('\\\\Q', sep, '\\\\E'))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION str_split(s STRING, sep STRING)
       RETURNS ARRAY<STRING>
       RETURN string_split(s, sep)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION string_to_array(s STRING, sep STRING)
       RETURNS ARRAY<STRING>
       RETURN string_split(s, sep)""",
    # list_unique: DuckDB counts distinct non-null elements.
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_list_unique(l ARRAY<STRING>)
       RETURNS BIGINT
       RETURN size(array_distinct(filter(l, x -> x IS NOT NULL)))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_list_reverse_sort(l ARRAY<DOUBLE>)
       RETURNS ARRAY<DOUBLE>
       RETURN reverse(array_sort(l))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(ts TIMESTAMP)
       RETURNS BIGINT
       RETURN unix_millis(ts)""",
    # formatReadableDecimalSize: decimal (SI) units, one TRUNCATED
    # decimal, '<n> bytes' under 1 kB — DuckDB's rendering exactly
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_format_bytes_dec(b BIGINT)
       RETURNS STRING RETURN
       CASE WHEN abs(b) < 1000 THEN concat(CAST(b AS STRING), ' bytes')
       ELSE concat(
         format_string('%.1f',
          CAST(CAST(b / pow(10, 3 * CAST(floor(log10(abs(b)) / 3) AS INT))
               * 10 AS BIGINT) AS DOUBLE) / 10),
         ' ',
         element_at(array('kB','MB','GB','TB','PB','EB'),
                    CAST(floor(log10(abs(b)) / 3) AS INT))
       ) END""",
    # RFC-3986 percent coding (DuckDB ≥1.1): encode renders space as
    # %20 (Spark's form-encoder emits + only for spaces — safe swap);
    # decode leaves + literal (protected as %2B before Spark decodes)
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_url_encode(s STRING)
       RETURNS STRING RETURN replace(url_encode(s), '+', '%20')""",
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_url_decode(s STRING)
       RETURNS STRING RETURN url_decode(replace(s, '+', '%2B'))""",
    # list_zip: DuckDB yields positionally-indexable pairs; an
    # array-of-arrays keeps the ``p[1] * p[2]`` access pattern working
    # through the try_element_at subscript rewrite. Numeric lists only
    # (the data-pipeline use); float arrays coerce to double.
    """CREATE OR REPLACE TEMPORARY FUNCTION dd_list_zip(
           a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS ARRAY<ARRAY<DOUBLE>>
       RETURN zip_with(a, b, (x, y) -> array(x, y))""",
)


def register_dialect_functions(spark: SparkSession) -> None:
    """Register the SQL-UDF alias layer (idempotent; bootstrap-time)."""
    for stmt in _DIALECT_FUNCTIONS:
        spark.sql(stmt)
    # strip_accents shares the 1:1 translate table with the DataFrame shim
    # (functions/scalar.py) — same codegen expression, SQL spelling.
    from duckdb_server_spark.functions.scalar import _ACCENTED, _PLAIN

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION strip_accents(s STRING) "
        "RETURNS STRING "
        f"RETURN translate(s, '{_ACCENTED}', '{_PLAIN}')"
    )
    # bar(): DuckDB's ASCII bar chart — full blocks, a TRUNCATED eighth
    # partial, then space padding computed from the bar's UTF-8 BYTE
    # length (each block char is 3 bytes; DuckDB's own byte-width
    # padding, reproduced exactly)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_bar("
        "v DOUBLE, mn DOUBLE, mx DOUBLE, w INT) RETURNS STRING RETURN "
        "CASE WHEN mx = mn THEN repeat(' ', w) ELSE "
        "concat("
        " repeat('█', CAST(floor(least(greatest((v-mn)/(mx-mn),0),1)*w) AS INT)),"
        " element_at(array('', '▏', '▎', '▍', '▌',"
        "                  '▋', '▊', '▉'),"
        "   CAST(floor((least(greatest((v-mn)/(mx-mn),0),1)*w"
        "        - floor(least(greatest((v-mn)/(mx-mn),0),1)*w)) * 8) AS INT) + 1),"
        " repeat(' ', greatest(0, w"
        "   - 3*CAST(floor(least(greatest((v-mn)/(mx-mn),0),1)*w) AS INT)"
        "   - CASE WHEN CAST(floor((least(greatest((v-mn)/(mx-mn),0),1)*w"
        "        - floor(least(greatest((v-mn)/(mx-mn),0),1)*w)) * 8) AS INT) > 0"
        "     THEN 3 ELSE 0 END))"
        ") END"
    )

    # format_bytes: DuckDB's binary-unit rendering — '<n> bytes' under
    # 1 KiB, else ONE TRUNCATED decimal (10239 → '9.9 KiB', not 10.0)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_format_bytes(b BIGINT) "
        "RETURNS STRING RETURN "
        "CASE WHEN abs(b) < 1024 THEN concat(CAST(b AS STRING), ' bytes') "
        "ELSE concat("
        " format_string('%.1f',"
        "  CAST(CAST(b / pow(2, 10 * CAST(floor(log2(abs(b)) / 10) AS INT))"
        "       * 10 AS BIGINT) AS DOUBLE) / 10),"
        " ' ',"
        " element_at(array('KiB','MiB','GiB','TiB','PiB','EiB'),"
        "            CAST(floor(log2(abs(b)) / 10) AS INT))"
        ") END"
    )

    # typeof → DuckDB type spellings (shares the DESCRIBE name map's
    # scalar rules; one array level via the LIKE branch, upper() covers
    # decimal(p,s) and the long tail)
    scalar_case = (
        "CASE t WHEN 'int' THEN 'INTEGER' WHEN 'string' THEN 'VARCHAR' "
        "WHEN 'binary' THEN 'BLOB' WHEN 'timestamp_ntz' THEN 'TIMESTAMP' "
        "WHEN 'timestamp' THEN 'TIMESTAMP' ELSE upper(t) END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_typeof_scalar(t STRING) "
        f"RETURNS STRING RETURN {scalar_case}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_typeof_name(t STRING) "
        "RETURNS STRING RETURN CASE WHEN t LIKE 'array<%>' THEN "
        "dd_typeof_scalar(substr(t, 7, length(t) - 7)) || '[]' "
        "ELSE dd_typeof_scalar(t) END"
    )

    # integer gcd/lcm (Spark has neither) — vectorized pandas shims
    import pandas as _pd0
    from pyspark.sql.functions import pandas_udf as _pudf0

    def _gcd_shim(a, b):
        import math as _math

        return _pd0.Series(
            [
                None if x is None or y is None else _math.gcd(int(x), int(y))
                for x, y in zip(a, b)
            ],
            dtype="object",
        )

    _gcd_shim.__annotations__ = {"a": _pd0.Series, "b": _pd0.Series,
                                 "return": _pd0.Series}
    spark.udf.register("dd_gcd", _pudf0(_gcd_shim, "long"))

    def _lcm_shim(a, b):
        import math as _math

        def one(x, y):
            if x is None or y is None:
                return None
            x, y = int(x), int(y)
            if x == 0 or y == 0:
                return 0
            return abs(x * y) // _math.gcd(x, y)

        return _pd0.Series([one(x, y) for x, y in zip(a, b)], dtype="object")

    _lcm_shim.__annotations__ = {"a": _pd0.Series, "b": _pd0.Series,
                                 "return": _pd0.Series}
    spark.udf.register("dd_lcm", _pudf0(_lcm_shim, "long"))

    # aggregates Spark lacks entirely: Shannon entropy over the value
    # distribution (DuckDB: log2) and running product — Arrow-batched
    # grouped-agg pandas UDFs (whole group per call, no partial agg)
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    def _entropy_agg(s):
        vc = s.dropna().value_counts()
        n = int(vc.sum())
        if n == 0:
            return None
        import math as _math

        return float(-sum(c / n * _math.log2(c / n) for c in vc))

    _entropy_agg.__annotations__ = {"s": _pd.Series, "return": float}
    spark.udf.register("entropy", _pandas_udf(_entropy_agg, "double"))

    def _product_agg(s):
        s = s.dropna()
        if len(s) == 0:
            return None
        return float(s.astype("float64").prod())

    _product_agg.__annotations__ = {"s": _pd.Series, "return": float}
    spark.udf.register("product", _pandas_udf(_product_agg, "double"))

    def _mad_agg(s):
        # median absolute deviation — DuckDB mad(); double for every
        # numeric input (DECIMAL-in comes back double; values equal)
        s = s.dropna()
        if len(s) == 0:
            return None
        s = s.astype("float64")
        return float((s - s.median()).abs().median())

    _mad_agg.__annotations__ = {"s": _pd.Series, "return": float}
    spark.udf.register("mad", _pandas_udf(_mad_agg, "double"))

    # character-set jaccard / positional hamming: JVM-side HOF bodies
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_jaccard(a STRING, b STRING) "
        "RETURNS DOUBLE "
        "RETURN size(array_intersect(array_distinct(split(a, '')), "
        "array_distinct(split(b, '')))) / "
        "CAST(size(array_union(array_distinct(split(a, '')), "
        "array_distinct(split(b, '')))) AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_hamming(a STRING, b STRING) "
        "RETURNS BIGINT "
        "RETURN CASE WHEN length(a) <> length(b) THEN "
        "CAST(raise_error('hamming: strings must be of equal length') AS BIGINT) "
        "ELSE CAST(size(filter(zip_with(split(a, ''), split(b, ''), "
        "(x, y) -> x <> y), z -> z)) AS BIGINT) END"
    )
    for stmt in (
        # full-match regex (DuckDB SIMILAR TO / regexp_full_match)
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_regexp_full_match"
        "(s STRING, p STRING) RETURNS BOOLEAN "
        "RETURN s RLIKE concat('^(?:', p, ')$')",
        # floored division / floored modulo (DuckDB fdiv/fmod, measured:
        # fdiv(-7,2) = -4, fmod(-7,2) = 1 — floored, not C-truncated)
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_fdiv(a DOUBLE, b DOUBLE) "
        "RETURNS DOUBLE RETURN floor(a / b)",
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_fmod(a DOUBLE, b DOUBLE) "
        "RETURNS DOUBLE RETURN a - floor(a / b) * b",
        # round away from zero to the next even number (double result)
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_even(x DOUBLE) "
        "RETURNS DOUBLE RETURN "
        "(CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END) * "
        "(CASE WHEN CAST(ceil(abs(x)) AS BIGINT) % 2 = 0 "
        "THEN ceil(abs(x)) ELSE ceil(abs(x)) + 1 END)",
        # DuckDB's signbit(-0.0) is false — plain sign test matches it
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_signbit(x DOUBLE) "
        "RETURNS BOOLEAN RETURN x < 0",
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_isfinite(x DOUBLE) "
        "RETURNS BOOLEAN RETURN NOT isnan(x) "
        "AND abs(x) <> CAST('Infinity' AS DOUBLE)",
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_isinf(x DOUBLE) "
        "RETURNS BOOLEAN RETURN abs(x) = CAST('Infinity' AS DOUBLE)",
        # unicode(): codepoint of the first character, -1 for ''
        "CREATE OR REPLACE TEMPORARY FUNCTION dd_unicode(s STRING) "
        "RETURNS INT RETURN CASE WHEN length(s) = 0 THEN -1 "
        "ELSE ascii(s) END",
    ):
        spark.sql(stmt)
    _register_libm_shims(spark)
    _register_distance_shims(spark)
    _register_text_shims(spark)
    _register_json_shims(spark)
    _register_hash_shims(spark)


def _register_json_shims(spark: SparkSession) -> None:
    """DuckDB JSON functions whose semantics differ from Spark's
    get_json_object family: json_extract returns JSON TEXT (strings stay
    quoted), json() canonicalizes, json_keys/json_valid/json_merge_patch
    have no Spark spelling. Arrow-vectorized; path support covers the
    $.a.b[i] subset DuckDB documents."""
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(v):
        try:
            return _json.loads(v), True
        except (TypeError, ValueError):
            return None, False

    _STEP = re.compile(
        r"\.([A-Za-z_]\w*)"          # .key
        r"|\[\s*#?(-?\d+)\s*\]"      # [i], [-i], [#-i] (from the end)
        r"|\[(\*)\]"                 # [*] wildcard (list results)
        r'|\."([^"]*)"'              # ."quoted key"
    )
    _MISSING = object()

    def _walk(obj, path: str):
        """Resolve a DuckDB JSON path against a parsed document; returns
        a LIST of matches ([] for no match — [*] may multi-match).
        Supports $-paths with [i]/[-i]/[#-i]/[*], bare top-level keys,
        and RFC 6901 JSON Pointer ('/a/0')."""
        if not path:
            return []
        if path[0] == "/":
            # JSON Pointer: ~1 -> '/', ~0 -> '~'; numeric segment = index
            for seg in path.split("/")[1:]:
                seg = seg.replace("~1", "/").replace("~0", "~")
                if isinstance(obj, dict) and seg in obj:
                    obj = obj[seg]
                elif isinstance(obj, list) and re.fullmatch(r"\d+", seg):
                    i = int(seg)
                    if i >= len(obj):
                        return []
                    obj = obj[i]
                else:
                    return []
            return [obj]
        if path[0] != "$":
            # DuckDB: a non-$ path is a single top-level KEY lookup
            if isinstance(obj, dict) and path in obj:
                return [obj[path]]
            return []
        frontier = [obj]
        pos = 1
        while pos < len(path):
            m = _STEP.match(path, pos)
            if not m:
                return []
            pos = m.end()
            key = m.group(1) or m.group(4)
            nxt = []
            for cur in frontier:
                if m.group(3):  # [*]
                    if isinstance(cur, list):
                        nxt.extend(cur)
                    continue
                if key is not None:
                    if isinstance(cur, dict) and key in cur:
                        nxt.append(cur[key])
                    continue
                if isinstance(cur, list):
                    i = int(m.group(2))
                    if -len(cur) <= i < len(cur):
                        nxt.append(cur[i])
            frontier = nxt
        return frontier

    def _extract_one(doc: str, path: str):
        obj, ok = _parse(doc)
        if not ok or not path:
            return None
        hits = _walk(obj, path)
        # DuckDB: a resolved JSON null IS SQL NULL (same as no match)
        if not hits or hits[0] is None:
            return None
        return _json.dumps(hits[0], separators=(",", ":"))

    def jext(d, p):
        return pd.Series([_extract_one(a, b) for a, b in zip(d, p)])

    def _extract_list(doc: str, path: str):
        obj, ok = _parse(doc)
        if not ok or not path:
            return None
        return [
            None if h is None else _json.dumps(h, separators=(",", ":"))
            for h in _walk(obj, path)
        ]

    def jext_list(d, p):
        return pd.Series([_extract_list(a, b) for a, b in zip(d, p)])

    def _extract_str(doc: str, path: str):
        obj, ok = _parse(doc)
        if not ok or not path:
            return None
        hits = _walk(obj, path)
        if not hits or hits[0] is None:
            return None
        h = hits[0]
        if isinstance(h, str):
            return h
        if isinstance(h, bool):
            return "true" if h else "false"
        return _json.dumps(h, separators=(",", ":"))

    def jext_str(d, p):
        return pd.Series([_extract_str(a, b) for a, b in zip(d, p)])

    def _str_of(h):
        if h is None:
            return None
        if isinstance(h, str):
            return h
        if isinstance(h, bool):
            return "true" if h else "false"
        return _json.dumps(h, separators=(",", ":"))

    def _extract_str_list(doc: str, path: str):
        obj, ok = _parse(doc)
        if not ok or not path:
            return None
        return [_str_of(h) for h in _walk(obj, path)]

    def jext_str_list(d, p):
        return pd.Series([_extract_str_list(a, b) for a, b in zip(d, p)])

    def jvalid(s):
        return s.map(lambda v: _parse(v)[1] if v is not None else None)

    def jkeys(s):
        def keys(v):
            obj, ok = _parse(v)
            return list(obj.keys()) if ok and isinstance(obj, dict) else None
        return s.map(keys)

    def jcanon(s):
        def canon(v):
            obj, ok = _parse(v)
            return _json.dumps(obj, separators=(",", ":")) if ok else None
        return s.map(canon)

    def _structure(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "BOOLEAN"
        if isinstance(v, int):
            return "UBIGINT" if v >= 0 else "BIGINT"
        if isinstance(v, float):
            return "DOUBLE"
        if isinstance(v, str):
            return "VARCHAR"
        if isinstance(v, list):
            elems = [_structure(e) for e in v]
            return [_unify(elems)] if elems else ["NULL"]
        if isinstance(v, dict):
            return {k: _structure(x) for k, x in v.items()}
        return "JSON"

    def _unify(structs):
        first = structs[0]
        if all(s == first for s in structs):
            return first
        if all(isinstance(s, str) for s in structs):
            scalars = set(structs) - {"NULL"}
            if scalars <= {"UBIGINT", "BIGINT", "DOUBLE"}:
                if "DOUBLE" in scalars:
                    return "DOUBLE"
                return "BIGINT" if "BIGINT" in scalars else "UBIGINT"
            return "JSON"
        if all(isinstance(s, dict) for s in structs):
            keys = {k for s in structs for k in s}
            return {
                k: _unify([s[k] for s in structs if k in s]) for k in keys
            }
        if all(isinstance(s, list) for s in structs):
            return [_unify([s[0] for s in structs])]
        return "JSON"

    def jstructure(s):
        def one(v):
            obj, ok = _parse(v)
            if not ok:
                return None
            return _json.dumps(_structure(obj), separators=(",", ":"))

        return s.map(one)

    def jquote(s):
        return s.map(
            lambda v: _json.dumps(v, separators=(",", ":"))
            if v is not None
            else None
        )

    def jmerge(a, b):
        def patch(target, p):
            if not isinstance(p, dict):
                return p
            out = dict(target) if isinstance(target, dict) else {}
            for k, v in p.items():
                if v is None:
                    out.pop(k, None)
                else:
                    out[k] = patch(out.get(k), v)
            return out
        def one(x, y):
            tx, okx = _parse(x)
            ty, oky = _parse(y)
            if not (okx and oky):
                return None
            return _json.dumps(patch(tx, ty), separators=(",", ":"))
        return pd.Series([one(x, y) for x, y in zip(a, b)])

    def jcontains(a, b):
        def inside(hay, needle):
            """DuckDB containment: the needle value appears anywhere in
            the haystack tree (objects match on key-subset, arrays on
            element-subset)."""
            def matches(h, n):
                if isinstance(n, dict):
                    return isinstance(h, dict) and all(
                        k in h and matches(h[k], v) for k, v in n.items()
                    )
                if isinstance(n, list):
                    return isinstance(h, list) and all(
                        any(matches(e, v) for e in h) for v in n
                    )
                if isinstance(n, bool) or isinstance(h, bool):
                    return h is n if isinstance(n, bool) else False
                if isinstance(n, (int, float)) and isinstance(
                    h, (int, float)
                ):
                    return float(h) == float(n)
                return h == n
            if matches(hay, needle):
                return True
            if isinstance(hay, dict):
                return any(inside(v, needle) for v in hay.values())
            if isinstance(hay, list):
                return any(inside(e, needle) for e in hay)
            return False

        def one(x, y):
            hx, okx = _parse(x)
            ny, oky = _parse(y)
            if not (okx and oky):
                return None
            return inside(hx, ny)

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    for name, fn, typ in (
        ("dd_json_extract", jext, "string"),
        ("dd_json_extract_list", jext_list, "array<string>"),
        ("dd_json_extract_str", jext_str, "string"),
        ("dd_json_extract_str_list", jext_str_list, "array<string>"),
        ("dd_json_valid", jvalid, "boolean"),
        ("dd_json_keys", jkeys, "array<string>"),
        ("dd_json_canon", jcanon, "string"),
        ("dd_json_merge_patch", jmerge, "string"),
        ("dd_json_structure", jstructure, "string"),
        ("dd_json_quote", jquote, "string"),
        ("dd_json_contains", jcontains, "boolean"),
    ):
        fn.__annotations__ = (
            {"d": pd.Series, "p": pd.Series, "return": pd.Series}
            if fn in (jext, jext_list, jext_str, jext_str_list, jmerge,
                      jcontains)
            else {"s": pd.Series, "return": pd.Series}
        )
        if fn in (jmerge, jcontains):
            fn.__annotations__ = {
                "a": pd.Series, "b": pd.Series, "return": pd.Series
            }
        spark.udf.register(name, pandas_udf(fn, typ))


_DD_NULL_HASH = 13787848793156543929  # DuckDB's hash of NULL (any type)
_DD_HASH_MASK = (1 << 64) - 1
_DD_HASH_COMBINE_K = 0xBF58476D1CE4E5B9


def _dd_murmur_fin(x: int) -> int:
    """DuckDB's integer hash — the xor-shift/multiply finalizer over the
    value's unsigned representation at its own type width (probed
    against live DuckDB for every width; duckdb hash.hpp murmurhash64)."""
    M = _DD_HASH_MASK
    x &= M
    x ^= x >> 32
    x = (x * 0xD6E8FEB86659FD93) & M
    x ^= x >> 32
    x = (x * 0xD6E8FEB86659FD93) & M
    x ^= x >> 32
    return x


def _dd_murmur64a(data: bytes, seed: int = 0xE17A1465) -> int:
    """MurmurHash64A — DuckDB's VARCHAR/BLOB hash (seed probed: the
    classic 0xe17a1465; verified byte-for-byte on live DuckDB)."""
    M = _DD_HASH_MASK
    m, r = 0xC6A4A7935BD1E995, 47
    h = (seed ^ ((len(data) * m) & M)) & M
    i = 0
    while i + 8 <= len(data):
        k = int.from_bytes(data[i : i + 8], "little")
        k = (k * m) & M
        k ^= k >> r
        k = (k * m) & M
        h = ((h ^ k) * m) & M
        i += 8
    tail = data[i:]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & M
    h ^= h >> r
    h = (h * m) & M
    h ^= h >> r
    return h


def _register_hash_shims(spark: SparkSession) -> None:
    """DuckDB's ``hash()`` reproduced bit for bit (UBIGINT results ride
    as digit strings so the 64-bit unsigned range survives; the rewrite
    wraps the outermost call in CAST(… AS DECIMAL(20,0)) like the
    md5_number family). Arrow-batched; values cross as exact digit
    strings, never floats."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def hu64(s):
        def one(v):
            if v is None:
                return str(_DD_NULL_HASH)
            return str(_dd_murmur_fin(int(v)))
        return s.map(one)

    def hstr(s):
        def one(v):
            if v is None:
                return str(_DD_NULL_HASH)
            if isinstance(v, (bytes, bytearray)):
                return str(_dd_murmur64a(bytes(v)))
            return str(_dd_murmur64a(str(v).encode()))
        return s.map(one)

    def hdbl(x, isnull):
        import struct as _struct

        def one(v, n):
            if n:
                return str(_DD_NULL_HASH)
            v = float(v)
            if v == 0.0:  # DuckDB normalizes -0.0 before hashing
                v = 0.0
            bits = _struct.unpack("<Q", _struct.pack("<d", v))[0]
            return str(_dd_murmur_fin(bits))
        return pd.Series([one(v, n) for v, n in zip(x, isnull)])

    def hcomb(a, b):
        M, K = _DD_HASH_MASK, _DD_HASH_COMBINE_K

        def one(x, y):
            if x is None or y is None:
                return None
            return str(((int(x) * K) & M) ^ int(y))
        return pd.Series([one(x, y) for x, y in zip(a, b)])

    hu64.__annotations__ = {"s": pd.Series, "return": pd.Series}
    hstr.__annotations__ = {"s": pd.Series, "return": pd.Series}
    hdbl.__annotations__ = {"x": pd.Series, "isnull": pd.Series,
                            "return": pd.Series}
    hcomb.__annotations__ = {"a": pd.Series, "b": pd.Series,
                             "return": pd.Series}
    spark.udf.register("dd_hash_u64", pandas_udf(hu64, "string"))
    spark.udf.register("dd_hash_str", pandas_udf(hstr, "string"))
    spark.udf.register("dd_hash_dbl", pandas_udf(hdbl, "string"))
    spark.udf.register("dd_hash_combine", pandas_udf(hcomb, "string"))


def _register_text_shims(spark: SparkSession) -> None:
    """NFC normalization as an Arrow-vectorized shim (the JVM exposes no
    SQL spelling for java.text.Normalizer)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def nfc(s):
        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.udf.register("dd_nfc_normalize", pandas_udf(nfc, "string"))

    import re as _re

    def resc(s):
        return s.map(lambda v: _re.escape(v) if v is not None else None)

    resc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.udf.register("dd_regexp_escape", pandas_udf(resc, "string"))

    def lev_bytes(a, b):
        """DuckDB's levenshtein operates on UTF-8 BYTES (probed live:
        levenshtein('kitten','sätting') = 5, not the 4 a character-level
        distance gives) — Spark's builtin counts characters."""

        def one(x, y):
            if x is None or y is None:
                return None
            xb, yb = x.encode("utf-8"), y.encode("utf-8")
            prev = list(range(len(yb) + 1))
            for i, cx in enumerate(xb, 1):
                cur = [i]
                for j, cy in enumerate(yb, 1):
                    cur.append(min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cx != cy),
                    ))
                prev = cur
            return prev[-1]

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    lev_bytes.__annotations__ = {
        "a": pd.Series, "b": pd.Series, "return": pd.Series
    }
    spark.udf.register("dd_lev_bytes", pandas_udf(lev_bytes, "long"))

    def rr_first(s, p, r):
        """DuckDB regexp_replace WITHOUT the 'g' flag replaces only the
        FIRST match (Spark's builtin always replaces all). Backslash
        backreferences (\\1) share syntax between DuckDB and Python re;
        the inline-flag prefix (?i) folded by the rewrite also parses."""

        def one(x, pat, rep):
            if x is None or pat is None or rep is None:
                return None
            return _re.sub(pat, rep, x, count=1)

        return pd.Series([one(*t) for t in zip(s, p, r)])

    rr_first.__annotations__ = {
        "s": pd.Series, "p": pd.Series, "r": pd.Series,
        "return": pd.Series,
    }
    spark.udf.register(
        "dd_regexp_replace_first", pandas_udf(rr_first, "string")
    )

    import calendar as _cal

    def age_seconds(a, b):
        """DuckDB age(x, y) flattened to seconds: swap so x >= y, split
        into months/days/micros with borrows from the SMALLER date's
        month, negate if swapped, then the client's 30-day-month
        flattening — each step probed on live DuckDB 1.0 (battery 14)."""

        def one(x, y):
            if x is None or y is None or x != x or y != y:
                return None
            x, y = x.to_pydatetime(), y.to_pydatetime()
            sign = 1
            if x < y:
                x, y, sign = y, x, -1
            m = 12 * (x.year - y.year) + (x.month - y.month)
            d = x.day - y.day
            us = (
                (x.hour - y.hour) * 3_600_000_000
                + (x.minute - y.minute) * 60_000_000
                + (x.second - y.second) * 1_000_000
                + (x.microsecond - y.microsecond)
            )
            if us < 0:
                d -= 1
                us += 86_400_000_000
            if d < 0:
                m -= 1
                d += _cal.monthrange(y.year, y.month)[1]
            return sign * ((m * 30 + d) * 86400.0 + us / 1e6)

        return pd.Series(
            [one(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    age_seconds.__annotations__ = {
        "a": pd.Series, "b": pd.Series, "return": pd.Series
    }
    spark.udf.register("dd_age_seconds", pandas_udf(age_seconds, "double"))


def _register_distance_shims(spark: SparkSession) -> None:
    """Jaro / Jaro-Winkler / Damerau-Levenshtein as Arrow-vectorized
    pandas UDFs (loop-shaped algorithms with no HOF spelling). Semantics
    pinned to DuckDB 1.0: empty input → 0.0 similarity, Winkler prefix
    ≤ 4 at p = 0.1, Damerau is FULL DL (unrestricted transposition —
    dl('ca','abc') = 2, not OSA's 3)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def jaro(s1: str, s2: str) -> float:
        n1, n2 = len(s1), len(s2)
        if n1 == 0 or n2 == 0:
            return 0.0
        window = max(0, max(n1, n2) // 2 - 1)
        m1 = [False] * n1
        m2 = [False] * n2
        matches = 0
        for i, c in enumerate(s1):
            lo, hi = max(0, i - window), min(n2, i + window + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(n1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (matches / n1 + matches / n2 + (matches - t) / matches) / 3

    def jaro_winkler(s1: str, s2: str) -> float:
        j = jaro(s1, s2)
        if j <= 0.7:  # standard boost threshold (DuckDB applies it too)
            return j
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        return j + prefix * 0.1 * (1 - j)

    def damerau(s1: str, s2: str) -> int:
        # full Damerau-Levenshtein (with alphabet bookkeeping)
        n1, n2 = len(s1), len(s2)
        maxdist = n1 + n2
        da: dict[str, int] = {}
        d = [[0] * (n2 + 2) for _ in range(n1 + 2)]
        d[0][0] = maxdist
        for i in range(n1 + 1):
            d[i + 1][0] = maxdist
            d[i + 1][1] = i
        for j in range(n2 + 1):
            d[0][j + 1] = maxdist
            d[1][j + 1] = j
        for i in range(1, n1 + 1):
            db = 0
            for j in range(1, n2 + 1):
                k = da.get(s2[j - 1], 0)
                l = db
                if s1[i - 1] == s2[j - 1]:
                    cost = 0
                    db = j
                else:
                    cost = 1
                d[i + 1][j + 1] = min(
                    d[i][j] + cost,
                    d[i + 1][j] + 1,
                    d[i][j + 1] + 1,
                    d[k][l] + (i - k - 1) + 1 + (j - l - 1),
                )
            da[s1[i - 1]] = i
        return d[n1 + 1][n2 + 1]

    def make_pair(f, cast):
        def shim(a, b):
            return pd.Series(
                [
                    cast(f(x if x is not None else "", y if y is not None else ""))
                    for x, y in zip(a, b)
                ]
            )

        shim.__annotations__ = {
            "a": pd.Series, "b": pd.Series, "return": pd.Series
        }
        return shim

    spark.udf.register("dd_jaro", pandas_udf(make_pair(jaro, float), "double"))
    spark.udf.register(
        "dd_jaro_winkler", pandas_udf(make_pair(jaro_winkler, float), "double")
    )
    spark.udf.register(
        "dd_damerau", pandas_udf(make_pair(damerau, int), "long")
    )


# DuckDB evaluates these through C libm; the JVM's Math intrinsics differ
# in the last ulp (measured: asin/acos/atan/atan2/exp/ln/log10/log2
# diverge on ordinary inputs). Under DuckDB-first serving they remap to
# Arrow-vectorized pandas UDFs calling Python's math module — the SAME
# libm DuckDB links, so results are bit-identical. Parity shims only:
# native sessions and the non-forced rewrite path keep JVM codegen trig.
_LIBM_FNS = (
    "sin", "cos", "tan", "asin", "acos", "atan",
    "exp", "ln", "log10", "log2", "sinh", "cosh", "tanh",
    # sqrt is IEEE-exact on both engines; it routes through the shim so
    # negative inputs RAISE like DuckDB instead of returning NaN
    "sqrt",
)
_LIBM_RE = re.compile(
    r"\b(" + "|".join(_LIBM_FNS) + r"|atan2)\s*\(", re.IGNORECASE
)
_DEG_RAD_RE = re.compile(r"\b(degrees|radians)\s*\(", re.IGNORECASE)
_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)
# 180/π and π/180 as nearest doubles — DuckDB computes degrees/radians
# as one IEEE multiply by these constants, so a textual multiply matches
# it exactly (verified value-for-value; no UDF needed). CAST to DOUBLE:
# Spark parses bare decimal literals as DECIMAL, which would change the
# arithmetic.
_DEG_CONST = "CAST(57.29577951308232 AS DOUBLE)"
_RAD_CONST = "CAST(0.017453292519943295 AS DOUBLE)"


def _register_libm_shims(spark: SparkSession) -> None:
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    impl = {name: getattr(math, name) for name in _LIBM_FNS if name != "ln"}
    impl["ln"] = math.log

    # DuckDB raises on log/sqrt domain violations (probed live:
    # 'cannot take logarithm of zero' / 'of a negative number' /
    # 'cannot take square root of a negative number'); other libm
    # domain errors keep the NaN convention
    _DOMAIN_RAISERS = {"ln", "log10", "log2", "sqrt"}

    def make(f, name=None):
        def shim(s):
            def one(v):
                try:
                    return f(v)
                except (ValueError, OverflowError, TypeError):
                    if name in _DOMAIN_RAISERS and v == v:
                        if name == "sqrt":
                            raise ValueError(
                                "cannot take square root of a negative "
                                "number"
                            )
                        raise ValueError(
                            "cannot take logarithm of zero" if v == 0
                            else "cannot take logarithm of a negative "
                                 "number"
                        )
                    return float("nan")

            return s.astype("float64").map(one)

        # real annotation objects: the module-wide `from __future__ import
        # annotations` would otherwise leave unresolvable strings and
        # break pandas_udf's type inference
        shim.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return shim

    # gamma/lgamma have NO Spark spelling at all (not just a divergent
    # one), so they rename to these shims unconditionally, not only
    # under DuckDB-first serving
    impl["gamma"] = math.gamma
    impl["lgamma"] = math.lgamma
    for name, f in impl.items():
        spark.udf.register(
            f"dd_libm_{name}", pandas_udf(make(f, name), "double")
        )

    def nextafter_shim(a, b):
        return pd.Series(
            [
                math.nextafter(x, y)
                for x, y in zip(a.astype("float64"), b.astype("float64"))
            ]
        )

    nextafter_shim.__annotations__ = {
        "a": pd.Series, "b": pd.Series, "return": pd.Series
    }
    spark.udf.register("dd_libm_nextafter", pandas_udf(nextafter_shim, "double"))

    def atan2_shim(y, x):
        return pd.Series(
            [
                math.atan2(a, b)
                for a, b in zip(y.astype("float64"), x.astype("float64"))
            ]
        )

    atan2_shim.__annotations__ = {
        "y": pd.Series, "x": pd.Series, "return": pd.Series
    }
    spark.udf.register("dd_libm_atan2", pandas_udf(atan2_shim, "double"))

    # DuckDB rounds doubles as floor(v·10^p + 0.5)/10^p (ceil for
    # negatives) — calibrated bit-exact against it over 6k cases; Spark's
    # HALF_UP over the decimal representation disagrees within an ulp of
    # the .5 boundary, which is exactly where libm-exact inputs land.
    def round_shim(v, p):
        out = []
        for a, b in zip(v.astype("float64"), p):
            if a != a or a in (float("inf"), float("-inf")):
                out.append(a)
                continue
            power = 10.0 ** int(b)
            out.append(
                math.floor(a * power + 0.5) / power
                if a >= 0
                else math.ceil(a * power - 0.5) / power
            )
        return pd.Series(out)

    round_shim.__annotations__ = {
        "v": pd.Series, "p": pd.Series, "return": pd.Series
    }
    spark.udf.register("dd_libm_round", pandas_udf(round_shim, "double"))


def _primary_end(s: str, start: int) -> int:
    """Forward walk past unary signs and ONE primary expression starting
    at/after ``start`` (identifier/number/mask chars, call/bracket
    groups, and a trailing ``OVER (…)`` clause); returns the end index
    (exclusive)."""
    i = start
    while i < len(s) and s[i] in " \t\n":
        i += 1
    while i < len(s) and s[i] in "+-":
        i += 1
        while i < len(s) and s[i] in " \t\n":
            i += 1
    begun = False
    while i < len(s):
        c = s[i]
        if c.isalnum() or c in "_.\x00":
            i += 1
            begun = True
        elif c in "([" and begun or c == "(":
            depth = 0
            while i < len(s):
                if s[i] in "([":
                    depth += 1
                elif s[i] in ")]":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
            begun = True
        else:
            break
    # a windowed aggregate "agg(x) OVER (…)" is one primary
    m = re.match(r"\s+OVER\s*\(", s[i:], re.IGNORECASE)
    if begun and m:
        open_idx = i + m.end() - 1
        i = _matching_paren(s, open_idx) + 1
    # a postfix '::type' cast binds tighter than any binary operator
    # (DuckDB: a / b::INT divides by the cast divisor) — consume chained
    # casts, parameterized types, and array-type suffixes as the primary
    while begun:
        m2 = re.match(r"\s*::\s*([A-Za-z_]\w*)", s[i:])
        if not m2:
            break
        i += m2.end()
        m3 = re.match(r"\s*\(", s[i:])
        if m3:
            i = _matching_paren(s, i + m3.end() - 1) + 1
        while m4 := re.match(r"\s*\[\s*\]", s[i:]):
            i += m4.end()
    return i


_AT_ABS_RE = re.compile(r"(?<![\w\x00])@(?!\s*[>=<@])\s*")


_AT_ARITH_OP_RE = re.compile(r"\s*(\+|-|\*|//|/|%|\bDIV\b)\s*", re.IGNORECASE)


def _rewrite_at_abs(s: str) -> str:
    """DuckDB's prefix ``@x`` absolute-value operator → ``abs(x)``.
    Postgres generic-operator precedence: ``@`` binds LOOSER than
    arithmetic but tighter than comparisons (``@ -2 - 3`` is abs(-5)=5,
    ``@ -2 = 2`` is true) — so consume the whole arithmetic chain.
    Each pass consumes one ``@``, so nested ``@ @ x`` terminates."""
    while m := _AT_ABS_RE.search(s):
        end = _primary_end(s, m.end())
        if end <= m.end():
            return s  # dangling '@' — leave it to fail at parse time
        while op := _AT_ARITH_OP_RE.match(s, end):
            nxt = _primary_end(s, op.end())
            if nxt <= op.end():
                break
            end = nxt
        inner = s[m.end() : end]
        s = s[: m.start()] + f"abs({inner})" + s[end:]
    return s


def _rewrite_division(s: str) -> str:
    """DuckDB's ``/`` ALWAYS returns DOUBLE (``SELECT typeof(10/4)`` →
    DOUBLE; decimal operands included) and division by zero yields NULL
    (ANSI Spark raises), while Spark keeps DECIMAL arithmetic when a
    decimal literal is involved — so ``p_size / 51.0`` diverges from
    DuckDB before any function ever runs. Rewriting ``l / r`` to
    ``try_divide(CAST(l AS DOUBLE), r)`` fixes the result type AND the
    zero behavior in one move; downstream mixed arithmetic then promotes
    identically in both engines."""
    i = 0
    while i < len(s):
        if s[i] != "/":
            i += 1
            continue
        if (i > 0 and s[i - 1] == "/") or (i + 1 < len(s) and s[i + 1] == "/"):
            i += 1  # '//' integer division — not this operator
            continue
        # walk back over one primary operand (a windowed aggregate
        # ``agg(x) OVER (…)`` is one primary: on consuming the OVER
        # keyword, keep walking through the space to the aggregate call)
        j = i - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        end = j + 1
        while j >= 0:
            if s[j] in " \t\n:":
                # a gap inside a primary only when it precedes the frame
                # of an OVER clause ("agg(x) OVER (…)" is one operand) or
                # a postfix '::' cast (the cast's operand is the primary)
                k = j
                while k >= 0 and s[k] in " \t\n":
                    k -= 1
                wm = re.search(r"([A-Za-z_]\w*)$", s[: k + 1])
                if wm and wm.group(1).upper() == "OVER":
                    j = k
                elif k >= 1 and s[k] == ":" and s[k - 1] == ":" and j + 1 < end:
                    j = k - 2
                    while j >= 0 and s[j] in " \t\n":
                        j -= 1
                else:
                    break
            elif s[j] in ")]":
                depth, openc = 1, "(" if s[j] == ")" else "["
                closec = s[j]
                j -= 1
                while j >= 0 and depth:
                    if s[j] == closec:
                        depth += 1
                    elif s[j] == openc:
                        depth -= 1
                    j -= 1
            elif s[j].isalnum() or s[j] in "_.\x00":
                w_end = j + 1
                while j >= 0 and (s[j].isalnum() or s[j] in "_.\x00"):
                    j -= 1
                if s[j + 1 : w_end].upper() == "OVER":
                    while j >= 0 and s[j] in " \t\n":
                        j -= 1
            else:
                break
        start = j + 1
        operand = s[start:end]
        prev_word = re.search(r"([A-Za-z_]\w*)\s*$", s[:start])
        if (
            not operand.strip()
            or operand.strip().upper() in ("END", "OVER")
            or (prev_word and prev_word.group(1).upper() == "OVER")
        ):
            i += 1  # CASE…END / named-window operands: leave untouched
            continue
        r_end = _primary_end(s, i + 1)
        right = s[i + 1 : r_end].strip()
        if not right:
            i += 1
            continue
        repl = f"try_divide(CAST({operand} AS DOUBLE), {right})"
        s = s[:start] + repl + s[r_end:]
        i = start + len(repl)
    return s


def _rewrite_try_mod(s: str) -> str:
    """DuckDB-first only: ``l % r`` → ``try_mod(l, r)`` — DuckDB's
    modulo by zero yields NULL where ANSI Spark raises; values agree for
    every nonzero divisor (both truncate toward the dividend's sign)."""
    i = 0
    while i < len(s):
        if s[i] != "%":
            i += 1
            continue
        j = i - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        end = j + 1
        start = _primary_back(s, end)
        operand = s[start:end]
        if not operand.strip():
            i += 1
            continue
        r_end = _primary_end(s, i + 1)
        right = s[i + 1 : r_end].strip()
        if not right:
            i += 1
            continue
        repl = f"try_mod({operand}, {right})"
        s = s[:start] + repl + s[r_end:]
        i = start + len(repl)
    return s


_EXPR_HEAD_KEYWORDS = {
    "SELECT", "WHERE", "AND", "OR", "NOT", "ON", "WHEN", "THEN", "ELSE",
    "BY", "HAVING", "RETURN", "IN", "LIKE", "RLIKE", "BETWEEN", "CASE",
    "UNION", "ALL", "DISTINCT", "AS", "SET", "VALUES", "QUALIFY",
}


def _primary_back(s: str, end: int) -> int:
    """Backward walk over ONE primary expression ending at ``end``
    (exclusive): identifier/number/mask chars and call/bracket groups,
    plus a unary sign when what precedes it cannot end an expression
    (operator, opening paren, comma, or a clause keyword — so ``-1`` in
    ``WHERE -1 = …`` binds, but the minus in ``a - 1`` does not).
    Returns the start index."""
    j = end - 1
    while j >= 0:
        if s[j] in ")]":
            depth = 1
            openc = "(" if s[j] == ")" else "["
            closec = s[j]
            j -= 1
            while j >= 0 and depth:
                if s[j] == closec:
                    depth += 1
                elif s[j] == openc:
                    depth -= 1
                j -= 1
        elif s[j].isalnum() or s[j] in "_.\x00":
            while j >= 0 and (s[j].isalnum() or s[j] in "_.\x00"):
                j -= 1
        elif s[j] in " \t\n:" and j + 1 < end:
            # what we consumed so far may be the TYPE of a postfix
            # '::' cast — if so, the cast and its operand are one primary
            k = j
            while k >= 0 and s[k] in " \t\n":
                k -= 1
            if k >= 1 and s[k] == ":" and s[k - 1] == ":":
                j = k - 2
                while j >= 0 and s[j] in " \t\n":
                    j -= 1
            else:
                break
        else:
            break
    start = j + 1
    k = j
    while k >= 0 and s[k] in " \t\n":
        k -= 1
    if k >= 0 and s[k] in "+-":
        p = k - 1
        while p >= 0 and s[p] in " \t\n":
            p -= 1
        if p < 0 or s[p] in "(,=<>*/%^|+-":
            return k
        wm = re.search(r"([A-Za-z_]\w*)$", s[: p + 1])
        if wm and wm.group(1).upper() in _EXPR_HEAD_KEYWORDS:
            return k
    return start


def _primary_fwd(s: str, start: int) -> int:
    """Forward walk over ONE primary expression starting at ``start``:
    an optional unary sign, then an identifier path / number / mask /
    bracket group, then postfix call parens, subscripts, and ``::``
    casts. Returns the exclusive end index."""
    n = len(s)
    j = start
    while j < n and s[j] in " \t\n":
        j += 1
    if j < n and s[j] in "+-":
        j += 1
        while j < n and s[j] in " \t\n":
            j += 1
    if j < n and s[j] in "([":
        openc, closec = s[j], ")" if s[j] == "(" else "]"
        depth = 1
        j += 1
        while j < n and depth:
            if s[j] == openc:
                depth += 1
            elif s[j] == closec:
                depth -= 1
            j += 1
    elif j < n and (s[j].isalnum() or s[j] in "_\x00"):
        while j < n and (s[j].isalnum() or s[j] in "_.\x00"):
            j += 1
    else:
        return start
    # postfix: call parens, subscripts, :: casts
    while j < n:
        k = j
        while k < n and s[k] in " \t\n":
            k += 1
        if k < n and s[k] in "([":
            openc, closec = s[k], ")" if s[k] == "(" else "]"
            depth = 1
            k += 1
            while k < n and depth:
                if s[k] == openc:
                    depth += 1
                elif s[k] == closec:
                    depth -= 1
                k += 1
            j = k
        elif k + 1 < n and s[k] == ":" and s[k + 1] == ":":
            k += 2
            while k < n and s[k] in " \t\n":
                k += 1
            while k < n and (s[k].isalnum() or s[k] == "_"):
                k += 1
            j = k
        else:
            break
    return j


#  no whitespace before the paren: ``FROM db.tbl (alias_list)`` must
#  never read as a method call
_DOT_CALL_RE = re.compile(r"\.([A-Za-z_]\w*)\(")
# prefixes that are schema qualifiers, not method receivers — DuckDB
# resolves main.abs(-1) as the schema-qualified function
_DOT_CALL_SCHEMAS = {
    "main", "temp", "system", "memory",
    "pg_catalog", "information_schema",
}


def _rewrite_dot_calls(s: str) -> str:
    """DuckDB's method-call sugar: ``expr.fn(args)`` ≡ ``fn(expr,
    args)``, chainable left to right (``x.sqrt().round(2)``). Bare
    number and string-literal receivers stay untouched — they are
    parser errors in DuckDB too — as do the known schema qualifiers."""
    pos = 0
    while m := _DOT_CALL_RE.search(s, pos):
        dot = m.start()
        prev = s[dot - 1] if dot else ""
        if not (prev.isalnum() or prev in "_)]\x00"):
            pos = m.end()
            continue
        start = _primary_back(s, dot)
        primary = s[start:dot].strip()
        if primary.lower() in _DOT_CALL_SCHEMAS:
            # schema-qualified call: main.abs(-1) ≡ abs(-1) — strip the
            # qualifier (Spark resolves only bare function names)
            s = s[:start] + s[dot + 1 :]
            pos = start
            continue
        if (
            not primary
            or re.fullmatch(r"[+-]?\d+", primary)       # 5.abs() — parser
            or re.fullmatch(r"[+-]?\d*\.\d+", primary)   # 1.5.round() — error
            or re.fullmatch(r"\x00\d+\x00", primary)     # 'x'.fn() — error
        ):
            pos = m.end()
            continue
        # a dotted path keeps everything up to the LAST segment as the
        # receiver (t.x.abs() → abs(t.x)) — unless its head is a schema
        head = primary.split(".", 1)[0].lower()
        if head in _DOT_CALL_SCHEMAS:
            pos = m.end()
            continue
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        inner = s[open_idx + 1 : close].strip()
        repl = f"{m.group(1)}({primary}" + (f", {inner}" if inner else "") + ")"
        s = s[:start] + repl + s[close + 1 :]
        pos = start  # rescan so the next link of a chain resolves
    return s


# --- nested-type comparison operators (battery 33) --------------------------
# DuckDB compares lists/structs by a LEFT-TO-RIGHT SHORT-CIRCUIT scan in
# which a NULL element/field pair stops the scan with UNKNOWN (probed
# live: [NULL,1] = [NULL,2] is NULL even though index 1 differs;
# [2,NULL] < [1,2] is FALSE — first pair decides; [1] = [1,2] is FALSE —
# equal prefix, then length). Spark treats nested NULLs as ordinary
# equal/orderable values (struct{'a':NULL} = struct{'a':NULL} is TRUE) —
# a silent wrong answer whenever runtime NULLs appear. The rewrite fires
# only when an operand is PROVABLY nested (array(...)/named_struct(...)
# spellings, CAST targets, or catalog-kind columns); structs need field
# names (from a literal, a cast type, or the column schema) and fail
# closed otherwise, as do map comparisons.

_NESTED_CMP_RE = re.compile(r"<>|!=|<=|>=|=|<|>")


def _nested_shape(p: str, kinds: dict[str, str] | None):
    """'list' / 'map' / ('struct', fields|None) / None for one primary."""
    t = p.strip()
    if re.match(r"(?i)^array\s*\(", t):
        return "list"
    if re.match(r"(?i)^named_struct\s*\(", t):
        return ("struct", None)  # fields parsed lazily by the caller
    if re.match(r"(?i)^map\s*\(", t):
        return "map"
    if re.match(r"(?i)^CAST\s*\(", t):
        cm = re.search(
            r"(?i)\bAS\s+(STRUCT\s*\(|MAP\s*\(|ARRAY\s*<|[A-Za-z]+\s*\[)", t
        )
        if cm:
            g = cm.group(1).upper()
            if g.startswith("STRUCT"):
                inner = t[cm.end() - 1 : _matching_paren(t, cm.end() - 1)]
                fields = []
                for part in inner.lstrip("(").split(","):
                    fm = re.match(r"\s*([A-Za-z_]\w*)\s+", part)
                    if fm:
                        fields.append(fm.group(1))
                return ("struct", fields or None)
            if g.startswith("MAP"):
                return "map"
            return "list"
        return None
    if re.fullmatch(r"[A-Za-z_][\w.]*", t) and kinds:
        k = kinds.get(t.split(".")[-1].lower()) or ""
        if k == "array":
            return "list"
        if k == "map":
            return "map"
        if k.startswith("struct:"):
            return ("struct", k[7:].split(","))
    return None


def _named_struct_fields(p: str, table: list[str]) -> list[str] | None:
    """Field names of a ``named_struct(key, val, ...)`` spelling (keys
    are masked string literals)."""
    t = p.strip()
    open_idx = t.index("(")
    args = _split_top_commas(t[open_idx + 1 : _matching_paren(t, open_idx)])
    fields = []
    for key in args[::2]:
        lit = _literal_value(_unmask(key.strip(), table))
        if lit is None:
            return None
        fields.append(str(lit))
    return fields or None


def _list_cmp_sql(a: str, b: str, op: str, distinct: bool = False) -> str:
    """DuckDB's short-circuit pairwise scan over the shared prefix as a
    Spark aggregate fold: per-pair code 0=equal 1=lt 2=gt 3=unknown,
    first nonzero sticks; the all-equal prefix falls through to the
    length comparison.

    ``distinct=True`` is the BOOLEAN-context variant (battery 37,
    probed live on DuckDB 1.0): filter/join/CASE-condition consumers
    compare nested types with IS-DISTINCT-FROM-style total order — a
    NULL element equals a NULL element and sorts LAST (larger than any
    value); only a top-level NULL operand still yields UNKNOWN."""
    a, b = f"({a})", f"({b})"
    n = f"least(size({a}), size({b}))"
    if distinct:
        if op in ("=", "<>", "!="):
            pair = (
                "CASE WHEN __dd_x IS NULL AND __dd_y IS NULL THEN 0 "
                "WHEN __dd_x IS NULL OR __dd_y IS NULL THEN 1 "
                "WHEN __dd_x = __dd_y THEN 0 ELSE 1 END"
            )
        else:
            pair = (
                "CASE WHEN __dd_x IS NULL AND __dd_y IS NULL THEN 0 "
                "WHEN __dd_x IS NULL THEN 2 "
                "WHEN __dd_y IS NULL THEN 1 "
                "WHEN __dd_x = __dd_y THEN 0 "
                "WHEN __dd_x < __dd_y THEN 1 ELSE 2 END"
            )
    elif op in ("=", "<>", "!="):
        pair = ("CASE WHEN __dd_x = __dd_y THEN 0 "
                "WHEN NOT (__dd_x = __dd_y) THEN 1 ELSE 3 END")
    else:
        pair = ("CASE WHEN __dd_x = __dd_y THEN 0 "
                "WHEN __dd_x < __dd_y THEN 1 "
                "WHEN __dd_x > __dd_y THEN 2 ELSE 3 END")
    scan = (
        f"aggregate(zip_with(slice({a}, 1, {n}), slice({b}, 1, {n}), "
        f"(__dd_x, __dd_y) -> {pair}), 0, "
        f"(__dd_acc, __dd_p) -> "
        f"CASE WHEN __dd_acc <> 0 THEN __dd_acc ELSE __dd_p END)"
    )
    if op in ("=", "<>", "!="):
        core = (
            f"CASE {scan} WHEN 1 THEN false "
            f"WHEN 3 THEN CAST(NULL AS BOOLEAN) "
            f"ELSE size({a}) = size({b}) END"
        )
    else:
        lt_res = "true" if op in ("<", "<=") else "false"
        gt_res = "false" if op in ("<", "<=") else "true"
        tail = f"size({a}) {op} size({b})"
        core = (
            f"CASE {scan} WHEN 1 THEN {lt_res} WHEN 2 THEN {gt_res} "
            f"WHEN 3 THEN CAST(NULL AS BOOLEAN) ELSE {tail} END"
        )
    out = (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL "
        f"THEN CAST(NULL AS BOOLEAN) ELSE {core} END)"
    )
    if op in ("<>", "!="):
        out = f"(NOT {out})"
    return out


def _struct_cmp_sql(
    a: str, b: str, op: str, fields: list[str], table: list[str],
    distinct: bool = False,
) -> str:
    """Field-by-field short-circuit CASE chain (declaration order);
    backtick-quoted dotted access so arbitrary names survive (and the
    later subscript rewrite never touches it). ``distinct=True`` is the
    boolean-context total order (see _list_cmp_sql): NULL fields equal,
    NULL sorts last."""
    a, b = f"({a})", f"({b})"
    whens = []
    for f in fields:
        fq = "`" + f.replace("`", "``") + "`"
        pa, pb = f"{a}.{fq}", f"{b}.{fq}"
        if distinct:
            if op in ("=", "<>", "!="):
                whens.append(f"WHEN NOT ({pa} <=> {pb}) THEN false")
            else:
                lt_res = "true" if op in ("<", "<=") else "false"
                gt_res = "false" if op in ("<", "<=") else "true"
                whens.append(
                    f"WHEN {pa} IS NULL AND {pb} IS NOT NULL "
                    f"THEN {gt_res}"
                )
                whens.append(
                    f"WHEN {pb} IS NULL AND {pa} IS NOT NULL "
                    f"THEN {lt_res}"
                )
                whens.append(f"WHEN {pa} < {pb} THEN {lt_res}")
                whens.append(f"WHEN {pa} > {pb} THEN {gt_res}")
        elif op in ("=", "<>", "!="):
            whens.append(f"WHEN NOT ({pa} = {pb}) THEN false")
            whens.append(
                f"WHEN ({pa} = {pb}) IS NULL THEN CAST(NULL AS BOOLEAN)"
            )
        else:
            lt_res = "true" if op in ("<", "<=") else "false"
            gt_res = "false" if op in ("<", "<=") else "true"
            whens.append(f"WHEN {pa} < {pb} THEN {lt_res}")
            whens.append(f"WHEN {pa} > {pb} THEN {gt_res}")
            whens.append(
                f"WHEN ({pa} = {pb}) IS NULL THEN CAST(NULL AS BOOLEAN)"
            )
    tail = {"=": "true", "<>": "true", "!=": "true",
            "<": "false", ">": "false", "<=": "true", ">=": "true"}[op]
    if op in ("<>", "!="):
        tail = "true"
    core = "CASE " + " ".join(whens) + f" ELSE {tail} END"
    out = (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL "
        f"THEN CAST(NULL AS BOOLEAN) ELSE {core} END)"
    )
    if op in ("<>", "!="):
        # the whens above encode the EQ scan; NOT-wrap flips it with
        # three-valued semantics (the chain used eq-shaped whens)
        eq_core = "CASE " + " ".join(whens) + " ELSE true END"
        out = (
            f"(NOT (CASE WHEN {a} IS NULL OR {b} IS NULL "
            f"THEN CAST(NULL AS BOOLEAN) ELSE {eq_core} END))"
        )
    return out


# DuckDB's interval → VARCHAR rendering (probed live): months normalize
# to 'N year(s) M month(s)', days to 'N day(s)' (weeks×7), micros to
# 'HH:MM:SS[.frac]' with unbounded hours and trailing zeros trimmed;
# the time part prints when nonzero or when everything is zero.
_IVL_UNIT = {
    "year": (12, 0, 0), "years": (12, 0, 0),
    "quarter": (3, 0, 0), "quarters": (3, 0, 0),
    "month": (1, 0, 0), "months": (1, 0, 0),
    "decade": (120, 0, 0), "decades": (120, 0, 0),
    "century": (1200, 0, 0), "centuries": (1200, 0, 0),
    "millennium": (12000, 0, 0), "millennia": (12000, 0, 0),
    "week": (0, 7, 0), "weeks": (0, 7, 0),
    "day": (0, 1, 0), "days": (0, 1, 0),
    "hour": (0, 0, 3_600_000_000), "hours": (0, 0, 3_600_000_000),
    "minute": (0, 0, 60_000_000), "minutes": (0, 0, 60_000_000),
    "second": (0, 0, 1_000_000), "seconds": (0, 0, 1_000_000),
    "millisecond": (0, 0, 1000), "milliseconds": (0, 0, 1000),
    "microsecond": (0, 0, 1), "microseconds": (0, 0, 1),
}
_IVL_CAST_RE = re.compile(
    r"CAST\s*\(\s*INTERVAL\s+(\d+)\s+([A-Za-z]+)\s+AS\s+"
    r"(?:VARCHAR|STRING)\s*\)",
    re.IGNORECASE,
)


def _duck_interval_str(months: int, days: int, micros: int) -> str:
    parts = []
    if months:
        y, mo = divmod(months, 12)
        if y:
            parts.append(f"{y} year" + ("s" if y != 1 else ""))
        if mo:
            parts.append(f"{mo} month" + ("s" if mo != 1 else ""))
    if days:
        parts.append(f"{days} day" + ("s" if days != 1 else ""))
    if micros or not parts:
        h, rem = divmod(micros, 3_600_000_000)
        m, rem = divmod(rem, 60_000_000)
        sec, us = divmod(rem, 1_000_000)
        t = f"{h:02d}:{m:02d}:{sec:02d}"
        if us:
            t += ("." + f"{us:06d}").rstrip("0")
        parts.append(t)
    return " ".join(parts)


def _rewrite_interval_varchar(s: str, table: list[str]) -> str:
    def fold(m: re.Match) -> str:
        unit = m.group(2).lower()
        if unit not in _IVL_UNIT:
            return m.group(0)
        f = _IVL_UNIT[unit]
        n = int(m.group(1))
        return _masked_literal(
            table, _duck_interval_str(n * f[0], n * f[1], n * f[2])
        )

    return _IVL_CAST_RE.sub(fold, s)


def _rewrite_nested_cast_types(s: str) -> str:
    """DuckDB STRUCT(name TYPE, ...) / MAP(K, V) type spellings in cast
    position → Spark STRUCT<name: TYPE, ...> / MAP<K, V> (one level;
    nested parens fall through to a Spark parse error, fail-closed).
    Runs BEFORE _rewrite_struct_map so a MAP(K, V) cast target is never
    mistaken for DuckDB's two-list map() constructor."""

    def _struct_type(mm: re.Match) -> str:
        fields = []
        for part in mm.group(2).split(","):
            fm = re.match(r"\s*([A-Za-z_]\w*)\s+(.+?)\s*$", part)
            if not fm:
                return mm.group(0)
            ft = re.sub(r"(?i)^VARCHAR$", "STRING", fm.group(2).strip())
            ft = re.sub(r"(?i)^([A-Za-z]+)\s*\[\s*\d*\s*\]$",
                        lambda am: f"ARRAY<{am.group(1)}>", ft)
            fields.append(f"{fm.group(1)}: {ft}")
        return f"{mm.group(1)}STRUCT<{', '.join(fields)}>"

    s = re.sub(
        r"(::\s*|\bAS\s+)STRUCT\s*\(([^()]*)\)",
        _struct_type,
        s,
        flags=re.IGNORECASE,
    )
    return re.sub(
        r"(::\s*|\bAS\s+)MAP\s*\(\s*([A-Za-z]+)\s*,\s*([A-Za-z]+)\s*\)",
        lambda mm: "{}MAP<{}, {}>".format(
            mm.group(1),
            re.sub(r"(?i)^VARCHAR$", "STRING", mm.group(2)),
            re.sub(r"(?i)^VARCHAR$", "STRING", mm.group(3)),
        ),
        s,
        flags=re.IGNORECASE,
    )


_CMP_LEFT_BOOL = {"WHERE", "HAVING", "WHEN", "ON", "AND", "OR", "NOT"}
_CMP_RIGHT_BOOL = {
    "AND", "OR", "THEN", "ORDER", "GROUP", "LIMIT", "OFFSET", "QUALIFY",
    "WINDOW", "UNION", "INTERSECT", "EXCEPT", "JOIN", "INNER", "LEFT",
    "RIGHT", "FULL", "CROSS", "WHERE", "USING", "ELSE", "END", "WHEN",
    "HAVING",
}
# identifiers allowed inside a CONSTANT nested literal (const-folded
# comparisons keep value semantics even in boolean position — probed:
# WHERE [1,NULL] = [1,NULL] filters the row while WHERE col = [1,NULL]
# keeps it)
_CMP_CONST_WORDS = {
    "NULL", "TRUE", "FALSE", "CAST", "AS", "ARRAY", "MAP", "NAMED_STRUCT",
    "STRUCT", "ROW", "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT", "REAL", "VARCHAR", "STRING", "TEXT", "BOOLEAN",
    "DECIMAL", "NUMERIC", "DATE", "TIMESTAMP", "INTERVAL",
}


def _tok_before(s: str, i: int) -> tuple[str | None, int]:
    """Last token (word upper-cased, or single char) ending before
    position i, with its start index."""
    j = i - 1
    while j >= 0 and s[j] in " \t\n":
        j -= 1
    if j < 0:
        return None, -1
    m = re.search(r"([A-Za-z_][\w$]*)\Z", s[: j + 1])
    if m:
        return m.group(1).upper(), m.start()
    return s[j], j


def _tok_after(s: str, i: int) -> str | None:
    j = i
    while j < len(s) and s[j] in " \t\n":
        j += 1
    if j >= len(s):
        return None
    m = re.match(r"[A-Za-z_][\w$]*", s[j:])
    if m:
        return m.group(0).upper()
    return s[j]


def _cmp_is_constant(p: str) -> bool:
    """Whether a nested-comparison operand spells a constant literal
    (no column references) — DuckDB const-folds those before its
    boolean-context distinct conversion kicks in."""
    for w in re.findall(r"[A-Za-z_][\w$]*", p):
        if w.upper() not in _CMP_CONST_WORDS:
            return False
    return True


def _boolctx_ranges(s: str) -> list[tuple[int, int]]:
    """Interior spans of ``__dd_boolctx(...)`` markers — the internal
    wrapper DML handlers put around WHERE predicates so the nested-
    comparison rewrite still sees filter context after the predicate is
    embedded in coalesce(CAST(...)) NULL plumbing. Stripped to plain
    parens at the end of the rewrite."""
    out = []
    for m in re.finditer(r"(?i)__dd_boolctx\s*\(", s):
        close = _matching_paren(s, m.end() - 1)
        if close > 0:
            out.append((m.end(), close))
    return out


def _cmp_bool_context(s: str, lstart: int, rend: int) -> bool:
    """Whether a comparison spanning [lstart, rend) feeds a filter /
    JOIN ON / HAVING / CASE-condition consumer. DuckDB 1.0 compares
    nested types in those positions with IS-DISTINCT-FROM total order
    (probed live, battery 37); value positions (SELECT list, function
    arguments, FILTER(WHERE ...), a wrapped (cmp) IS NULL / = true)
    keep three-valued semantics. Residual unmodeled shapes, documented:
    CAST(cmp AS BOOLEAN) inside a filter (DuckDB propagates boolean
    context through the cast; we classify it a function call) and a
    boolean chain nested inside a function argument (classified by its
    nearest AND/OR/NOT)."""
    tok, at = _tok_before(s, lstart)
    while tok == "(":
        ptok, pat = _tok_before(s, at)
        if ptok is None or ptok == ",":
            return False  # statement start / function argument
        if re.match(r"[A-Za-z_]", ptok):
            if ptok in _CMP_LEFT_BOOL:
                tok, at = ptok, pat  # keyword '(' = grouping paren
                break
            return False  # function call argument (or SELECT list etc.)
        tok, at = ptok, pat  # another '(' — keep walking out
    if tok not in _CMP_LEFT_BOOL:
        return False
    if tok == "WHERE":
        ptok, pat = _tok_before(s, at)
        if ptok == "(":
            p2, _ = _tok_before(s, pat)
            if p2 == "FILTER":
                return False  # FILTER (WHERE cmp) is value-semantics
    # right side: any run of closing parens, then a clause keyword,
    # statement end, or nothing
    j = rend
    while True:
        nxt = _tok_after(s, j)
        if nxt == ")":
            j = s.index(")", j) + 1
            continue
        if nxt is None or nxt == ";":
            return True
        if isinstance(nxt, str) and nxt in _CMP_RIGHT_BOOL:
            return True
        return False


def _rewrite_nested_comparisons(
    s: str, table: list[str], kinds: dict[str, str] | None
) -> str:
    dml = re.match(r"(?i)\s*(UPDATE|MERGE|INSERT|DELETE)\b", s)
    if dml:
        # Assignment '=' in DML SET lists is not a comparison, but the
        # statement's query body still carries DuckDB nested-NULL
        # semantics (r10 ADVICE: INSERT INTO ... SELECT was skipped
        # wholesale). Rewrite only the safe sub-range: the embedded
        # SELECT/VALUES body for INSERT (stopping before ON CONFLICT's
        # DO UPDATE SET), the WHERE tail for UPDATE/DELETE, and the ON
        # condition for MERGE.
        kw = dml.group(1).upper()
        if kw == "INSERT":
            body = re.search(r"(?i)\b(SELECT|VALUES)\b", s)
            if not body:
                return s
            i = body.start()
            conflict = re.search(r"(?i)\bON\s+CONFLICT\b", s)
            j = conflict.start() if conflict and conflict.start() > i else len(s)
        elif kw in ("UPDATE", "DELETE"):
            body = re.search(r"(?i)\bWHERE\b", s)
            if not body:
                return s
            i, j = body.start(), len(s)
        else:  # MERGE: the ON condition up to the first WHEN [NOT] MATCHED
            on_m = re.search(r"(?i)\bON\b", s)
            when_m = re.search(r"(?i)\bWHEN\s+(?:NOT\s+)?MATCHED\b", s)
            if not on_m or not when_m or on_m.start() >= when_m.start():
                return s
            i, j = on_m.start(), when_m.start()
        return (
            s[:i]
            + _rewrite_nested_comparisons(s[i:j], table, kinds)
            + s[j:]
        )
    pos = 0
    while m := _NESTED_CMP_RE.search(s, pos):
        op = m.group(0)
        before = s[m.start() - 1] if m.start() else ""
        if before in ":<>!-=" or s[m.end() : m.end() + 1] in (">", "="):
            pos = m.end()
            continue
        j = m.start() - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        lstart = _primary_back(s, j + 1)
        left = s[lstart : j + 1].strip()
        rend = _primary_fwd(s, m.end())
        right = s[m.end() : rend].strip()
        if not left or not right:
            pos = m.end()
            continue
        if re.match(r"(?i)^\(\s*SELECT\b", left) or re.match(
            r"(?i)^\(\s*SELECT\b", right
        ):
            pos = m.end()
            continue
        ls, rs = _nested_shape(left, kinds), _nested_shape(right, kinds)
        if ls is None and rs is None:
            pos = m.end()
            continue
        if "map" in (ls, rs):
            raise DialectError(
                "map comparison operators are not supported (DuckDB "
                "short-circuit NULL semantics have no Spark equivalent)"
            )
        # boolean-context (filter/ON/HAVING/CASE-condition) comparisons
        # use DuckDB's distinct total order — unless both operands are
        # constants, which DuckDB folds at value semantics first
        in_marker = any(
            a <= lstart and rend <= b for a, b in _boolctx_ranges(s)
        )
        distinct = (in_marker or _cmp_bool_context(s, lstart, rend)) and not (
            _cmp_is_constant(left) and _cmp_is_constant(right)
        )
        structs = [x for x in (ls, rs) if isinstance(x, tuple)]
        if structs:
            fields = None
            for side, shape in ((left, ls), (right, rs)):
                if isinstance(shape, tuple):
                    fields = shape[1] or _named_struct_fields(side, table)
                    if fields:
                        break
            if not fields:
                raise DialectError(
                    "struct comparison needs field names (literal, cast "
                    "type, or catalog schema) — none resolvable here"
                )
            repl = _struct_cmp_sql(
                left, right, op, fields, table, distinct=distinct
            )
        else:
            repl = _list_cmp_sql(left, right, op, distinct=distinct)
        s = s[:lstart] + repl + s[rend:]
        pos = lstart + len(repl)
    return s


_LIST_SET_OP_RE = re.compile(r"<@|@>|&&")


def _rewrite_list_set_ops(s: str) -> str:
    """DuckDB's list containment/overlap operators — ``a <@ b`` (a's
    elements all in b), ``a @> b`` (reverse), ``a && b`` (any shared
    element) — spelled as the list_has_all / list_has_any functions,
    whose templates carry DuckDB's ignore-NULL-elements semantics.
    Operands are single primaries (list literals, columns, calls);
    other shapes fall through to a parse error rather than silently
    rebinding (Spark has none of these operators)."""
    pos = 0
    while m := _LIST_SET_OP_RE.search(s, pos):
        j = m.start() - 1
        while j >= 0 and s[j] in " \t\n":
            j -= 1
        lstart = _primary_back(s, j + 1)
        left = s[lstart : j + 1].strip()
        rend = _primary_fwd(s, m.end())
        right = s[m.end() : rend].strip()
        if not left or not right:
            pos = m.end()
            continue
        op = m.group(0)
        if op == "<@":
            repl = f"list_has_all({right}, {left})"
        elif op == "@>":
            repl = f"list_has_all({left}, {right})"
        else:
            repl = f"list_has_any({left}, {right})"
        s = s[:lstart] + repl + s[rend:]
        pos = lstart + len(repl)
    return s


def _rewrite_libm(s: str) -> str:
    """DuckDB-first only: route the libm-divergent numeric family and
    double rounding to the bit-identical shims, and expand
    degrees/radians to the exact constant multiply DuckDB performs."""
    s = _rewrite_division(s)
    s = _rewrite_try_mod(s)
    s = _LIBM_RE.sub(lambda m: "dd_libm_" + m.group(1).lower() + "(", s)
    while m := _DEG_RAD_RE.search(s):
        close = _matching_paren(s, s.index("(", m.start()))
        inner = s[s.index("(", m.start()) + 1 : close]
        const = _DEG_CONST if m.group(1).lower() == "degrees" else _RAD_CONST
        s = s[: m.start()] + f"(({inner}) * {const})" + s[close + 1 :]
    pos = 0
    while m := _ROUND_RE.search(s, pos):
        open_idx = s.index("(", m.start())
        close = _matching_paren(s, open_idx)
        args = _split_top_commas(s[open_idx + 1 : close])
        inner = ", ".join(args) if len(args) == 2 else args[0] + ", 0"
        s = s[: m.start()] + f"dd_libm_round({inner})" + s[close + 1 :]
        # continue scanning INSIDE the arguments (nested rounds rewrite too)
        pos = m.start() + len("dd_libm_round(")
    return s


# ---------------------------------------------------------------------------
# init-script statement routing (SET / INSTALL / LOAD / SECRET / VIEW)
# ---------------------------------------------------------------------------


@dataclass
class DialectState:
    """Session-level DuckDB-compat state the router maintains: settings
    from SET, extensions from INSTALL/LOAD (surfaced through the
    capability registry analog), named secrets from CREATE SECRET, and
    macros from CREATE MACRO (expanded textually at query time, exactly
    DuckDB's own inlining semantics)."""

    settings: dict[str, str] = field(default_factory=dict)
    installed: list[str] = field(default_factory=list)
    loaded: list[str] = field(default_factory=list)
    secrets: dict[str, dict[str, str]] = field(default_factory=dict)
    macros: dict[str, "Macro"] = field(default_factory=dict)
    prepared: dict[str, str] = field(default_factory=dict)
    # statement-digest → built DataFrame for dynamic PIVOT: the eager
    # value-discovery distinct runs once per distinct statement, not once
    # per GetFlightInfo/GetSchema/DoGet leg. LRU-bounded (insertion order
    # = recency) and cleared on every write route so cached pivot columns
    # can never go stale after an init-phase INSERT/COPY FROM.
    pivot_cache: dict[str, DataFrame] = field(default_factory=dict)
    # __dd_read_* / __dd_ubn_* / __dd_pivot_* temp views registered from
    # wire input, LRU-ordered; oldest are dropped past _TEMP_VIEW_CAP so
    # server-lifetime catalog state stays bounded under arbitrary clients
    temp_views: dict[str, None] = field(default_factory=dict)
    # open-transaction undo log: relation name → the DataFrame to restore
    # on ROLLBACK (None = created inside the transaction, so ROLLBACK
    # drops it). None when no transaction is active. Works because every
    # mutation is a copy-on-write view swap and prior DataFrames pin
    # their analyzed plans.
    txn_undo: "dict[str, DataFrame | None] | None" = None
    # snapshot of the DDL registries (tables/sequences/enums/enum_columns/
    # schemas/indexes/comments) taken at BEGIN: DuckDB's DDL is
    # transactional, so ROLLBACK must also undo DROP-side forget_table(),
    # sequence advancement, and CREATE TYPE/SEQUENCE/SCHEMA
    txn_ddl_undo: "dict[str, object] | None" = None
    # index/comment metadata: results never depend on them, but clients
    # create them and expect the statements to succeed
    indexes: dict[str, str] = field(default_factory=dict)
    comments: dict[str, str | None] = field(default_factory=dict)
    # DDL registries (ddl.py): declared constraints of plain CREATE TABLE
    # statements, session sequences, and CREATE TYPE … AS ENUM members
    # (+ which table columns carry an enum type, for ordinal semantics)
    tables: dict[str, "object"] = field(default_factory=dict)
    sequences: dict[str, "object"] = field(default_factory=dict)
    enums: dict[str, list[str]] = field(default_factory=dict)
    enum_columns: dict[str, dict[str, str]] = field(default_factory=dict)
    # CREATE SCHEMA names: qualified references flatten onto the single
    # temp-view namespace (the warehouse model — one catalog lifetime)
    schemas: set[str] = field(default_factory=set)


_PIVOT_CACHE_CAP = 32
_TEMP_VIEW_CAP = 64


def _track_temp_view(spark: SparkSession, name: str) -> None:
    """Record a wire-input-derived temp view in the LRU; evict (and drop
    from the catalog) the least-recently-used past the cap."""
    state = dialect_state(spark)
    state.temp_views.pop(name, None)
    state.temp_views[name] = None
    while len(state.temp_views) > _TEMP_VIEW_CAP:
        old = next(iter(state.temp_views))
        del state.temp_views[old]
        spark.catalog.dropTempView(old)


@dataclass
class Macro:
    """A DuckDB ``CREATE MACRO`` definition. The body is stored masked
    (literals extracted) so parameter substitution can never touch string
    contents; ``params`` carry optional ``:=`` defaults."""

    params: list[tuple[str, str | None]]
    masked_body: str
    body_table: list[str]
    is_table: bool


def _expand_macros(sql: str, macros: dict[str, Macro]) -> str:
    """Inline every macro call site, innermost-out (DuckDB macros are
    pure textual inlining too — the planner sees only the expansion).
    Scalar macros become a parenthesized expression; table macros a
    derived-table subquery."""
    masked, table = _mask(sql)
    for _ in range(16):  # nesting guard
        changed = False
        for name, mac in macros.items():
            pat = re.compile(r"\b" + re.escape(name) + r"\s*\(", re.IGNORECASE)
            m = pat.search(masked)
            while m:
                open_idx = m.end() - 1
                close = _matching_paren(masked, open_idx)
                args = _split_top_commas(masked[open_idx + 1 : close])
                bound: dict[str, str] = {}
                positional = []
                for a in args:
                    am = re.match(r"^([A-Za-z_]\w*)\s*:=\s*(.+)$", a, re.DOTALL)
                    if am and any(p == am.group(1).lower() for p, _ in mac.params):
                        bound[am.group(1).lower()] = am.group(2).strip()
                    else:
                        positional.append(a)
                for (p, default), i in zip(
                    mac.params, range(len(mac.params))
                ):
                    if p in bound:
                        continue
                    if i < len(positional):
                        bound[p] = positional[i]
                    elif default is not None:
                        bound[p] = default
                    else:
                        raise ValueError(
                            f"macro {name}: missing argument {p!r}"
                        )
                # splice the macro body's literal table onto the main one
                offset = len(table)
                body = _PLACEHOLDER_RE.sub(
                    lambda mm: _PLACEHOLDER.format(int(mm.group(1)) + offset),
                    mac.masked_body,
                )
                table.extend(mac.body_table)
                # SIMULTANEOUS substitution: one pass over all parameter
                # names — sequential passes would re-match a parameter
                # name appearing inside an earlier-substituted argument
                # (add1(y, 1) with params (x, y) must not turn the
                # spliced-in column y into the second argument)
                if bound:
                    param_re = re.compile(
                        r"\b(" + "|".join(re.escape(p) for p in bound) + r")\b",
                        re.IGNORECASE,
                    )
                    body = param_re.sub(
                        lambda mm: f"({bound[mm.group(1).lower()]})", body
                    )
                repl = f"({body})"
                masked = masked[: m.start()] + repl + masked[close + 1 :]
                changed = True
                m = pat.search(masked, m.start() + len(repl))
        if not changed:
            break
    return _unmask(masked, table)


_STATE_KEY = "spark.dss.dialectStateId"
_STATES: dict[str, DialectState] = {}


def dialect_state(spark: SparkSession) -> DialectState:
    sid = spark.conf.get(_STATE_KEY, None)
    if sid is None or sid not in _STATES:
        sid = str(len(_STATES))
        spark.conf.set(_STATE_KEY, sid)
        _STATES[sid] = DialectState()
    return _STATES[sid]


# The Flight serving path defaults to DuckDB-dialect semantics: the
# reference's wire contract IS verbatim DuckDB SQL (main.go:199,229), so
# a statement valid in BOTH dialects with different meanings (2-arg
# ltrim/rtrim argument order, 1-based subscripts) must get the DuckDB
# answer over the wire. Embedded ``Engine.sql`` stays native-first. The
# default is thread-scoped (the server wraps each request), and an
# explicit ``SET dialect='…'`` always wins in either direction.
_SERVING_TL = threading.local()


@contextmanager
def serving_dialect(on: bool = True):
    """Scope the DuckDB-first serving default to the current thread (the
    server wraps every request resolution in this)."""
    prev = getattr(_SERVING_TL, "duckdb_first", None)
    _SERVING_TL.duckdb_first = on
    try:
        yield
    finally:
        _SERVING_TL.duckdb_first = prev


def _duckdb_first(state: DialectState) -> bool:
    """Precedence for dialect mode: an explicit ``SET dialect`` setting,
    else the thread's serving default, else native-first."""
    setting = state.settings.get("dialect", "").lower()
    if setting:
        return setting in ("duckdb", "duck")
    return bool(getattr(_SERVING_TL, "duckdb_first", False))


def split_statements(script: str) -> list[str]:
    """Split an init script on ``;`` outside quotes/comments."""
    masked, table = _mask(script)
    return [
        _unmask(part, table).strip()
        for part in masked.split(";")
        if _unmask(part, table).strip()
    ]


_SET_RE = re.compile(
    r"^\s*SET\s+(?:SESSION\s+|GLOBAL\s+|LOCAL\s+)?([A-Za-z_]\w*)\s*"
    r"(?:=|\bTO\b)\s*(.+)$",
    re.IGNORECASE | re.DOTALL,
)
# CREATE SCHEMA registers a name so schema-qualified references flatten
# onto the single temp-view namespace (the warehouse model); USE is a
# no-op for known schemas, like DuckDB's default-catalog switch
_CREATE_SCHEMA_RE = re.compile(
    r"^\s*CREATE\s+SCHEMA\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_SCHEMA_RE = re.compile(
    r"^\s*DROP\s+SCHEMA\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)"
    r"(\s+CASCADE)?\s*;?\s*$",
    re.IGNORECASE,
)
_USE_RE = re.compile(r"^\s*USE\s+([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE)
_INSTALL_RE = re.compile(
    r"^\s*(?:FORCE\s+)?INSTALL\s+([A-Za-z_]\w*)(?:\s+FROM\s+\S+)?\s*$", re.IGNORECASE
)
_LOAD_RE = re.compile(r"^\s*LOAD\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE)
# ATTACH 'path' [AS alias] [(READ_ONLY, TYPE duckdb, ...)] — a parquet
# warehouse directory or a real .duckdb database file (engine.py:
# attach_warehouse). Option list accepted and ignored: this engine's
# attach is always read-only, matching the reference's serving contract.
# The Airport/remote form routes to the Flight catalog path instead.
_ATTACH_RE = re.compile(
    r"^\s*ATTACH\s+(?:DATABASE\s+)?'([^']+)'"
    r"(?:\s+AS\s+([A-Za-z_]\w*))?\s*(?:\(([^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)
_DETACH_RE = re.compile(
    r"^\s*DETACH\s+(?:DATABASE\s+)?([A-Za-z_]\w*)\s*;?\s*$", re.IGNORECASE
)

_SECRET_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:PERSISTENT\s+|TEMPORARY\s+)?SECRET"
    r"(?:\s+(?!\()([A-Za-z_]\w*))?\s*\(", re.IGNORECASE
)
_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?VIEW\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)
_TABLE_AS_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(?:IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s+AS\s+(.+)$",
    re.IGNORECASE | re.DOTALL,
)


_COPY_RE = re.compile(
    # greedy options group + anchored final ')' so option values with
    # nested parens (PARTITION_BY (a, b)) stay inside the group
    r"^\s*COPY\s+(\(.*\)|[A-Za-z_][\w.]*)\s+TO\s+('[^']+')"
    r"\s*(?:(?:WITH\s*)?\((.*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COPY_FROM_RE = re.compile(
    r"^\s*COPY\s+([A-Za-z_][\w.]*)\s+FROM\s+('[^']+')"
    r"\s*(?:\(|WITH\s*\()?([^)]*)\)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _run_copy_from(spark: SparkSession, m: re.Match) -> None:
    """DuckDB ``COPY <table> FROM 'path' (FORMAT …)`` — the init-phase
    load direction. The file reads through the same spark.read resolution
    as read_* table functions; rows append to an existing temp view
    (INSERT semantics) or create it."""
    target, path_lit, opts = m.groups()
    path = path_lit[1:-1].replace("''", "'")
    opts_l = (opts or "").lower()
    fmt_m = re.search(r"format\s+(\w+)", opts_l)
    fmt = fmt_m.group(1) if fmt_m else (_path_format(path) or "")
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"COPY FROM: unsupported format {fmt!r}")
    read_opts: dict[str, str] = {}
    if fmt == "csv":
        if "header false" in opts_l or "header 0" in opts_l:
            read_opts["header"] = "false"
        dm = re.search(r"delim(?:iter)?\s+'([^']*)'", opts or "", re.IGNORECASE)
        if dm:
            read_opts["delim"] = dm.group(1)
    view = _file_read_view(spark, fmt, (path,), read_opts)
    name = target.split(".")[-1]
    df = spark.table(view)
    if spark.catalog.tableExists(name):
        old = spark.table(name)
        from pyspark.sql import functions as F

        aligned = df.toDF(*old.columns).select(
            *[F.col(c).cast(old.schema[c].dataType) for c in old.columns]
        )
        df = old.unionByName(aligned)
    df.localCheckpoint(eager=True).createOrReplaceTempView(name)
_MACRO_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?"
    r"(?:MACRO|FUNCTION)\s+([A-Za-z_]\w*)\s*\(",
    re.IGNORECASE,
)
_DROP_MACRO_RE = re.compile(
    r"^\s*DROP\s+(?:MACRO|FUNCTION)\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_RELATION_RE = re.compile(
    r"^\s*DROP\s+(?:TABLE|VIEW)\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(?:OR\s+(REPLACE|IGNORE)\s+)?INTO\s+([A-Za-z_][\w.]*)\s*"
    r"(\([^)]*\))?\s*(BY\s+NAME\s+)?(VALUES\b.+|SELECT\b.+|FROM\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
# plain CREATE TABLE with column definitions (constraints parsed and
# enforced by ddl.py); CTAS never matches — its name is followed by AS,
# not an opening paren
_TABLE_DDL_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*\((.+)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_SEQ_RE = re.compile(
    r"^\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?SEQUENCE\s+"
    r"(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*(.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_SEQ_RE = re.compile(
    r"^\s*DROP\s+SEQUENCE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_TYPE_RE = re.compile(
    r"^\s*CREATE\s+TYPE\s+([A-Za-z_][\w.]*)\s+AS\s+ENUM\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TYPE_RE = re.compile(
    r"^\s*DROP\s+TYPE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)
# cheap pre-check so only statements that can touch a sequence pay
_SEQVAL_HINT_RE = re.compile(r"\b(?:nextval|currval)\s*\(", re.IGNORECASE)
# DuckDB session prepared statements: PREPARE name AS <stmt with $1/?>,
# EXECUTE name(args), DEALLOCATE name — the CLI-level analog of the
# Flight DoPut binding (same bind_parameters underneath).
_PREPARE_RE = re.compile(
    r"^\s*PREPARE\s+([A-Za-z_]\w*)\s+AS\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXECUTE_RE = re.compile(
    r"^\s*EXECUTE\s+([A-Za-z_]\w*)\s*(\(.*\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DEALLOCATE_RE = re.compile(
    r"^\s*DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_]\w*)\s*;?\s*$", re.IGNORECASE
)


def _run_execute(spark: SparkSession, m: re.Match) -> DataFrame:
    state = dialect_state(spark)
    name = m.group(1).lower()
    stmt = state.prepared.get(name)
    if stmt is None:
        raise ValueError(f"EXECUTE: no prepared statement {name!r}")
    if m.group(2):
        masked, table = _mask(m.group(2)[1:-1])
        named: dict[str, object] = {}
        positional: list[object] = []
        for a in _split_top_commas(masked):
            nm = re.match(r"^\s*([A-Za-z_]\w*)\s*:=\s*(.+)$", a, re.DOTALL)
            if nm:
                named[nm.group(1).lower()] = _parse_literal_token(
                    _unmask(nm.group(2), table)
                )
            else:
                positional.append(_parse_literal_token(_unmask(a, table)))
        if named and positional:
            raise ValueError(
                "EXECUTE: cannot mix named and positional arguments"
            )
        if named:
            stmt = bind_named_parameters(stmt, named)
        else:
            stmt = bind_parameters(stmt, positional)
    return run_sql(spark, stmt)


def _parse_literal_token(tok: str):
    """A SQL literal argument of EXECUTE(...) → python value."""
    tok = tok.strip()
    lit = _literal_value(tok)
    if lit is not None:
        return lit
    low = tok.lower()
    if low == "null":
        return None
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise ValueError(f"EXECUTE: unsupported argument {tok!r}") from None


def _register_macro(state: DialectState, stmt: str, m: re.Match) -> bool:
    """Parse ``CREATE MACRO name(p1, p2 := default) AS <expr|TABLE query>``
    into a stored :class:`Macro` (body kept masked). Returns False for a
    Spark-native ``CREATE FUNCTION … RETURNS … RETURN`` statement, which
    must fall through to ``spark.sql`` untouched."""
    name = m.group(1).lower()
    open_idx = m.end() - 1
    close = _matching_paren(stmt, open_idx)
    rest = stmt[close + 1 :]
    am = re.match(r"^\s*AS\s+(TABLE\s+)?(.+?)\s*;?\s*$", rest, re.IGNORECASE | re.DOTALL)
    if not am:
        if re.match(r"^\s*RETURNS?\b", rest, re.IGNORECASE):
            return False  # Spark SQL UDF, not a DuckDB macro
        raise ValueError(f"CREATE MACRO {name}: expected AS <body>")
    params: list[tuple[str, str | None]] = []
    for p in _split_top_commas(stmt[open_idx + 1 : close]):
        dm = re.match(r"^([A-Za-z_]\w*)\s*:=\s*(.+)$", p, re.DOTALL)
        if dm:
            params.append((dm.group(1).lower(), dm.group(2).strip()))
        else:
            params.append((p.lower(), None))
    masked_body, body_table = _mask(am.group(2))
    state.macros[name] = Macro(params, masked_body, body_table, bool(am.group(1)))
    return True


def _materialize(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Eagerly materialize a DML result and truncate its lineage.
    localCheckpoint is the cheap path (columnar, stays JVM-side); Spark
    4.1's checkpoint re-analysis can hit `AttributeMap: key not found`
    when the plan unions a view that was itself swapped onto a prior
    checkpoint (multi-statement UPDATE→INSERT chains) — the fallback
    rebases the computed RDD onto a fresh LogicalRDD, which always
    carries clean attribute ids."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:
        return spark.createDataFrame(df.rdd, df.schema).localCheckpoint(
            eager=True
        )


def _count_frame(spark: SparkSession, n: int) -> DataFrame:
    """DuckDB's DML result shape: one BIGINT ``Count`` row."""
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [(n,)], T.StructType([T.StructField("Count", T.LongType())])
    )


def _run_insert(spark: SparkSession, m: re.Match) -> DataFrame:
    """``INSERT [OR REPLACE|IGNORE] INTO t [(cols)] VALUES|SELECT …
    [ON CONFLICT …]`` against a temp view: append by union (or the
    ddl.py three-leg merge for the upsert forms), enforce declared
    constraints, re-materialize, swap the view. Init-phase only (serving
    stays read-only), mirroring the reference's boot-time-writes-then-
    serve model. Returns DuckDB's ``Count`` row."""
    from duckdb_server_spark import ddl

    or_action, name, col_list, by_name, body = m.groups()
    target = name.split(".")[-1]
    state = dialect_state(spark)
    body, returning = ddl.split_returning(body)
    body, conflict = ddl.split_on_conflict(body)
    if or_action:
        if conflict is not None:
            raise ValueError(
                "INSERT: OR REPLACE/IGNORE cannot be combined with "
                "ON CONFLICT"
            )
        conflict = ddl.or_action_conflict(or_action)
    if returning is not None and conflict is not None:
        raise ValueError(
            "INSERT: RETURNING with ON CONFLICT is not supported"
        )
    old = spark.table(target)
    new = ddl.build_insert_source(
        spark, state, target, old, col_list, body, by_name=bool(by_name)
    )
    if conflict is not None:
        return ddl.run_upsert(spark, state, target, old, new, conflict)
    n_before = old.count()
    new = _materialize(spark, new)
    merged = _materialize(spark, old.unionByName(new))
    ddl.enforce_constraints(spark, state, target, merged)
    merged.createOrReplaceTempView(target)
    if returning is not None:
        return ddl.project_returning(spark, new, returning)
    return _count_frame(spark, merged.count() - n_before)


_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+([A-Za-z_][\w.]*)(\s+.+?)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_TRUNCATE_RE = re.compile(
    r"^\s*TRUNCATE\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+([A-Za-z_][\w.]*)\s+SET\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _run_delete(
    spark: SparkSession,
    target: str,
    cond: str | None,
    using: str | None = None,
    returning: str | None = None,
) -> DataFrame:
    """``DELETE FROM t [USING rel] [WHERE cond] [RETURNING …]`` /
    ``TRUNCATE t`` — copy-on-write: re-materialize the kept rows and
    swap the view, the same model as INSERT (and the only honest
    mutation over immutable parquet at any scale — Delta/Iceberg
    deletes are this exact rewrite plus a manifest). A NULL condition
    keeps the row, like DuckDB; USING keeps rows through a LEFT ANTI
    join on the predicate (the join shuffles on Catalyst's chosen keys,
    bodies move once). Returns the deleted ``Count`` (or the RETURNING
    projection over the deleted rows)."""
    from duckdb_server_spark import ddl

    name = target.split(".")[-1]
    old = spark.table(name)
    total = old.count()
    if using:
        if not cond:
            raise ValueError("DELETE USING requires a WHERE predicate")
        keep = run_sql(
            spark,
            f"SELECT {name}.* FROM {name} LEFT ANTI JOIN {using} "
            f"ON ({cond})",
        )
        doomed_sql = (
            f"SELECT {name}.* FROM {name} LEFT SEMI JOIN {using} "
            f"ON ({cond})"
        )
    elif cond:
        # coalesce(cond, false) — NULL predicates delete nothing; the
        # condition text flows through the full dialect rewrite
        keep = run_sql(
            spark,
            f"SELECT * FROM {name} "
            f"WHERE NOT coalesce(CAST((__dd_boolctx({cond})) AS BOOLEAN), false)",
        )
        doomed_sql = (
            f"SELECT * FROM {name} "
            f"WHERE coalesce(CAST((__dd_boolctx({cond})) AS BOOLEAN), false)"
        )
    else:
        keep = old.limit(0)
        doomed_sql = f"SELECT * FROM {name}"
    doomed = (
        _materialize(spark, run_sql(spark, doomed_sql))
        if returning is not None
        else None
    )
    kept = _materialize(spark, keep)
    n_kept = kept.count()
    kept.createOrReplaceTempView(name)
    if returning is not None:
        return ddl.project_returning(spark, doomed, returning)
    return _count_frame(spark, total - n_kept)


def _run_update(spark: SparkSession, m: re.Match) -> DataFrame:
    """``UPDATE t SET c = expr, … [FROM rel] [WHERE cond]
    [RETURNING …]`` — copy-on-write CASE projection over every row (the
    Delta/Iceberg update shape): assigned columns become ``CASE WHEN
    cond THEN expr ELSE c END``, the result re-materializes and swaps
    the view. The FROM (join-update) form routes to ddl.run_update_from
    — a row-id keyed join that fails closed on ambiguous multi-matches.
    Returns the matched ``Count`` (or the RETURNING projection over the
    post-update matched rows)."""
    from pyspark.sql import functions as F

    from duckdb_server_spark import ddl

    target = m.group(1).split(".")[-1]
    masked, table = _mask(m.group(2))
    clauses = ddl.split_clauses(masked, ("FROM", "WHERE", "RETURNING"))
    assigns_m = clauses[None]
    cond = (
        _unmask(clauses["WHERE"], table) if clauses.get("WHERE") else None
    )
    returning = (
        _unmask(clauses["RETURNING"], table)
        if clauses.get("RETURNING")
        else None
    )
    if clauses.get("FROM"):
        return ddl.run_update_from(
            spark,
            dialect_state(spark),
            target,
            _unmask(assigns_m, table),
            _unmask(clauses["FROM"], table),
            cond,
            returning,
        )
    old = spark.table(target)
    by_lower = {c.lower(): c for c in old.columns}
    assigns: dict[str, str] = {}
    for item in _split_top_commas(assigns_m):
        am = re.match(r'^\s*"?([A-Za-z_]\w*)"?\s*=\s*(.+)$', item, re.DOTALL)
        if not am:
            raise ValueError("UPDATE expects col = expr assignments")
        col = am.group(1).lower()
        if col not in by_lower:
            raise ValueError(f"UPDATE: unknown column {am.group(1)!r}")
        assigns[col] = _unmask(am.group(2).strip(), table)
    projs = []
    for c in old.columns:
        e = assigns.get(c.lower())
        if e is None:
            projs.append(f"`{c}`")
        elif cond:
            projs.append(
                f"CASE WHEN coalesce(CAST((__dd_boolctx({cond})) AS BOOLEAN), false) "
                f"THEN ({e}) ELSE `{c}` END AS `{c}`"
            )
        else:
            projs.append(f"({e}) AS `{c}`")
    n = run_sql(
        spark,
        f"SELECT count(*) AS n FROM {target}"
        + (
            f" WHERE coalesce(CAST((__dd_boolctx({cond})) AS BOOLEAN), false)"
            if cond
            else ""
        ),
    ).collect()[0][0]
    meta = dialect_state(spark).tables.get(target.lower())
    if meta is not None:
        for col in assigns:
            if col in meta.generated:
                raise ValueError(
                    f"Binder Error: Cannot update a generated column "
                    f"{col!r}"
                )
    post = None
    if returning is not None:
        # the post-update image of the matched rows, captured pre-swap
        post_projs = [
            f"({assigns[c.lower()]}) AS `{c}`"
            if c.lower() in assigns
            else f"`{c}`"
            for c in old.columns
        ]
        post_sql = f"SELECT {', '.join(post_projs)} FROM {target}"
        if cond:
            post_sql += f" WHERE coalesce(CAST((__dd_boolctx({cond})) AS BOOLEAN), false)"
        post = _materialize(spark, run_sql(spark, post_sql))
    new = run_sql(spark, f"SELECT {', '.join(projs)} FROM {target}")
    new = new.select(
        *[F.col(c).cast(old.schema[c].dataType) for c in old.columns]
    )
    new = _materialize(
        spark,
        ddl.apply_generated(spark, dialect_state(spark), target, new, old),
    )
    new.createOrReplaceTempView(target)
    if returning is not None:
        return ddl.project_returning(spark, post, returning)
    return _count_frame(spark, n)


def _run_copy(spark: SparkSession, m: re.Match) -> None:
    """DuckDB ``COPY <table|(query)> TO 'path' (FORMAT ..., HEADER, ...)``
    → a Spark DataFrame write (the init-phase export path; serving-time
    queries stay read-only — COPY only routes through run_script /
    execute_statement, same as the reference writing only at boot).
    Format from the FORMAT option, else the path suffix; parquet/csv/json
    supported, single-file semantics via coalesce(1) to mirror DuckDB's
    one-file output."""
    src, path_lit, opts = m.groups()
    path = path_lit[1:-1].replace("''", "'")
    opts_l = (opts or "").lower()
    fmt_m = re.search(r"format\s+(\w+)", opts_l)
    fmt = fmt_m.group(1) if fmt_m else path.rsplit(".", 1)[-1].lower()
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"COPY TO: unsupported format {fmt!r}")
    df = (
        run_sql(spark, src[1:-1]) if src.startswith("(") else spark.table(src)
    )
    # PARTITION_BY → hive-layout directory write (dir/col=value/…), byte
    # and layout compatible with DuckDB's own partitioned COPY and with
    # read_parquet(..., hive_partitioning=true) on either engine. This is
    # the 100 TB sink shape: partitioned writes parallelize per partition
    # value, so no coalesce(1) — DuckDB's single-file contract applies
    # only to the unpartitioned form.
    pb = re.search(
        r"partition_by\s*(?:\(([^)]*)\)|([A-Za-z_]\w*))", opts or "",
        re.IGNORECASE,
    )
    if pb:
        cols = [
            c.strip().strip('"')
            for c in (pb.group(1) or pb.group(2)).split(",")
            if c.strip()
        ]
        writer = df.write.mode("overwrite").partitionBy(*cols)
    else:
        writer = df.coalesce(1).write.mode("overwrite")
    cm = re.search(r"compression\s+'?(\w+)'?", opts_l)
    if cm and cm.group(1) != "auto":
        writer = writer.option("compression", cm.group(1))
    if fmt == "csv":
        # DuckDB COPY TO csv writes a header unless HEADER false.
        header = "header false" not in opts_l and "header 0" not in opts_l
        writer = writer.option("header", "true" if header else "false")
        dm = re.search(r"(?:delimiter|delim|sep)\s+'([^']*)'", opts or "",
                       re.IGNORECASE)
        if dm:
            writer = writer.option("sep", dm.group(1))
    getattr(writer, fmt)(path)


def _strip_quotes(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1].replace(v[0] * 2, v[0])
    return v


def _apply_secret(spark: SparkSession, state: DialectState, stmt: str, name: str | None) -> None:
    open_idx = stmt.index("(")
    close = _matching_paren(stmt, open_idx)
    kv: dict[str, str] = {}
    for item in _split_top_commas(stmt[open_idx + 1 : close]):
        km = re.match(r"^([A-Za-z_]\w*)\s+(.+)$", item.strip(), re.DOTALL)
        if km:
            kv[km.group(1).lower()] = _strip_quotes(km.group(2))
    # Unnamed secrets key on their content so re-running an init script is
    # idempotent (DuckDB's CREATE PERSISTENT SECRET re-run is too).
    key = name or "__secret_" + "%08x" % (hash(tuple(sorted(kv.items()))) & 0xFFFFFFFF)
    state.secrets[key] = kv
    if kv.get("type", "").lower() == "s3":
        # The reference's S3 secret wires httpfs (k8s/main.yaml:110-125);
        # the Spark analog is hadoop-s3a conf on the live session.
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        if "key_id" in kv:
            hconf.set("fs.s3a.access.key", kv["key_id"])
        if "secret" in kv:
            hconf.set("fs.s3a.secret.key", kv["secret"])
        if "endpoint" in kv:
            hconf.set("fs.s3a.endpoint", kv["endpoint"])
        if kv.get("use_ssl", "").lower() in ("false", "0"):
            hconf.set("fs.s3a.connection.ssl.enabled", "false")
        if kv.get("url_style", "").lower() == "path":
            hconf.set("fs.s3a.path.style.access", "true")


def _txn_record(spark: SparkSession, state: DialectState, name: str) -> None:
    """First-touch snapshot of a relation inside an open transaction.
    Dataset creation analyzes eagerly, so the captured DataFrame pins the
    relation's CURRENT plan — later view swaps cannot retarget it."""
    if state.txn_undo is None:
        return
    key = name.split(".")[-1]
    if key in state.txn_undo:
        return
    try:
        prior = spark.table(key) if spark.catalog.tableExists(key) else None
    except Exception:
        prior = None
    state.txn_undo[key] = prior


_BEGIN_RE = re.compile(r"^\s*BEGIN(\s+TRANSACTION)?\s*;?\s*$", re.IGNORECASE)
_COMMIT_RE = re.compile(
    r"^\s*(?:COMMIT|END)(\s+TRANSACTION)?\s*;?\s*$", re.IGNORECASE
)
_ROLLBACK_RE = re.compile(
    r"^\s*(?:ROLLBACK|ABORT)(\s+TRANSACTION)?\s*;?\s*$", re.IGNORECASE
)
_CREATE_INDEX_RE = re.compile(
    r"^\s*CREATE\s+(?:UNIQUE\s+)?INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"([A-Za-z_]\w*)\s+ON\s+([A-Za-z_][\w.]*)",
    re.IGNORECASE,
)
_DROP_INDEX_RE = re.compile(
    r"^\s*DROP\s+INDEX\s+(?:IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*(?:VACUUM|ANALYZE)(?:\s+[A-Za-z_][\w.]*)?\s*;?\s*$", re.IGNORECASE
)
_COMMENT_RE = re.compile(
    r"^\s*COMMENT\s+ON\s+(TABLE|VIEW|COLUMN)\s+([A-Za-z_][\w.]*)\s+IS\s+"
    r"('(?:[^']|'')*'|NULL)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXPORT_DB_RE = re.compile(
    r"^\s*EXPORT\s+DATABASE\s+'([^']+)'\s*(?:\([^)]*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_IMPORT_DB_RE = re.compile(
    r"^\s*IMPORT\s+DATABASE\s+'([^']+)'\s*;?\s*$", re.IGNORECASE
)

# DuckDB type spelling → Spark, for ALTER TABLE column types
_ALTER_TYPE_MAP = {
    "varchar": "STRING", "text": "STRING", "string": "STRING",
    "blob": "BINARY", "bytea": "BINARY",
    "integer": "INT", "int": "INT", "int4": "INT",
    "bigint": "BIGINT", "int8": "BIGINT", "hugeint": "DECIMAL(38,0)",
    "smallint": "SMALLINT", "int2": "SMALLINT", "tinyint": "TINYINT",
    "double": "DOUBLE", "float8": "DOUBLE", "real": "FLOAT",
    "float4": "FLOAT", "float": "FLOAT",
    "boolean": "BOOLEAN", "bool": "BOOLEAN",
    "date": "DATE", "timestamp": "TIMESTAMP",
}


def _alter_spark_type(t: str) -> str:
    t = t.strip()
    low = t.lower()
    if low.startswith("decimal") or low.startswith("numeric"):
        return re.sub(r"(?i)^numeric", "DECIMAL", t)
    return _ALTER_TYPE_MAP.get(low, t.upper())


def _run_alter(spark: SparkSession, state: DialectState, m: re.Match) -> None:
    """``ALTER TABLE t RENAME TO | RENAME COLUMN | ADD COLUMN | DROP
    COLUMN | ALTER COLUMN … TYPE`` over the temp-view warehouse: each
    form swaps the view onto a LAZY projection of the current relation
    (Catalyst collapses stacked projections, so repeated ALTERs cost one
    projection at scan time — never a rewrite of the data)."""
    from pyspark.sql import functions as F

    if_exists, target, action = m.groups()
    name = target.split(".")[-1]
    if not spark.catalog.tableExists(name):
        if if_exists:
            return
        raise ValueError(f"ALTER TABLE: relation {target!r} does not exist")
    _txn_record(spark, state, name)
    df = spark.table(name)
    by_lower = {c.lower(): c for c in df.columns}
    act = action.strip()
    if rt := re.match(r'(?i)^RENAME\s+TO\s+"?([A-Za-z_]\w*)"?$', act):
        newname = rt.group(1)
        _txn_record(spark, state, newname)
        df.createOrReplaceTempView(newname)
        spark.catalog.dropTempView(name)
        return
    if rc := re.match(
        r'(?i)^RENAME\s+(?:COLUMN\s+)?"?([A-Za-z_]\w*)"?\s+TO\s+"?([A-Za-z_]\w*)"?$',
        act,
    ):
        old_c, new_c = rc.groups()
        if old_c.lower() not in by_lower:
            raise ValueError(f"ALTER TABLE: unknown column {old_c!r}")
        df.withColumnRenamed(by_lower[old_c.lower()], new_c).createOrReplaceTempView(name)
        return
    if ac := re.match(
        r'(?i)^ADD\s+(?:COLUMN\s+)?(IF\s+NOT\s+EXISTS\s+)?"?([A-Za-z_]\w*)"?\s+'
        r"([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
        r"(?:\s+DEFAULT\s+(.+))?$",
        act,
        re.DOTALL,
    ):
        if_nx, col, typ, dflt = ac.groups()
        if col.lower() in by_lower:
            if if_nx:
                return
            raise ValueError(f"ALTER TABLE: column {col!r} already exists")
        # DuckDB fills existing rows with the DEFAULT (NULL without one)
        expr = F.expr(f"CAST({dflt or 'NULL'} AS {_alter_spark_type(typ)})")
        df.withColumn(col, expr).createOrReplaceTempView(name)
        return
    if dc := re.match(
        r'(?i)^DROP\s+(?:COLUMN\s+)?(IF\s+EXISTS\s+)?"?([A-Za-z_]\w*)"?$', act
    ):
        if_ex, col = dc.groups()
        if col.lower() not in by_lower:
            if if_ex:
                return
            raise ValueError(f"ALTER TABLE: unknown column {col!r}")
        df.drop(by_lower[col.lower()]).createOrReplaceTempView(name)
        return
    if at := re.match(
        r'(?i)^ALTER\s+(?:COLUMN\s+)?"?([A-Za-z_]\w*)"?\s+'
        r"(?:SET\s+DATA\s+)?TYPE\s+(.+)$",
        act,
        re.DOTALL,
    ):
        col, typ = at.groups()
        if col.lower() not in by_lower:
            raise ValueError(f"ALTER TABLE: unknown column {col!r}")
        real = by_lower[col.lower()]
        df.withColumn(real, F.col(real).cast(_alter_spark_type(typ))).createOrReplaceTempView(name)
        return
    raise ValueError(f"unsupported ALTER TABLE action: {act!r}")


def _run_export_db(spark: SparkSession, target_dir: str) -> None:
    """``EXPORT DATABASE 'dir'`` — every user relation written as a
    parquet directory (parallel writers, Spark's own split layout — no
    single-file coalesce) plus a ``load.sql`` of CREATE OR REPLACE TABLE
    … read_parquet() statements. The glob-spelled load script runs back
    through THIS engine's IMPORT DATABASE **and** verbatim in DuckDB, so
    the export is a cross-engine backup."""
    import os

    os.makedirs(target_dir, exist_ok=True)
    names = [r.name for r in show_tables_frame(spark).collect()]
    lines = []
    for nm in names:
        out = os.path.join(target_dir, f"{nm}.parquet")
        spark.table(nm).write.mode("overwrite").parquet(out)
        lines.append(
            f"CREATE OR REPLACE TABLE {nm} AS "
            f"SELECT * FROM read_parquet('{out}/*.parquet');"
        )
    with open(os.path.join(target_dir, "load.sql"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _run_import_db(spark: SparkSession, source_dir: str) -> None:
    import os

    path = os.path.join(source_dir, "load.sql")
    if not os.path.exists(path):
        raise ValueError(f"IMPORT DATABASE: no load.sql under {source_dir!r}")
    with open(path) as f:
        run_script(spark, f.read())


def execute_statement(spark: SparkSession, stmt: str) -> DataFrame | None:
    """Route one DuckDB statement. Management statements (SET / INSTALL /
    LOAD / CREATE SECRET) map to engine state and return None; queries and
    views go through :func:`run_sql` / temp-view creation."""
    state = dialect_state(spark)
    if _BEGIN_RE.match(stmt):
        if state.txn_undo is not None:
            raise ValueError("cannot start a transaction within a transaction")
        import copy

        state.txn_undo = {}
        # plain-data registries (no DataFrames) — deep-copied so in-place
        # mutation (ALTER, nextval) can't reach into the snapshot
        state.txn_ddl_undo = copy.deepcopy(
            {
                "tables": state.tables,
                "sequences": state.sequences,
                "enums": state.enums,
                "enum_columns": state.enum_columns,
                "schemas": state.schemas,
                "indexes": state.indexes,
                "comments": state.comments,
            }
        )
        return None
    if _COMMIT_RE.match(stmt):
        if state.txn_undo is None:
            raise ValueError("no transaction is active")
        state.txn_undo = None
        state.txn_ddl_undo = None
        return None
    if _ROLLBACK_RE.match(stmt):
        if state.txn_undo is None:
            raise ValueError("no transaction is active")
        for nm, prior in state.txn_undo.items():
            if prior is None:
                spark.catalog.dropTempView(nm)
            else:
                prior.createOrReplaceTempView(nm)
        if state.txn_ddl_undo is not None:
            state.tables = state.txn_ddl_undo["tables"]
            # sequence EXISTENCE is transactional but the counter is not
            # (DuckDB/Postgres: nextval advancement survives ROLLBACK) —
            # restore the snapshot's catalog, keep live counters
            restored = state.txn_ddl_undo["sequences"]
            for nm, seq in restored.items():
                live = state.sequences.get(nm)
                if live is not None:
                    seq.current = live.current
            state.sequences = restored
            state.enums = state.txn_ddl_undo["enums"]
            state.enum_columns = state.txn_ddl_undo["enum_columns"]
            state.schemas = state.txn_ddl_undo["schemas"]
            state.indexes = state.txn_ddl_undo["indexes"]
            state.comments = state.txn_ddl_undo["comments"]
        state.txn_undo = None
        state.txn_ddl_undo = None
        state.pivot_cache.clear()
        return None
    if m := _SET_RE.match(stmt):
        state.settings[m.group(1).lower()] = _strip_quotes(m.group(2))
        return None
    if m := _PRAGMA_RE.match(stmt):
        return _run_pragma(
            spark, state, m.group(1).lower(), m.group(2), m.group(3)
        )
    if _CHECKPOINT_RE.match(stmt):
        return None  # durability is the parquet warehouse's concern
    if m := _ATTACH_RE.match(stmt):
        path, alias, opts = m.groups()
        if alias is None:
            import os as _os

            alias = _os.path.splitext(_os.path.basename(path))[0]
        opts_l = (opts or "").lower()
        if "type airport" in opts_l:
            # the k8s sidecar topology: remote catalog over Flight
            from duckdb_server_spark.sources.remote import (
                attach_flight_catalog,
            )

            lm = re.search(r"location\s+'([^']+)'", opts or "", re.IGNORECASE)
            if not lm:
                raise ValueError("ATTACH (TYPE AIRPORT) needs a location")
            attach_flight_catalog(spark, lm.group(1), prefix=f"{alias}_")
            return None
        from duckdb_server_spark.engine import attach_warehouse

        attach_warehouse(spark, path, alias)
        return None
    if m := _DETACH_RE.match(stmt):
        spark.sql(f"DROP DATABASE IF EXISTS {m.group(1)} CASCADE")
        return None
    if m := _INSTALL_RE.match(stmt):
        if m.group(1).lower() not in state.installed:
            state.installed.append(m.group(1).lower())
        return None
    if m := _LOAD_RE.match(stmt):
        ext = m.group(1).lower()
        if ext not in state.installed:
            state.installed.append(ext)
        if ext not in state.loaded:
            state.loaded.append(ext)
        return None
    if m := _SECRET_RE.match(stmt):
        _apply_secret(spark, state, stmt, m.group(1))
        return None
    if m := _COPY_RE.match(stmt):
        _run_copy(spark, m)
        return None
    if m := _COPY_FROM_RE.match(stmt):
        _txn_record(spark, state, m.group(1))
        _run_copy_from(spark, m)
        state.pivot_cache.clear()  # cached pivot columns may be stale now
        return None
    if (m := _MACRO_RE.match(stmt)) and _register_macro(state, stmt, m):
        return None
    if m := _DROP_MACRO_RE.match(stmt):
        state.macros.pop(m.group(1).lower(), None)
        return None
    if m := _DROP_RELATION_RE.match(stmt):
        _txn_record(spark, state, m.group(2))
        dropped = spark.catalog.dropTempView(m.group(2).split(".")[-1])
        if not dropped and not m.group(1):
            raise ValueError(f"DROP: relation {m.group(2)!r} does not exist")
        from duckdb_server_spark import ddl

        ddl.forget_table(state, m.group(2))
        state.pivot_cache.clear()
        return None
    if m := _INSERT_RE.match(stmt):
        _txn_record(spark, state, m.group(2))
        df = _run_insert(spark, m)
        state.pivot_cache.clear()  # cached pivot columns may be stale now
        return df
    if m := _CREATE_SEQ_RE.match(stmt):
        from duckdb_server_spark import ddl

        name = m.group(3).split(".")[-1].lower()
        if name in state.sequences and m.group(2) and not m.group(1):
            return None  # IF NOT EXISTS
        state.sequences[name] = ddl.parse_create_sequence(m.group(4))
        return None
    if m := _DROP_SEQ_RE.match(stmt):
        name = m.group(2).split(".")[-1].lower()
        if name not in state.sequences and not m.group(1):
            raise ValueError(
                f"Catalog Error: Sequence with name {name} does not exist!"
            )
        state.sequences.pop(name, None)
        return None
    if m := _CREATE_TYPE_RE.match(stmt):
        members = []
        masked, table = _mask(m.group(2))
        for item in _split_top_commas(masked):
            tok = re.fullmatch(r"\x00(\d+)\x00", item.strip())
            lit = _literal_value(table[int(tok.group(1))]) if tok else None
            if lit is None:
                raise ValueError("CREATE TYPE: enum members must be strings")
            members.append(lit)
        state.enums[m.group(1).split(".")[-1].lower()] = members
        return None
    if m := _CREATE_SCHEMA_RE.match(stmt):
        state.schemas.add(m.group(2).lower())
        return None
    if m := _DROP_SCHEMA_RE.match(stmt):
        name = m.group(2).lower()
        if name not in state.schemas and not m.group(1):
            raise ValueError(
                f"Catalog Error: Schema with name {name} does not exist!"
            )
        state.schemas.discard(name)
        return None
    if m := _USE_RE.match(stmt):
        name = m.group(1).split(".")[-1].lower()
        if name not in state.schemas and name not in ("main", "memory"):
            raise ValueError(
                f"Catalog Error: SET schema: No catalog + schema named "
                f'"{m.group(1)}" found.'
            )
        return None
    if m := _DROP_TYPE_RE.match(stmt):
        name = m.group(2).split(".")[-1].lower()
        if name not in state.enums and not m.group(1):
            raise ValueError(
                f"Catalog Error: Type with name {name} does not exist!"
            )
        state.enums.pop(name, None)
        return None
    if m := _DELETE_RE.match(stmt):
        from duckdb_server_spark import ddl

        _txn_record(spark, state, m.group(1))
        masked, tbl = _mask(m.group(2) or "")
        clauses = ddl.split_clauses(masked, ("USING", "WHERE", "RETURNING"))
        if clauses[None].strip():
            raise ValueError(
                f"DELETE: unsupported clause {_unmask(clauses[None], tbl)!r}"
            )
        df = _run_delete(
            spark,
            m.group(1),
            _unmask(clauses["WHERE"], tbl) if clauses.get("WHERE") else None,
            _unmask(clauses["USING"], tbl) if clauses.get("USING") else None,
            _unmask(clauses["RETURNING"], tbl)
            if clauses.get("RETURNING")
            else None,
        )
        state.pivot_cache.clear()
        return df
    if m := _TRUNCATE_RE.match(stmt):
        _txn_record(spark, state, m.group(1))
        df = _run_delete(spark, m.group(1), None)
        state.pivot_cache.clear()
        return df
    if m := _UPDATE_RE.match(stmt):
        _txn_record(spark, state, m.group(1))
        df = _run_update(spark, m)
        state.pivot_cache.clear()
        return df
    if m := _ALTER_RE.match(stmt):
        _run_alter(spark, state, m)
        state.pivot_cache.clear()
        return None
    if m := _CREATE_INDEX_RE.match(stmt):
        # an index is a performance hint here — results never depend on
        # it; recorded so clients' CREATE/DROP INDEX round-trips succeed
        state.indexes[m.group(1).lower()] = m.group(2).split(".")[-1].lower()
        return None
    if m := _DROP_INDEX_RE.match(stmt):
        state.indexes.pop(m.group(1).lower(), None)
        return None
    if _VACUUM_RE.match(stmt):
        return None  # storage upkeep is the parquet warehouse's concern
    if m := _COMMENT_RE.match(stmt):
        val = m.group(3)
        key = f"{m.group(1).lower()}:{m.group(2).split('.')[-1].lower()}"
        state.comments[key] = (
            None if val.upper() == "NULL" else _strip_quotes(val)
        )
        return None
    if m := _EXPORT_DB_RE.match(stmt):
        _run_export_db(spark, m.group(1))
        return None
    if m := _IMPORT_DB_RE.match(stmt):
        _run_import_db(spark, m.group(1))
        state.pivot_cache.clear()
        return None
    if m := _PREPARE_RE.match(stmt):
        state.prepared[m.group(1).lower()] = m.group(2)
        return None
    if m := _DEALLOCATE_RE.match(stmt):
        state.prepared.pop(m.group(1).lower(), None)
        return None
    if m := _EXECUTE_RE.match(stmt):
        return _run_execute(spark, m)
    if m := _VIEW_RE.match(stmt):
        # Persistent CREATE VIEW would need a metastore and cannot
        # reference the temp-view warehouse; serve it as a temp view —
        # equivalent within one engine lifetime (the reference recreates
        # its views from the init script on every boot anyway).
        name, body = m.group(1), m.group(2)
        _txn_record(spark, state, name)
        df = run_sql(spark, body)
        df.createOrReplaceTempView(name.split(".")[-1])
        state.pivot_cache.clear()
        return None
    if m := _TABLE_DDL_RE.match(stmt):
        from duckdb_server_spark import ddl

        _txn_record(spark, state, m.group(3))
        ddl.run_create_table(
            spark,
            state,
            m.group(3),
            m.group(4),
            or_replace=bool(m.group(1)),
            if_not_exists=bool(m.group(2)),
        )
        state.pivot_cache.clear()
        return None
    if m := _TABLE_AS_RE.match(stmt):
        # CREATE TABLE AS during init: materialize the query once
        # (localCheckpoint — table semantics, not a re-executing view)
        # and serve it under the name. Durable managed-table storage is
        # Engine.create_table; init scripts only need the name to exist
        # for the serving lifetime, like the reference's boot-time
        # duckdb.db writes.
        name, body = m.group(1), m.group(2)
        _txn_record(spark, state, name)
        df = _materialize(spark, run_sql(spark, body))
        df.createOrReplaceTempView(name.split(".")[-1])
        state.pivot_cache.clear()
        return None
    return run_sql(spark, stmt)


def run_script(spark: SparkSession, script: str) -> list[DataFrame | None]:
    """Execute a DuckDB init script verbatim (k8s/main.yaml:100-135)."""
    return [execute_statement(spark, s) for s in split_statements(script)]


# ---------------------------------------------------------------------------
# file-reading table functions (read_parquet / read_csv / FROM 'x.parquet')
# ---------------------------------------------------------------------------
#
# DuckDB's headline idiom — and therefore the reference's, since every
# ticket is verbatim DuckDB SQL (main.go:199) — is querying files in
# place: ``SELECT * FROM read_parquet('s3://bucket/*.parquet')`` or the
# bare-path shorthand ``FROM 'data.parquet'``. Spark has no table-function
# spelling for this, so each call site is resolved to a cached temp view
# backed by the matching ``spark.read`` source (the scan stays a native
# DataSource v2 scan: pushdown/pruning apply untouched; a glob fans out to
# a multi-file scan partitioned by Spark's own split planning).

_READ_FNS = {
    "read_parquet": "parquet",
    "parquet_scan": "parquet",
    "read_csv_auto": "csv",
    "read_csv": "csv",
    "read_json_auto": "json",
    "read_json": "json",
    "read_ndjson_auto": "json",
    "read_ndjson": "json",
}
_READ_FN_RE = re.compile(
    r"\b(" + "|".join(_READ_FNS) + r")\s*\(", re.IGNORECASE
)
# Cheap pre-check on the raw SQL so native queries never pay for masking.
_FILE_READ_HINT_RE = re.compile(
    r"\bread_\w+\s*\(|\bparquet_scan\s*\(|\b(?:FROM|JOIN)\s+glob\s*\("
    r"|'[^']*\.(?:parquet|pq|csv|tsv|json|jsonl|ndjson)(?:\.(?:gz|zst))?'",
    re.IGNORECASE,
)
_FILE_SUFFIX_FMT = {
    "parquet": "parquet", "pq": "parquet",
    "csv": "csv", "tsv": "csv",
    "json": "json", "jsonl": "json", "ndjson": "json",
}
_BARE_PATH_RE = re.compile(r"\b(FROM|JOIN)\s+(\x00\d+\x00)", re.IGNORECASE)


def _truthy(v: str | None, default: bool = False) -> bool:
    if v is None:
        return default
    return v.strip().lower() in ("true", "1", "yes", "on")


def _path_format(path: str) -> str | None:
    base = re.sub(r"\.(gz|zst)$", "", path.strip().lower())
    ext = base.rsplit(".", 1)[-1] if "." in base else ""
    return _FILE_SUFFIX_FMT.get(ext)


def _sniff_csv(paths: list[str]) -> tuple[str, bool]:
    """Dialect sniffing over the first matching file's head (≤16 KB,
    ≤20 lines), DuckDB-style: the delimiter is the candidate
    (, ; tab |) with a consistent nonzero per-line count — highest count
    wins ties — and the file has a header when no first-line field
    parses as a number. Deliberately ONE-sided: DuckDB 1.0's sniffer also
    promotes the first row of an all-VARCHAR file to a header (its
    header check is "does the first row cast to the body's types" —
    everything casts to VARCHAR), so requiring a numeric body line would
    diverge (pinned differentially in tests/test_r9_advice.py). Explicit
    options always override the sniff."""
    import glob as _glob
    import os as _os

    f = None
    for p in paths:
        hits = sorted(_glob.glob(p)) or (
            [p] if _os.path.exists(p) else []
        )
        if hits:
            f = hits[0]
            break
    if f is None or _os.path.isdir(f):
        return ",", True
    try:
        with open(f, "r", errors="replace") as fh:
            lines = [ln for ln in fh.read(16384).splitlines() if ln][:20]
    except OSError:
        return ",", True
    if not lines:
        return ",", True
    best, best_count = ",", 0
    for cand in (",", ";", "\t", "|"):
        counts = [ln.count(cand) for ln in lines]
        if counts[0] > 0 and all(c == counts[0] for c in counts):
            if counts[0] > best_count:
                best, best_count = cand, counts[0]

    def _is_num(tok: str) -> bool:
        try:
            float(tok.strip().strip('"'))
            return True
        except ValueError:
            return False

    first = lines[0].split(best)
    header = not any(_is_num(t) for t in first if t.strip())
    return best, header


def _file_read_view(
    spark: SparkSession, fmt: str, paths: tuple[str, ...], opts: dict[str, str]
) -> str:
    """Register (once) and return a temp view over ``spark.read`` for the
    given files. The view name is a digest of (format, paths, options), so
    repeated queries against the same files reuse the registration — for
    csv that also amortizes the one-time inferSchema sampling pass."""
    import hashlib

    from pyspark.sql import functions as F

    key = hashlib.md5(
        repr((fmt, paths, tuple(sorted(opts.items())))).encode()
    ).hexdigest()[:12]
    name = f"__dd_read_{key}"
    if spark.catalog.tableExists(name):
        _track_temp_view(spark, name)
        return name
    if any(p.startswith("s3://") for p in paths):
        # httpfs analog (S8): resolve through the CREATE SECRET store —
        # signed GETs spool into a local ETag-keyed cache; on a real
        # cluster with hadoop-aws jars the s3a conf path scans directly
        from duckdb_server_spark.sources.s3 import resolve_s3_paths

        paths = resolve_s3_paths(paths, dialect_state(spark).secrets)
    path_list = list(paths)

    def _hive_base(reader):
        # hive_partitioning=true: Spark infers dt=… directory columns
        # only under an explicit basePath when the paths are globs — use
        # the longest non-glob directory prefix
        if not _truthy(opts.get("hive_partitioning")):
            return reader
        import os as _os

        base = path_list[0]
        gm = re.search(r"[*?\[]", base)
        if gm:
            base = base[: gm.start()]
        if not base.endswith("/"):
            base = _os.path.dirname(base)
        return reader.option("basePath", base)

    if fmt == "parquet":
        reader = _hive_base(spark.read)
        if _truthy(opts.get("union_by_name")):
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*path_list)
    elif fmt == "csv":
        sep = opts.get("delim") or opts.get("sep") or opts.get("delimiter")
        header_opt = opts.get("header")
        if sep is None or header_opt is None:
            # DuckDB's read_csv(_auto) SNIFFS the dialect; defaulting to
            # comma+header silently mis-parses ';'/tab files and eats
            # the first row of headerless data
            sniff_sep, sniff_header = _sniff_csv(path_list)
            sep = sep or sniff_sep
        header = (
            _truthy(header_opt, default=True)
            if header_opt is not None
            else sniff_header
        )
        reader = (
            spark.read.option("header", header)
            .option("sep", sep)
        )
        # pass-through option spellings with a direct Spark equivalent
        for duck_key, spark_key in (
            ("quote", "quote"), ("escape", "escape"),
            ("nullstr", "nullValue"), ("null_padding", None),
            ("dateformat", "dateFormat"),
            ("timestampformat", "timestampFormat"),
        ):
            if spark_key and duck_key in opts:
                reader = reader.option(spark_key, opts[duck_key])
        if _truthy(opts.get("ignore_errors")):
            reader = reader.option("mode", "DROPMALFORMED")
        if "columns" in opts:
            # columns={'name': 'TYPE', …} → explicit schema (DuckDB type
            # spellings translated); disables inference entirely
            spec = opts["columns"].strip()
            if not (spec.startswith("{") and spec.endswith("}")):
                raise ValueError("read_csv(columns=...) expects {'c': 'TYPE'}")
            fields = []
            for item in _split_top_commas(spec[1:-1]):
                km = re.match(
                    r"^\s*'([^']+)'\s*:\s*'([^']+)'\s*$", item
                )
                if not km:
                    raise ValueError(
                        f"read_csv(columns=...): bad entry {item.strip()!r}"
                    )
                fields.append(
                    f"`{km.group(1)}` {_alter_spark_type(km.group(2))}"
                )
            reader = _hive_base(reader.schema(", ".join(fields)))
            df = reader.csv(path_list)
        else:
            reader = _hive_base(
                reader.option(
                    "inferSchema", not _truthy(opts.get("all_varchar"))
                )
            )
            df = reader.csv(path_list)
        if not header and "columns" not in opts:
            # DuckDB's headerless column names are column0..columnN
            # (Spark's are _c0.._cN)
            df = df.toDF(*[f"column{i}" for i in range(len(df.columns))])
        if "names" in opts:
            spec = opts["names"].strip()
            if not (spec.startswith("[") and spec.endswith("]")):
                raise ValueError("read_csv(names=...) expects ['a', 'b', …]")
            names_list = [
                _strip_quotes(x.strip())
                for x in _split_top_commas(spec[1:-1])
            ]
            if len(names_list) > len(df.columns):
                raise ValueError("read_csv(names=...): more names than columns")
            df = df.toDF(*names_list, *df.columns[len(names_list):])
    elif fmt == "json":
        df = _hive_base(spark.read).json(path_list)
        if df.columns in ([], ["_corrupt_record"]):
            # DuckDB read_json auto-detects top-level arrays; Spark needs
            # multiLine for the non-NDJSON layout.
            df = spark.read.option("multiLine", "true").json(path_list)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unsupported file format {fmt!r}")
    if _truthy(opts.get("filename")):
        df = df.select("*", F.input_file_name().alias("filename"))
    df.createOrReplaceTempView(name)
    _track_temp_view(spark, name)
    return name


def _parse_read_args(args: list[str]) -> tuple[tuple[str, ...], dict[str, str]]:
    """First arg: one quoted path or a ``[...]`` list of them (already
    unmasked). Remaining args: DuckDB named parameters ``key = value``."""
    first = args[0].strip()
    if first.startswith("[") and first.endswith("]"):
        paths = tuple(_strip_quotes(p) for p in _split_top_commas(first[1:-1]))
    else:
        paths = (_strip_quotes(first),)
    opts: dict[str, str] = {}
    for arg in args[1:]:
        m = re.match(r"^([A-Za-z_]\w*)\s*:?=\s*(.+)$", arg.strip(), re.DOTALL)
        if not m:
            raise ValueError(f"unsupported read option: {arg.strip()!r}")
        key = m.group(1).lower()
        if key in ("skip", "skip_rows"):
            # Spark's CSV source has no skip-N-preamble-lines option; a
            # silent ignore would return the unskipped rows
            raise ValueError("read_csv(skip=...) is not supported")
        opts[key] = (
            m.group(2).strip()
            if key in ("columns", "names")
            else _strip_quotes(m.group(2))
        )
    return paths, opts


def _resolve_file_reads(spark: SparkSession, sql: str) -> str:
    """Replace every ``read_*('path', ...)`` call and bare ``FROM 'path'``
    table reference with a registered temp view over the same files."""
    masked, table = _mask(sql)
    while m := re.search(
        r"(\bFROM\s+|\bJOIN\s+)glob\s*\(", masked, re.IGNORECASE
    ):
        # glob('pattern') table function: one `file` row per match —
        # a driver-side listing, exactly DuckDB's own implementation
        open_idx = masked.index("(", m.end() - 1)
        close = _matching_paren(masked, open_idx)
        pat = _strip_quotes(
            _unmask(masked[open_idx + 1 : close], table).strip()
        )
        import glob as _glob
        import hashlib as _hashlib

        from pyspark.sql import types as T

        files = sorted(_glob.glob(pat))
        name = "__dd_glob_" + _hashlib.md5(pat.encode()).hexdigest()[:12]
        spark.createDataFrame(
            [(f,) for f in files],
            T.StructType([T.StructField("file", T.StringType(), True)]),
        ).createOrReplaceTempView(name)
        _track_temp_view(spark, name)
        masked = masked[: m.start()] + m.group(1) + name + masked[close + 1 :]
    while m := _READ_FN_RE.search(masked):
        fmt = _READ_FNS[m.group(1).lower()]
        open_idx = m.end() - 1
        close = _matching_paren(masked, open_idx)
        args = [
            _unmask(a, table)
            for a in _split_top_commas(masked[open_idx + 1 : close])
        ]
        paths, opts = _parse_read_args(args)
        view = _file_read_view(spark, fmt, paths, opts)
        masked = masked[: m.start()] + view + masked[close + 1 :]

    def bare_path(m: re.Match) -> str:
        lit = _literal_value(_unmask(m.group(2), table))
        fmt = _path_format(lit) if lit is not None else None
        if fmt is None:  # not a recognized file reference: leave untouched
            return m.group(0)
        return m.group(1) + " " + _file_read_view(spark, fmt, (lit,), {})

    masked = _BARE_PATH_RE.sub(bare_path, masked)
    return _unmask(masked, table)


# ---------------------------------------------------------------------------
# prepared-statement parameter binding (? / $N placeholders)
# ---------------------------------------------------------------------------
#
# ADBC/JDBC FlightSQL clients bind parameters as an Arrow record batch via
# DoPut against the prepared-statement handle. The server substitutes the
# values textually before analysis — masked first, so a '?' inside a
# string literal is never a placeholder — which keeps the executed plan an
# ordinary Catalyst query (constant-folded literals, pushdown-eligible).

_DOLLAR_PARAM_RE = re.compile(r"\$(\d+)")


def has_parameters(sql: str) -> bool:
    masked, _ = _mask(sql)
    return "?" in masked or bool(_DOLLAR_PARAM_RE.search(masked))


def render_sql_literal(v) -> str:
    """One Python value → a SQL literal both Spark and DuckDB parse to the
    same typed constant."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v in (float("inf"), float("-inf")):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    if isinstance(v, (bytes, bytearray)):
        return "X'" + bytes(v).hex() + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return "ARRAY(" + ", ".join(render_sql_literal(x) for x in v) + ")"
    raise ValueError(f"cannot render {type(v).__name__} as a SQL literal")


def neutralize_parameters(sql: str) -> str:
    """Every placeholder → NULL; used only to run the parse-level
    read-only gate on a statement whose values arrive later (Spark's
    parser accepts '?' but not '$N')."""
    masked, table = _mask(sql)
    masked = _DOLLAR_PARAM_RE.sub("NULL", masked.replace("?", "NULL"))
    return _unmask(masked, table)


def bind_named_parameters(sql: str, named: dict) -> str:
    """Substitute DuckDB named ``$param`` placeholders (EXECUTE
    q(param := value))."""
    masked, table = _mask(sql)

    def sub(m: re.Match) -> str:
        key = m.group(1).lower()
        if key not in named:
            raise ValueError(f"EXECUTE: no value for parameter ${key}")
        return render_sql_literal(named[key])

    replaced = re.sub(r"\$([A-Za-z_]\w*)", sub, masked)
    if replaced == masked and named:
        raise ValueError("statement has no named parameter placeholders")
    return _unmask(replaced, table)


def bind_parameters(sql: str, values) -> str:
    """Substitute positional ``?`` (JDBC style) or ``$1``-indexed (DuckDB
    style) placeholders with rendered literals."""
    lits = [render_sql_literal(v) for v in values]
    masked, table = _mask(sql)
    if "?" in masked:
        parts = masked.split("?")
        if len(parts) - 1 != len(lits):
            raise ValueError(
                f"query has {len(parts) - 1} '?' placeholders, "
                f"{len(lits)} values bound"
            )
        masked = parts[0] + "".join(
            lit + rest for lit, rest in zip(lits, parts[1:])
        )
    else:
        def sub(m: re.Match) -> str:
            i = int(m.group(1))
            if not 1 <= i <= len(lits):
                raise ValueError(f"parameter ${i} out of range (have {len(lits)})")
            return lits[i - 1]

        replaced = _DOLLAR_PARAM_RE.sub(sub, masked)
        if replaced == masked and lits:
            raise ValueError("statement has no parameter placeholders")
        masked = replaced
    return _unmask(masked, table)


# UNION [ALL] BY NAME has no Spark SQL spelling (the DataFrame op is
# unionByName). Resolve it here: locate the innermost paren group (or the
# whole statement) containing the operator, run both sides through
# run_sql, combine with unionByName(allowMissingColumns=True) — DuckDB
# fills missing columns with NULL — and serve the result as a temp view
# spliced back into the SQL.
_UNION_BY_NAME_RE = re.compile(
    r"\bUNION\s+(ALL\s+)?BY\s+NAME\b", re.IGNORECASE
)


def _leading_cte_prefix(masked: str) -> str:
    """The ``WITH name AS (…)[, …]`` head of a statement (empty if none)
    — UNION BY NAME sides run as standalone queries, so a shared CTE
    scope must be re-attached to each side."""
    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", masked, re.IGNORECASE)
    if not m:
        return ""
    pos = m.end()
    while True:
        im = re.match(
            r"\s*([A-Za-z_]\w*)\s*(\([^)]*\))?\s+AS\s*\(", masked[pos:]
        )
        if not im:
            return ""  # not a parseable CTE head: leave untouched
        close = _matching_paren(masked, pos + im.end() - 1)
        pos = close + 1
        cm = re.match(r"\s*,", masked[pos:])
        if not cm:
            return masked[:pos]
        pos += cm.end()


def _resolve_union_by_name(spark: SparkSession, sql: str) -> str:
    import hashlib

    masked, table = _mask(sql)
    prefix = _leading_cte_prefix(masked)

    def with_scope(side: str) -> str:
        side = side.strip()
        if prefix and not re.match(r"\s*WITH\b", side, re.IGNORECASE):
            return prefix + " " + side
        return side

    while m := _UNION_BY_NAME_RE.search(masked):
        # find the innermost enclosing '(' ... ')' (or whole string)
        depth = 0
        start = 0
        for i in range(m.start() - 1, -1, -1):
            c = masked[i]
            if c == ")":
                depth += 1
            elif c == "(":
                if depth == 0:
                    start = i
                    break
                depth -= 1
        if masked[start] == "(":
            end = _matching_paren(masked, start)
            left = masked[start + 1 : m.start()]
            right = masked[m.end() : end]
        else:
            end = len(masked) - 1
            left = masked[:m.start()]
            right = masked[m.end() :]
        # trailing ORDER BY / LIMIT apply to the combined result
        tail_idx, _ = _find_top_keyword(right, ("ORDER", "LIMIT"))
        tail = ""
        if tail_idx >= 0:
            tail = right[tail_idx:]
            right = right[:tail_idx]
        distinct = not m.group(1)
        ldf = run_sql(spark, _unmask(with_scope(left), table))
        rdf = run_sql(spark, _unmask(with_scope(right), table))
        combined = ldf.unionByName(rdf, allowMissingColumns=True)
        if distinct:
            combined = combined.distinct()
        name = "__dd_ubn_" + hashlib.md5(
            _unmask(masked, table).encode()
        ).hexdigest()[:10]
        combined.createOrReplaceTempView(name)
        _track_temp_view(spark, name)
        inner = f"SELECT * FROM {name} {tail}".rstrip()
        if masked[start] == "(":
            masked = masked[:start] + "(" + inner + ")" + masked[end + 1 :]
        else:
            masked = inner
    return _unmask(masked, table)


# Embedded dynamic PIVOT: ``FROM (PIVOT <src> ON <col> USING <agg>)`` —
# the pivoted relation materializes as a temp view (its output columns
# are data-dependent, so no static SQL rewrite exists) and the view name
# splices into the query.
_EMBEDDED_PIVOT_RE = re.compile(
    r"\(\s*PIVOT\s+(\(.*?\)|[A-Za-z_][\w.]*)\s+ON\s+([A-Za-z_]\w*)\s+"
    r"USING\s+(\w+)\s*\(\s*(\*|[A-Za-z_]\w*)\s*\)"
    r"(?:\s+GROUP\s+BY\s+(.+?))?\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def _resolve_embedded_pivots(spark: SparkSession, sql: str) -> str:
    import hashlib

    masked, table = _mask(sql)
    while m := _EMBEDDED_PIVOT_RE.search(masked):
        stmt = _unmask(masked[m.start() + 1 : m.end() - 1], table)
        df = _run_pivot(spark, _PIVOT_RE.match(stmt))
        name = "__dd_pivot_" + hashlib.md5(stmt.encode()).hexdigest()[:10]
        df.createOrReplaceTempView(name)
        _track_temp_view(spark, name)
        masked = masked[: m.start()] + name + masked[m.end() :]
    return _unmask(masked, table)


# WITH RECURSIVE … UNION (distinct): Spark's native recursive CTE
# (4.1) supports only UNION ALL, so the distinct form routes through the
# engine's fixpoint operator (operators/recursive.py) — semi-naive
# iteration, frontier-only recursive reference, exactly the SQL
# standard's working-table semantics. The recursive name resolves to a
# temp view per iteration; base/step/outer each re-enter run_sql so the
# full dialect applies inside.
_RECURSIVE_RE = re.compile(
    r"^\s*WITH\s+RECURSIVE\s+([A-Za-z_]\w*)\s*(\([^)]*\))?\s+AS\s*\(",
    re.IGNORECASE,
)


def _run_recursive_cte(spark: SparkSession, sql: str) -> DataFrame:
    import hashlib

    from duckdb_server_spark.operators.recursive import recursive_fixpoint

    masked, table = _mask(sql)
    m = _RECURSIVE_RE.match(masked)
    if not m:
        raise ValueError("not a recursive CTE")
    name = m.group(1)
    cols = (
        [c.strip() for c in m.group(2)[1:-1].split(",")] if m.group(2) else None
    )
    open_idx = m.end() - 1
    close = _matching_paren(masked, open_idx)
    body = masked[open_idx + 1 : close]
    outer = masked[close + 1 :].strip()
    if not re.search(rf"\b{re.escape(name)}\b", body, re.IGNORECASE):
        # WITH RECURSIVE marks the whole CTE list; THIS cte never
        # references itself, so it is an ordinary CTE that happens to
        # lead the list (b58's oracle shape). Materialize it as a temp
        # view, re-head the remainder as WITH RECURSIVE, and recurse —
        # the truly self-referencing CTE down the list gets the
        # fixpoint; a list with none left falls out to plain WITH.
        plain = run_sql(spark, _unmask(body, table))
        if cols:
            plain = plain.toDF(*cols)
        # Materialize: the downstream fixpoint re-reads these views every
        # iteration (a lazy view would re-execute its whole chain per
        # round), and a checkpointed LogicalRDD also gives the recursive
        # step a fresh-attribute plan — deep lazy view chains under the
        # fixpoint trip Spark's attribute rewrite ("key not found" in
        # localCheckpoint of the step frame).
        plain = plain.localCheckpoint(eager=True)
        if spark.catalog.tableExists(name):
            # avoid clobbering an existing relation: fresh name, masked
            # substitution (literals immune)
            fresh = f"__dd_cte_{hashlib.md5(sql.encode()).hexdigest()[:10]}"
            outer = re.sub(
                rf"\b{re.escape(name)}\b", fresh, outer, flags=re.IGNORECASE
            )
            view = fresh
        else:
            view = name
        plain.createOrReplaceTempView(view)
        rest = _unmask(outer, table)
        if rest.lstrip().startswith(","):
            rest = "WITH RECURSIVE " + rest.lstrip()[1:]
        try:
            out = run_sql(spark, rest)
            out.schema
            return out
        finally:
            spark.catalog.dropTempView(view)
    # the recursive term is the LAST top-level UNION
    ui = -1
    probe = 0
    while True:
        nxt, _ = _find_top_keyword(body, ("UNION",), probe)
        if nxt < 0:
            break
        ui, probe = nxt, nxt + 5
    if ui < 0:
        raise ValueError("recursive CTE has no UNION")
    am = re.match(r"UNION\s+(ALL\s+)?", body[ui:], re.IGNORECASE)
    distinct = not am.group(1)
    base_text = _unmask(body[:ui], table)
    step_masked = body[ui + am.end() :]
    fid = hashlib.md5(sql.encode()).hexdigest()[:10]

    seed = run_sql(spark, base_text)
    if cols:
        seed = seed.toDF(*cols)
    if distinct:
        seed = seed.distinct()

    # The CTE name must resolve to the current frontier inside the step
    # and to the fixpoint result in the outer query. When the name is
    # free, the working view is registered UNDER THE CTE NAME ITSELF —
    # zero text substitution, so string literals and same-named columns
    # are untouched. When an existing relation would be clobbered, fall
    # back to substituting a fresh name on the MASKED text (literals are
    # extracted there, so only identifiers can ever match).
    collision = spark.catalog.tableExists(name)
    if collision:
        name_re = re.compile(rf"\b{re.escape(name)}\b", re.IGNORECASE)
        work, res_view = f"__dd_rec_w_{fid}", f"__dd_rec_{fid}"
        step_text = _unmask(name_re.sub(work, step_masked), table)
        outer_text = _unmask(name_re.sub(res_view, outer), table)
    else:
        work = res_view = name
        step_text = _unmask(step_masked, table)
        outer_text = _unmask(outer, table)

    def step(frontier: DataFrame) -> DataFrame:
        frontier.createOrReplaceTempView(work)
        return run_sql(spark, step_text).toDF(*seed.columns)

    result = recursive_fixpoint(seed, step, distinct=distinct)
    result.createOrReplaceTempView(res_view)
    if outer_text.lstrip().startswith(","):
        # further (non-recursive) CTEs follow the recursive one:
        # WITH RECURSIVE r AS (…), b AS (…) SELECT … → re-head as WITH
        outer_text = "WITH " + outer_text.lstrip()[1:]
    try:
        out = run_sql(spark, outer_text)
        out.schema  # analyze before the backing views are dropped
        return out
    finally:
        spark.catalog.dropTempView(res_view)
        if work != res_view:
            spark.catalog.dropTempView(work)


# DuckDB ``COLUMNS('regex')`` star modifier — expands to the matching
# column names, which needs the source table's schema, so it resolves
# here (where a session is in hand) rather than in the pure rewrite.
# Regex semantics are a substring search, like DuckDB's regexp_matches.
_COLUMNS_FN_RE = re.compile(r"\bCOLUMNS\s*\(", re.IGNORECASE)


def _sql_like_to_regex(pat: str, case_insensitive: bool = False) -> "re.Pattern[str]":
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile(
        "".join(out) + r"\Z", re.IGNORECASE if case_insensitive else 0
    )


def _columns_match(arg: str, table: list[str], cols: list[str]) -> list[str]:
    """Resolve a COLUMNS(...) argument to the matching source columns.

    Supported forms (DuckDB star-expression docs): ``'regex'``, ``*``,
    ``* EXCLUDE (a, b)``, and a name lambda ``c -> <predicate>`` with
    LIKE / ILIKE / NOT LIKE / SIMILAR TO / = / <> predicates on the
    name. Anything else fails closed."""
    arg = arg.strip()
    if re.fullmatch(r"\x00\d+\x00", arg):
        pat = _literal_value(_unmask(arg, table))
        sel = [c for c in cols if re.search(pat, c)]
    elif m := re.fullmatch(
        r"\*(?:\s+EXCLUDE\s*\(([^)]*)\))?", arg, re.IGNORECASE
    ):
        excl = {
            e.strip().strip('"').lower()
            for e in (m.group(1) or "").split(",")
            if e.strip()
        }
        missing = excl - {c.lower() for c in cols}
        if missing:
            raise ValueError(
                f"COLUMNS EXCLUDE names not in FROM clause: {sorted(missing)}"
            )
        sel = [c for c in cols if c.lower() not in excl]
    elif m := re.fullmatch(r"([A-Za-z_]\w*)\s*->\s*(.+)", arg, re.DOTALL):
        var, pred = m.group(1), m.group(2).strip()
        pm = re.fullmatch(
            rf"{var}\s+(NOT\s+)?(LIKE|ILIKE)\s+(\x00\d+\x00)",
            pred,
            re.IGNORECASE,
        )
        if pm:
            rx = _sql_like_to_regex(
                _literal_value(_unmask(pm.group(3), table)),
                pm.group(2).upper() == "ILIKE",
            )
            sel = [c for c in cols if bool(rx.match(c)) != bool(pm.group(1))]
        elif pm := re.fullmatch(
            rf"{var}\s+SIMILAR\s+TO\s+(\x00\d+\x00)", pred, re.IGNORECASE
        ):
            rx = re.compile(_literal_value(_unmask(pm.group(1), table)) + r"\Z")
            sel = [c for c in cols if rx.match(c)]
        elif pm := re.fullmatch(
            rf"{var}\s*(=|<>|!=)\s*(\x00\d+\x00)", pred
        ):
            name = _literal_value(_unmask(pm.group(2), table))
            eq = pm.group(1) == "="
            sel = [c for c in cols if (c == name) == eq]
        else:
            raise ValueError(
                f"COLUMNS lambda predicate not supported: {pred!r}"
            )
    else:
        raise ValueError(f"COLUMNS() argument not supported: {arg!r}")
    if not sel:
        raise ValueError(f"COLUMNS({arg!r}) matched no columns")
    return sel


def _expand_columns_fn(spark: SparkSession, sql: str) -> str:
    """DuckDB star expressions: every select-list item containing a
    ``COLUMNS(...)`` call expands to one copy per matched column with the
    COLUMNS call replaced by the column reference, aliased to the SOURCE
    column name — DuckDB's own naming (``min(COLUMNS(*))`` emits columns
    named after the inputs), so wrapped forms (aggregates, arithmetic)
    expand correctly."""
    masked, table = _mask(sql)
    first_call = _COLUMNS_FN_RE.search(masked)
    if not first_call:
        return sql
    # anchor on the SELECT whose list contains the COLUMNS call: scan
    # backward skipping balanced paren groups; unmatched '(' just climbs
    # out of a wrapping call (min(COLUMNS(*))), while a scalar subquery
    # in the list stays a balanced group and cannot steal the anchor
    i = first_call.start() - 1
    depth_back = 0
    sel_start = None
    while i >= 0:
        c = masked[i]
        if c in ")]":
            depth_back += 1
        elif c in "([":
            if depth_back > 0:
                depth_back -= 1
        elif depth_back == 0 and c in "tT" and i >= 5:
            if masked[i - 5 : i + 1].upper() == "SELECT" and (
                i == 5 or not (masked[i - 6].isalnum() or masked[i - 6] == "_")
            ):
                sel_start = i + 1
                break
        i -= 1
    if sel_start is None:
        raise ValueError("COLUMNS(): cannot locate the enclosing SELECT")
    m_dist = re.match(r"\s+DISTINCT\b", masked[sel_start:], re.IGNORECASE)
    start = sel_start + (m_dist.end() if m_dist else 0)
    # select list spans to the enclosing FROM (or end/closing paren)
    depth = 0
    end = len(masked)
    for i in range(start, len(masked)):
        c = masked[i]
        if c in "([":
            depth += 1
        elif c in ")]":
            if depth == 0:
                end = i
                break
            depth -= 1
        elif (
            depth == 0
            and masked[i : i + 4].upper() == "FROM"
            and not (masked[i - 1].isalnum() or masked[i - 1] == "_")
            and (i + 4 >= len(masked) or not (masked[i + 4].isalnum() or masked[i + 4] == "_"))
        ):
            end = i
            break
    select_list = masked[start:end]
    if not _COLUMNS_FN_RE.search(select_list):
        raise ValueError("COLUMNS() is supported in the select list only")
    # FROM clause: from after FROM to the first same-level keyword or the
    # enclosing close paren
    fm = re.match(r"FROM\s+", masked[end:], re.IGNORECASE)
    if not fm:
        raise ValueError("COLUMNS(): cannot locate the FROM clause")
    f_start = end + fm.end()
    depth = 0
    f_end = len(masked)
    stop_kw = re.compile(
        r"(WHERE|GROUP|ORDER|LIMIT|QUALIFY|WINDOW|HAVING|UNION|INTERSECT|EXCEPT)\b",
        re.IGNORECASE,
    )
    j = f_start
    while j < len(masked):
        c = masked[j]
        if c in "([":
            depth += 1
        elif c in ")]":
            if depth == 0:
                f_end = j
                break
            depth -= 1
        elif depth == 0 and c.isalpha():
            km = stop_kw.match(masked, j)
            if km and not (masked[j - 1].isalnum() or masked[j - 1] == "_"):
                f_end = j
                break
            while j < len(masked) and (masked[j].isalnum() or masked[j] == "_"):
                j += 1
            continue
        j += 1
    source = _unmask(masked[f_start:f_end].strip().rstrip(";"), table)
    # a WITH prologue must travel with the schema probe so CTE sources
    # resolve; only safe when the anchor select sits at the top level
    prologue = ""
    head = masked[: sel_start - 6]
    if re.match(r"\s*WITH\b", head, re.IGNORECASE) and (
        head.count("(") + head.count("[")
        == head.count(")") + head.count("]")
    ):
        prologue = _unmask(head, table)
    probe = spark.sql(f"{prologue} SELECT * FROM {source}")
    cols = probe.columns

    items = _split_top_commas(select_list)
    out_items: list[str] = []
    call_re = re.compile(r"\bCOLUMNS\s*\(", re.IGNORECASE)
    for item in items:
        cm = call_re.search(item)
        if not cm:
            out_items.append(item.strip())
            continue
        open_idx = cm.end() - 1
        close = _matching_paren(item, open_idx)
        arg = item[open_idx + 1 : close]
        sel = _columns_match(arg, table, cols)
        prefix, suffix = item[: cm.start()], item[close + 1 :]
        has_alias = re.search(r"\bAS\s+\S+\s*$", suffix, re.IGNORECASE)
        for c in sel:
            expanded = f"{prefix}{c}{suffix}".strip()
            if expanded == c or has_alias:
                out_items.append(expanded)
            else:
                out_items.append(f"{expanded} AS {c}")
    new_masked = masked[:start] + " " + ", ".join(out_items) + " " + masked[end:]
    return _unmask(new_masked, table)


# ---------------------------------------------------------------------------
# serving entry
# ---------------------------------------------------------------------------


_SUMMARIZE_RE = re.compile(
    r"^\s*SUMMARIZE\s+(.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)
_DESCRIBE_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?([A-Za-z_][\w.]*)\s*;?\s*$", re.IGNORECASE
)
# DuckDB SHOW TABLES returns a single `name` column; SHOW <table> is an
# alias of DESCRIBE. Spark-specific SHOW forms (DATABASES/FUNCTIONS/…)
# fall through to native.
_SHOW_TABLES_RE = re.compile(r"^\s*SHOW\s+(?:ALL\s+)?TABLES\s*;?\s*$", re.IGNORECASE)
_SHOW_TABLE_RE = re.compile(
    r"^\s*SHOW\s+(?!TABLES\b|DATABASES\b|SCHEMAS\b|VIEWS\b|FUNCTIONS\b"
    r"|COLUMNS\b|PARTITIONS\b|CREATE\b|TBLPROPERTIES\b|CATALOGS\b)"
    r"([A-Za-z_][\w.]*)\s*;?\s*$",
    re.IGNORECASE,
)


_PRAGMA_RE = re.compile(
    r"^\s*PRAGMA\s+(\w+)\s*(?:\(\s*(.*?)\s*\)|\s*=\s*(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CHECKPOINT_RE = re.compile(r"^\s*(?:FORCE\s+)?CHECKPOINT\s*;?\s*$", re.IGNORECASE)
_CURRENT_SETTING_RE = re.compile(
    r"\bcurrent_setting\s*\(\s*'([^']*)'\s*\)", re.IGNORECASE
)


def _run_pragma(spark: SparkSession, state, name: str, call_arg, assign_arg):
    """DuckDB PRAGMA surface that wire clients actually send (DBeaver /
    drivers): version, database_list, show_tables, table_info; the
    assignment form (PRAGMA memory_limit='2GB') routes like SET."""
    from pyspark.sql import types as T

    if name == "version":
        schema = T.StructType([
            T.StructField("library_version", T.StringType(), True),
            T.StructField("source_id", T.StringType(), True),
        ])
        return spark.createDataFrame([("v1.0.0", "spark-analog")], schema)
    if name == "database_list":
        schema = T.StructType([
            T.StructField("seq", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("file", T.StringType(), True),
        ])
        return spark.createDataFrame([(0, "memory", None)], schema)
    if name in ("show_tables", "show_tables_expanded"):
        return show_tables_frame(spark)
    if name == "table_info" and call_arg:
        return table_info_frame(spark, call_arg.strip().strip("'\""))
    if name == "show_databases":
        schema = T.StructType([T.StructField("name", T.StringType(), True)])
        return spark.createDataFrame([("memory",)], schema)
    if assign_arg is not None:
        # assignment form — engine setting, routed like SET
        state.settings[name] = _strip_quotes(assign_arg.strip())
        return None
    if call_arg is None:
        # bare flag PRAGMAs (DuckDB's enable_/disable_ pairs) toggle the
        # matching engine setting; unknown names still fail closed below
        fm = re.fullmatch(r"(enable|disable)_(\w+)", name)
        if fm and fm.group(2) in (
            "progress_bar",
            "profiling",
            "profile",
            "verification",
            "object_cache",
            "optimizer",
            "checkpoint_on_shutdown",
            "print_progress_bar",
        ):
            state.settings[fm.group(2)] = (
                "true" if fm.group(1) == "enable" else "false"
            )
            return None
    raise ValueError(f"unsupported PRAGMA {name!r}")


# engine-setting defaults surfaced through current_setting(); SET
# overrides land in DialectState.settings first
def _resolve_current_setting(spark: SparkSession, sql: str) -> str:
    import os as _os

    state = dialect_state(spark)
    defaults = {
        "threads": str(_os.cpu_count() or 1),
        "memory_limit": "128GB",
        "access_mode": "read_only",
        "default_order": "asc",
    }

    def sub(m):
        key = m.group(1).lower()
        val = state.settings.get(key, defaults.get(key))
        if val is None:
            raise ValueError(f"current_setting: unknown setting {key!r}")
        return val if re.fullmatch(r"-?\d+", val) else f"'{val}'"

    return _CURRENT_SETTING_RE.sub(sub, sql)


def table_info_frame(spark: SparkSession, name: str) -> DataFrame:
    """``PRAGMA table_info('t')`` / ``pragma_table_info('t')`` output
    shape: (cid, name, type, notnull, dflt_value, pk) — what GUI clients
    (DBeaver et al.) issue to introspect columns."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("notnull", T.BooleanType(), True),
            T.StructField("dflt_value", T.StringType(), True),
            T.StructField("pk", T.BooleanType(), True),
        ]
    )
    rows = [
        (i, f.name, _duck_type_name(f.dataType), not f.nullable, None, False)
        for i, f in enumerate(spark.table(name).schema.fields)
    ]
    return spark.createDataFrame(rows, schema)


def _catalog_tables(spark: SparkSession) -> list:
    return sorted(
        (t for t in spark.catalog.listTables()
         if t.isTemporary and not t.name.startswith("__dd_")),
        key=lambda t: t.name,
    )


_META_TVF_RE = re.compile(
    r"\b(pragma_table_info\s*\(|duckdb_tables\s*\(\s*\)|"
    r"duckdb_columns\s*\(\s*\)|information_schema\s*\.\s*(?:tables|columns)|"
    r"parquet_schema\s*\(|parquet_metadata\s*\(|parquet_file_metadata\s*\(|"
    r"duckdb_indexes\s*\(\s*\)|duckdb_settings\s*\(\s*\)|"
    r"duckdb_databases\s*\(\s*\))",
    re.IGNORECASE,
)


def _resolve_meta_tvfs(spark: SparkSession, sql: str) -> str:
    """Metadata table functions / information_schema views → temp views
    built from the session catalog (DuckDB exposes its catalog this way;
    GUI clients and ORMs query them constantly)."""
    from pyspark.sql import types as T

    def tables_frame(info_schema: bool) -> DataFrame:
        if info_schema:
            schema = T.StructType([
                T.StructField("table_catalog", T.StringType(), True),
                T.StructField("table_schema", T.StringType(), True),
                T.StructField("table_name", T.StringType(), True),
                T.StructField("table_type", T.StringType(), True),
            ])
            rows = [("memory", "main", t.name, "VIEW")
                    for t in _catalog_tables(spark)]
        else:
            schema = T.StructType([
                T.StructField("database_name", T.StringType(), True),
                T.StructField("schema_name", T.StringType(), True),
                T.StructField("table_name", T.StringType(), True),
                T.StructField("temporary", T.BooleanType(), True),
                T.StructField("column_count", T.IntegerType(), True),
            ])
            rows = [
                ("memory", "main", t.name, True,
                 len(spark.table(t.name).schema.fields))
                for t in _catalog_tables(spark)
            ]
        return spark.createDataFrame(rows, schema)

    def columns_frame(info_schema: bool) -> DataFrame:
        rows = []
        for t in _catalog_tables(spark):
            for i, f in enumerate(spark.table(t.name).schema.fields):
                if info_schema:
                    rows.append(
                        ("memory", "main", t.name, f.name, i + 1,
                         _duck_type_name(f.dataType),
                         "YES" if f.nullable else "NO")
                    )
                else:
                    rows.append(
                        ("memory", "main", t.name, f.name, i,
                         _duck_type_name(f.dataType), f.nullable)
                    )
        if info_schema:
            schema = T.StructType([
                T.StructField("table_catalog", T.StringType(), True),
                T.StructField("table_schema", T.StringType(), True),
                T.StructField("table_name", T.StringType(), True),
                T.StructField("column_name", T.StringType(), True),
                T.StructField("ordinal_position", T.IntegerType(), True),
                T.StructField("data_type", T.StringType(), True),
                T.StructField("is_nullable", T.StringType(), True),
            ])
        else:
            schema = T.StructType([
                T.StructField("database_name", T.StringType(), True),
                T.StructField("schema_name", T.StringType(), True),
                T.StructField("table_name", T.StringType(), True),
                T.StructField("column_name", T.StringType(), True),
                T.StructField("column_index", T.IntegerType(), True),
                T.StructField("data_type", T.StringType(), True),
                T.StructField("is_nullable", T.BooleanType(), True),
            ])
        return spark.createDataFrame(rows, schema)

    def register(name: str, df: DataFrame) -> str:
        df.createOrReplaceTempView(name)
        _track_temp_view(spark, name)
        return name

    def _pq_files(pattern: str) -> list[str]:
        import glob as _glob

        return sorted(_glob.glob(pattern)) or [pattern]

    def parquet_file_metadata_frame(pattern: str) -> DataFrame:
        import pyarrow.parquet as _pq

        rows = []
        for f in _pq_files(pattern):
            md = _pq.ParquetFile(f).metadata
            rows.append((
                f, md.created_by, md.num_rows, md.num_row_groups,
                int(float(md.format_version)), None, None,
            ))
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("file_name", T.StringType(), True),
            T.StructField("created_by", T.StringType(), True),
            T.StructField("num_rows", T.LongType(), True),
            T.StructField("num_row_groups", T.LongType(), True),
            T.StructField("format_version", T.LongType(), True),
            T.StructField("encryption_algorithm", T.StringType(), True),
            T.StructField("footer_signing_key_metadata", T.StringType(), True),
        ]))

    def parquet_schema_frame(pattern: str) -> DataFrame:
        import pyarrow.parquet as _pq

        rows = []
        for f in _pq_files(pattern):
            sch = _pq.ParquetFile(f).schema
            arrow = sch.to_arrow_schema()
            rows.append((
                f, "schema", None, None, "REQUIRED", len(arrow.names),
                None, None, None, None, None,
            ))
            for i in range(len(sch)):
                c = sch.column(i)
                rows.append((
                    f, c.name, c.physical_type, c.length or None,
                    "OPTIONAL" if c.max_definition_level > 0 else "REQUIRED",
                    None,
                    None if c.converted_type in (None, "NONE")
                    else str(c.converted_type),
                    c.scale or None, c.precision or None, None,
                    str(c.logical_type),
                ))
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("file_name", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("type_length", T.LongType(), True),
            T.StructField("repetition_type", T.StringType(), True),
            T.StructField("num_children", T.LongType(), True),
            T.StructField("converted_type", T.StringType(), True),
            T.StructField("scale", T.LongType(), True),
            T.StructField("precision", T.LongType(), True),
            T.StructField("field_id", T.LongType(), True),
            T.StructField("logical_type", T.StringType(), True),
        ]))

    def parquet_metadata_frame(pattern: str) -> DataFrame:
        import pyarrow.parquet as _pq

        rows = []
        for f in _pq_files(pattern):
            md = _pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    st = c.statistics
                    has_mm = st is not None and st.has_min_max
                    rows.append((
                        f, i, rg.num_rows, rg.num_columns,
                        rg.total_byte_size, j, c.file_offset, c.num_values,
                        c.path_in_schema, c.physical_type,
                        str(st.min) if has_mm else None,
                        str(st.max) if has_mm else None,
                        st.null_count if st is not None else None,
                        (st.distinct_count or None) if st is not None else None,
                        str(st.min) if has_mm else None,
                        str(st.max) if has_mm else None,
                        c.compression,
                        ", ".join(c.encodings),
                        None, c.dictionary_page_offset, c.data_page_offset,
                        c.total_compressed_size, c.total_uncompressed_size,
                    ))
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("file_name", T.StringType(), True),
            T.StructField("row_group_id", T.LongType(), True),
            T.StructField("row_group_num_rows", T.LongType(), True),
            T.StructField("row_group_num_columns", T.LongType(), True),
            T.StructField("row_group_bytes", T.LongType(), True),
            T.StructField("column_id", T.LongType(), True),
            T.StructField("file_offset", T.LongType(), True),
            T.StructField("num_values", T.LongType(), True),
            T.StructField("path_in_schema", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("stats_min", T.StringType(), True),
            T.StructField("stats_max", T.StringType(), True),
            T.StructField("stats_null_count", T.LongType(), True),
            T.StructField("stats_distinct_count", T.LongType(), True),
            T.StructField("stats_min_value", T.StringType(), True),
            T.StructField("stats_max_value", T.StringType(), True),
            T.StructField("compression", T.StringType(), True),
            T.StructField("encodings", T.StringType(), True),
            T.StructField("index_page_offset", T.LongType(), True),
            T.StructField("dictionary_page_offset", T.LongType(), True),
            T.StructField("data_page_offset", T.LongType(), True),
            T.StructField("total_compressed_size", T.LongType(), True),
            T.StructField("total_uncompressed_size", T.LongType(), True),
        ]))

    def indexes_frame() -> DataFrame:
        state = dialect_state(spark)
        rows = [
            ("memory", "main", ix, tbl, False, False, None)
            for ix, tbl in sorted(state.indexes.items())
        ]
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("database_name", T.StringType(), True),
            T.StructField("schema_name", T.StringType(), True),
            T.StructField("index_name", T.StringType(), True),
            T.StructField("table_name", T.StringType(), True),
            T.StructField("is_unique", T.BooleanType(), True),
            T.StructField("is_primary", T.BooleanType(), True),
            T.StructField("sql", T.StringType(), True),
        ]))

    def settings_frame() -> DataFrame:
        import os as _os

        state = dialect_state(spark)
        merged = {
            "threads": str(_os.cpu_count() or 1),
            "memory_limit": "128GB",
            "access_mode": "read_only",
            "default_order": "asc",
        }
        merged.update(state.settings)
        rows = [
            (k, v, "", "VARCHAR", "GLOBAL") for k, v in sorted(merged.items())
        ]
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("name", T.StringType(), True),
            T.StructField("value", T.StringType(), True),
            T.StructField("description", T.StringType(), True),
            T.StructField("input_type", T.StringType(), True),
            T.StructField("scope", T.StringType(), True),
        ]))

    def databases_frame() -> DataFrame:
        rows = [("memory", None, "duckdb")]
        for db in spark.catalog.listDatabases():
            if db.name != "default":
                rows.append((db.name, None, "duckdb"))
        return spark.createDataFrame(rows, T.StructType([
            T.StructField("database_name", T.StringType(), True),
            T.StructField("path", T.StringType(), True),
            T.StructField("type", T.StringType(), True),
        ]))

    for fn_name, builder in (
        ("parquet_file_metadata", parquet_file_metadata_frame),
        ("parquet_metadata", parquet_metadata_frame),
        ("parquet_schema", parquet_schema_frame),
    ):
        while m := re.search(rf"\b{fn_name}\s*\(", sql, re.IGNORECASE):
            close = _matching_paren(sql, m.end() - 1)
            arg = sql[m.end() : close].strip().strip("'\"")
            import hashlib as _hashlib

            view = register(
                f"__dd_{fn_name[:10]}_"
                + _hashlib.md5(arg.encode()).hexdigest()[:10],
                builder(arg),
            )
            sql = sql[: m.start()] + view + sql[close + 1 :]
    sql = re.sub(
        r"\bduckdb_indexes\s*\(\s*\)",
        lambda _m: register("__dd_meta_indexes", indexes_frame()),
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bduckdb_settings\s*\(\s*\)",
        lambda _m: register("__dd_meta_settings", settings_frame()),
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bduckdb_databases\s*\(\s*\)",
        lambda _m: register("__dd_meta_databases", databases_frame()),
        sql, flags=re.IGNORECASE,
    )
    while m := re.search(r"\bpragma_table_info\s*\(", sql, re.IGNORECASE):
        close = _matching_paren(sql, m.end() - 1)
        arg = sql[m.end() : close].strip().strip("'\"")
        view = register(
            f"__dd_ti_{re.sub(r'[^A-Za-z0-9_]', '_', arg)}",
            table_info_frame(spark, arg),
        )
        sql = sql[: m.start()] + view + sql[close + 1 :]
    sql = re.sub(
        r"\bduckdb_tables\s*\(\s*\)",
        lambda _m: register("__dd_meta_tables", tables_frame(False)),
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\bduckdb_columns\s*\(\s*\)",
        lambda _m: register("__dd_meta_columns", columns_frame(False)),
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\binformation_schema\s*\.\s*tables\b",
        lambda _m: register("__dd_is_tables", tables_frame(True)),
        sql, flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"\binformation_schema\s*\.\s*columns\b",
        lambda _m: register("__dd_is_columns", columns_frame(True)),
        sql, flags=re.IGNORECASE,
    )
    return sql


def show_tables_frame(spark: SparkSession) -> DataFrame:
    from pyspark.sql import types as T

    names = sorted(
        t.name
        for t in spark.catalog.listTables()
        if t.isTemporary and not t.name.startswith("__dd_")
    )
    return spark.createDataFrame(
        [(n,) for n in names],
        T.StructType([T.StructField("name", T.StringType(), True)]),
    )
_DESCRIBE_SELECT_RE = re.compile(
    r"^\s*DESC(?:RIBE)?\s+(SELECT\b.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)

# Spark type → DuckDB DESCRIBE spelling. Both Spark timestamp types map
# to DuckDB TIMESTAMP: the warehouse loader relabels parquet NTZ
# timestamps to UTC-pinned LTZ (session.py load_table — wall-clock
# identical under the pinned UTC session), so Spark TIMESTAMP here IS the
# engine's representation of DuckDB's TIMESTAMP over the same parquet.
_DUCK_TYPE_NAMES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "binary": "BLOB",
}


def _duck_type_name(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return _duck_type_name(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({_duck_type_name(dt.keyType)}, "
            f"{_duck_type_name(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {_duck_type_name(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    name = dt.simpleString()
    if name not in _DUCK_TYPE_NAMES:
        raise ValueError(f"DESCRIBE: no DuckDB spelling for type {name!r}")
    return _DUCK_TYPE_NAMES[name]


def describe_frame(spark: SparkSession, df: DataFrame) -> DataFrame:
    """DuckDB ``DESCRIBE`` output shape: (column_name, column_type, null,
    key, default, extra) — schema metadata only, no data scan. ``null`` is
    'YES' and key/default/extra are NULL for every view/scan-backed
    relation, matching DuckDB over the same parquet."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(c, T.StringType(), True)
            for c in ("column_name", "column_type", "null", "key", "default", "extra")
        ]
    )
    rows = [
        (f.name, _duck_type_name(f.dataType), "YES", None, None, None)
        for f in df.schema.fields
    ]
    return spark.createDataFrame(rows, schema)
_PIVOT_RE = re.compile(
    r"^\s*PIVOT\s+(\(.*\)|[A-Za-z_][\w.]*)\s+ON\s+([A-Za-z_]\w*)\s*"
    r"(?:IN\s*\(([^)]*)\)\s*)?\s+"
    r"USING\s+(\w+)\s*\(\s*(\*|[A-Za-z_]\w*)\s*\)"
    r"(?:\s+GROUP\s+BY\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UNPIVOT_RE = re.compile(
    r"^\s*UNPIVOT\s+(\(.*?\)|[A-Za-z_][\w.]*)\s+ON\s+(.+?)\s+"
    r"INTO\s+NAME\s+([A-Za-z_]\w*)\s+VALUE\s+([A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _run_pivot(spark: SparkSession, m: re.Match) -> DataFrame:
    """DuckDB ``PIVOT t ON col USING agg(x) [GROUP BY g]``: dynamic pivot
    — output columns discovered from the data. Spark equivalent is
    ``groupBy(g).pivot(col)`` with no value list, which runs one eager
    distinct job over the (low-NDV, dictionary-encoded) pivot column;
    that extra scan is dynamic pivoting's documented scale cost in ANY
    engine. Without GROUP BY, DuckDB groups by all remaining columns —
    mirrored here."""
    from pyspark.sql import functions as F

    tbl, on_col, in_list, fn, arg, group_by = m.groups()
    df = (
        run_sql(spark, tbl[1:-1]) if tbl.startswith("(") else spark.table(tbl)
    )
    fn = fn.lower()
    if fn not in ("sum", "avg", "min", "max", "count"):
        raise ValueError(f"PIVOT USING {fn}(): unsupported aggregate")
    agg = (
        F.count(F.lit(1))
        if (fn == "count" and arg == "*")
        else getattr(F, fn)(arg)
    )
    if group_by:
        groups = [c.strip() for c in group_by.split(",")]
    else:
        groups = [c for c in df.columns if c != on_col and c != arg]
    if in_list:
        # explicit value list: no distinct-discovery job — the static
        # form a production pipeline prefers (plan known at submit time)
        values = [
            _strip_quotes(v.strip()) for v in in_list.split(",") if v.strip()
        ]
        out = df.groupBy(*groups).pivot(on_col, values).agg(agg)
    else:
        out = df.groupBy(*groups).pivot(on_col).agg(agg)
    if fn == "count":
        # DuckDB's count() pivot cells are 0 where no rows matched —
        # Spark's pivot leaves NULL (a silent divergence, battery 32)
        out = out.fillna(0, subset=[c for c in out.columns
                                    if c not in groups])
    return out


def _flatten_schemas(sql: str, schemas: set) -> str:
    """``schema.table`` → ``table`` for CREATE SCHEMA names, at relation
    positions only (FROM/JOIN/INTO/UPDATE/TABLE keywords), so a table
    ALIAS that happens to share a schema name keeps its column
    references untouched."""
    masked, table = _mask(sql)
    pat = re.compile(
        r"(\b(?:FROM|JOIN|INTO|UPDATE|TABLE)\s+)("
        + "|".join(re.escape(s) for s in sorted(schemas))
        + r")\.",
        re.IGNORECASE,
    )
    return _unmask(pat.sub(lambda m: m.group(1), masked), table)


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Execute SQL, accepting both Spark and DuckDB dialect. Native Spark
    SQL takes the first path untouched (analysis is forced via ``.schema``
    so unresolved DuckDB names surface here, not at action time); on
    parse/analysis failure the DuckDB rewrite is applied and retried. If
    the rewrite is a no-op the original error propagates. The DuckDB
    ``SUMMARIZE t`` statement routes to the one-pass sketch aggregate
    (engine.summarize_frame)."""
    if m := _SUMMARIZE_RE.match(sql):
        from duckdb_server_spark.engine import summarize_frame

        return summarize_frame(spark, m.group(1))
    if m := _EXECUTE_RE.match(sql):
        # EXECUTE of a PREPAREd statement (prepared via the init script /
        # run_script; execution itself is an ordinary read-only query)
        return _run_execute(spark, m)
    if m := _DESCRIBE_RE.match(sql):
        return describe_frame(spark, spark.table(m.group(1)))
    if m := _DESCRIBE_SELECT_RE.match(sql):
        return describe_frame(spark, run_sql(spark, m.group(1)))
    if _SHOW_TABLES_RE.match(sql):
        return show_tables_frame(spark)
    if m := _SHOW_TABLE_RE.match(sql):
        return describe_frame(spark, spark.table(m.group(1)))
    if m := _PIVOT_RE.match(sql):
        state = dialect_state(spark)
        key = " ".join(sql.split())
        df = state.pivot_cache.pop(key, None)
        if df is None:
            df = _run_pivot(spark, m)
        state.pivot_cache[key] = df  # reinsert = most-recently-used
        while len(state.pivot_cache) > _PIVOT_CACHE_CAP:
            state.pivot_cache.pop(next(iter(state.pivot_cache)))
        return df
    if m := _UNPIVOT_RE.match(sql):
        # DuckDB `UNPIVOT t ON c1, c2 INTO NAME k VALUE v` → Spark's
        # native UNPIVOT clause (same semantics, different spelling).
        tbl, cols, name_col, val_col = m.groups()
        return run_sql(
            spark,
            f"SELECT * FROM {tbl} UNPIVOT ({val_col} FOR {name_col} "
            f"IN ({cols}))",
        )
    state = dialect_state(spark)
    if state.macros:
        sql = _expand_macros(sql, state.macros)
    if state.sequences and _SEQVAL_HINT_RE.search(sql):
        from duckdb_server_spark import ddl

        return ddl.run_sequence_query(spark, state, sql)
    if state.enums:
        from duckdb_server_spark import ddl

        sql = ddl.resolve_enums(spark, state, sql)
    if state.schemas:
        sql = _flatten_schemas(sql, state.schemas)
    if _FILE_READ_HINT_RE.search(sql):
        sql = _resolve_file_reads(spark, sql)
    if _META_TVF_RE.search(sql):
        sql = _resolve_meta_tvfs(spark, sql)
    if _CURRENT_SETTING_RE.search(sql):
        sql = _resolve_current_setting(spark, sql)
    if _COLUMNS_FN_RE.search(sql):
        sql = _expand_columns_fn(spark, sql)
    if _UNION_BY_NAME_RE.search(sql):
        sql = _resolve_union_by_name(spark, sql)
    if re.search(r"\(\s*PIVOT\b", sql, re.IGNORECASE):
        sql = _resolve_embedded_pivots(spark, sql)
    if _duckdb_first(state):
        # DuckDB-first mode — the Flight serving default (wrapped per
        # request via serving_dialect) and the ``SET dialect='duckdb'``
        # opt-in for embedded sessions: rewrite FIRST, so SQL that is
        # valid in both dialects with different semantics (2-arg
        # ltrim/rtrim argument order, 1-based subscripts) gets DuckDB
        # semantics instead of Spark's. Embedded native-Spark sessions
        # never pay this — the default path below tries spark.sql
        # untouched.
        if em := re.match(
            r"\s*EXPLAIN\s+(ANALYZE\s+)?(.*)$", sql, re.IGNORECASE | re.DOTALL
        ):
            # DuckDB's EXPLAIN shape: (explain_key, explain_value) rows.
            # The plan text is this engine's (Catalyst), which is the
            # honest answer to "explain this query" here.
            inner_df = run_sql(spark, em.group(2))
            key = "analyzed_plan" if em.group(1) else "physical_plan"
            plan = inner_df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            import pyspark.sql.types as T

            schema = T.StructType(
                [
                    T.StructField("explain_key", T.StringType()),
                    T.StructField("explain_value", T.StringType()),
                ]
            )
            return spark.createDataFrame([(key, plan)], schema)
        try:
            df = spark.sql(rewrite(sql, spark, duckdb_first=True))
            df.schema
            return df
        except DialectError:
            raise  # native fallback would run different semantics
        except Exception:
            pass  # fall through: maybe it was Spark-dialect input
    try:
        df = spark.sql(sql)
        df.schema  # force analysis
        return df
    except Exception as first_err:  # ParseException / AnalysisException
        if _RECURSIVE_RE.match(sql):
            # native recursive CTE failed (UNION-distinct form) → the
            # fixpoint route
            return _run_recursive_cte(spark, sql)
        try:
            rewritten = rewrite(sql, spark)
        except ValueError:
            raise first_err from None
        if " ".join(rewritten.split()) == " ".join(sql.split()):
            raise
        df = spark.sql(rewritten)
        df.schema
        return df
