"""Expression rewrites: function renames, list/regexp/window forms, ASOF JOIN, subscripts/slices, strftime/datediff, struct/map spellings (split from dialect.py, round 11)."""

from __future__ import annotations

import datetime as _dt
import re
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from duckdb_server_spark.dialect_rewrites.core import (  # noqa: F401
    DialectError,
    _PLACEHOLDER,
    _PLACEHOLDER_RE,
    _find_top_keyword,
    _literal_value,
    _masked_literal,
    _matching_paren,
    _split_top_commas,
    _unmask,
)



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
    # (list_intersect is ALSO a _template rewrite — DuckDB excludes a
    # shared NULL from the intersection, Spark keeps it; this rename is
    # the fallback for shapes the template declines)
    "list_intersect": "array_intersect",
    # (list_concat / list_cat / array_concat are _template rewrites:
    # DuckDB SKIPS NULL list arguments — concat would return NULL)
    "list_append": "array_append",
    "array_push_back": "array_append",
    # (list_prepend / array_prepend / array_push_front are _template
    # rewrites: DuckDB's argument order is (elem, list), Spark's is
    # (array, elem))
    # (list_zip is a _template rewrite: arrays_zip pads with NULLs and
    # keeps element types — the old dd_list_zip macro forced DOUBLE
    # pairs-as-arrays; round-12 hunt B)
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
    for i, c in enumerate(s):
        if c == "[":
            # Indexing only when the bracket abuts its operand
            # (ident char, ')', ']', or a masked literal terminator) —
            # or follows one across whitespace (DuckDB allows `x [1]`,
            # and whitespace collapse produces `[..] [i]`), provided the
            # operand isn't a bare clause keyword (`SELECT [1,2]` stays
            # a literal). Mirrors _rewrite_subscripts' predicate.
            is_literal = not (prev.isalnum() or prev in ")]_\x00")
            if is_literal and prev in " \t\n":
                j = i - 1
                while j >= 0 and s[j] in " \t\n":
                    j -= 1
                if j >= 0 and s[j] in ")]\x00":
                    is_literal = False
                elif j >= 0 and (s[j].isalnum() or s[j] == "_"):
                    wm = re.search(r"([A-Za-z_][\w$]*)\Z", s[: j + 1])
                    if not wm or wm.group(1).upper() not in (
                        _SUBSCRIPT_STOP_WORDS
                    ):
                        is_literal = False
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


# list_aggregate(l, 'fname') → Spark array expression. SQL aggregate
# NULL semantics (round-12 hunt B: the old sum lambda propagated NULL
# elements and returned 0.0 for empty lists; DuckDB skips NULLs and
# gives NULL on empty/all-NULL, like SUM over rows). sum's zero is
# element-typed (first - first), so integer lists stay integral —
# DuckDB widens to HUGEINT, so extreme-magnitude integer sums can
# overflow where DuckDB's 128-bit accumulator would not (documented).
_LIST_AGG_NN = "filter({l}, __dd_x -> __dd_x IS NOT NULL)"
_LIST_AGG_MAP = {
    "min": "array_min({l})",
    "max": "array_max({l})",
    "count": f"size({_LIST_AGG_NN})",
    "sum": (
        f"CASE WHEN size({_LIST_AGG_NN}) = 0 THEN NULL "
        f"ELSE aggregate({_LIST_AGG_NN}, "
        f"element_at({_LIST_AGG_NN}, 1) - element_at({_LIST_AGG_NN}, 1), "
        "(a, x) -> a + x) END"
    ),
    "avg": (
        f"CASE WHEN size({_LIST_AGG_NN}) = 0 THEN NULL "
        f"ELSE aggregate({_LIST_AGG_NN}, CAST(0.0 AS DOUBLE), "
        f"(a, x) -> a + x) / size({_LIST_AGG_NN}) END"
    ),
}



def _fold_literal_list_sum(arg: str, table: list[str]) -> str | None:
    """Exact rewrite-time sum of a LITERAL numeric list (NULLs skipped,
    empty/all-NULL → NULL): integer lists emit a plain integer literal,
    decimal lists a DECIMAL cast at the widest element scale — both
    repr-identical to DuckDB's HUGEINT / DECIMAL(38,s) results. Returns
    None when the argument is not a literal numeric list."""
    t = arg.strip()
    if t.startswith("[") and t.endswith("]"):
        items = _split_top_commas(t[1:-1])
    elif (m := re.match(r"(?i)^array\s*\(", t)) and t.endswith(")"):
        if _matching_paren(t, m.end() - 1) != len(t) - 1:
            return None
        items = _split_top_commas(t[m.end() : -1])
    else:
        return None
    items = [x for x in items if x.strip()]
    from decimal import Decimal

    vals: list[Decimal] = []
    scale = 0
    for it in items:
        t = it.strip()
        if t.upper() == "NULL":
            continue
        if re.fullmatch(r"-?\d+", t):
            vals.append(Decimal(t))
        elif re.fullmatch(r"-?\d+\.\d+", t):
            vals.append(Decimal(t))
            scale = max(scale, len(t.split(".")[1]))
        else:
            return None
    if not vals:
        return "CAST(NULL AS BIGINT)" if not scale else (
            "CAST(NULL AS DECIMAL(38,%d))" % scale
        )
    total = sum(vals)
    if scale == 0:
        return str(int(total))
    return f"CAST({total:.{scale}f} AS DECIMAL(38,{scale}))"


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
        elif fl == "sum" and len(args) == 2 and (
            folded := _fold_literal_list_sum(args[0], table)
        ) is not None:
            # DECIMAL lists break the element-typed accumulator (Spark's
            # aggregate needs a stable acc type; decimal + widens), so
            # LITERAL lists fold exactly at rewrite time in decimal
            # math — DuckDB's own arithmetic domain (round-12 hunt B)
            repl = folded
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
                if cols is None and src.strip():
                    # round-13 hunt F wave 4: subquery/VALUES sources —
                    # analysis-only schema resolve (no job); masked
                    # literals in src make this raise → same fallback
                    try:
                        cols = spark.sql(f"SELECT * FROM {src}").columns
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
    the first depth-0 SELECT/FROM belong to the main query block.
    Round 15 (hunt H wave 5): QUALIFY inside a parenthesized subquery
    (an IN-subquery predicate, a CTE body) rewrites recursively — the
    top-level-only expansion left those raw (a Spark parse error)."""
    changed = True
    while changed:
        changed = False
        for qm in re.finditer(r"(?i)\bQUALIFY\b", s):
            depth, j, open_idx = 0, qm.start() - 1, None
            while j >= 0:
                c = s[j]
                if c == ")":
                    depth += 1
                elif c == "(":
                    if depth == 0:
                        open_idx = j
                        break
                    depth -= 1
                j -= 1
            if open_idx is None:
                continue  # depth-0 QUALIFY: the block logic below
            close = _matching_paren(s, open_idx)
            inner = s[open_idx + 1 : close]
            if not re.match(r"(?i)\s*\(*\s*(SELECT|WITH)\b", inner):
                continue
            new_inner = _rewrite_qualify(inner)
            if new_inner != inner:
                s = s[: open_idx + 1] + new_inner + s[close:]
                changed = True
                break
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

def _scrub_bare_star(s: str, join_pos: int) -> str:
    """If the query block CONTAINING the rewritten ASOF join projects a
    bare ``*``, exclude the helper column the rewrite added to the
    right side. Round 15 (hunt H): the scrub previously always hit the
    top-level SELECT — wrong when the ASOF join sits inside a derived
    table (e.g. a PIVOT source) whose own select list is explicit; the
    bound column never escapes that subquery, and the outer EXCEPT
    then referenced a nonexistent name. The enclosing SELECT is found
    by walking back from the join at matching paren depth."""
    depth = 0
    i = join_pos
    sel_idx = None
    while i >= 0:
        c = s[i]
        if c == ")":
            depth += 1
        elif c == "(":
            if depth == 0:
                break  # left our query block: no SELECT to scrub here
            depth -= 1
        elif (depth == 0 and c in "Ss"
              and re.match(r"(?i)SELECT\b", s[i:])
              and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))):
            sel_idx = i
            break
        i -= 1
    if sel_idx is None:
        return s
    m = re.match(
        r"SELECT\s+\*(?!\s*EXCEPT)(?=\s*,|\s+FROM)", s[sel_idx:],
        re.IGNORECASE,
    )
    if m:
        star_end = sel_idx + m.end()
        s = s[:star_end] + " EXCEPT (__asof_bound)" + s[star_end:]
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
        s = _scrub_bare_star(s, m.start())



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



_SUBSCRIPT_STOP_WORDS = {
    "SELECT", "WHERE", "AND", "OR", "NOT", "THEN", "ELSE", "WHEN",
    "CASE", "IN", "ON", "USING", "BY", "AS", "FROM", "JOIN", "VALUES",
    "UNION", "ALL", "DISTINCT", "RETURN", "RETURNING", "SET", "LIMIT",
    "OFFSET", "HAVING", "GROUP", "ORDER", "BETWEEN", "LIKE", "ILIKE",
    "GLOB", "EXCEPT", "INTERSECT", "LATERAL", "OVER", "PARTITION",
    "ROW", "ROWS", "RANGE", "IS", "NULL", "TRUE", "FALSE", "END",
    "INTO", "INSERT", "UPDATE", "DELETE", "MERGE", "DEFAULT",
}


def _rewrite_subscripts(
    s: str,
    kinds: dict[str, str] | None = None,
    table: list[str] | None = None,
    map_direct: bool = False,
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

    def _is_struct_base(base: str) -> bool:
        b = base.strip()
        while b.startswith("(") and _matching_paren(b, 0) == len(b) - 1:
            b = b[1:-1].strip()
        if re.match(r"(?i)^(named_struct|struct)\s*\(", b):
            return True
        if kinds and re.fullmatch(r"[A-Za-z_][\w.]*", b):
            k = kinds.get(b.split(".")[-1].lower())
            return bool(k and k.startswith("struct:"))
        return False

    def _is_string_base(base: str) -> bool:
        base = base.strip()
        # a parenthesized literal — ('hello')[0:3] — is still a string
        # base (round-12 hunt)
        while (
            base.startswith("(") and base.endswith(")")
            and _matching_paren(base, 0) == len(base) - 1
        ):
            base = base[1:-1].strip()
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
            bref = start - 1
            while bref >= 0 and s[bref] in " \t\n":
                bref -= 1
            if bref < 0:
                continue
            prev_c = s[bref]
            if prev_c not in ")]" and not (prev_c.isalnum() or prev_c in "_\x00"):
                continue  # list literal (handled earlier) or stray bracket
            if bref < start - 1 and prev_c not in ")]\x00":
                # whitespace-separated subscript (DuckDB allows `x [1]`,
                # and whitespace collapse produces `[..] [i]`): only when
                # the base doesn't end in a bare clause keyword —
                # `SELECT [1,2]` / `THEN [1]` are list literals
                wm = re.search(r"([A-Za-z_][\w$]*)\Z", s[: bref + 1])
                if wm and wm.group(1).upper() in _SUBSCRIPT_STOP_WORDS:
                    continue
            bref += 1
            content = m.group(1).strip()
            if not content:
                continue
            base_start = _expr_start(s, bref)
            base = s[base_start:bref]
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
                    # 1-based window → substr; negative/zero bounds
                    # normalize like list slices ('abcdef'[2:-2] =
                    # 'bcde', 'hello'[0:3] = 'hel')
                    na, ln = _slice_window(
                        base, a, b or f"length({base})", "length"
                    )
                    repl = f"substr({base}, {na}, {ln})"
                else:
                    na, ln = _slice_window(base, a, b or f"size({base})")
                    repl = f"slice({base}, {na}, {ln})"
            elif _is_string_base(base):
                # single-character string subscript (DuckDB: '' for [0],
                # negative wraps from the end — substr matches both)
                if content == "0":
                    repl = f"substr({base}, 2, 0)"
                else:
                    repl = f"substr({base}, {content}, 1)"
            elif (
                _is_struct_base(base)
                and table is not None
                and (sm := re.fullmatch(r"\x00(\d+)\x00", content))
                and table[int(sm.group(1))].startswith("'")
            ):
                # round-14 hunt G: DuckDB allows STRING subscripts on
                # STRUCTs — struct['a'] ≡ struct.a; Spark's element_at
                # lowering only fits maps/lists
                repl = f"{base}.`{_literal_value(table[int(sm.group(1))])}`"
            elif _is_map_base(base):
                if map_direct:
                    # 1.2+ semantics (round 15, VERDICT r14 item 6,
                    # behind SET duckdb_version_semantics): map[key]
                    # returns the VALUE directly, NULL when missing —
                    # the 1.2 release notes' breaking change
                    repl = f"try_element_at({base}, {content})"
                else:
                    # 1.0 oracle (probed live): map[key] yields the
                    # LIST of matches — [] for a missing key, [v] when
                    # present (even a NULL v); a NULL key matches
                    # nothing
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
    """DuckDB stepped slice: elements at positions a, a+c, … toward the
    end bound, inclusive and clamped; negative bounds count from the
    last element. A literal NEGATIVE step walks backwards (round-12
    hunt — probed: [1..7][7:1:-1] reverses, [1..5][-1:-5:-2] = [5,3,1],
    [1..5][100:0:-2] = [5,3,1], [1..5][2:5:-1] = []); the start then
    clamps DOWN to size and the end UP to 1. ``slice(arr, 1, 0)``
    supplies a correctly-typed empty result when the window is empty
    (Spark's sequence errors on an illegal direction)."""
    if re.fullmatch(r"\s*-\d+\s*", c):
        lo = (
            f"least(size({arr}), CASE WHEN ({a}) < 0 THEN size({arr}) "
            f"+ ({a}) + 1 ELSE ({a}) END)"
        )
        end = (
            f"greatest(1, CASE WHEN ({b}) < 0 THEN size({arr}) + ({b}) "
            f"+ 1 ELSE ({b}) END)"
        )
        return (
            f"CASE WHEN {lo} >= {end} THEN "
            f"transform(sequence({lo}, {end}, ({c})), "
            f"__dd_i -> element_at({arr}, CAST(__dd_i AS INT))) "
            f"ELSE slice({arr}, 1, 0) END"
        )
    lo = (
        f"greatest(1, CASE WHEN ({a}) < 0 THEN size({arr}) + ({a}) + 1 "
        f"ELSE ({a}) END)"
    )
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



def _slice_window(
    arr: str, a: str, b: str, size_fn: str = "size"
) -> tuple[str, str]:
    """Normalized (start, length) for Spark ``slice``/``substr`` from
    DuckDB's (start, end) slice window (round-12 hunt: negative and
    zero STARTS were silently mis-sliced before): both bounds are
    1-based inclusive, a negative bound counts from the end
    (idx = size + bound + 1), the start clamps up to 1 and the end
    down to size, and an inverted window is empty. Probed:
    [1..5][-3:-2] = [3,4], [0:3] = [1,2,3], [-10:3] = [1,2,3],
    [-1:2] = [], 'hello'[0:3] = 'hel'."""
    na = (
        f"greatest(1, CASE WHEN ({a}) < 0 THEN {size_fn}({arr}) + ({a}) "
        f"+ 1 ELSE ({a}) END)"
    )
    ne = (
        f"least({size_fn}({arr}), CASE WHEN ({b}) < 0 THEN "
        f"{size_fn}({arr}) + ({b}) + 1 ELSE ({b}) END)"
    )
    # greatest/least IGNORE NULLs in Spark, so a NULL bound must gate
    # explicitly — DuckDB returns NULL for a NULL bound
    ln = (
        f"(CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
        f"ELSE greatest(0, ({ne}) - ({na}) + 1) END)"
    )
    return na, ln



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
            repl = _step_slice_expr(arr, a, b, c)
        elif len(args) == 3:
            arr, a, b = args
            if is_string(arr):
                na, ln = _slice_window(arr, a, b, "length")
                repl = f"substr({arr}, {na}, {ln})"
            else:
                na, ln = _slice_window(arr, a, b)
                repl = f"slice({arr}, {na}, {ln})"
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



def _column_kinds(spark, masked: str,
                  table: list[str] | None = None) -> dict[str, str]:
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
    # round 15 (hunt H wave 2's documented boundary, now closed):
    # ``UNNEST([{…}, …]) AS t(s)`` — the derived column's STRUCT kind
    # (and its field names) are visible from the literal text itself,
    # no catalog needed, so ``t.s['a']`` can lower to field access
    # (struct literals have already lowered to named_struct(key, val,
    # …) and UNNEST([…]) to explode(array(…)) by this point in the
    # pipeline — keys are masked strings)
    for um in re.finditer(
        r"(?i)\b(?:UNNEST|explode)\s*\(\s*(?:\[|array\s*\()\s*"
        r"named_struct\s*\(",
        masked,
    ):
        open_idx = masked.index("(", um.start())
        close = _matching_paren(masked, open_idx)
        am = re.match(
            r"\s*(?:AS\s+)?[A-Za-z_]\w*\s*\(\s*([A-Za-z_]\w*)\s*\)",
            masked[close + 1 :], re.IGNORECASE,
        )
        if not am:
            continue
        col = am.group(1).lower()
        ns_open = masked.index("(", um.end() - 1)
        ns_close = _matching_paren(masked, ns_open)
        args = _split_top_commas(masked[ns_open + 1 : ns_close])
        fields = []
        for key in args[::2]:  # named_struct alternates key, value
            key = key.strip()
            if table is not None and key.startswith("\x00"):
                key = _unmask(key, table).strip().strip("'\"")
            if not re.fullmatch(r"[A-Za-z_]\w*", key):
                fields = []
                break
            fields.append(key)
        if fields and col not in conflicted and col not in kinds:
            kinds[col] = "struct:" + ",".join(fields)
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



_WINDOW_KW_RE = re.compile(r"\bWINDOW\s+(?=[A-Za-z_]\w*\s+AS\s*\()",
                           re.IGNORECASE)


def _inline_named_windows(s: str) -> str:
    """Inline a named WINDOW definition into its ``OVER name`` uses
    when the definition carries a frame only the inline-OVER rewrites
    can lower (``EXCLUDE …`` / ``GROUPS`` — hunt H r15: ``WINDOW w AS
    (… EXCLUDE CURRENT ROW)`` previously failed closed because
    _rewrite_exclude_frames only sees ``OVER ( … )``). Definitions
    without such frames stay in the native WINDOW clause (Spark
    supports it)."""
    changed = True
    while changed:
        changed = False
        for wm in _WINDOW_KW_RE.finditer(s):
            pos = wm.end()
            defs: list[tuple[str, str]] = []
            clause_end = pos
            while True:
                dm = re.match(r"([A-Za-z_]\w*)\s+AS\s*\(", s[pos:],
                              re.IGNORECASE)
                if not dm:
                    break
                open_idx = pos + dm.end() - 1
                close = _matching_paren(s, open_idx)
                defs.append((dm.group(1), s[open_idx + 1 : close]))
                clause_end = close + 1
                nxt = re.match(r"\s*,\s*", s[close + 1 :])
                if not nxt:
                    break
                pos = close + 1 + nxt.end()
            inline = [
                d for d in defs
                if re.search(r"(?i)\bEXCLUDE\s+(?:CURRENT|GROUP|TIES|"
                             r"NO\s+OTHERS)|\bGROUPS\b", d[1])
            ]
            if not inline:
                continue
            keep = [d for d in defs if d not in inline]
            clause = ("WINDOW " + ", ".join(f"{n} AS ({sp})"
                                            for n, sp in keep)
                      if keep else "")
            s = s[: wm.start()] + clause + s[clause_end:]
            for name, spec in inline:
                s = re.sub(rf"(?i)\bOVER\s+{name}\b", f"OVER ({spec})",
                           s)
            changed = True
            break
    return s


_STD_PIVOT_RE = re.compile(r"\bPIVOT\s*\(", re.IGNORECASE)


def _pivot_body_parts(body: str):
    """Split a standard-PIVOT body into (agg items, FOR column, IN-open
    offset within body). Returns None when the body is not the
    ``aggs FOR col IN (…)`` shape."""
    depth = 0
    for fm in re.finditer(r"(?i)\bFOR\b", body):
        depth = body[: fm.start()].count("(") - body[: fm.start()].count(")")
        if depth == 0:
            im = re.match(r"\s*[A-Za-z_]\w*\s+IN\s*\(", body[fm.end() :],
                          re.IGNORECASE)
            if im:
                return (
                    _split_top_commas(body[: fm.start()]),
                    fm.end() + im.end() - 1,
                )
    return None


def _rewrite_std_pivot_count(s: str, table: list[str]) -> str:
    """SQL-standard ``PIVOT (count(…) FOR c IN (v1, v2))``: DuckDB
    fills absent (group, value) cells with 0 for count, Spark's native
    PIVOT leaves NULL (hunt H r15 — the composed probe was PIVOT over
    an ASOF-join source). The pivot output's value-column names are
    known from the IN list, so the source+PIVOT segment wraps in a
    projection that coalesces exactly those columns; other aggregates
    (sum/min/max/avg) are NULL-celled in both engines and stay
    native.

    r16 (ADVICE r15 item 1): the original shape match required the
    count to be the FIRST and ONLY aggregate with no alias, so
    ``count(*) AS n FOR …`` or ``sum(x) AS s, count(*) AS n FOR …``
    stayed native and silently kept Spark's NULL cells. Now the agg
    list is parsed: any count aggregate in any position is coalesced,
    with the engines' naming conventions reconciled — single aliased
    agg: DuckDB names ``{value}_{alias}`` while Spark ignores the
    alias (probed on both engines), so the wrap renames; multi-agg:
    both engines name ``{value}_{alias-or-text}`` identically. The one
    shape whose Spark/DuckDB names cannot be reconciled textually —
    an UNALIASED ``count(*)`` among multiple aggregates (DuckDB
    ``count_star()`` vs Spark ``count(1)`` suffixes) — fails closed
    with DialectError instead of diverging silently."""
    pos = 0
    while m := _STD_PIVOT_RE.search(s, pos):
        piv_open = s.index("(", m.start())
        piv_close = _matching_paren(s, piv_open)
        body = s[piv_open + 1 : piv_close]
        parts = _pivot_body_parts(body)
        if parts is None:
            pos = piv_close + 1
            continue
        agg_items, in_off = parts
        aggs = []  # (expr_text, alias_or_None, is_count)
        for item in agg_items:
            item = item.strip()
            am = re.search(r"(?is)\s+AS\s+([A-Za-z_]\w*|\x00\d+\x00)\s*$",
                           item)
            alias = None
            expr = item
            if am:
                alias = _unmask(am.group(1), table).strip()
                if (len(alias) >= 2 and alias[0] == alias[-1]
                        and alias[0] in "'\""):
                    alias = alias[1:-1]
                expr = item[: am.start()].strip()
            aggs.append((expr, alias,
                         bool(re.match(r"(?is)^count\s*\(", expr))))
        if not any(is_cnt for _, _, is_cnt in aggs):
            pos = piv_close + 1
            continue
        if len(aggs) > 1 and any(
            is_cnt and alias is None and "*" in expr
            for expr, alias, is_cnt in aggs
        ):
            raise DialectError(
                "PIVOT with an unaliased count(*) among multiple "
                "aggregates: Spark (count(1)) and DuckDB (count_star()) "
                "derive different column suffixes — alias the count "
                "(e.g. count(*) AS n) to pivot this shape"
            )
        in_open = piv_open + 1 + in_off
        in_close = _matching_paren(s, in_open)
        names = []
        for v in _split_top_commas(s[in_open + 1 : in_close]):
            v = v.strip()
            vm = re.match(r"(?is)^(.*?)\s+AS\s+([A-Za-z_]\w*|\x00\d+\x00)"
                          r"\s*$", v)
            raw = vm.group(2) if vm else v
            raw = _unmask(raw, table).strip()
            if (len(raw) >= 2 and raw[0] == raw[-1]
                    and raw[0] in "'\""):
                raw = raw[1:-1]
            names.append(raw)
        # source: the paren group or dotted identifier just before PIVOT
        src_end = m.start()
        while src_end > 0 and s[src_end - 1] in " \t\n":
            src_end -= 1
        if src_end and s[src_end - 1] == ")":
            depth, j = 0, src_end - 1
            while j >= 0:
                if s[j] == ")":
                    depth += 1
                elif s[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            src_start = j
        else:
            im = re.search(r"[A-Za-z_][\w.]*$", s[:src_end])
            if not im:
                pos = piv_close + 1
                continue
            src_start = im.start()
        # optional trailing alias stays outside the wrap
        am2 = re.match(r"\s+(?:AS\s+)?([A-Za-z_]\w*)", s[piv_close + 1 :],
                       re.IGNORECASE)
        alias = ""
        tail_start = piv_close + 1
        if am2 and am2.group(1).upper() not in ("WHERE", "GROUP", "ORDER",
                                                "LIMIT", "QUALIFY", "ON",
                                                "JOIN", "UNION", "HAVING",
                                                "WINDOW", "OFFSET"):
            alias = " " + am2.group(1)
            tail_start += am2.end()
        # Per (value, aggregate) output column: Spark's native name, the
        # DuckDB-parity name, and whether it needs the count-0 fill. The
        # wrap EXCEPTs every pivot column and re-emits ALL of them in
        # native order (group columns stay first), so column order —
        # positionally significant under a downstream UNION — survives.
        sel_items, except_cols = [], []
        for n in names:
            for expr, agg_alias, is_cnt in aggs:
                if len(aggs) == 1:
                    spark_name = n
                    duck_name = f"{n}_{agg_alias}" if agg_alias else n
                else:
                    suffix = agg_alias if agg_alias else expr
                    spark_name = duck_name = f"{n}_{suffix}"
                except_cols.append(f"`{spark_name}`")
                if is_cnt:
                    sel_items.append(
                        f"coalesce(`{spark_name}`, 0) AS `{duck_name}`")
                elif spark_name != duck_name:
                    sel_items.append(f"`{spark_name}` AS `{duck_name}`")
                else:
                    sel_items.append(f"`{spark_name}`")
        quoted = ", ".join(except_cols)
        cos = ", ".join(sel_items)
        seg = s[src_start : piv_close + 1]
        repl = (f"(SELECT * EXCEPT ({quoted}), {cos} FROM {seg})"
                f"{alias or ' __dd_pvt'}")
        s = s[:src_start] + repl + s[tail_start:]
        pos = src_start + len(repl)
    return s


_RANK_OVER_RE = re.compile(
    r"\b(row_number|rank|dense_rank|percent_rank|cume_dist|ntile|lead"
    r"|lag)\s*\([^()]*\)\s*OVER\s*(\(|[A-Za-z_]\w*)",
    re.IGNORECASE,
)


def _rewrite_unordered_rank(s: str) -> str:
    """Rank-family window functions over a spec WITHOUT ``ORDER BY``
    (hunt H r15): DuckDB permits them — rows number in arbitrary
    (scan) order — while Spark requires an ordered window. ``ORDER BY
    1`` (a constant) reproduces the arbitrary-order contract exactly.
    Only the rank family is touched: appending an ORDER BY to an
    AGGREGATE's window would silently shrink its default frame from
    the whole partition to range-to-current-row. Named windows are
    expanded at the call site (patching the shared WINDOW definition
    would hit aggregate users too)."""
    # named-window defs, for call-site expansion
    defs: dict[str, str] = {}
    for wm in _WINDOW_KW_RE.finditer(s):
        pos = wm.end()
        while True:
            dm = re.match(r"([A-Za-z_]\w*)\s+AS\s*\(", s[pos:],
                          re.IGNORECASE)
            if not dm:
                break
            open_idx = pos + dm.end() - 1
            close = _matching_paren(s, open_idx)
            defs[dm.group(1).lower()] = s[open_idx + 1 : close]
            nxt = re.match(r"\s*,\s*", s[close + 1 :])
            if not nxt:
                break
            pos = close + 1 + nxt.end()

    def _no_order(spec: str) -> bool:
        depth = 0
        up = spec.upper()
        i = 0
        while i < len(up):
            c = up[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif depth == 0 and up.startswith("ORDER", i) and (
                    i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_")):
                return False
            i += 1
        return True

    pos = 0
    while m := _RANK_OVER_RE.search(s, pos):
        tgt = m.group(2)
        if tgt == "(":
            open_idx = m.end() - 1
            close = _matching_paren(s, open_idx)
            spec = s[open_idx + 1 : close]
            if _no_order(spec):
                ins = (" ORDER BY 1" if spec.strip() else "ORDER BY 1")
                s = s[:close] + ins + s[close:]
                pos = close + len(ins) + 1
            else:
                pos = close + 1
            continue
        name = tgt.lower()
        if name in defs and _no_order(defs[name]):
            spec = (defs[name].strip() + " ORDER BY 1").strip()
            repl = f"({spec})"
            s = s[: m.start(2)] + repl + s[m.end(2) :]
            pos = m.start(2) + len(repl)
        else:
            pos = m.end()
    return s


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



_ORDER_BY_KW_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_OB_STOP_KWS = (
    "LIMIT", "OFFSET", "FETCH", "ROWS", "RANGE", "GROUPS", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT", "USING", "SEPARATOR",
)
_OB_STOP_RE = re.compile(
    r"(?i)\b(" + "|".join(_OB_STOP_KWS) + r")\b"
)


def _rewrite_order_null_defaults(s: str) -> str:
    """DuckDB's default null placement is NULLS LAST for BOTH sort
    directions (default_null_order); Spark's ASC default is NULLS
    FIRST — a silent row-order divergence on every unannotated
    ascending key over nullable data (round-12 hunt C; the declared
    catalog always writes NULLS LAST explicitly, so this bites only
    verbatim user SQL). Appends NULLS LAST to every ORDER BY item that
    names neither a null order nor DESC (the DESC defaults agree),
    in top-level, subquery, and OVER(...) clauses alike. 'ALL' keys
    are left for the ORDER BY ALL expansion."""
    idx = 0
    while m := _ORDER_BY_KW_RE.search(s, idx):
        start = m.end()
        depth = 0
        i = start
        end = len(s)
        while i < len(s):
            c = s[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0 and (c.isalpha()) and (
                i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
            ):
                mm = _OB_STOP_RE.match(s, i)
                if mm:
                    end = i
                    break
            i += 1
        clause = s[start:end]
        items = _split_top_commas(clause)
        changed = False
        new_items = []
        for it in items:
            t = it.strip()
            if (
                not t
                or re.search(r"(?i)\bNULLS\s+(FIRST|LAST)\s*$", t)
                or re.search(r"(?i)\bDESC\s*$", t)
                or re.fullmatch(r"(?i)ALL", t)
            ):
                new_items.append(t)
            else:
                new_items.append(t + " NULLS LAST")
                changed = True
        if changed:
            repl = " " + ", ".join(new_items) + " "
            s = s[:start] + repl + s[end:]
            idx = start + len(repl)
        else:
            idx = end
    return s


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
        # round-14 hunt G wave 4: a trailing FILTER (WHERE …) — DuckDB
        # allows it on ordered/null-keeping aggregates, but the
        # transform(array_sort(collect_list(…))) lowering cannot carry
        # a FILTER clause on the OUTER expression; attach it to the
        # inner collection aggregate instead
        filt, fend = "", close
        fm = re.match(r"\s*FILTER\s*\(", s[close + 1 :], re.IGNORECASE)
        if fm:
            fopen = close + 1 + fm.end() - 1
            fclose = _matching_paren(s, fopen)
            if fclose > 0:
                filt = " FILTER " + s[fopen : fclose + 1]
                fend = fclose
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
                # Zero input rows give NULL, not [] (round-12 hunt C).
                inner_s = inner.strip()
                repl = (
                    f"CASE WHEN size(collect_list(struct({inner_s} AS _v)"
                    f"){filt}) = 0 THEN NULL ELSE "
                    f"transform(collect_list(struct({inner_s} AS _v))"
                    f"{filt}, x -> x._v) END"
                )
                s = s[: m.start()] + repl + s[fend + 1 :]
                pos = m.start() + len(repl)
                continue
            pos = close + 1
            continue
        expr_part = inner[:ob_idx].rstrip()
        if fn in ("min", "max", "count", "bool_and", "bool_or"):
            # order-INSENSITIVE aggregates: DuckDB accepts the ORDER BY
            # clause and ignores it — strip it (battery 35)
            repl = f"{fn}({expr_part}){filt}"
            s = s[: m.start()] + repl + s[fend + 1 :]
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
            repl = f"array_sort(collect_set({e}){filt})"
            if keys[0][1]:
                repl = f"reverse({repl})"
        else:
            fields = ", ".join(
                [f"{k} AS _o{i}" for i, (k, _, _) in enumerate(keys)]
                + [f"{expr_part} AS _v"]
            )
            sorted_expr = (
                f"array_sort(collect_list(struct({fields})){filt}, "
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
        tail = fend if (filt and fn not in ("string_agg", "group_concat")) else close
        s = s[: m.start()] + repl + s[tail + 1 :]
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



_PARALLEL_UNNEST_RE = re.compile(r"\bunnest\s*\(", re.IGNORECASE)


def _rewrite_parallel_unnest(s: str) -> str:
    """Round-13 hunt F wave 4: DuckDB ZIPS parallel unnests in one
    select list (``SELECT unnest([1,2]), unnest([10,20])`` → rows
    (1,10),(2,20), shorter lists padded with NULL); Spark's multiple
    generators don't. When EVERY top-level select item is an
    ``unnest(expr) [AS alias]`` and there is no FROM tail, lower to
    one ``explode(arrays_zip(...))`` over a dual row (arrays_zip pads
    with NULL identically). A FROM-ful parallel unnest fails closed —
    the old path produced silently wrong cross-ish rows."""
    m = re.match(r"(?is)^\s*SELECT\s+(.*)$", s)
    if not m:
        return s
    body = m.group(1)
    if len(_PARALLEL_UNNEST_RE.findall(body)) < 2:
        return s
    items = _split_top_commas(body)
    parsed = []
    for item in items:
        im = re.match(
            r"(?is)^\s*unnest\s*\((.*)\)\s*(?:AS\s+([A-Za-z_]\w*))?\s*$",
            item,
        )
        if not im or _matching_paren(
                item, item.lower().index("(")) < 0:
            parsed = None
            break
        parsed.append((im.group(1), im.group(2)))
    if parsed and len(parsed) >= 2:
        zip_args = ", ".join(p[0] for p in parsed)
        cols = ", ".join(
            f"__dd_zz.`{i}` AS {alias or f'unnest_{i}'}"
            for i, (_, alias) in enumerate(parsed)
        )
        return (
            f"SELECT {cols} FROM (SELECT "
            f"explode(arrays_zip({zip_args})) AS __dd_zz)"
        )
    from_idx, _ = _find_top_keyword(body, ("FROM",))
    head = body[:from_idx] if from_idx >= 0 else body
    if len(_PARALLEL_UNNEST_RE.findall(head)) >= 2:
        raise DialectError(
            "parallel unnest: DuckDB zips the vectors row-wise — only "
            "a single unnest per select list, or the FROM-less "
            "all-unnest zip form, is supported"
        )
    return s


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
        off_n = off_unit = None
        if origin is not None:
            om = re.match(
                r"(?i)^INTERVAL\s+(?:(\x00\d+\x00)|(\d+)\s+([A-Za-z]+))$",
                origin,
            )
            if om:
                # round-13 hunt F wave 2: the INTERVAL-offset form —
                # buckets shift by the offset (probed: 15 MIN width,
                # 5 MIN offset → 12:37 buckets to 12:35, 12:02 to
                # 11:50): fold the offset into the origin
                if om.group(1):
                    olit = _literal_value(_unmask(om.group(1), table)) or ""
                    oparts = olit.split()
                    if len(oparts) != 2:
                        raise ValueError(
                            f"time_bucket: unsupported offset {olit!r}"
                        )
                    off_n, off_unit = int(oparts[0]), oparts[1].lower()
                else:
                    off_n, off_unit = int(om.group(2)), om.group(3).lower()
                origin = None
            elif _tb_temporal_kind(origin, table, kinds) is None:
                raise ValueError(
                    "time_bucket: origin must be a DATE/TIMESTAMP or "
                    "INTERVAL literal"
                )
        if unit in _INTERVAL_MONTHS:
            months = n * _INTERVAL_MONTHS[unit]
            o = origin or "DATE '2000-01-01'"
            if off_unit is not None:
                if off_unit not in _INTERVAL_MONTHS:
                    raise ValueError(
                        "time_bucket: month-width offsets must be "
                        "month-granular"
                    )
                o = (f"add_months({o}, "
                     f"{off_n * _INTERVAL_MONTHS[off_unit]})")
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
            if off_unit is not None:
                if off_unit not in _INTERVAL_DAYS:
                    raise ValueError(
                        "time_bucket: day-width offsets must be "
                        "day-granular"
                    )
                o = (f"date_add(CAST({o} AS DATE), "
                     f"{off_n * _INTERVAL_DAYS[off_unit]})")
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
            if off_unit is not None:
                if off_unit in _INTERVAL_MICROS:
                    off_us = off_n * _INTERVAL_MICROS[off_unit]
                elif off_unit in _INTERVAL_DAYS:
                    off_us = (off_n * _INTERVAL_DAYS[off_unit]
                              * 86_400_000_000)
                else:
                    raise ValueError(
                        "time_bucket: offsets on a sub-day width must "
                        "be day- or time-granular"
                    )
                o_us = f"({o_us} + {off_us})"
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



def _fold_int_arith(expr: str):
    """Evaluate PURE integer constant arithmetic with DuckDB's
    semantics (``//`` and ``%`` truncate toward zero, unlike Python's
    floor). Returns None when the text contains anything beyond
    digits, ``+ - * // %`` and parens — columns, functions, floats,
    and ``/`` (float division) all keep the dynamic path."""
    toks = re.findall(r"\d+|//|[-+*%()]", expr)
    if "".join(toks) != re.sub(r"\s+", "", expr):
        return None
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    def p_expr():
        nonlocal pos
        v = p_term()
        while peek() in ("+", "-"):
            op = toks[pos]
            pos += 1
            r = p_term()
            v = v + r if op == "+" else v - r
        return v

    def p_term():
        nonlocal pos
        v = p_unary()
        while peek() in ("*", "//", "%"):
            op = toks[pos]
            pos += 1
            r = p_unary()
            if op == "*":
                v *= r
            elif r == 0:
                raise ValueError("division by zero")
            elif op == "//":
                v = trunc_div(v, r)
            else:
                v = v - r * trunc_div(v, r)
        return v

    def p_unary():
        nonlocal pos
        if peek() in ("-", "+"):
            op = toks[pos]
            pos += 1
            v = p_unary()
            return -v if op == "-" else v
        return p_primary()

    def p_primary():
        nonlocal pos
        t = peek()
        if t == "(":
            pos += 1
            v = p_expr()
            if peek() != ")":
                raise ValueError("unbalanced")
            pos += 1
            return v
        if t is None or not t.isdigit():
            raise ValueError("not a constant")
        pos += 1
        return int(t)

    try:
        v = p_expr()
        return v if pos == len(toks) else None
    except ValueError:
        return None


def _fold_const_int_intervals(s: str) -> str:
    """``INTERVAL (<integer constant arithmetic>) UNIT`` → ``INTERVAL n
    UNIT`` (round-15 hunt H): Spark requires LITERAL window-frame
    bounds and time_bucket widths, while DuckDB folds any constant
    expression — ``RANGE BETWEEN INTERVAL (90 // 1) MINUTE PRECEDING``
    and ``time_bucket(INTERVAL (60 // 4) MINUTE, …)`` previously
    errored. Folding uses DuckDB's truncating ``//``/``%``; anything
    non-constant keeps the make_dt_interval dynamic path."""
    pos = 0
    while m := _DYN_INTERVAL_RE.search(s, pos):
        open_idx = m.end() - 1
        close = _matching_paren(s, open_idx)
        um = re.match(r"\s*([A-Za-z]+)\b", s[close + 1 :])
        unit = um.group(1) if um else None
        n = _fold_int_arith(s[open_idx + 1 : close])
        if (unit is None or n is None or n < 0
                or unit.lower() not in _DYN_INTERVAL_UNITS):
            pos = close + 1
            continue
        repl = f"INTERVAL {n} {unit}"
        s = s[: m.start()] + repl + s[close + 1 + um.end() :]
        pos = m.start() + len(repl)
    return s


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
        # ORDER BY ALL (hunt H r15): Spark resolves ALL natively in the
        # outer ORDER BY, but the window's ORDER BY cannot — expand to
        # the projected select list (DuckDB's ALL = output columns
        # left-to-right; a bare-column projection keeps names valid
        # inside the window subquery).
        am = re.fullmatch(r"(?i)ALL(\s+(?:ASC|DESC))?(\s+NULLS\s+\w+)?",
                          order_list.strip())
        if am:
            if "*" in sel:
                raise ValueError(
                    "DISTINCT ON … ORDER BY ALL: expand * to explicit "
                    "columns (the window ordering needs a column list)"
                )
            sfx = (am.group(1) or "") + (am.group(2) or "")
            order_list = ", ".join(
                re.split(r"(?i)\s+AS\s+[A-Za-z_\"]\w*\s*$",
                         c.strip())[0] + sfx
                for c in _split_top_commas(sel)
            )
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

