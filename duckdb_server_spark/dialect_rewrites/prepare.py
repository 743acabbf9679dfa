"""Prepared statements and parameter binding (split from dialect.py, round 11)."""

from __future__ import annotations

import datetime as _dt
import re
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from duckdb_server_spark.dialect_rewrites.core import (  # noqa: F401
    _find_top_keyword,
    _literal_value,
    _mask,
    _matching_paren,
    _run_sql_late,
    _split_top_commas,
    _unmask,
)

from duckdb_server_spark.dialect_rewrites.statements import (  # noqa: F401
    _DOLLAR_PARAM_RE,
    _PIVOT_RE,
    _run_pivot,
    _track_temp_view,
)



def has_parameters(sql: str) -> bool:
    masked, _ = _mask(sql)
    return "?" in masked or bool(_DOLLAR_PARAM_RE.search(masked))



def neutralize_parameters(sql: str) -> str:
    """Every placeholder → NULL; used only to run the parse-level
    read-only gate on a statement whose values arrive later (Spark's
    parser accepts '?' but not '$N')."""
    masked, table = _mask(sql)
    masked = _DOLLAR_PARAM_RE.sub("NULL", masked.replace("?", "NULL"))
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
        ldf = _run_sql_late(spark, _unmask(with_scope(left), table))
        rdf = _run_sql_late(spark, _unmask(with_scope(right), table))
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
        plain = _run_sql_late(spark, _unmask(body, table))
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
            out = _run_sql_late(spark, rest)
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

    seed = _run_sql_late(spark, base_text)
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
        return _run_sql_late(spark, step_text).toDF(*seed.columns)

    result = recursive_fixpoint(seed, step, distinct=distinct)
    result.createOrReplaceTempView(res_view)
    if outer_text.lstrip().startswith(","):
        # further (non-recursive) CTEs follow the recursive one:
        # WITH RECURSIVE r AS (…), b AS (…) SELECT … → re-head as WITH
        outer_text = "WITH " + outer_text.lstrip()[1:]
    try:
        out = _run_sql_late(spark, outer_text)
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
    elif re.fullmatch(r"\[[^\[\]]*\]", arg.strip()):
        # round-14 hunt G: the LIST-of-names form —
        # COLUMNS(['a', 'b']) selects exactly those columns, in the
        # list's order (names are masked string literals here)
        names = []
        for item in arg.strip()[1:-1].split(","):
            item = item.strip()
            mm = re.fullmatch(r"\x00\d+\x00", item)
            if not mm:
                raise ValueError(
                    f"COLUMNS list items must be string literals: {item!r}"
                )
            names.append(_literal_value(_unmask(item, table)))
        by_lower = {c.lower(): c for c in cols}
        missing = [n for n in names if n.lower() not in by_lower]
        if missing:
            raise ValueError(
                f"COLUMNS list names not in FROM clause: {missing}"
            )
        sel = [by_lower[n.lower()] for n in names]
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

