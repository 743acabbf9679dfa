"""One-shot mechanical splitter for dialect.py (round 11, VERDICT r10
item 3): moves rewrite families into duckdb_server_spark/dialect_rewrites/
submodules with generated explicit imports, leaving dialect.py as the
dispatch spine (rewrite + serving entry) that re-exports every name for
back-compat. Zero behavior change by construction: code segments move
verbatim; only import plumbing is generated."""

from __future__ import annotations

import ast
import os
import re

SRC = "duckdb_server_spark/dialect.py"
PKG = "duckdb_server_spark/dialect_rewrites"

# module order IS the import DAG (later may import earlier)
ORDER = ["core", "exprs", "breadth", "macros", "nested", "statements",
         "prepare"]

SPANS = [
    ("core", 1, 178),
    ("exprs", 179, 2686),
    ("breadth", 2687, 5021),
    ("spine", 5022, 5244),          # rewrite()
    ("macros", 5245, 6643),
    ("nested", 6644, 7209),
    ("statements", 7210, 8457),
    ("statements", 8458, 8769),     # file-reading TVFs merge in
    ("prepare", 8770, 9327),
    ("spine", 9328, 10**9),         # serving entry
]

# name-level overrides resolving upward references
OVERRIDES = {
    # shared text/hash primitives -> core
    "_masked_literal": "core",
    "_primary_back": "core",
    "_primary_end": "core",
    "_primary_fwd": "core",
    "_EXPR_HEAD_KEYWORDS": "core",
    "_dd_murmur64a": "core",
    "_dd_murmur_fin": "core",
    "_DD_HASH_MASK": "core",
    "_DD_HASH_COMBINE_K": "core",
    "_DD_NULL_HASH": "core",
    # serving meta helpers used by the statement router -> statements
    "_run_pragma": "statements",
    "_PRAGMA_RE": "statements",
    "_CHECKPOINT_RE": "statements",
    "show_tables_frame": "statements",
    "_run_pivot": "statements",
    "_PIVOT_RE": "statements",
    "table_info_frame": "statements",
    "_duck_type_name": "statements",
    "_DUCK_TYPE_NAMES": "statements",
    "_catalog_tables": "statements",
    # parameter binding used by the router (EXECUTE path) -> statements
    "bind_parameters": "statements",
    "bind_named_parameters": "statements",
    "_DOLLAR_PARAM_RE": "statements",
    "render_sql_literal": "statements",
}

HEADER = '''"""{doc}"""

from __future__ import annotations

import datetime as _dt
import re
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
'''

DOCS = {
    "core": "Dialect core: literal masking, balanced-paren/keyword "
            "scanners, hash primitives, dialect/serving state, and the "
            "run_sql late-binding indirection (split from dialect.py, "
            "round 11).",
    "exprs": "Expression rewrites: function renames, list/regexp/window "
             "forms, ASOF JOIN, subscripts/slices, strftime/datediff, "
             "struct/map spellings (split from dialect.py, round 11).",
    "breadth": "Breadth rewrites: struct/map literals, function "
               "templates, typed literals, temporal folding, POSITIONAL "
               "JOIN, fetch/limit forms (split from dialect.py, round "
               "11).",
    "macros": "SQL-UDF aliases (register_dialect_functions) and "
              "hash()/bit-exact numeric shims (split from dialect.py, "
              "round 11).",
    "nested": "Nested-type comparison semantics (batteries 33/37), "
              "list set ops, libm shims, interval rendering (split "
              "from dialect.py, round 11).",
    "statements": "Statement router: SET/ATTACH/DDL/DML/transactions, "
                  "macros/state, file-reading table functions, PRAGMA/"
                  "SHOW/pivot meta (split from dialect.py, round 11).",
    "prepare": "Prepared statements and parameter binding (split from "
               "dialect.py, round 11).",
}

src_text = open(SRC).read()
src_lines = src_text.splitlines(keepends=True)
tree = ast.parse(src_text)


def span_mod(line: int) -> str:
    for name, a, b in SPANS:
        if a <= line <= b:
            return name
    raise AssertionError(line)


# --- assign each top-level node (with its leading comments) to a module ----
segments = []  # (module, names, start, end) 1-based inclusive
prev_end = 0
header_end = None
for node in tree.body:
    start = prev_end + 1
    end = node.end_lineno
    prev_end = end
    names = []
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        names = [node.name]
    elif isinstance(node, ast.Assign):
        names = [t.id for t in node.targets if isinstance(t, ast.Name)]
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        names = [node.target.id]
    elif isinstance(node, (ast.Import, ast.ImportFrom)):
        header_end = end
        continue
    elif isinstance(node, ast.Expr) and node.lineno == 1:
        header_end = end
        continue  # module docstring
    mod = None
    for n in names:
        if n in OVERRIDES:
            mod = OVERRIDES[n]
            break
    if mod is None:
        mod = span_mod(node.lineno)
    segments.append((mod, names, start, end))

# --- compute definitions per module -----------------------------------------
defs: dict[str, str] = {}
for mod, names, a, b in segments:
    for n in names:
        defs[n] = mod

# --- per-module needed imports ----------------------------------------------
node_by_start = {}
for (mod, names, a, b), node in zip(
    segments,
    [n for n in tree.body
     if not isinstance(n, (ast.Import, ast.ImportFrom))
     and not (isinstance(n, ast.Expr) and n.lineno == 1)],
):
    node_by_start[a] = node

needs: dict[str, dict[str, set]] = {m: {} for m in ORDER + ["spine"]}
for mod, names, a, b in segments:
    node = node_by_start[a]
    for sub in ast.walk(node):
        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
            dm = defs.get(sub.id)
            if dm and dm != mod:
                needs[mod].setdefault(dm, set()).add(sub.id)

# run_sql / rewrite upward edges resolve through core._run_sql_late
for m in ("statements", "prepare"):
    for prov in list(needs[m]):
        needs[m][prov].discard("run_sql")
        if not needs[m][prov]:
            del needs[m][prov]
    needs[m].setdefault("core", set()).add("_run_sql_late")
defs["_run_sql_late"] = "core"

violations = []
for m, provs in needs.items():
    if m == "spine":
        continue
    for prov in provs:
        if prov == "spine":
            violations.append((m, prov, needs[m][prov]))
        elif ORDER.index(prov) > ORDER.index(m):
            violations.append((m, prov, needs[m][prov]))
if violations:
    raise SystemExit(f"UPWARD EDGES REMAIN: {violations}")

# --- emit submodules ----------------------------------------------------------
os.makedirs(PKG, exist_ok=True)
RUN_SQL_LATE = '''

def _run_sql_late(spark: SparkSession, sql: str):
    """Call-time indirection to dialect.run_sql — the statement router
    and prepared-statement binder run sub-SELECTs back through the full
    serving pipeline (mutual recursion across the module split)."""
    from duckdb_server_spark.dialect import run_sql

    return run_sql(spark, sql)
'''

mod_names: dict[str, list[str]] = {m: [] for m in ORDER}
for mod, names, a, b in segments:
    if mod != "spine":
        mod_names[mod].extend(names)
mod_names["core"].append("_run_sql_late")

for m in ORDER:
    parts = [HEADER.format(doc=DOCS[m])]
    for prov in ORDER:
        if prov == m:
            break
        wanted = sorted(needs[m].get(prov, ()))
        if wanted:
            parts.append(
                f"\nfrom duckdb_server_spark.dialect_rewrites.{prov} "
                f"import (  # noqa: F401\n"
                + "".join(f"    {n},\n" for n in wanted)
                + ")\n"
            )
    parts.append("\n")
    for mod, names, a, b in segments:
        if mod == m:
            parts.append("".join(src_lines[a - 1 : b]))
            parts.append("\n")
    body = "".join(parts)
    if m == "core":
        body += RUN_SQL_LATE
    if m in ("statements", "prepare"):
        body = re.sub(r"\brun_sql\(", "_run_sql_late(", body)
    open(f"{PKG}/{m}.py", "w").write(body)

open(f"{PKG}/__init__.py", "w").write(
    '"""Rewrite-family modules split out of dialect.py (round 11).\n'
    "Import via duckdb_server_spark.dialect, which re-exports every\n"
    'name for back-compat."""\n'
)

# --- emit the new dialect.py spine -------------------------------------------
spine_parts = ["".join(src_lines[:header_end]), "\n"]
for m in ORDER:
    wanted = sorted(set(mod_names[m]))
    spine_parts.append(
        f"from duckdb_server_spark.dialect_rewrites.{m} import (  "
        f"# noqa: F401\n"
        + "".join(f"    {n},\n" for n in wanted)
        + ")\n"
    )
spine_parts.append("\n")
for mod, names, a, b in segments:
    if mod == "spine":
        spine_parts.append("".join(src_lines[a - 1 : b]))
        spine_parts.append("\n")
open(SRC, "w").write("".join(spine_parts))
print("split complete")
for m in ORDER:
    n = len(open(f"{PKG}/{m}.py").read().splitlines())
    print(f"  {m}.py: {n} lines")
print(f"  dialect.py: {len(open(SRC).read().splitlines())} lines")
