"""Helpers to interrogate a DataFrame's physical plan.

Built on ``df.explain('formatted')`` output — the same text a human reads
when tuning, machine-checked so regressions fail tests instead of showing
up as 100× slowdowns on the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (df.explain prints to stdout)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions pushed into DataSource scans (``PushedFilters``)."""
    text = explain_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each file scan (``ReadSchema``) —
    the column-pruning evidence: a 2-column projection must not scan 16."""
    text = explain_string(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (BroadcastHashJoin /
    BroadcastNestedLoopJoin) — the no-shuffle join for small dimensions."""
    return "Broadcast" in explain_string(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the FINAL adaptive plan —
    wider/fewer is better; zero means the plan fell off the codegen path.

    Executes the query: under AQE the ``*(n)`` markers only exist once the
    adaptive plan is finalized (isFinalPlan=true)."""
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    ids = set(re.findall(r"\*\((\d+)\)", text))
    return len(ids)
