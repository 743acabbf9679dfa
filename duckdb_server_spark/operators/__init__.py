"""Relational + beyond-reference operators.

Operators the reference reaches through SQL passthrough but Spark lacks as
builtins (as-of join, top-k with ties, distinct-on, recursive CTE) are
implemented here as compositions of DataFrame primitives; the
beyond-reference LLM-pipeline operators (dedup, similarity, text analysis,
multimodal) live here too. Everything is shuffle-conscious: see each
module's scale notes.
"""
