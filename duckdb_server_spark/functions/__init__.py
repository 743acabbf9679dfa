"""Function parity layer: DuckDB scalar-function surface → Spark builtins.

The reference declares its function surface in SqlInfo (numeric list
main.go:515-519, string list main.go:520-521, casts main.go:522-524); all
other DuckDB functions are reachable through the SQL passthrough
(main.go:229). ``scalar`` maps every declared name to the Spark builtin and
implements the known divergences (numeric TRUNC, GLOB, CURRENT_TIME);
``vector`` adds the array/embedding math used by the beyond-reference
similarity operators.
"""

from duckdb_server_spark.functions.scalar import (  # noqa: F401
    DUCKDB_TO_SPARK_FUNCTIONS,
    glob_match,
    glob_to_regex,
    trunc_numeric,
)
from duckdb_server_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_distance,
    vector_norm,
)
