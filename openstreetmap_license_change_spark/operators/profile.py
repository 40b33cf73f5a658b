"""Column profiling — the schema-audit rollup.

Reference analogue: the reference's loaders assert shape ad hoc
(handlers drop malformed rows silently); a 10¹²-row ingest instead
runs a PROFILE pass first and gates the load on it: per column the
null share, distinct cardinality, and value range, as one long-form
table a diff can track across snapshots ("lang nulls jumped 40×" is a
crawler regression caught before training, not after).

One scan: every column's aggregates live in a single agg() row —
Spark plans multi-column count(DISTINCT) with one Expand, so the cost
is one pass plus one shuffle — then the row unpivots to long form
with a stack() projection.  min/max aggregate on the NATIVE type
(lexicographic for strings, numeric for ints) and cast to string only
for the unified output schema.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form profile of ``cols``: one output row per column with
    (column, n_rows, n_null, n_distinct, min_value, max_value) —
    n_distinct EXACT and excluding NULLs (the SQL COUNT(DISTINCT)
    convention), min/max as strings of the native-type extremes,
    NULL on all-null columns.

    Swap :func:`~.sketches.hll_distinct` in for n_distinct when exact
    per-column cardinalities are too hot at full scale; this operator
    is the exact gate."""
    cols = list(cols)
    if not cols:
        raise ValueError("column_profile: need at least one column")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"_null_{i}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_value", "max_value",
    )


def column_profile_sql(src: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`column_profile` — one aggregate row, one
    UNNEST-free unpivot via UNION ALL of constant projections."""
    cols = list(cols)
    selects = []
    for c in cols:
        selects.append(f"""
            SELECT '{c}' AS column,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT)
                       AS n_null,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(MIN({c}) AS VARCHAR) AS min_value,
                   CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM {src}
        """)
    return " UNION ALL ".join(selects)
