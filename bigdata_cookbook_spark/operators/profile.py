"""Column profiling (training-data tier): data-quality stats per column.

A corpus intake pipeline's first step is profiling: null rates, distinct
cardinalities, and value ranges per column, to catch schema drift and
degenerate fields before anything expensive runs. One pass over the
table computes every column's aggregates simultaneously (a single
groupBy-less aggregation — map-side partials, one reduce); the wide
single row then unpivots driver-side cheap (#columns rows).

min/max are computed on the NATIVE column type (numeric/date ordering,
not lexical) and cast to string only for the uniform output schema.
n_distinct is exact here (oracle-checkable); at 100 TB swap
approx_count_distinct per the declared A2 tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value) with min/max stringified after native-type comparison."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "AS (column, __nn, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )
