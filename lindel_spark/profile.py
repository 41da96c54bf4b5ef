"""One-pass dataset profiling: per-column null/distinct/min/max.

The pre-flight every training-data pipeline runs before trusting a new
drop: one aggregation pass over the table (no per-column jobs, no
collect loops) produces a long-format stats frame. Distinct counts are
exact by default (each adds an expand branch to the single aggregate —
fine for profiling runs); pass ``approx=True`` to switch to HLL
``approx_count_distinct`` for cheap continuous monitoring at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) per
    column — one shuffle-free aggregate, exploded to long format.

    min/max are stringified so heterogeneous column types share one
    schema; NULL-only columns yield NULL min/max.
    """
    cols = list(columns) if columns is not None else df.columns
    nd = (F.approx_count_distinct if approx else F.count_distinct)
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).cast("long")
            .alias(f"__nn_{c}"),
            nd(F.col(c)).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__nn_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        for c in cols
    ])
    return (
        row.select(F.col("__n").alias("n_rows"),
                   F.explode(structs).alias("s"))
        .select("s.column", "n_rows", "s.n_nulls", "s.n_distinct",
                "s.min_str", "s.max_str")
    )
