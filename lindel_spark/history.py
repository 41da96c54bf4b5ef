"""Temporal history operators: SCD Type-2 builds and incremental
aggregate maintenance.

The reference engine registers no history operators (its SQL surface
is the four curve functions, src/lindel_extension.cpp:948-1026); these
are part of the training-data-pipeline tier the build brief asks for —
the bookkeeping a 100 TB ingest needs to track *how a record changed
over time* (SCD2) and to *keep derived aggregates fresh without full
recomputes* (algebraic state merge).

Scale notes
-----------
* :func:`scd2_build` is one shuffle on the business key plus two
  window passes over the same partitioning — Spark reuses the sort, so
  the physical plan is a single Exchange + Sort followed by narrow
  window operators. Per-key state is the key's changelog, never the
  table.
* :func:`merge_agg_states` is union + hash-aggregate of *states*, not
  raw rows: on a 100 TB table the base state is millions of rows, the
  delta is a day's partial aggregate, and the merge never rereads the
  raw history. All supported merges are algebraic (sum/count/min/max),
  so map-side partial aggregation applies and the shuffle carries one
  row per (key, side).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key: str | Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    collapse_runs: bool = True,
) -> DataFrame:
    """Build a Slowly-Changing-Dimension Type-2 history from a
    changelog.

    Every input row is an observation of ``attr_cols`` for ``key`` at
    the position given by ``order_cols`` (which must totally order a
    key's rows — pass a tiebreaker column, e.g. ``["ts", "event_id"]``).
    The output has one row per *version*: the attribute tuple together
    with its validity interval.

    Output columns: the key column(s), ``attr_cols``, plus

    * ``valid_from`` — value of ``order_cols[0]`` where the version
      begins (inclusive),
    * ``valid_to`` — ``valid_from`` of the next version (exclusive),
      NULL for the current version,
    * ``is_current`` — whether this is the key's latest version,
    * ``version`` — 1-based version ordinal per key.

    ``collapse_runs=True`` (classic SCD2) merges consecutive
    observations with identical attributes into one version, so only
    genuine changes open a new interval.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if not attr_cols:
        raise ValueError("attr_cols must name at least one column")
    w = Window.partitionBy(*keys).orderBy(*order_cols)

    out = df
    if collapse_runs:
        # A row opens a new version iff it is the key's first row or
        # any tracked attribute differs from the previous observation.
        change = F.lit(False)
        for a in attr_cols:
            prev = F.lag(a).over(w)
            change = change | (~F.col(a).eqNullSafe(prev))
        is_first = F.row_number().over(w) == 1
        out = out.withColumn("_chg", is_first | change).filter("_chg")

    wv = Window.partitionBy(*keys).orderBy(*order_cols)
    valid_to = F.lead(order_cols[0]).over(wv)
    return (
        out.select(
            *keys,
            *attr_cols,
            F.col(order_cols[0]).alias("valid_from"),
            valid_to.alias("valid_to"),
            valid_to.isNull().alias("is_current"),
            F.row_number().over(wv).alias("version"),
        )
    )


_MERGES = {"sum", "min", "max"}


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    merges: Mapping[str, str],
) -> DataFrame:
    """Merge partial aggregate *states* into the aggregate of the
    union of their inputs — incremental materialized-view
    maintenance.

    Each DataFrame in ``states`` holds one row per key with algebraic
    partial aggregates (counts are sums of 1s, so they merge with
    ``"sum"``). ``merges`` maps each metric column to its combine
    function: ``sum | min | max``. Keys absent from one state simply
    contribute nothing from that side (full outer semantics via the
    union).

    The point at scale: refreshing ``agg(100 TB base ∪ 1 TB delta)``
    costs one pass over the *delta* plus a hash-merge of state rows —
    the base's raw history is never re-read.
    """
    if len(states) < 2:
        raise ValueError("need at least two states to merge")
    bad = {c: m for c, m in merges.items() if m not in _MERGES}
    if bad:
        raise ValueError(f"unsupported merge functions: {bad}; "
                         f"supported: {sorted(_MERGES)}")
    cols = list(keys) + list(merges)
    unioned = states[0].select(*cols)
    for s in states[1:]:
        unioned = unioned.unionByName(s.select(*cols))
    aggs = [getattr(F, m)(c).alias(c) for c, m in merges.items()]
    return unioned.groupBy(*keys).agg(*aggs)
