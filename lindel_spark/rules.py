"""Market-basket co-occurrence and association rules.

The classic retail/recsys mining pass (Agrawal's support/confidence
framework, computed exactly — no Apriori pruning needed for pairwise
rules): which items co-occur in baskets more than their popularity
predicts. Re-expressed Spark-first:

- basket de-dup and item counts are map-side-combined group-bys;
- pair generation is a self-join keyed on the basket id, so candidate
  volume is sum(basket_size^2) — bounded by the data's own basket
  fan-out, never |items|^2 (the join that would not survive 100 TB);
- support/confidence/lift are exact closed forms over bigint counts,
  so the DuckDB oracle replays them bit-for-bit.

The reference has no mining surface (curve functions only,
src/lindel_extension.cpp:948-1026); this is the brief's pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_items(df: DataFrame, basket_col: str,
                  item_col: str) -> DataFrame:
    """Distinct ``(__b, __i)`` basket-item frame, persisted: every
    consumer in this module (both self-join sides, item counts, the
    basket count, the third-leg join) re-derives exactly this frame,
    and without the persist each reference re-runs the upstream
    scan/join/distinct — 18 parquet scans in the triples plan."""
    from pyspark import StorageLevel

    b = df.select(F.col(basket_col).alias("__b"),
                  F.col(item_col).alias("__i")).distinct()
    return b.persist(StorageLevel.MEMORY_AND_DISK)


def _pairs_with_basket(b: DataFrame) -> DataFrame:
    """``(__b, item_a, item_b)``: unordered in-basket item pairs with
    their basket id, ``item_a < item_b`` — the shared candidate
    generator behind pair counts and triple candidates."""
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, on="__b")
        .filter(F.col("x.__i") < F.col("y.__i"))
        .select("__b", F.col("x.__i").alias("item_a"),
                F.col("y.__i").alias("item_b"))
    )


def cooccurrence_pairs(df: DataFrame, basket_col: str,
                       item_col: str) -> DataFrame:
    """(item_a, item_b, n_baskets) for unordered item pairs sharing a
    basket, ``item_a < item_b``. Input rows may repeat (a basket
    listing an item twice counts once — set semantics)."""
    b = _basket_items(df, basket_col, item_col)
    return (
        _pairs_with_basket(b)
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_baskets: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Pairwise association rules ``antecedent -> consequent`` with
    exact support / confidence / lift:

    - ``support``    = n(a, c) / N          (pair frequency)
    - ``confidence`` = n(a, c) / n(a)       (P(c | a))
    - ``lift``       = confidence / (n(c) / N)

    Both rule directions are emitted (a->c and c->a differ in
    confidence). ``min_pair_baskets`` prunes the long co-occurrence
    tail BEFORE the rule join (the standard min-support cut that keeps
    the rule table output-sized); ``min_confidence`` filters the
    emitted rules. N = distinct baskets.

    Shape at scale: one basket-keyed self-join (bounded by basket
    fan-out), two map-side-combined counts, one broadcast-size scalar
    (N), and item-keyed joins of the pair table against the item
    counts. All arithmetic on bigints until the final divisions, so
    the numbers are engine-portable.
    """
    b = _basket_items(df, basket_col, item_col)
    n_baskets = b.select("__b").distinct().count()
    item_counts = b.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__n_item"))
    pairs = (_pairs_with_basket(b)
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
             .filter(F.col("n_baskets") >= min_pair_baskets))
    both = pairs.unionByName(
        pairs.select(F.col("item_b").alias("item_a"),
                     F.col("item_a").alias("item_b"), "n_baskets"))
    rules = (
        both
        .join(item_counts.select(F.col("__i").alias("item_a"),
                                 F.col("__n_item").alias("__n_a")),
              "item_a")
        .join(item_counts.select(F.col("__i").alias("item_b"),
                                 F.col("__n_item").alias("__n_b")),
              "item_b")
        .select(
            F.col("item_a").alias("antecedent"),
            F.col("item_b").alias("consequent"),
            F.col("n_baskets").alias("n_pair"),
            (F.col("n_baskets").cast("double") / F.lit(float(n_baskets)))
            .alias("support"),
            (F.col("n_baskets").cast("double")
             / F.col("__n_a").cast("double")).alias("confidence"),
            ((F.col("n_baskets").cast("double")
              / F.col("__n_a").cast("double"))
             / (F.col("__n_b").cast("double") / F.lit(float(n_baskets))))
            .alias("lift"),
        )
    )
    if min_confidence > 0.0:
        rules = rules.filter(F.col("confidence") >= min_confidence)
    return rules


def frequent_triples(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support_baskets: int,
) -> DataFrame:
    """Frequent 3-itemsets ``(item_a, item_b, item_c, n_baskets)``
    with ``item_a < item_b < item_c`` and basket count ≥
    ``min_support_baskets`` — one Apriori level above
    :func:`association_rules`' pairwise surface (triple-conditioned
    recommendations, bundle design).

    Apriori pruning keeps the candidate volume survivable: a triple's
    support is bounded by EVERY sub-pair's support, so candidates are
    generated only from baskets whose (a, b) pair is already
    frequent, and the (a, c)/(b, c) legs are semi-joined against the
    frequent-pair table before the count — the pruning is lossless by
    the anti-monotone support bound, so the plan change never changes
    the answer. All joins are keyed (basket id or pair tuple):
    per-basket fan-out bounds the explode, never |items|³.
    """
    if min_support_baskets < 1:
        raise ValueError("min_support_baskets must be >= 1")
    from pyspark import StorageLevel

    b = _basket_items(df, basket_col, item_col)
    # ONE pair-candidate build serves both the frequent-pair counts
    # and the surviving-occurrence probe (before, the b⋈b self-join
    # subtree was built twice — once inside cooccurrence_pairs, once
    # for bp — and each side re-derived b from the raw input).
    # Persisted: the two consumers are keyed differently ((a,b)
    # aggregate vs basket-keyed candidate join), so exchange reuse
    # alone cannot share them. SIZE-GATED (round 16, ADVICE r15): the
    # pair explode is the module's scale-dominant intermediate
    # (sum of basket_size² rows) and disk-backed blocks are not
    # LRU-evicted, so above the cap it streams — both consumers then
    # recompute the self-join from the (persisted, basket-sized) b,
    # trading bounded CPU for unbounded executor disk.
    bp0 = _pairs_with_basket(b)
    # Two-tier gate, because Catalyst's self-join size estimate is
    # off by orders of magnitude here (measured 4 TB vs ~50 MB real
    # at sf0.1): a metadata-small basket frame persists outright (no
    # extra job — the bench path), a larger one pays one bounded
    # aggregate for the EXACT pair volume Σ c·(c−1)/2 (negligible
    # next to the self-join it gates, and it warms b's cache).
    cap = int(__import__("os").environ.get(
        "SPARK_GRAFT_PAIR_PERSIST_CAP", str(8 << 30)))
    small = 256 << 20
    try:
        in_est = int(b._jdf.queryExecution()
                     .optimizedPlan().stats().sizeInBytes())
    except Exception:
        in_est = None  # unknown size: never risk the disk pin
    do_persist = in_est is not None and in_est <= small
    if in_est is not None and in_est > small:
        vol = (b.groupBy("__b").agg(F.count(F.lit(1)).alias("c"))
               .agg(F.sum(F.col("c") * (F.col("c") - F.lit(1)) / 2))
               .first()[0]) or 0
        do_persist = int(vol) * 64 <= cap  # conservative row width
    if do_persist:
        bp0 = bp0.persist(StorageLevel.MEMORY_AND_DISK)
    fp = (bp0.groupBy("item_a", "item_b")
          .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
          .filter(F.col("n_baskets") >= min_support_baskets)
          .select("item_a", "item_b"))
    bp = bp0.join(fp, ["item_a", "item_b"], "left_semi")
    z = b.select(F.col("__b").alias("__b"),
                 F.col("__i").alias("item_c"))
    cand = (bp.join(z, "__b")
            .filter(F.col("item_c") > F.col("item_b"))
            .join(fp.select(F.col("item_a"),
                            F.col("item_b").alias("item_c")),
                  ["item_a", "item_c"], "left_semi")
            .join(fp.select(F.col("item_a").alias("item_b"),
                            F.col("item_b").alias("item_c")),
                  ["item_b", "item_c"], "left_semi"))
    return (cand.groupBy("item_a", "item_b", "item_c")
            .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
            .filter(F.col("n_baskets") >= min_support_baskets))
