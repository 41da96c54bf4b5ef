"""Skew-robust shuffle patterns: salted joins and two-phase aggregates.

At 100 TB a single hot key turns one reducer into the whole job's
critical path. AQE's skew-join split (enabled in
:mod:`lindel_spark.session`) handles moderate skew adaptively; these
helpers are the explicit, planner-independent forms for extreme skew:

* :func:`salted_join` — spread one hot key across ``salt`` reducers by
  salting the skewed side and replicating the other side ``salt``
  times. The result set is provably salt-invariant (every (l, r) pair
  with equal keys meets in exactly one salted bucket).
* :func:`two_phase_distinct` — COUNT(DISTINCT x) BY k without sending
  every x of a hot k to one reducer: dedupe on (k, x) first (spread
  shuffle), then count per k (tiny shuffle).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (skewed) side salted ``salt`` ways.

    The left side gets a uniform salt; the right side is replicated
    once per salt value (an ``explode`` of ``salt`` literals — cheap
    when the right side is the smaller/dimension side, which is the
    normal skew-join shape). Join keys become (on..., salt), so a hot
    key's rows land on ``salt`` different reducers.

    Only join modes that never emit unmatched *right* rows are legal:
    the right side is replicated ``salt`` times, so a right/full outer
    join would silently duplicate each unmatched right row once per
    salt value. Those modes raise; use AQE's skew-join handling or
    salt the right side instead for outer semantics.
    """
    safe = {"inner", "left", "left_outer", "leftouter", "left_semi",
            "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower().replace("_", "") not in {m.replace("_", "") for m in safe}:
        raise ValueError(
            f"LINDEL: salted_join(how={how!r}) would duplicate unmatched "
            "right rows salt-fold; only inner/left/left_semi/left_anti "
            "are salt-invariant"
        )
    on = [on] if isinstance(on, str) else list(on)
    # Salt = row-content hash, not rand(): rand(seed) is deterministic
    # only per partition *index*, so a repartitioned rerun moves rows
    # between buckets. A content hash is layout-independent — reruns
    # are bit-reproducible under any partitioning. Rows identical in
    # every column share a bucket; that cannot change the join result
    # (the pair set is salt-invariant) and only concentrates skew when
    # the hot key's rows are full duplicates.
    l = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def two_phase_distinct(
    df: DataFrame,
    key: str,
    col: str,
) -> DataFrame:
    """COUNT(DISTINCT col) GROUP BY key, skew-safely: (key, n_distinct).

    Phase 1 shuffles on (key, col) — a hot key spreads over as many
    reducers as it has distinct values; phase 2 aggregates pre-deduped
    pairs, so the per-key reducer sees one row per distinct value.
    """
    return (
        df.select(key, col).distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )


def join_skew_report(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    top_n: int = 20,
) -> DataFrame:
    """Pre-flight skew diagnosis for an equi-join: the ``top_n``
    hottest join keys by OUTPUT fan-out — ``(key, cnt_left,
    cnt_right, out_rows, out_share)`` where ``out_rows =
    cnt_left · cnt_right`` is exactly how many rows that key will
    produce and ``out_share`` its fraction of the whole join's
    output. The decision input for :func:`salted_join` (a key with
    out_share ≈ 1 needs salting; a flat profile doesn't) and the
    estimator that catches the accidental many-to-many BEFORE it runs
    — a key you believed unique showing cnt_left·cnt_right ≫
    cnt_left+cnt_right is the classic join-explosion smell.

    Cost: two map-side-combined per-key counts, one vocabulary-sized
    equi-join of the count tables, one total, one top-n
    (TakeOrderedAndProject) — never the join itself. Ties break on
    ascending key so the report is deterministic.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    rk = right_key if right_key is not None else left_key
    lc = (left.select(F.col(left_key).alias("key"))
          .filter(F.col("key").isNotNull())
          .groupBy("key")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt_left")))
    rc = (right.select(F.col(rk).alias("key"))
          .filter(F.col("key").isNotNull())
          .groupBy("key")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt_right")))
    per_key = (lc.join(rc, "key")
               .withColumn("out_rows",
                           F.col("cnt_left") * F.col("cnt_right")))
    total = per_key.agg(F.sum("out_rows").cast("long")
                        .alias("__total_out"))
    return (per_key.crossJoin(F.broadcast(total))
            .withColumn("out_share",
                        F.col("out_rows").cast("double")
                        / F.col("__total_out").cast("double"))
            .drop("__total_out")
            .orderBy(F.col("out_rows").desc(), F.col("key").asc())
            .limit(top_n))
