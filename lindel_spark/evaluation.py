"""Model-evaluation metrics over score/label frames: exact ROC-AUC,
Brier score, calibration (reliability) bins.

The measurement leg for classifier-shaped pipeline stages (quality
gates, linkage thresholds, label propagation, hard-negative miners):
``retrieval.retrieval_metrics`` grades RANKED retrieval,
``profile.agreement_kappa`` grades label agreement — this module
grades scored binary predictions. Everything is closed-form algebra
over counts and rank sums, so every metric is engine-replayable at
value level (no sklearn, no sampling).

Part of the build brief's pipeline tier beside the reference's curve
surface (src/lindel_extension.cpp:948-1026 registers scalar curve
functions only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC via the Mann–Whitney rank identity:
    ``AUC = (Σ midranks(positives) − n⁺(n⁺+1)/2) / (n⁺·n⁻)`` — one
    row ``(n_pos, n_neg, auc)``. Ties get MIDRANKS (the average rank
    of the tied block), so equal scores contribute exactly ½ — the
    textbook tie-corrected U statistic, identical in any engine, no
    trapezoid sweep and no threshold grid.

    Plan: scores collapse to a (score → pos/neg counts) table first
    (map-side-combined groupBy — DISTINCT-SCORE-sized, never rows);
    the prefix sum over that sorted table runs as a DISTRIBUTED
    two-phase cumulative (range-partition → pin placement with a
    vocabulary-sized localCheckpoint → per-partition totals offset a
    per-partition window) — never an unpartitioned window, so a
    continuous score column with row-scale distinct values still
    ranks in parallel. The per-partition totals are the one bounded
    driver scalar (P rows — the ``global_rank`` contract). Labels
    must be 0/1 (NULLs excluded); degenerate inputs (no positives or
    no negatives) return NULL auc.
    """
    lab = F.col(label_col).cast("int")
    pairs = (df.select(F.col(score_col).cast("double").alias("s"),
                       lab.alias("y"))
             .filter(F.col("s").isNotNull() & F.col("y").isNotNull()))
    from lindel_spark.util import prefix_sums

    counts = pairs.groupBy("s").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
    )
    c = prefix_sums(
        counts.withColumn("__cnt", F.col("pos") + F.col("neg")),
        "s", ["__cnt"])
    # midrank of a tied block at score s: ranks occupied are
    # (cum_before + 1 .. cum_before + cnt) -> mean = cum_before + (cnt+1)/2
    t = c.withColumn(
        "__midrank",
        (F.col("cum___cnt") - F.col("__cnt")).cast("double")
        + (F.col("__cnt").cast("double") + F.lit(1.0)) / F.lit(2.0))
    agg = t.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos").cast("double") * F.col("__midrank"))
        .alias("__rank_sum"),
    )
    np_ = F.col("n_pos").cast("double")
    nn_ = F.col("n_neg").cast("double")
    return agg.select(
        "n_pos", "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0),
               (F.col("__rank_sum") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0))
               / (np_ * nn_))
        .otherwise(F.lit(None).cast("double")).alias("auc"))


def brier_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score (mean squared error of the probability forecast)
    with its calibration/refinement-friendly companions: one row
    ``(n, brier, base_rate)``. Lower is better; a constant forecast
    of the base rate scores ``p(1−p)`` — beat that or the model adds
    nothing. One scalar aggregate; labels 0/1, scores in [0, 1]
    expected (not enforced — probabilities are the caller's
    contract), NULLs excluded."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pairs = df.select(s.alias("s"), y.alias("y")).filter(
        F.col("s").isNotNull() & F.col("y").isNotNull())
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg((F.col("s") - F.col("y")) * (F.col("s") - F.col("y")))
        .alias("brier"),
        F.avg("y").alias("base_rate"))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table: scores bucketed into ``n_bins`` equal-width
    probability bins, each row ``(bin, n, avg_score, frac_pos)`` —
    the calibration curve's points (a calibrated model has
    ``avg_score ≈ frac_pos`` per bin) plus the inputs to ECE
    (``Σ n_b/n · |avg_score − frac_pos|``). Scores at exactly 1.0
    close into the last bin. One map-side-combined groupBy on the
    bin id — ``n_bins`` rows of state, 100 TB-safe."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pairs = df.select(s.alias("s"), y.alias("y")).filter(
        F.col("s").isNotNull() & F.col("y").isNotNull())
    b = F.least(F.lit(n_bins - 1),
                F.floor(F.col("s") * n_bins).cast("int")).alias("bin")
    return (pairs.select(b, "s", "y")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.avg("s").alias("avg_score"),
                 F.avg("y").alias("frac_pos")))


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision (the PR-AUC summary, sklearn's step-wise
    ``average_precision_score`` definition): ``AP = Σ_k ΔR_k · P_k``
    over DISTINCT score thresholds descending — precision at each
    threshold weighted by the recall it adds. The precision-recall
    companion to :func:`roc_auc`: under heavy class imbalance (the
    usual shape for dedup-pair labels, linkage matches, quality
    flags) ROC-AUC saturates while AP keeps discriminating. One row
    ``(n_pos, n_neg, ap)``.

    Same plan family as :func:`roc_auc`: scores collapse to the
    distinct-score count table, the cumulative runs through the
    DISTRIBUTED prefix sum (never an unpartitioned window), and the
    descending cumulative is derived from the ascending one by
    complement — exact count algebra ÷ two totals, so any engine
    replays it. Tied scores share one threshold (the step-wise
    definition makes tie handling exact, no interpolation). NULLs
    excluded; no positives → NULL ap.
    """
    lab = F.col(label_col).cast("int")
    pairs = (df.select(F.col(score_col).cast("double").alias("s"),
                       lab.alias("y"))
             .filter(F.col("s").isNotNull() & F.col("y").isNotNull()))
    from lindel_spark.util import prefix_sums

    counts = pairs.groupBy("s").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
    )
    c = prefix_sums(
        counts.withColumn("__cnt", F.col("pos") + F.col("neg")),
        "s", ["pos", "__cnt"])
    tot = c.agg(F.sum("pos").cast("long").alias("n_pos"),
                F.sum("neg").cast("long").alias("n_neg"))
    j = c.crossJoin(F.broadcast(tot))
    # descending cumulatives by complement of the ascending prefix
    cum_pos_d = (F.col("n_pos") - (F.col("cum_pos") - F.col("pos"))) \
        .cast("double")
    cum_cnt_d = ((F.col("n_pos") + F.col("n_neg"))
                 - (F.col("cum___cnt") - F.col("__cnt"))).cast("double")
    term = F.when(
        F.col("pos") > 0,
        (F.col("pos").cast("double") / F.col("n_pos").cast("double"))
        * (cum_pos_d / cum_cnt_d)).otherwise(F.lit(0.0))
    agg = j.groupBy("n_pos", "n_neg").agg(F.sum(term).alias("__ap"))
    return agg.select(
        "n_pos", "n_neg",
        F.when(F.col("n_pos") > 0, F.col("__ap"))
        .otherwise(F.lit(None).cast("double")).alias("ap"))
