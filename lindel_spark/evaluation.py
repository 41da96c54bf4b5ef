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


def conformal_split(
    df_cal: DataFrame,
    df_test: DataFrame,
    score_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal calibration (Vovk et al. 2005; the
    distribution-free coverage recipe): from the CALIBRATION fold's
    nonconformity scores take the exact order statistic ``q̂ =
    s_(⌈(n+1)(1−α)⌉)``, then measure the TEST fold's empirical
    coverage ``P(s ≤ q̂)`` — one row ``(n_cal, n_test, k, qhat,
    coverage)``. If test is exchangeable with calibration, coverage
    ≥ 1−α is guaranteed; a drop below is a drift alarm with a
    finite-sample guarantee, which is what makes this the
    model-agnostic companion to the PSI/KS monitors. ``k`` > n_cal
    (tiny folds / tight α) yields ``qhat = +∞`` semantics: returned
    as NULL qhat with coverage 1 by definition.

    Plan: calibration collapses to per-distinct-score counts and the
    order statistic comes from the repo's DISTRIBUTED prefix sum
    (never an unpartitioned window, never a full sort); the test
    side is one broadcast-threshold aggregate. Exact integer count
    algebra; NULL scores excluded.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    from lindel_spark.util import prefix_sums

    cal = (df_cal.select(F.col(score_col).cast("double").alias("s"))
           .filter(F.col("s").isNotNull()))
    counts = cal.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    cum = prefix_sums(counts, "s", ["c"])
    tot = cum.agg(F.max("cum_c").cast("long").alias("n_cal"))
    # k = ceil((n+1)(1-alpha)) without float edges:
    # ceil(a/b) = -floor(-a/b) over exact integers when alpha is a
    # dyadic-safe literal; compute in double then ceil — standard.
    withk = cum.crossJoin(F.broadcast(tot)).withColumn(
        "__k", F.ceil((F.col("n_cal") + 1).cast("double")
                      * F.lit(1.0 - float(alpha))).cast("long"))
    qhat = (withk.filter(F.col("cum_c") >= F.col("__k"))
            .agg(F.min("s").alias("qhat")))
    base = (tot.withColumn(
        "k", F.ceil((F.col("n_cal") + 1).cast("double")
                    * F.lit(1.0 - float(alpha))).cast("long"))
        .crossJoin(F.broadcast(qhat)))
    test = (df_test.select(F.col(score_col).cast("double").alias("s"))
            .filter(F.col("s").isNotNull()))
    cov = test.crossJoin(F.broadcast(base)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.avg(F.when(F.col("k") > F.col("n_cal"), 1.0)
              .otherwise(
                  F.when(F.col("s") <= F.col("qhat"), 1.0)
                  .otherwise(0.0))).alias("coverage"))
    return (base.crossJoin(F.broadcast(cov))
            .select("n_cal", "n_test", "k",
                    F.when(F.col("k") <= F.col("n_cal"),
                           F.col("qhat")).alias("qhat"),
                    "coverage"))


def roc_auc_by(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC PER GROUP — :func:`roc_auc`'s
    midrank identity applied within each ``by`` partition: one row
    per group ``(by…, n_pos, n_neg, auc)``. The fairness/segment
    screen (does the scorer degrade on a slice?) that reruns of the
    global metric can't see.

    Plan: rows collapse map-side to per-(group, distinct-score)
    counts, midranks come from a window PARTITIONED by the group
    columns (per-group state = the group's distinct scores — a
    partitioned window is the scale-correct tool here, unlike the
    global metric where only the distributed prefix sum avoids the
    single-task funnel), one aggregate closes. Labels must be 0/1;
    degenerate groups (single class) return NULL auc.
    """
    from pyspark.sql.window import Window

    by = [by] if isinstance(by, str) else list(by)
    pairs = (df.select(*by,
                       F.col(score_col).cast("double").alias("s"),
                       F.col(label_col).cast("int").alias("y"))
             .filter(F.col("s").isNotNull() & F.col("y").isNotNull()))
    counts = pairs.groupBy(*by, "s").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"))
    w = (Window.partitionBy(*by).orderBy("s")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = counts.withColumn(
        "cumc", F.sum(F.col("pos") + F.col("neg")).over(w))
    mid2 = 2 * F.col("cumc") - (F.col("pos") + F.col("neg")) + 1
    # DECIMAL(38,0) rank sums — LONG wraps at ~3e9 rows per group
    # (r1_2 ~ 2n²) where DuckDB promotes to HUGEINT; see
    # profile.mann_whitney_u (ADVICE r12)
    agg = cum.groupBy(*by).agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos").cast("decimal(19,0)")
              * mid2.cast("decimal(19,0)")).alias("r1_2"))
    np_, nn_ = F.col("n_pos"), F.col("n_neg")
    auc = F.when(
        (np_ > 0) & (nn_ > 0),
        (F.col("r1_2").cast("double") / 2.0
         - (np_ * (np_ + 1)).cast("double") / 2.0)
        / (np_ * nn_).cast("double"))
    return agg.select(*by, "n_pos", "n_neg", auc.alias("auc"))


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 64,
) -> DataFrame:
    """Isotonic (monotone) probability calibration over score bins —
    the PAV answer to "my ranker's scores aren't probabilities":
    returns one row per NON-EMPTY equal-width score bin ``(bin, n,
    pos, rate, calibrated)`` where ``calibrated`` is the weighted
    isotonic regression of the bin positive-rates — the best
    monotone-non-decreasing fit, the standard post-hoc calibrator
    (Zadrozny & Elkan 2002) next to Platt scaling
    (:func:`lindel_spark.features.logistic_fit` of y on score).
    Join back on the bin id to calibrate a scored corpus.

    NOT the sequential pool-adjacent-violators loop: the fit uses
    the MINIMAX closed form (Robertson–Wright–Dykstra eq. 1.9)

        f(i) = max_{j ≤ i} min_{k ≥ i} avg(y over bins j..k)

    where every interval average is a ratio of EXACT integer prefix
    sums (Σpos / Σn) — so the whole operator is one
    map-side-combined groupBy(bin) over the corpus (n_bins rows of
    state, 100 TB-safe) followed by pure algebra on the tiny bin
    frame (≤ n_bins³ interval triples, broadcast joins — zero
    driver loops, zero order-sensitive double sums; the only doubles
    are the final divisions and their min/max lattice, which any
    engine replays bit-for-bit).

    Scores are taken probability-like in [0, 1] (the
    :func:`calibration_bins` contract; 1.0 closes into the last
    bin); labels as y ≠ 0.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = (F.col(label_col).cast("double") != 0.0).cast("long")
    pairs = df.select(s.alias("s"), y.alias("y")).filter(
        F.col("s").isNotNull()
        & F.col(label_col).isNotNull())
    b = F.least(F.lit(n_bins - 1),
                F.floor(F.col("s") * n_bins).cast("int")) \
        .cast("long").alias("bin")
    bins = (pairs.select(b, "y")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("y").cast("long").alias("pos")))
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    pref = (bins
            .withColumn("cn", F.sum("n").over(w).cast("long"))
            .withColumn("cp", F.sum("pos").over(w).cast("long")))
    jf = pref.select(F.col("bin").alias("jb"),
                     (F.col("cn") - F.col("n")).alias("pn"),
                     (F.col("cp") - F.col("pos")).alias("pp"))
    kf = pref.select(F.col("bin").alias("kb"),
                     F.col("cn").alias("kn"),
                     F.col("cp").alias("kp"))
    iv = (jf.join(F.broadcast(kf), F.col("jb") <= F.col("kb"))
          .select("jb", "kb",
                  (F.col("kp") - F.col("pp")).cast("double")
                  / (F.col("kn") - F.col("pn")).cast("double"))
          .toDF("jb", "kb", "avg"))
    ib = bins.select(F.col("bin").alias("ib"))
    f = (iv.join(F.broadcast(ib), (F.col("jb") <= F.col("ib"))
                 & (F.col("kb") >= F.col("ib")))
         .groupBy("ib", "jb").agg(F.min("avg").alias("__t"))
         .groupBy("ib").agg(F.max("__t").alias("calibrated")))
    return (bins.join(F.broadcast(f), bins["bin"] == f["ib"])
            .select("bin", "n", "pos",
                    (F.col("pos").cast("double")
                     / F.col("n").cast("double")).alias("rate"),
                    "calibrated"))


def brier_decomposition(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Murphy (1973) decomposition of the binned Brier score: one
    row ``(n, reliability, resolution, uncertainty, brier_binned)``
    with ``brier_binned = REL − RES + UNC`` — the WHY behind a bad
    :func:`brier_score`: REL (Σ n_b(p̄_b − ō_b)²/N, want ≈ 0) says
    the scores are miscalibrated — fix with
    :func:`isotonic_calibrate`; RES (Σ n_b(ō_b − ō)²/N, want large)
    says the scores can't separate outcomes at all — no calibration
    will help, the model needs features; UNC (ō(1−ō)) is the
    irreducible base-rate term. Scores probability-like in [0, 1]
    (the :func:`calibration_bins` contract), labels y ≠ 0, the
    decomposition taken over ``n_bins`` equal-width bins (the
    identity is exact for the BINNED forecast p̄_b — the standard
    verification practice).

    Plan: ONE map-side-combined groupBy(bin) over the corpus
    (n_bins rows of state), then pure algebra on the tiny bin frame
    with the Σ_b folds in ASCENDING bin order (``sort_array`` fold —
    the kruskal double-addition lesson), so both engines evaluate
    identical double chains.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = (F.col(label_col).cast("double") != 0.0).cast("long")
    pairs = df.select(s.alias("s"), y.alias("y")).filter(
        F.col("s").isNotNull() & F.col(label_col).isNotNull())
    b = F.least(F.lit(n_bins - 1),
                F.floor(F.col("s") * n_bins).cast("int")) \
        .cast("long").alias("bin")
    bins = (pairs.select(b, "s", "y")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("nb"),
                 F.sum("s").alias("ss"),
                 F.sum("y").cast("long").alias("sy")))
    agg = bins.agg(
        F.sum("nb").cast("long").alias("n"),
        F.sum("sy").cast("long").alias("__sy"),
        F.array_sort(F.collect_list(F.struct(
            F.col("bin"), F.col("nb"), F.col("ss"),
            F.col("sy").alias("syb")))).alias("__bs"))
    nn = F.col("n").cast("double")
    obar = F.col("__sy").cast("double") / nn
    rel = F.aggregate(
        F.col("__bs"), F.lit(0.0),
        lambda acc, x: acc
        + x["nb"].cast("double")
        * (x["ss"] / x["nb"].cast("double")
           - x["syb"].cast("double") / x["nb"].cast("double"))
        * (x["ss"] / x["nb"].cast("double")
           - x["syb"].cast("double") / x["nb"].cast("double"))) / nn
    res = F.aggregate(
        F.col("__bs"), F.lit(0.0),
        lambda acc, x: acc
        + x["nb"].cast("double")
        * (x["syb"].cast("double") / x["nb"].cast("double") - obar)
        * (x["syb"].cast("double") / x["nb"].cast("double")
           - obar)) / nn
    unc = obar * (1.0 - obar)
    out = agg.select(
        "n", rel.alias("reliability"), res.alias("resolution"),
        unc.alias("uncertainty"))
    return out.withColumn(
        "brier_binned",
        F.col("reliability") - F.col("resolution")
        + F.col("uncertainty"))
