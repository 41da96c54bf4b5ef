"""Feature scaling for training prep: rank/quantile, z-score, min-max.

The normalization pass every tabular/embedding training pipeline runs
before features meet a model. All three transforms are engine-portable
closed forms (the DuckDB oracles replay them exactly) and scale-shaped:
z-score and min-max are ONE aggregate (broadcast back, map-only apply);
quantile normalization routes through
:func:`lindel_spark.util.global_rank` — a range shuffle plus map-side
enumeration — never a single-task window.

The reference has no feature surface (curve functions only,
src/lindel_extension.cpp:948-1026); this is the brief's pipeline tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lindel_spark.util import global_rank, local_frame


def standard_scale(df: DataFrame, cols, suffix: str = "_z") -> DataFrame:
    """Z-score columns: ``(x - mean) / stddev_pop`` appended as
    ``<col><suffix>``. One aggregate over all columns (single scan),
    broadcast back; a zero-variance column scales to 0.0 rather than
    NULL/inf so downstream math never divides by zero."""
    if isinstance(cols, str):
        cols = [cols]
    aggs = []
    for c in cols:
        aggs += [F.avg(F.col(c).cast("double")).alias(f"__mu_{c}"),
                 F.stddev_pop(F.col(c).cast("double")).alias(f"__sd_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        sd = F.col(f"__sd_{c}")
        out = out.withColumn(
            c + suffix,
            F.when(sd == 0, F.lit(0.0)).otherwise(
                (F.col(c).cast("double") - F.col(f"__mu_{c}")) / sd))
    return out.drop(*[f"__mu_{c}" for c in cols],
                    *[f"__sd_{c}" for c in cols])


def minmax_scale(df: DataFrame, cols, suffix: str = "_mm",
                 lo: float = 0.0, hi: float = 1.0) -> DataFrame:
    """Min-max scale columns into [lo, hi]; constant columns map to
    ``lo``. Same one-aggregate + broadcast shape as
    :func:`standard_scale`."""
    if isinstance(cols, str):
        cols = [cols]
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    span = hi - lo
    for c in cols:
        width = F.col(f"__hi_{c}") - F.col(f"__lo_{c}")
        out = out.withColumn(
            c + suffix,
            F.when(width == 0, F.lit(float(lo))).otherwise(
                F.lit(float(lo))
                + (F.col(c).cast("double") - F.col(f"__lo_{c}"))
                / width * F.lit(float(span))))
    return out.drop(*[f"__lo_{c}" for c in cols],
                    *[f"__hi_{c}" for c in cols])


def quantile_normalize(df: DataFrame, value_col: str, id_col: str,
                       out_col: str = "quantile") -> DataFrame:
    """Empirical-quantile (rank) normalization: each value maps to
    ``(avg_rank - 0.5) / n`` in (0, 1), with TIES sharing the average
    of their ranks (the standard treatment — equal inputs must get
    equal quantiles, which a raw unique rank would violate).

    Makes any feature distribution uniform — the robust-to-outliers
    normalization for heavy-tailed signals (doc lengths, user counts)
    where z-scores are dominated by the tail.

    Shape: :func:`lindel_spark.util.global_rank` under the total order
    ``(value, id)`` (one range shuffle, map-only enumeration), an
    aggregate of average rank per distinct value, and a value-keyed
    join back. NULL values pass through with NULL quantile.
    """
    n = df.filter(F.col(value_col).isNotNull()).count()
    if n == 0:
        return df.withColumn(out_col, F.lit(None).cast("double"))
    vals = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("__v"), F.col(id_col))
    ranked = global_rank(vals, ["__v", id_col], out_col="__r")
    avg_rank = ranked.groupBy("__v").agg(F.avg("__r").alias("__ar"))
    return (
        df.join(avg_rank, df[value_col] == avg_rank["__v"], "left")
        .withColumn(out_col, (F.col("__ar") - 0.5) / F.lit(float(n)))
        .drop("__v", "__ar")
    )


def robust_scale(df: DataFrame, cols, suffix: str = "_rb") -> DataFrame:
    """Median/MAD scaling: ``(x - median) / (1.4826 · MAD)`` appended
    as ``<col><suffix>`` — the outlier-immune sibling of
    :func:`standard_scale` (mean and stddev move with the tail;
    median and MAD don't), with the 1.4826 consistency constant so
    the scaled values read in sigma units for normal-ish bulk. A
    zero-MAD column (>50% one value) scales to 0.0, never NULL/inf.

    Two single-scan aggregates over all columns (medians, then MADs
    of the broadcast-centered deviations — the MAD needs the median
    first, irreducibly), each broadcast back; exact interpolated
    ``percentile`` so any engine replays the numbers.
    """
    if isinstance(cols, str):
        cols = [cols]
    med = df.agg(*[F.percentile(F.col(c).cast("double"), F.lit(0.5))
                   .alias(f"__med_{c}") for c in cols])
    centered = df.crossJoin(F.broadcast(med))
    mad = centered.agg(*[
        F.percentile(F.abs(F.col(c).cast("double")
                           - F.col(f"__med_{c}")), F.lit(0.5))
        .alias(f"__mad_{c}") for c in cols])
    out = centered.crossJoin(F.broadcast(mad))
    for c in cols:
        denom = F.col(f"__mad_{c}") * F.lit(1.4826)
        out = out.withColumn(
            c + suffix,
            F.when(F.col(f"__mad_{c}") == 0, F.lit(0.0)).otherwise(
                (F.col(c).cast("double") - F.col(f"__med_{c}"))
                / denom))
    return out.drop(*[f"__med_{c}" for c in cols],
                    *[f"__mad_{c}" for c in cols])


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    suffix: str = "_te",
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing: the
    category's target mean EXCLUDING the current row, shrunk toward
    the global mean —

        ``(sum_y(cat) − y + m · prior) / (n(cat) − 1 + m)``

    — the standard high-cardinality categorical feature that a
    one-hot cannot serve (and, done naively with the row included,
    leaks the row's own label into its feature; the leave-one-out
    form is the leak-safe variant). ``m = smoothing`` is the
    pseudo-count pulling rare categories toward ``prior`` (the global
    target mean), so a 1-row category encodes as the prior, not its
    own label. NULL targets are excluded from sums and denominators;
    rows with a NULL target still RECEIVE an encoding (all-inclusive
    category stats).

    One map-side-combined per-category aggregate joined back on the
    category key (NO broadcast hint — at the high cardinalities this
    feature exists for, the stats table is itself large; AQE picks
    the broadcast when it fits) + one global 1-row broadcast. Exact
    algebra any engine replays.
    """
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    y = F.col(target_col).cast("double")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(y).alias("__sum_y"),
        F.count(y).cast("long").alias("__n_y"))
    glob = df.agg((F.sum(y) / F.count(y)).alias("__prior"))
    m = F.lit(float(smoothing))
    own = F.when(y.isNotNull(), y).otherwise(F.lit(0.0))
    own_n = F.when(y.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return (df.join(per_cat, cat_col, "left")
            .crossJoin(F.broadcast(glob))
            .withColumn(
                cat_col + suffix,
                (F.coalesce(F.col("__sum_y"), F.lit(0.0)) - own
                 + m * F.col("__prior"))
                / (F.coalesce(F.col("__n_y"), F.lit(0)) - own_n + m))
            .drop("__sum_y", "__n_y", "__prior"))


def corr_matrix(df: DataFrame, cols) -> DataFrame:
    """Pairwise Pearson correlation over numeric columns:
    ``(col_a, col_b, n, corr)`` for the upper triangle (incl. the
    diagonal as a 1.0 sanity row) — the tabular-column counterpart to
    :func:`lindel_spark.similarity.covariance_matrix` and the input
    to redundant-feature pruning.

    Every pairwise correlation comes from ONE aggregation pass: per
    pair five raw sums over rows where BOTH sides are non-null
    (pairwise-complete semantics — per-pair n, like pandas
    ``df.corr``), then the closed ``(nΣxy − ΣxΣy)/√(…)`` form.
    k(k+1)/2 × 5 aggregate expressions, one job, no shuffle beyond
    the single partial-agg exchange. Zero-variance pairs emit NULL.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols[i:], start=i):
            xa = F.col(a).cast("double")
            xb = F.col(b).cast("double")
            both = xa.isNotNull() & xb.isNotNull()
            x = F.when(both, xa)
            y = F.when(both, xb)
            # positional tag: name-based tags collide for columns
            # containing the separator (review catch, round 11)
            tag = f"{i}_{j}"
            pairs.append((a, b, tag))
            aggs += [
                F.count(x).cast("long").alias(f"__n_{tag}"),
                F.sum(x).alias(f"__sx_{tag}"),
                F.sum(y).alias(f"__sy_{tag}"),
                F.sum(x * x).alias(f"__sxx_{tag}"),
                F.sum(y * y).alias(f"__syy_{tag}"),
                F.sum(x * y).alias(f"__sxy_{tag}"),
            ]
    row = df.agg(*aggs)
    structs = []
    for a, b, tag in pairs:
        n = F.col(f"__n_{tag}").cast("double")
        cov = n * F.col(f"__sxy_{tag}") \
            - F.col(f"__sx_{tag}") * F.col(f"__sy_{tag}")
        vx = n * F.col(f"__sxx_{tag}") \
            - F.col(f"__sx_{tag}") * F.col(f"__sx_{tag}")
        vy = n * F.col(f"__syy_{tag}") \
            - F.col(f"__sy_{tag}") * F.col(f"__sy_{tag}")
        structs.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col(f"__n_{tag}").alias("n"),
            F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
            .otherwise(F.lit(None).cast("double")).alias("corr")))
    return (row.select(F.explode(F.array(*structs)).alias("s"))
            .select("s.col_a", "s.col_b", "s.n", "s.corr"))


def woe_iv(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per category
    of a categorical feature against a 0/1 label — the classic
    scorecard-era feature screen (Siddiqi 2006) and the
    LOG-ODDS-scaled companion to :func:`target_encode` (which returns
    smoothed means): ``WOE_i = ln(dist_pos_i / dist_neg_i)`` with
    Laplace mass ``smoothing`` added per category on BOTH sides (so
    pure categories stay finite), ``iv_term_i = (dist_pos_i −
    dist_neg_i) · WOE_i``; the feature's IV is the sum over rows of
    the output (rule of thumb: < 0.02 useless, > 0.5 suspicious).

    Plan: one map-side-combined groupBy to category counts
    (category-sized, never rows), one broadcast one-row totals frame
    — the distributions normalize by ``(pos_tot + s·K)`` where ``K``
    is the category count, so smoothed masses sum to exactly 1 on
    both engines. NULL features or labels are excluded; labels must
    be 0/1.
    """
    s = float(smoothing)
    base = (df.select(F.col(feature_col).alias("category"),
                      F.col(label_col).cast("int").alias("__y"))
            .filter(F.col("category").isNotNull()
                    & F.col("__y").isNotNull()))
    cat = base.groupBy("category").agg(
        F.sum("__y").cast("long").alias("pos"),
        F.sum(F.lit(1) - F.col("__y")).cast("long").alias("neg"))
    tot = cat.agg(F.sum("pos").cast("double").alias("__pt"),
                  F.sum("neg").cast("double").alias("__nt"),
                  F.count(F.lit(1)).cast("double").alias("__k"))
    j = cat.crossJoin(F.broadcast(tot))
    dp = (F.col("pos").cast("double") + F.lit(s)) \
        / (F.col("__pt") + F.lit(s) * F.col("__k"))
    dn = (F.col("neg").cast("double") + F.lit(s)) \
        / (F.col("__nt") + F.lit(s) * F.col("__k"))
    woe = F.log(dp / dn)
    return j.select("category", "pos", "neg",
                    (F.col("pos") + F.col("neg")).alias("n"),
                    woe.alias("woe"),
                    ((dp - dn) * woe).alias("iv_term"))


def best_split(
    df: DataFrame,
    feature_col: str,
    label_col: str,
    criterion: str = "gini",
) -> DataFrame:
    """Exact 1-D decision stump: the threshold on a numeric feature
    that best separates a 0/1 label — one row ``(threshold, gain,
    n_left, n_right, pos_left, pos_right)`` where ``left`` is
    ``feature ≤ threshold`` and ``gain`` the impurity decrease
    (``criterion='gini'``: Gini impurity; ``'entropy'``: information
    gain in nats). The single-feature screen behind every tree
    learner and the natural sequel to :func:`woe_iv` (categorical)
    for NUMERIC features — a near-zero best gain means the feature
    carries no first-order signal at any cut.

    Plan: values collapse map-side to per-distinct-value (pos, neg)
    counts; cumulative class counts ride the distributed prefix sum
    (:func:`lindel_spark.util.prefix_sums`), every candidate split's
    impurity is closed-form column algebra over that frame, and the
    argmax closes with a deterministic tie-break (max gain, then
    SMALLEST threshold). Exact integer counts until the final
    divisions. The largest value is excluded as a threshold (its
    right side would be empty). NULLs excluded; labels must be 0/1.
    """
    if criterion not in ("gini", "entropy"):
        raise ValueError("criterion must be 'gini' or 'entropy'")
    from lindel_spark.util import prefix_sums

    base = (df.select(F.col(feature_col).cast("double").alias("v"),
                      F.col(label_col).cast("int").alias("y"))
            .filter(F.col("v").isNotNull() & F.col("y").isNotNull()))
    counts = base.groupBy("v").agg(
        F.sum("y").cast("long").alias("p"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n"))
    cum = prefix_sums(counts, "v", ["p", "n"])
    tot = cum.agg(F.max("cum_p").cast("long").alias("__tp"),
                  F.max("cum_n").cast("long").alias("__tn"))
    c = cum.crossJoin(F.broadcast(tot))
    pl, nl = F.col("cum_p").cast("double"), F.col("cum_n").cast("double")
    pr = (F.col("__tp") - F.col("cum_p")).cast("double")
    nr = (F.col("__tn") - F.col("cum_n")).cast("double")
    tl, tr = pl + nl, pr + nr
    t = (F.col("__tp") + F.col("__tn")).cast("double")

    if criterion == "gini":
        def imp(p, q, s):
            return 1.0 - (p / s) * (p / s) - (q / s) * (q / s)
    else:
        def imp(p, q, s):
            def h(x):
                f = x / s
                return F.when(x > 0, -f * F.log(f)).otherwise(F.lit(0.0))
            return h(p) + h(q)

    parent = imp(F.col("__tp").cast("double"),
                 F.col("__tn").cast("double"), t)
    gain = parent - (tl / t) * imp(pl, nl, tl) \
        - (tr / t) * imp(pr, nr, tr)
    cand = (c.filter(tr > 0)  # the max value cannot be a threshold
            .select(F.col("v").alias("threshold"),
                    gain.alias("gain"),
                    tl.cast("long").alias("n_left"),
                    tr.cast("long").alias("n_right"),
                    F.col("cum_p").alias("pos_left"),
                    (F.col("__tp") - F.col("cum_p"))
                    .alias("pos_right")))
    best = cand.agg(F.max(F.round("gain", 12)).alias("__g"))
    return (cand.crossJoin(F.broadcast(best))
            .filter(F.round("gain", 12) == F.col("__g"))
            .groupBy().agg(
                F.min("threshold").alias("threshold"),
                F.first(F.col("__g")).alias("gain"),
                F.min_by("n_left", "threshold").alias("n_left"),
                F.min_by("n_right", "threshold").alias("n_right"),
                F.min_by("pos_left", "threshold").alias("pos_left"),
                F.min_by("pos_right", "threshold").alias("pos_right")))


def _gram_aggs(y_col: str, x_cols):
    """(keep-filter Column, aggregate list) for the linear-probe Gram
    moment set — shared by :func:`linear_fit` and the streaming
    :func:`lindel_spark.streaming.linear_probe_stream_sink` so the
    aliases can never drift from :func:`_solve_one`'s lookups."""
    d = len(x_cols)
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    keep = y.isNotNull()
    for x in xs:
        keep = keep & x.isNotNull()
    aggs = [F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy")]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(xi).alias(f"sx{i}"))
        aggs.append(F.sum(xi * y).alias(f"sx{i}y"))
        for j in range(i, d):
            aggs.append(F.sum(xi * xs[j]).alias(f"sx{i}x{j}"))
    return keep, aggs


def linear_fit(
    df: DataFrame,
    y_col: str,
    x_cols,
    ridge: float = 0.0,
    keys=(),
    max_keys: int = 4096,
) -> DataFrame:
    """Multiple linear regression (OLS, optionally ridge) by the
    normal equations: ONE map-side-combined aggregate collects the
    full Gram moment set (n, Σxᵢ, Σxᵢxⱼ, Σxᵢy, Σy, Σy²) in a single
    scan — (d+1)(d+2)/2 + d + 2 bounded scalars, never row data —
    and the (d+1)×(d+1) system solves on the driver (the
    ``train_centroids`` bounded-driver-state contract; ``d ≤ 64``
    validated, a LINEAR PROBE not a deep model). Returns ONE row:
    ``(n, r2, intercept, coef_<x1>, …, coef_<xd>)``.

    The training-pipeline face: fit a quality-score / length /
    toxicity LINEAR probe over per-document features at corpus scale
    — one scan + one 65×65 solve regardless of row count. ``ridge``
    adds λ to the feature diagonal (never the intercept), the
    standard shrinkage for collinear feature sets.

    Replay: for d ≤ 2 the driver solves via CRAMER'S RULE with the
    exact expression structure the SQL oracle writes (determinants of
    moment sums — bit-matching double algebra, the user_trend
    closed-form precedent); for d > 2 it uses ``np.linalg.solve``
    (LU), which no SQL engine replays term-for-term — registry
    queries pin the d ≤ 2 face, pytests pin the general face against
    NumPy's own lstsq. NULL rows (any feature or y NULL) are
    excluded; a singular system (constant feature, duplicated
    feature, n ≤ d) returns NULL coefficients rather than raising —
    the caller reads NULLs as "probe not identifiable".

    ``keys`` fits one probe PER GROUP (segment/model-variant
    probes): the Gram aggregate gains a groupBy and the driver
    solves each group's bounded system — driver state is
    |groups|·(d+1)², guarded by ``max_keys`` (raises beyond it; a
    per-unbounded-key regression is a different, sketch-shaped
    operator). Output gains the key columns, one row per group.
    """
    import numpy as np

    if isinstance(x_cols, str):
        x_cols = [x_cols]
    x_cols = list(x_cols)
    d = len(x_cols)
    if not 1 <= d <= 64:
        raise ValueError("linear_fit: 1 <= len(x_cols) <= 64 (a "
                         "linear probe, not a deep model)")
    if ridge < 0.0:
        raise ValueError("linear_fit: ridge must be >= 0")

    keep, aggs = _gram_aggs(y_col, x_cols)
    base = df.filter(keep)
    keys = [keys] if isinstance(keys, str) else list(keys)
    if keys:
        grouped = base.groupBy(*keys).agg(*aggs)
        rows = grouped.limit(max_keys + 1).collect()
        if len(rows) > max_keys:
            raise ValueError(
                f"LINDEL: linear_fit: more than max_keys={max_keys} "
                "groups — per-unbounded-key regression is a "
                "different operator; raise max_keys deliberately if "
                "the group count is genuinely bounded")
    else:
        rows = base.agg(*aggs).collect()

    spark = df.sparkSession
    key_schema = ""
    if keys:
        kf = df.select(*keys).schema
        key_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in kf
        ) + ", "
    schema = key_schema + \
        "n long, r2 double, intercept double, " + ", ".join(
            f"`coef_{c}` double" for c in x_cols)

    # (an ungrouped .agg() always yields one row — n=0 on empty
    # input, which _solve_one maps to (0, NULL, ...) — so out_rows
    # is only empty in the grouped-with-zero-groups case, where an
    # empty frame is the right answer)
    out_rows = []
    for m in sorted(rows, key=lambda r: tuple(
            str(r[k]) for k in keys)):
        kvals = [m[k] for k in keys]
        out_rows.append(tuple(kvals + list(_solve_one(m, d, ridge))))
    return local_frame(spark, out_rows, schema)


def _det3(M):
    # explicit cofactor expansion along row 0 — the EXACT expression
    # structure the d=2 SQL oracle writes, so Python double algebra
    # bit-matches the engine's
    return (M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1])
            - M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0])
            + M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]))


def _solve_sym(A, b, d: int):
    """Solve the (d+1)×(d+1) normal system: Cramer with the SQL
    oracle's exact expression structure for d ≤ 2, LU beyond.
    Returns the coefficient list or None (singular / non-finite) —
    shared by :func:`_solve_one` (OLS) and :func:`_logit_step`
    (IRLS), so the two probes can never drift in replay structure."""
    import numpy as np

    coefs = None
    if d == 1:
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        if det != 0.0:
            coefs = [(b[0] * A[1, 1] - A[0, 1] * b[1]) / det,
                     (A[0, 0] * b[1] - b[0] * A[1, 0]) / det]
    elif d == 2:
        Al = A.tolist()
        det = _det3(Al)
        if det != 0.0:
            cols_ = []
            for c in range(3):
                M = [row[:] for row in Al]
                for r in range(3):
                    M[r][c] = float(b[r])
                cols_.append(_det3(M) / det)
            coefs = cols_
    else:
        try:
            coefs = list(np.linalg.solve(A, b))
        except np.linalg.LinAlgError:
            coefs = None
    if coefs is not None and not all(np.isfinite(coefs)):
        coefs = None
    return coefs


def _solve_one(m, d: int, ridge: float):
    """(n, r2, intercept, coef…) for one Gram-moment row — the
    bounded per-group solve behind :func:`linear_fit`."""
    import numpy as np

    n = m["n"]
    if n == 0:
        return [0] + [None] * (d + 2)

    # normal matrix with intercept as column 0
    A = np.zeros((d + 1, d + 1), np.float64)
    b = np.zeros(d + 1, np.float64)
    A[0, 0] = float(n)
    b[0] = m["sy"]
    for i in range(d):
        A[0, i + 1] = A[i + 1, 0] = m[f"sx{i}"]
        b[i + 1] = m[f"sx{i}y"]
        for j in range(i, d):
            A[i + 1, j + 1] = A[j + 1, i + 1] = m[f"sx{i}x{j}"]
        A[i + 1, i + 1] += ridge

    coefs = _solve_sym(A, b, d)
    if coefs is None:
        return [n] + [None] * (d + 2)

    # r² from moments: SSE = Σy² − 2bᵀ(X'y) + bᵀ(X'X)b, SST = Σy² − n·ȳ²
    # — EXPLICIT fixed-order loops, not numpy matmul (BLAS reduction
    # order is unspecified; the SQL oracle writes these exact
    # ascending-index additions)
    bv = [float(c) for c in coefs]
    bty = 0.0
    for i in range(d + 1):
        bty += bv[i] * float(b[i])
    btab = 0.0
    for i in range(d + 1):
        ti = 0.0
        for j in range(d + 1):
            ti += bv[j] * float(A[j, i])
        btab += ti * bv[i]
    sse = float(m["syy"]) - 2.0 * bty + btab
    # the ridge term inflates bᵀAb by λ‖β‖²; remove it for true SSE
    if ridge:
        sse -= ridge * sum(c * c for c in bv[1:])
    sst = float(m["syy"]) - float(m["sy"]) * float(m["sy"]) / float(n)
    r2 = 1.0 - sse / sst if sst > 0 else None
    return [n, r2] + [float(c) for c in coefs]


def _logit_moment_aggs(y_col: str, x_cols):
    """(keep-filter, aggregate list) for one IRLS round: with the
    current betas riding as broadcast columns ``__b0 … __bd``, per
    row z = b0 + Σ xᵢ·bᵢ (ascending-index additions), p = 1/(1+e^-z),
    w = p(1−p), r = y − p; the aggregates are the weighted Gram
    moments (Σw·xᵢ·xⱼ left-associated) and the gradient sums."""
    d = len(x_cols)
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    keep = y.isNotNull()
    for x in xs:
        keep = keep & x.isNotNull()
    z = F.col("__b0")
    for i, x in enumerate(xs):
        z = z + x * F.col(f"__b{i + 1}")
    p = 1.0 / (1.0 + F.exp(-z))
    w = p * (1.0 - p)
    r = y - p
    aggs = [F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(w).alias("sw"),
            F.sum(r).alias("sr")]
    for i, xi in enumerate(xs):
        aggs.append(F.sum(w * xi).alias(f"swx{i}"))
        aggs.append(F.sum(r * xi).alias(f"srx{i}"))
        for j in range(i, d):
            aggs.append(F.sum(w * xi * xs[j]).alias(f"swx{i}x{j}"))
    return keep, aggs


def _logit_step(m, d: int, ridge: float):
    """One Newton/IRLS step from a weighted-moment row: solves
    (XᵀWX + λ·diag(0,1,…))δ = Xᵀ(y−p) through the shared
    :func:`_solve_sym` (Cramer structure for d ≤ 2). Returns the
    delta list or None (singular)."""
    import numpy as np

    A = np.zeros((d + 1, d + 1), np.float64)
    b = np.zeros(d + 1, np.float64)
    A[0, 0] = float(m["sw"])
    b[0] = float(m["sr"])
    for i in range(d):
        A[0, i + 1] = A[i + 1, 0] = float(m[f"swx{i}"])
        b[i + 1] = float(m[f"srx{i}"])
        for j in range(i, d):
            A[i + 1, j + 1] = A[j + 1, i + 1] = float(m[f"swx{i}x{j}"])
        A[i + 1, i + 1] += ridge
    return _solve_sym(A, b, d)


def logistic_fit(
    df: DataFrame,
    y_col: str,
    x_cols,
    rounds: int = 4,
    ridge: float = 0.0,
    keys=(),
    max_keys: int = 4096,
) -> DataFrame:
    """LOGISTIC probe by fixed-round IRLS (Newton-Raphson on the
    log-likelihood — the textbook GLM fit): the binary-label sibling
    of :func:`linear_fit` for pass/fail graders, toxicity flags,
    dedup-keep decisions. Returns ONE row ``(n, step_norm,
    intercept, coef_<x1>, …)`` — ``step_norm`` = Σδ² of the LAST
    Newton step (≈0 when converged; read a large value as "raise
    rounds or ridge").

    Scale shape: each round is ONE map-side-combined aggregate over
    the rows with the current betas broadcast as literal columns —
    (d+1)(d+2)/2 + d + 2 bounded scalars per group, never row data —
    plus a bounded driver solve; ``rounds + 0`` scans total, no
    collect of anything unbounded (the :func:`linear_fit` contract).
    β starts at 0 (deterministic); labels are taken as y ≠ 0.

    Replay: z/p/w/r are built with ascending-index additions and
    left-associated products, and the d ≤ 2 solve is the shared
    Cramer structure (:func:`_solve_sym`), so an unrolled per-round
    SQL oracle replays the whole ladder bit-for-bit (``exp`` has
    hash-matched cross-engine throughout the stats tier — the
    normal_sf/A-S precedent). Perfectly separable groups diverge in
    ANY logistic fit — finite ``rounds`` just stops early; pass
    ``ridge > 0`` for a finite MAP answer. Singular rounds (constant
    feature, n too small) return NULL coefficients.

    ``keys=`` fits one probe PER GROUP: the moment aggregate gains a
    groupBy, the betas broadcast as a |groups|-row frame joined back
    by key, driver state |groups|·(d+1) guarded by ``max_keys``.
    """
    if isinstance(x_cols, str):
        x_cols = [x_cols]
    x_cols = list(x_cols)
    d = len(x_cols)
    if not 1 <= d <= 64:
        raise ValueError("logistic_fit: 1 <= len(x_cols) <= 64")
    if ridge < 0.0:
        raise ValueError("logistic_fit: ridge must be >= 0")
    if rounds < 1:
        raise ValueError("logistic_fit: rounds must be >= 1")

    spark = df.sparkSession
    keys = [keys] if isinstance(keys, str) else list(keys)
    # internal-name collision guard (the by_adjust pattern): the
    # broadcast beta join would otherwise raise AMBIGUOUS_REFERENCE
    # mid-fit, or silently clobber a caller's __y01
    for taken in ["__y01"] + [f"__b{i}" for i in range(d + 1)]:
        if taken in df.columns:
            raise ValueError(
                f"LINDEL: logistic_fit: input already has a column "
                f"named {taken!r}")
    y01 = (F.col(y_col).cast("double") != 0.0).cast("double")
    base = df.withColumn("__y01", y01)
    keep, aggs = _logit_moment_aggs("__y01", x_cols)
    base = base.filter(keep).persist()

    bcols = [f"__b{i}" for i in range(d + 1)]
    bschema = ", ".join(f"{c} double" for c in bcols)

    if keys:
        kframe = base.select(*keys).distinct()
        krows = kframe.limit(max_keys + 1).collect()
        if len(krows) > max_keys:
            base.unpersist(False)
            raise ValueError(
                f"LINDEL: logistic_fit: more than max_keys="
                f"{max_keys} groups — per-unbounded-key regression "
                "is a different operator")
        state = {tuple(r[k] for k in keys): [0.0] * (d + 1)
                 for r in krows}
    else:
        state = {(): [0.0] * (d + 1)}

    dead: set = set()
    steps: dict = {}
    for _ in range(rounds):
        if keys:
            brows = [tuple(list(kv) + list(bv))
                     for kv, bv in state.items() if kv not in dead]
            if not brows:
                break
            kf = df.select(*keys).schema
            kschema = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in kf)
            bdf = local_frame(spark, brows, kschema + ", " + bschema)
            cur = base.join(F.broadcast(bdf), keys)
            mrows = cur.groupBy(*keys).agg(*aggs).collect()
        else:
            bdf = local_frame(spark, [tuple(state[()])], bschema)
            cur = base.crossJoin(F.broadcast(bdf))
            mrows = [cur.agg(*aggs).collect()[0]]
        for m in mrows:
            kv = tuple(m[k] for k in keys) if keys else ()
            delta = _logit_step(m, d, ridge) if m["n"] else None
            if delta is None:
                dead.add(kv)
                continue
            beta = state[kv]
            state[kv] = [beta[i] + float(delta[i])
                         for i in range(d + 1)]
            sn = 0.0
            for v in delta:  # ascending-index fold, oracle-shaped
                sn += float(v) * float(v)
            steps[kv] = sn

    # group sizes for the output row (and n for dead groups)
    if keys:
        nrows = {tuple(r[k] for k in keys): r["__n"]
                 for r in base.groupBy(*keys)
                 .agg(F.count(F.lit(1)).alias("__n")).collect()}
    else:
        nrows = {(): base.count()}
    base.unpersist(False)

    key_schema = ""
    if keys:
        kf = df.select(*keys).schema
        key_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in kf) + ", "
    schema = key_schema + \
        "n long, step_norm double, intercept double, " + ", ".join(
            f"`coef_{c}` double" for c in x_cols)
    out_rows = []
    for kv in sorted(state, key=lambda t: tuple(str(x) for x in t)):
        n = int(nrows.get(kv, 0))
        if kv in dead or kv not in steps:
            out_rows.append(tuple(list(kv) + [n]
                                  + [None] * (d + 2)))
        else:
            out_rows.append(tuple(list(kv) + [n, steps[kv]]
                                  + state[kv]))
    return local_frame(spark, out_rows, schema)
