"""Batch time-series operators: OHLC resampling and time-weighted
averages.

The reference's host engine leans on its SQL windows for these; here
they are packaged as single-shuffle window plans (one Exchange on the
series key, one Sort both passes share) so a 100 TB event history
rolls up with per-key — never per-table — state. Tie timestamps are
ordered by an explicit tiebreaker column so results are deterministic
under any partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lindel_spark.util import local_frame


def ohlc(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Open/high/low/close/count per key group — candlestick
    resampling. Pass the time bucket as one of ``keys`` (e.g. a
    derived day column).

    One hash Exchange on ``keys`` + one Sort; open/close come from the
    ordered frame, high/low/count from the unbounded frame over the
    same partitioning, and the ``rn = 1`` filter emits exactly one row
    per group without a second aggregation shuffle.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    wall = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    return (
        df.select(
            *keys,
            F.first(value_col).over(w).alias("open"),
            F.max(value_col).over(wall).alias("high"),
            F.min(value_col).over(wall).alias("low"),
            F.last(value_col).over(wall).alias("close"),
            F.count(F.lit(1)).over(wall).alias("n"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
) -> DataFrame:
    """Time-weighted average per key group: each observation holds
    (LOCF) until the next one, integrated over the group's observed
    span ``[min(ts), max(ts)]``.

    Returns ``keys, twa, span, n``. ``twa`` is NULL when the span is
    zero (a single observation, or all observations at one instant) —
    callers coalesce to the plain average if they want a value there.
    One window pass (lead) + one map-side-combined groupBy, both on
    the same key.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    nxt = F.lead(ts_col).over(w)
    stepped = df.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        ((nxt - F.col(ts_col)) * F.col(value_col)).alias("__w"),
    )
    agg = stepped.groupBy(*keys).agg(
        F.sum("__w").alias("__tw"),
        (F.max("__ts") - F.min("__ts")).cast("double").alias("span"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        *keys,
        F.when(F.col("span") > 0,
               F.col("__tw") / F.col("span")).alias("twa"),
        "span", "n",
    )


def acf(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    lags: Sequence[int],
) -> DataFrame:
    """Lag-k autocorrelation per series — the seasonality /
    persistence screen for event streams: ACF(24h) ≈ 1 says daily
    cycle, ACF(1) ≈ 0 says the metric is noise and smoothing it is
    pointless.

    For each key group and each requested lag ``k``, exact Pearson
    correlation between ``x_t`` and ``x_{t+k}`` over the row sequence
    ordered by ``(ts_col, tiebreak)`` (the tiebreaker makes the
    sequence — and therefore the pairing — deterministic under any
    partitioning). Output: ``(*keys, lag, n_pairs, acf)``; a (key,
    lag) with zero variance on either side emits a row with NULL acf;
    a group with fewer than ``k+1`` rows has no pairs at that lag and
    emits NO row (join on (key, lag) accordingly).

    The correlation is computed from raw sums
    ``(n·Σxy − Σx·Σy) / sqrt((n·Σx²−(Σx)²)(n·Σy²−(Σy)²))`` rather than
    a library ``corr`` so both engines evaluate the identical
    expression tree.

    Plan: ONE window pass (hash Exchange on ``keys`` + one per-group
    sort) computes every lag column off the same sorted frame; a
    stack unpivot (map-only) then one map-side-combined groupBy on
    ``(*keys, lag)``. Adding lags adds columns, not shuffles.
    """
    lags = [int(k) for k in lags]
    if not lags or any(k < 1 for k in lags):
        raise ValueError("lags must be >= 1")
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    x = F.col(value_col).cast("double")
    lagged = df.select(
        *keys,
        x.alias("__x"),
        *[F.lead(x, k).over(w).alias(f"__y{k}") for k in lags],
    )
    pairs = []
    for k in lags:
        pairs += [F.lit(k), F.col("__x"), F.col(f"__y{k}")]
    long = (lagged.select(
        *keys,
        F.stack(F.lit(len(lags)), *pairs).alias("lag", "x", "y"))
        .filter(F.col("y").isNotNull() & F.col("x").isNotNull()))
    g = long.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").alias("__sx"), F.sum("y").alias("__sy"),
        F.sum(F.col("x") * F.col("x")).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
        F.sum(F.col("x") * F.col("y")).alias("__sxy"),
    )
    n = F.col("n_pairs").cast("double")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return (g.withColumn(
        "acf",
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        .otherwise(F.lit(None).cast("double")))
        .drop("__sx", "__sy", "__sxx", "__syy", "__sxy"))


def cusum_changepoints(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """One-sided CUSUM change-point detection per series (Page 1954):
    flag the points where the upper/lower cumulative sums
    ``s⁺_t = max(0, s⁺_{t-1} + (x_t − target − slack))`` /
    ``s⁻_t = max(0, s⁻_{t-1} − (x_t − target + slack))`` cross
    ``threshold`` — the sequential drift alarm that catches a
    sustained small shift long before any single point trips a
    2-sigma rule.

    The recursive max has a CLOSED window form (the reset-to-zero
    recursion telescopes): with ``c_t = Σ_{i≤t} (x_i − target −
    slack)``, ``s⁺_t = c_t − min(0, min_{j≤t} c_j)`` — so both sides
    are two cumulative windows over one per-key sort, no recursion,
    no UDF, engine-replayable. Output: every row with
    ``(… , cusum_hi, cusum_lo, alarm_hi, alarm_lo)``.

    ``target`` is the in-control mean, ``slack`` (k) the half-shift
    you want to tolerate, ``threshold`` (h) the alarm level — all
    explicit constants rather than data-derived so the operator stays
    one pass (derive them upstream from a reference window if
    needed). One hash Exchange on ``keys`` + one sort both windows
    share; per-key state only.
    """
    x = F.col(value_col).cast("double")
    w = (Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
         .rowsBetween(Window.unboundedPreceding, 0))
    c_hi = F.sum(x - F.lit(float(target)) - F.lit(float(slack))).over(w)
    c_lo = F.sum(-(x - F.lit(float(target)) + F.lit(float(slack)))).over(w)
    out = (df
           .withColumn("__chi", c_hi)
           .withColumn("__clo", c_lo))
    w2 = (Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
          .rowsBetween(Window.unboundedPreceding, 0))
    hi = F.col("__chi") - F.least(F.lit(0.0), F.min("__chi").over(w2))
    lo = F.col("__clo") - F.least(F.lit(0.0), F.min("__clo").over(w2))
    return (out
            .withColumn("cusum_hi", hi)
            .withColumn("cusum_lo", lo)
            .withColumn("alarm_hi",
                        F.col("cusum_hi") > F.lit(float(threshold)))
            .withColumn("alarm_lo",
                        F.col("cusum_lo") > F.lit(float(threshold)))
            .drop("__chi", "__clo"))


def interarrival_stats(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Inter-arrival-time profile per series: ``(*keys, n_gaps,
    mean_gap_s, std_gap_s, cv, max_gap_s)`` — the burstiness screen
    (CV ≈ 1: Poisson-like arrivals; CV ≫ 1: bursts + silences —
    batchy upstream producers, retry storms; CV ≈ 0: a metronome,
    i.e. synthetic traffic). Gaps in seconds between consecutive
    events under the deterministic ``(ts, tiebreak)`` order;
    population std via the closed ``√(Σg²/n − (Σg/n)²)`` form so both
    engines evaluate the identical tree. One window pass + one
    map-side-combined groupBy; per-key state only.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    # events tables arrive as TIMESTAMP_NTZ from raw parquet; sessions
    # here run UTC, so the cast is lossless
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    g = (df.withColumn("__gap",
                       (tus - F.lag(tus).over(w)).cast("double")
                       / F.lit(1e6))
         .filter(F.col("__gap").isNotNull()))
    agg = g.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("__gap").alias("__s"),
        F.sum(F.col("__gap") * F.col("__gap")).alias("__ss"),
        F.max("__gap").alias("max_gap_s"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("__s") / n
    var = F.col("__ss") / n - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (agg
            .withColumn("mean_gap_s", mean)
            .withColumn("std_gap_s", std)
            .withColumn(
                "cv",
                F.when(mean > 0, std / mean)
                .otherwise(F.lit(None).cast("double")))
            .drop("__s", "__ss")
            .select(*keys, "n_gaps", "mean_gap_s", "std_gap_s", "cv",
                    "max_gap_s"))


def gap_report(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: str,
    max_gap: str,
) -> DataFrame:
    """Missing-data gaps per series: every consecutive-event gap
    longer than ``max_gap`` (an interval string like ``'2 hours'``),
    as ``(*keys, gap_start, gap_end, gap_seconds)`` — the outage /
    ingestion-hole report a completeness SLA reads (the inverse of
    sessionization: sessions keep what's inside the gap threshold,
    this emits what's missing). One window pass, map-only filter;
    per-key state only.
    """
    out = (df.select(*keys, F.col(ts_col).alias("__ts"),
                     F.col(tiebreak).alias("__tb"))
           .withColumn("__prev", F.lag("__ts").over(
               Window.partitionBy(*keys).orderBy("__ts", "__tb"))))
    gap_s = (F.unix_micros(F.col("__ts").cast("timestamp"))
             - F.unix_micros(F.col("__prev").cast("timestamp"))
             ).cast("double") / F.lit(1e6)
    # interval length WITHOUT an absolute epoch anchor: the session
    # timezone shifts both terms of the difference identically, so
    # the threshold is tz-independent (an anchored unix_micros of an
    # epoch string is NOT — review catch, round 11)
    t0 = F.lit("2000-01-01 00:00:00").cast("timestamp")
    thresh = (F.unix_micros(t0 + F.expr(f"INTERVAL {max_gap}"))
              - F.unix_micros(t0)).cast("double") / F.lit(1e6)
    return (out.filter(F.col("__prev").isNotNull())
            .withColumn("gap_seconds", gap_s)
            .filter(F.col("gap_seconds") > thresh)
            .select(*keys, F.col("__prev").alias("gap_start"),
                    F.col("__ts").alias("gap_end"), "gap_seconds"))


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    lookback: int = 20,
    min_points: int = 5,
    quantize: int | None = 6,
) -> DataFrame:
    """Point-anomaly score per event: z-score of each value against
    the PRECEDING ``lookback`` rows of its own series (never
    including itself — a spike must not mask itself by inflating its
    own baseline). The point-anomaly sibling of
    :func:`cusum_changepoints` (CUSUM catches sustained small drifts,
    this catches single excursions) and the per-series counterpart of
    the global MAD rule.

    Adds ``(roll_mean, roll_std, zscore)``; rows with fewer than
    ``min_points`` preceding points emit NULL zscore (cold start),
    zero-variance baselines too. Population std via the closed
    ``√(Σx²/n − mean²)`` form over window sums computed in DECIMAL:
    values quantize at ``quantize`` decimal places on entry (default
    6 — far inside most metrics' noise), buying EXACT
    order-independent accumulation: the scores are bit-identical
    across engines and partitionings, where double sums made
    near-zero-variance windows explode differently. For
    small-magnitude series (|values| comparable to 10^-quantize, e.g.
    probabilities at the default) RAISE ``quantize`` or pass
    ``quantize=None`` for full-double sums (order-dependent in the
    last ulps — fine for monitoring, not for bit-replay). Values
    beyond the decimal range (|v| ≥ 10^(18−quantize)) or NaN become
    NULL under the cast and drop from the window, like NULL inputs.
    One window pass (hash Exchange on ``keys`` + one sort),
    rows-between frame — map-only after the sort, per-key state
    only.
    """
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    if min_points < 2:
        raise ValueError("min_points must be >= 2")
    x = F.col(value_col).cast("double")
    # window sums in DECIMAL (the windowed_rollup precedent): decimal
    # addition is exact and associative, so the sums — and therefore
    # the scores — are bit-identical under ANY accumulation order
    # (DuckDB's segment-tree window sums vs Spark's sequential frame
    # made near-zero-variance windows explode differently at sf1)
    if quantize is not None and not 0 <= quantize <= 12:
        raise ValueError("quantize must be in [0, 12] or None")
    xd = (x if quantize is None
          else F.col(value_col).cast(f"decimal(18,{int(quantize)})"))
    w = (Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
         .rowsBetween(-lookback, -1))
    n = F.count(xd).over(w).cast("double")
    s = F.sum(xd).over(w).cast("double")
    ss = F.sum(xd * xd).over(w).cast("double")
    mean = s / n
    var = ss / n - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (df
            .withColumn("roll_mean", mean)
            .withColumn("roll_std", std)
            .withColumn(
                "zscore",
                F.when((n >= min_points) & (std > 0),
                       (x - mean) / std)
                .otherwise(F.lit(None).cast("double"))))


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    period: int,
    tiebreak: str,
) -> DataFrame:
    """Classical additive seasonal decomposition at a FIXED period:
    ``value = trend + seasonal + resid`` per key series — the
    descriptive screen behind "is this metric's weekly shape stable"
    and the pre-whitening step for the CUSUM/z-score anomaly tier
    (deseasonalized residuals alarm far cleaner than raw values).

    Textbook moving-average method (the ``statsmodels
    seasonal_decompose`` recipe, public): rows order per key by
    ``(ts, tiebreak)``; ``trend`` = the ``period``-row centered
    moving average (rows −⌊p/2⌋ … p−1−⌊p/2⌋ — symmetric for odd
    ``period``, trailing-by-half for even; edge rows without a FULL
    window get NULL trend, exactly like statsmodels); ``seasonal`` =
    the per-``phase`` mean of the detrended series, re-centered so
    one period sums to ~0; ``resid`` = value − trend − seasonal
    (NULL where trend is NULL). ``phase`` = 0-based position mod
    ``period``.

    Every step is key-partitioned (two window passes + one
    (key, phase) aggregate + broadcast-size joins) — no unpartitioned
    window, no driver state; sums of doubles, so registry replays
    round to 6dp (the events_cusum precedent).
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    keys = list(keys)
    lo, hi = -(period // 2), period - 1 - period // 2
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w_ord = Window.partitionBy(*keys).orderBy(*order)
    w_ma = w_ord.rowsBetween(lo, hi)
    v = F.col(value_col).cast("double")
    base = (df.withColumn("__pos", F.row_number().over(w_ord) - 1)
            .withColumn("phase", (F.col("__pos") % period).cast("int"))
            .withColumn(
                "trend",
                F.when(F.count(F.lit(1)).over(w_ma) == period,
                       F.avg(v).over(w_ma))))
    detr = base.withColumn("__d", v - F.col("trend"))
    ph = (detr.filter(F.col("__d").isNotNull())
          .groupBy(*keys, "phase")
          .agg(F.avg("__d").alias("__s_raw")))
    center = ph.groupBy(*keys).agg(F.avg("__s_raw").alias("__s_mean"))
    seas = (ph.join(center, keys)
            .select(*keys, "phase",
                    (F.col("__s_raw") - F.col("__s_mean"))
                    .alias("seasonal")))
    out = (base.join(seas, keys + ["phase"], "left")
           .withColumn("resid",
                       v - F.col("trend") - F.col("seasonal")))
    id_cols = [ts_col] if tiebreak == ts_col else [ts_col, tiebreak]
    return out.select(
        *keys, *id_cols, v.alias("value"), "phase",
        "trend", "seasonal", "resid")


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    alpha: float = 0.3,
    span: int = 8,
) -> DataFrame:
    """Finite-window EWMA smoothing per series: adds ``ewma`` =
    ``Σ_{j<span} (1−α)^j·x_{t−j} / Σ_{j<span, t−j≥0} (1−α)^j`` — the
    ``adjust=True`` exponential moving average TRUNCATED at ``span``
    lags (an FIR filter). The infinite-memory recursive form is
    inherently sequential per series; the truncated form is exact
    for its own definition, map-only after one per-key sort, and —
    because the weighted sum is a FIXED unrolled expression, not an
    accumulation — bit-replayable in any engine that evaluates the
    same expression (the weights at span=8, α=0.3 already decay to
    0.08; pick span so ``(1−α)^span`` is below your noise floor).
    The smoothing companion to :func:`rolling_zscore` (which
    flags excursions; this one filters them).

    NULL values drop out of BOTH the numerator and the weight
    normalizer (per-lag presence masks), so gaps don't bleed zeros
    into the average. One window pass: hash Exchange on ``keys`` +
    one sort; ``span`` is capped at 64 (the unrolled-lag expression
    is linear in span).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")
    if not 1 <= span <= 64:
        raise ValueError("span must be in [1, 64]")
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    x = F.col(value_col).cast("double")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(span):
        wj = float((1.0 - alpha) ** j)
        xj = x if j == 0 else F.lag(value_col, j).over(w).cast("double")
        num = num + F.when(xj.isNotNull(), F.lit(wj) * xj) \
            .otherwise(F.lit(0.0))
        den = den + F.when(xj.isNotNull(), F.lit(wj)) \
            .otherwise(F.lit(0.0))
    return df.withColumn(
        "ewma", F.when(den > 0, num / den))


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimator: one row per DISTINCT event
    time ``(t, n_risk, n_events, n_censored, survival)`` with
    ``S(t) = Π_{t_i ≤ t} (1 − d_i/n_i)`` — the standard
    retention/churn curve over (duration, 0/1-event) rows, censored
    subjects (``event = 0``) leaving the risk set without a death.
    The product is computed as ``exp(Σ ln(1 − d_i/n_i))`` so it
    becomes a PREFIX SUM — the repo's distributed prefix-sum
    machinery, never a sequential scan or unpartitioned window; a
    time where the risk set dies out entirely yields survival 0 from
    there on (ln(0) guarded). Exact integer risk-set algebra until
    the ln/exp pair.

    Plan: durations collapse to per-distinct-time (deaths, censored)
    counts (distinct-time-sized); the risk set at ``t`` is
    ``N − (all subjects with duration < t)`` — another prefix sum —
    so both legs ride :func:`lindel_spark.util.prefix_sums`. NULL
    durations excluded; events must be 0/1.
    """
    from lindel_spark.util import prefix_sums

    base = (df.select(F.col(duration_col).cast("double").alias("t"),
                      F.col(event_col).cast("int").alias("e"))
            .filter(F.col("t").isNotNull() & F.col("e").isNotNull()))
    counts = base.groupBy("t").agg(
        F.sum("e").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"))
    cum = prefix_sums(
        counts.withColumn("__all", F.col("d") + F.col("c")),
        "t", ["__all"])
    tot = cum.agg(F.max("cum___all").cast("long").alias("__n"))
    cum = cum.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk", F.col("__n") - (F.col("cum___all")
                                  - (F.col("d") + F.col("c"))))
    # ln(1 - d/n): a time that wipes out its whole risk set sends the
    # survival to exactly 0 from there on — emitted as NULL lns past
    # that point would corrupt the prefix sum, so the term is floored
    # and the final exp maps the -inf-like floor to 0 via a flag.
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    term = F.when(frac < 1.0, F.log(F.lit(1.0) - frac))
    withterm = cum.withColumn("__ln", F.coalesce(term, F.lit(0.0))) \
        .withColumn("__dead", F.when(frac >= 1.0, 1).otherwise(0))
    s = prefix_sums(withterm, "t", ["__ln", "__dead"])
    surv = F.when(F.col("cum___dead") > 0, F.lit(0.0)) \
        .otherwise(F.exp(F.col("cum___ln")))
    return (s.filter(F.col("d") > 0)
            .select(F.col("t"), "n_risk",
                    F.col("d").alias("n_events"),
                    F.col("c").alias("n_censored"),
                    surv.alias("survival")))


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak: str,
    conversion: str,
    model: str = "linear",
) -> DataFrame:
    """Multi-touch attribution over per-user event streams: each
    ``conversion`` event's unit of credit is split across the
    non-conversion touches since the user's PREVIOUS conversion
    (epoch-scoped, the standard formulation) under the chosen
    ``model`` — ``'first'`` (all credit to the earliest touch),
    ``'last'`` (latest), or ``'linear'`` (1/n each). Returns one row
    per touch type: ``(touch_type, credit, n_touches,
    n_conversions)`` where ``n_conversions`` counts conversions that
    had ≥ 1 touch (credit conserves: Σ credit = that count;
    touchless conversions attribute nothing).

    Plan: one per-user window pass computes each event's epoch (the
    running count of PRIOR conversions — prefix count, map-only
    after the per-key sort), touches join conversions on
    (user, epoch) implicitly by aggregation — no join at all: the
    epoch grouping IS the assignment, one groupBy on (user, epoch)
    for per-epoch touch counts/extents, one more keyed aggregate to
    the type rollup. Deterministic under the (ts, tiebreak) total
    order per user.
    """
    if model not in ("first", "last", "linear"):
        raise ValueError("model must be first/last/linear")
    from pyspark.sql.window import Window

    w = (Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
         .rowsBetween(Window.unboundedPreceding, -1))
    is_conv = F.when(F.col(type_col) == conversion, 1).otherwise(0)
    ev = df.withColumn("__conv", is_conv).withColumn(
        "__epoch",
        F.coalesce(F.sum("__conv").over(w), F.lit(0)).cast("long"))
    touches = ev.filter(F.col("__conv") == 0)
    convs = (ev.filter(F.col("__conv") == 1)
             .select(F.col(user_col).alias("__u"),
                     F.col("__epoch").alias("__e")))
    # per (user, epoch): touch extents for the first/last rules
    wt = Window.partitionBy(user_col, "__epoch") \
        .orderBy(ts_col, tiebreak)
    tagged = (touches
              .withColumn("__rn", F.row_number().over(wt))
              .withColumn("__cnt", F.count(F.lit(1)).over(
                  Window.partitionBy(user_col, "__epoch"))))
    # an epoch's touches attribute to the conversion CLOSING it —
    # i.e. a conversion whose own epoch equals the touch epoch
    closed = tagged.join(
        convs,
        (tagged[user_col] == convs["__u"])
        & (tagged["__epoch"] == convs["__e"]))
    if model == "linear":
        credit = F.lit(1.0) / F.col("__cnt").cast("double")
    elif model == "first":
        credit = F.when(F.col("__rn") == 1, 1.0).otherwise(0.0)
    else:
        credit = F.when(F.col("__rn") == F.col("__cnt"), 1.0) \
            .otherwise(0.0)
    per_type = (closed.withColumn("__credit", credit)
                .groupBy(F.col(type_col).alias("touch_type"))
                .agg(F.sum("__credit").alias("credit"),
                     F.count(F.lit(1)).cast("long").alias("n_touches")))
    # n_conversions = DISTINCT attributed conversions this type
    # touched (model-independent reach, beside the model's credit)
    per_conv = (closed.groupBy(F.col(type_col).alias("touch_type"))
                .agg(F.countDistinct(user_col, "__epoch")
                     .cast("long").alias("n_conversions")))
    return per_type.join(per_conv, "touch_type")


def _hw_states(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    period: int,
    window: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
):
    """Additive Holt–Winters (triple-exponential / ETS(A,A,A)-shaped)
    ONE-STEP-AHEAD forecast per key series — the predictive leg the
    diagnose-only tier (:func:`seasonal_decompose`, :func:`ewma`)
    was missing: gap-fill → decompose → FORECAST. Returns one row per
    key: ``(keys…, last_ts, n_obs, level, trend, forecast)`` where
    ``forecast = level + trend + season(next phase)``.

    The recursion (Holt 1957 / Winters 1960, the statsmodels/
    Hyndman FPP formulation) over the LAST ``window`` observations
    with deterministic cold-start — ``l₀`` = first-period mean,
    ``b₀`` = (second-period mean − first-period mean)/period,
    ``s_i`` = xᵢ − l₀ — then for t = period…window−1::

        l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_t)    + (1−γ)·s_{t−m}

    Truncating to a FIXED window (the :func:`ewma` FIR precedent)
    is what makes the inherently-sequential recursion replayable:
    every step is a NAMED column over the per-key value array, so
    the whole fold is a fixed expression DAG — bit-identical in any
    engine that evaluates the same steps (the DuckDB oracle
    regenerates the identical step list via lateral column aliases).
    Per-step LET-BINDING through ``withColumn`` (the round-12
    ``char_ngrams`` lesson) keeps the DAG linear in ``window`` —
    naive expression nesting would double per step.

    Plan shape: one hash Exchange on ``keys`` + per-key sorted
    ``collect_list`` (bounded: each series carries exactly
    ``window`` doubles — executor memory holds W·8 bytes per key,
    never the series history), then map-only column algebra. Series
    with fewer than ``window`` observations are ABSENT from the
    output (document the cold-start elsewhere; a half-window
    forecast is a different estimator, not a smaller one of these).
    ``window`` must be ≥ 2·period (the trend init needs two full
    periods) and ≤ 512 (the unrolled-step ceiling).
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    if window < 2 * period:
        raise ValueError("window must be >= 2*period")
    if window > 512:
        raise ValueError("window must be <= 512 (unrolled steps)")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < v < 1.0:
            raise ValueError(f"{nm} must be in (0, 1)")
    keys = list(keys)
    m, W = int(period), int(window)
    a, b_, g_ = float(alpha), float(beta), float(gamma)

    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    base = df.select(*keys, F.col(ts_col).alias("__ts"),
                     F.col(tiebreak).alias("__tb"),
                     F.col(value_col).cast("double").alias("__v"))
    grouped = (base.groupBy(*keys)
               .agg(F.slice(F.array_sort(
                        F.collect_list(F.struct(
                            F.col("__ts"), F.col("__tb"),
                            F.col("__v")))), -W, W).alias("__last"),
                    F.count(F.lit(1)).cast("long").alias("__n"))
               .filter(F.col("__n") >= W)
               .withColumn("__xs", F.transform(
                   F.col("__last"), lambda s: s["__v"]))
               .withColumn("last_ts", F.element_at(
                   F.col("__last"), W)["__ts"]))

    def x(i: int):  # 0-based element of the last-W value array
        return F.element_at(F.col("__xs"), i + 1)

    first = x(0)
    for i in range(1, m):
        first = first + x(i)
    second = x(m)
    for i in range(m + 1, 2 * m):
        second = second + x(i)
    # steps are BATCHED with withColumns (round-15 optimization): the
    # one-column-per-call chain built ~100 chained Projects, and the
    # per-call py4j + analyzer cost dominated the operator's wall
    # time (measured 3.8 s DataFrame build vs 3.0 s execution at
    # sf0.1). Same named-column let-binding, identical expressions —
    # only the Project grouping changes (l_t first, then b_t/s_t
    # which reference it).
    out = grouped.withColumns({
        "__l0": first / float(m),
        "__b0": (second - first) / float(m * m),
    })
    out = out.withColumns(
        {f"__s{i}": x(i) - F.col("__l0") for i in range(m)})
    lp, bp = "__l0", "__b0"
    for t in range(m, W):
        sm = F.col(f"__s{t - m}")
        out = out.withColumns({
            f"__l{t}":
                a * (x(t) - sm) + (1.0 - a) * (F.col(lp) + F.col(bp))})
        out = out.withColumns({
            f"__b{t}":
                b_ * (F.col(f"__l{t}") - F.col(lp))
                + (1.0 - b_) * F.col(bp),
            f"__s{t}":
                g_ * (x(t) - F.col(f"__l{t}")) + (1.0 - g_) * sm})
        lp, bp = f"__l{t}", f"__b{t}"
    return out, lp, bp, m, W, keys


def holt_winters_forecast(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    period: int,
    window: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    out, lp, bp, m, W, keys = _hw_states(
        df, keys, ts_col, value_col, tiebreak, period, window,
        alpha, beta, gamma)
    return out.select(
        *keys, "last_ts", F.col("__n").alias("n_obs"),
        F.col(lp).alias("level"), F.col(bp).alias("trend"),
        (F.col(lp) + F.col(bp) + F.col(f"__s{W - m}")).alias("forecast"))


holt_winters_forecast.__doc__ = _hw_states.__doc__


def holt_winters_horizon(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    period: int,
    window: int,
    horizon: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
) -> DataFrame:
    """H-STEP-AHEAD additive Holt-Winters forecast (round 14 — the
    capacity-planning face of :func:`holt_winters_forecast`): one row
    per key per step, ``(keys..., last_ts, n_obs, step, forecast)``
    with ``step`` = 1..horizon and

        forecast(t+h) = level + h*trend + s_{(phase of t+h)}

    — the standard frozen-state extrapolation (Hyndman FPP eq. 7.6:
    the level/trend extend linearly, the season repeats its last
    fitted cycle with indices wrapping mod ``period``). PURE ALGEBRA
    over the states the fixed-window fold already computed — no new
    recursion, so the replay contract (identical named-step DAG on
    both engines) carries over verbatim; ``horizon == 1`` equals
    :func:`holt_winters_forecast`'s single ``forecast`` exactly.

    Plan: the fold's one Exchange + map-only DAG, then a
    ``posexplode`` of the horizon-length forecast array — rows grow
    x ``horizon`` AFTER aggregation (keys x horizon, never data-
    scale). ``horizon`` is capped at 512 like the window (an
    unbounded horizon is an arange, not a forecast).
    """
    if not 1 <= int(horizon) <= 512:
        raise ValueError("horizon must be in [1, 512]")
    out, lp, bp, m, W, keys = _hw_states(
        df, keys, ts_col, value_col, tiebreak, period, window,
        alpha, beta, gamma)
    H = int(horizon)
    fc = F.array(*[
        (F.col(lp) + F.lit(float(h)) * F.col(bp)
         + F.col(f"__s{W - m + ((h - 1) % m)}"))
        for h in range(1, H + 1)])
    return (out.select(*keys, "last_ts",
                       F.col("__n").alias("n_obs"),
                       F.posexplode(fc).alias("__pos", "forecast"))
            .select(*keys, "last_ts", "n_obs",
                    (F.col("__pos") + 1).cast("int").alias("step"),
                    "forecast"))


def ar2_forecast(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: str,
    horizon: int = 3,
) -> DataFrame:
    """AR(2) forecast per series by Yule–Walker (the closed-form
    autoregressive tier between :func:`ewma` (no dynamics) and
    :func:`holt_winters_forecast` (trend+season): an AR(2) captures
    damped oscillation / mean reversion neither of those models).
    For each key group, estimates ``x_t − μ = φ1(x_{t−1} − μ) +
    φ2(x_{t−2} − μ)`` from the biased sample autocovariances and
    extrapolates ``horizon`` steps from the last two observations.
    Output: ``(*keys, n, mu, phi1, phi2, step, forecast)``, step =
    1..horizon.

    Everything is CLOSED FORM — no IRLS, no driver action: the
    Yule–Walker 2×2 solves in-plan by Cramer (``det = c0² − c1²``;
    ``φ1 = (c1·c0 − c1·c2)/det``, ``φ2 = (c0·c2 − c1²)/det``) and
    the h-step recursion unrolls into expressions (the
    :func:`holt_winters_horizon` replay contract), so a SQL oracle
    replays every double op. Plan: ONE window pass over the
    ``(ts, tiebreak)``-ordered series (hash Exchange on keys + one
    per-group sort — the :func:`acf` shape) computes the lag-1/lag-2
    leads AND the tail flags; one map-side-combined groupBy per key;
    a posexplode emits the horizon rows.

    Degenerate series (n < 3, zero variance, or a singular YW
    system) emit rows with NULL φ/forecast — μ and n still populate
    (read NULLs as "no AR structure identifiable").
    """
    if horizon < 1:
        raise ValueError("horizon must be >= 1")
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak)
    wd = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc())
    x = F.col(value_col).cast("double")
    # NULL observations are excluded BEFORE sequencing (the observed
    # subsequence — the runs_test convention): counting them in n
    # while the sums skip them would deflate mu and every
    # autocovariance (review catch, round 15)
    df = df.filter(F.col(value_col).isNotNull())
    seq = df.select(
        *keys, x.alias("__x"),
        F.lead(x, 1).over(w).alias("__y1"),
        F.lead(x, 2).over(w).alias("__y2"),
        F.row_number().over(wd).alias("__rd"))
    g = seq.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y1")).alias("__sxy1"),
        F.sum(F.col("__x") + F.col("__y1")).alias("__sp1"),
        F.count("__y1").cast("long").alias("__n1"),
        F.sum(F.col("__x") * F.col("__y2")).alias("__sxy2"),
        F.sum(F.col("__x") + F.col("__y2")).alias("__sp2"),
        F.count("__y2").cast("long").alias("__n2"),
        F.max(F.when(F.col("__rd") == 1, F.col("__x")))
        .alias("__last"),
        F.max(F.when(F.col("__rd") == 2, F.col("__x")))
        .alias("__prev"))
    nn = F.col("n").cast("double")
    mu = F.col("__sx") / nn
    # biased sample autocovariances (all divided by n, the standard
    # YW convention): c_k = (Σ x_t·x_{t+k} − μ·Σ(x_t + x_{t+k})
    #                        + n_k·μ²) / n
    c0 = (F.col("__sxx") - 2.0 * mu * F.col("__sx")
          + nn * mu * mu) / nn
    c1 = (F.col("__sxy1") - mu * F.col("__sp1")
          + F.col("__n1").cast("double") * mu * mu) / nn
    c2 = (F.col("__sxy2") - mu * F.col("__sp2")
          + F.col("__n2").cast("double") * mu * mu) / nn
    det = c0 * c0 - c1 * c1
    phi1 = (c1 * c0 - c1 * c2) / det
    phi2 = (c0 * c2 - c1 * c1) / det
    ok = (F.col("n") >= 3) & (det != 0.0)
    base = g.select(
        *keys, "n", mu.alias("mu"),
        F.when(ok, phi1).alias("phi1"),
        F.when(ok, phi2).alias("phi2"),
        F.col("__last").alias("__l"), F.col("__prev").alias("__p"))
    # unroll the recursion: f_{s} = μ + φ1·(f_{s-1} − μ) + φ2·(f_{s-2} − μ)
    # with f_0 = last, f_{-1} = prev — expressions only
    p1, p2 = F.col("phi1"), F.col("phi2")
    m = F.col("mu")
    fs = []
    fm1, fm2 = F.col("__l"), F.col("__p")
    for _ in range(horizon):
        f = m + p1 * (fm1 - m) + p2 * (fm2 - m)
        fs.append(f)
        fm2, fm1 = fm1, f
    return (base.select(
        *keys, "n", "mu", "phi1", "phi2",
        F.posexplode(F.array(*fs)).alias("__s", "forecast"))
        .select(*keys, "n", "mu", "phi1", "phi2",
                (F.col("__s") + 1).cast("long").alias("step"),
                F.when(F.col("phi1").isNotNull(), F.col("forecast"))
                .alias("forecast")))


def runs_test(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    flag_col: str,
    tiebreak: str,
) -> DataFrame:
    """Wald–Wolfowitz runs test per series: ``(*keys, n1, n0, runs,
    z)`` — "is this binary sequence RANDOM in time, or does it
    clump?": too FEW runs = positive serial dependence (failures
    arrive in bursts — retry storms, flaky hosts), too MANY =
    oscillation. The randomness audit for pass/fail event streams
    that :func:`acf` gives continuous metrics.

    ``runs`` = 1 + Σ 1[x_t ≠ x_{t−1}] over the ``(ts, tiebreak)``-
    ordered sequence (the :func:`acf` determinism contract);
    ``z = (R − μ)/σ`` with the exact conditional moments ``μ =
    2·n1·n0/N + 1``, ``σ² = 2·n1·n0·(2·n1·n0 − N) / (N²·(N−1))``.
    Flags are taken as x ≠ 0; NULL flags are excluded BEFORE
    sequencing (the runs of the observed subsequence). Everything
    is exact integers until the final division — engine-exact.

    Plan: one window pass per series (hash Exchange on keys + one
    per-group sort) + one map-side-combined aggregate. Degenerate
    series (all one symbol, or N < 2) return NULL z.
    """
    keys = list(keys)
    x = (F.col(flag_col).cast("double") != 0.0).cast("long")
    seq = (df.filter(F.col(flag_col).isNotNull())
           .select(*keys, F.col(ts_col).alias("__ts"),
                   F.col(tiebreak).alias("__tb"), x.alias("__x")))
    w2 = Window.partitionBy(*keys).orderBy("__ts", "__tb")
    seq = seq.withColumn("__prev", F.lag("__x").over(w2))
    g = seq.groupBy(*keys).agg(
        F.sum("__x").cast("long").alias("n1"),
        F.sum(1 - F.col("__x")).cast("long").alias("n0"),
        (F.lit(1) + F.sum(
            F.when(F.col("__prev").isNotNull()
                   & (F.col("__x") != F.col("__prev")), 1)
            .otherwise(0))).cast("long").alias("runs"))
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")
    nn = n1 + n0
    mu = 2.0 * n1 * n0 / nn + 1.0
    var = (2.0 * n1 * n0 * (2.0 * n1 * n0 - nn)
           / (nn * nn * (nn - 1.0)))
    z = F.when((F.col("n1") > 0) & (F.col("n0") > 0) & (var > 0),
               (F.col("runs").cast("double") - mu) / F.sqrt(var))
    return g.select(*keys, "n1", "n0", "runs", z.alias("z"))


def durbin_watson(
    df: DataFrame,
    y_col: str,
    x_cols,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Durbin–Watson residual-autocorrelation statistic for a
    linear probe: one row ``(n, dw)`` — ``Σ(e_t − e_{t−1})² /
    Σe_t²`` over the ``(ts, tiebreak)``-ordered residuals of a
    :func:`lindel_spark.features.linear_fit` of ``y ~ x_cols``.
    DW ≈ 2 means the probe's errors are serially independent;
    DW → 0 means positive autocorrelation — the probe is missing a
    time-varying signal and its r²/CIs overstate (the regression
    diagnostic that pairs with the probe tier). NULL rows are
    excluded with the probe's own keep filter, so the residual
    series is exactly the fitted rows.

    Plan: the probe's ONE Gram aggregate + bounded driver solve
    (the :func:`linear_fit` contract), betas broadcast back as
    literals (ŷ built with ascending-index additions — the
    :func:`lindel_spark.features.logistic_fit` replay structure);
    the lag pairing rides the repo's DISTRIBUTED
    :func:`lindel_spark.util.global_rank` (one range shuffle +
    map-side enumeration — never an unpartitioned window; review
    catch, round 15) followed by a rank-keyed self-join of
    consecutive positions; one scalar aggregate closes. A singular
    probe returns NULL dw.
    """
    from lindel_spark.features import linear_fit

    if isinstance(x_cols, str):
        x_cols = [x_cols]
    x_cols = list(x_cols)
    fit = linear_fit(df, y_col, x_cols).collect()[0]
    n = int(fit["n"])
    if n == 0 or fit["intercept"] is None:
        spark = df.sparkSession
        return local_frame(spark, [(n, None)],
                           "n long, dw double")
    yhat = F.lit(float(fit["intercept"]))
    for c in x_cols:
        yhat = yhat + F.col(c).cast("double") \
            * F.lit(float(fit[f"coef_{c}"]))
    keep = F.col(y_col).cast("double").isNotNull()
    for c in x_cols:
        keep = keep & F.col(c).cast("double").isNotNull()
    from lindel_spark.util import global_rank

    e = (df.filter(keep)
         .select(F.col(ts_col).alias("__ts"),
                 F.col(tiebreak).alias("__tb"),
                 (F.col(y_col).cast("double") - yhat).alias("__e")))
    r = global_rank(e, ["__ts", "__tb"], out_col="__r")
    prev = r.select((F.col("__r") + 1).alias("__r"),
                    F.col("__e").alias("__ep"))
    paired = r.join(prev, "__r", "left")
    agg = paired.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__e") * F.col("__e")).alias("__see"),
        F.sum(F.when(F.col("__ep").isNotNull(),
                     (F.col("__e") - F.col("__ep"))
                     * (F.col("__e") - F.col("__ep")))).alias("__sd"))
    dw = F.when(F.col("__see") > 0,
                F.col("__sd") / F.col("__see"))
    return agg.select("n", dw.alias("dw"))
