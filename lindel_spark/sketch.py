"""Count-min sketch: bounded-memory frequency estimation.

At 100 TB an exact token-frequency table is itself a large shuffle;
a count-min sketch (Cormode & Muthukrishnan 2005) folds the whole
corpus into a fixed ``depth × width`` grid of counters with one
map-side-combined ``groupBy`` — the sketch never grows with the data,
merges associatively across partitions/streams (cell-wise sum, which
is exactly what Spark's partial aggregation does here), and
overestimates only: ``est(t) = min_r grid[r][h_r(t)] >= true(t)``.

Hashing is the repo's engine-portable md5 idiom (first 15 hex chars
as a 60-bit integer — see sampling.split_fraction), so DuckDB replays
the *entire* sketch bit-for-bit and the registry query is value-level,
not a weak self-check.

Everything is pure column algebra: explode ``depth`` (row, bucket)
cells per token map-side, aggregate, done. No UDFs, no driver state.

Because :func:`cms_sketch` is just select + groupBy-sum, it runs
unchanged as a Structured Streaming aggregation: the streaming state
IS the grid (≤ depth × width cells, regardless of stream volume) —
the canonical bounded-state streaming frequency counter. Proven
streaming == batch in tests/test_sketch.py.

Part of the build brief's pipeline tier beside the reference's curve
surface (src/lindel_extension.cpp:948-1026 registers scalar curve
functions only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lindel_spark.util import local_frame

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_bucket(term: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Deterministic bucket of ``term`` for hash row ``row``: first
    15 md5 hex chars of ``"cms{row}:" + term`` as an integer, mod
    ``width``. Engine-portable (DuckDB:
    ``('0x'||substr(md5(..),1,15))::BIGINT % width``)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"cms{row}:"), term)), 1, 15),
        16, 10,
    ).cast("long")
    return h % F.lit(width)


def cms_sketch(terms: DataFrame, term_col: str = "term",
               weight_col: str | None = None, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch from a long-format term relation: returns
    (row, bucket, cnt) — at most ``depth × width`` rows regardless of
    input size. ``weight_col`` supports weighted counting (defaults
    to 1 per input row). One explode (×depth, map-side) + one
    map-side-combined groupBy."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            cms_bucket(F.col(term_col), r, width).alias("bucket"),
        )
        for r in range(depth)
    ])).alias("rb")
    return (
        terms.select(cells, w.cast("long").alias("w"))
        .select(F.col("rb.row").alias("row"),
                F.col("rb.bucket").alias("bucket"), "w")
        .groupBy("row", "bucket")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min grids built with the SAME (depth, width):
    cell-wise sum — the sketch's defining property. Lets shards,
    days, or streams be counted independently and combined later
    (estimates from the merged grid bound the combined counts exactly
    as a single-pass grid would)."""
    if not sketches:
        raise ValueError("LINDEL: cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, candidates: DataFrame,
                 term_col: str = "term", depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Estimated count per candidate term: ``min`` over the sketch's
    ``depth`` rows of the candidate's cell. The sketch is tiny
    (``depth × width`` rows) so it broadcasts; candidates never
    shuffle. Missing cells count 0 (terms the sketch never saw)."""
    probes = candidates.select(
        F.col(term_col).alias("term"),
        F.explode(F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                cms_bucket(F.col(term_col), r, width).alias("bucket"),
            )
            for r in range(depth)
        ])).alias("rb"),
    ).select("term", F.col("rb.row").alias("row"),
             F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters(terms: DataFrame, k: int = 20,
                  term_col: str = "term", depth: int = CMS_DEPTH,
                  width: int = CMS_WIDTH) -> DataFrame:
    """Top-``k`` terms by count-min estimate, with the exact count
    alongside (``est >= exact`` always — the CMS guarantee). Ties
    break on ascending term so the ranking is deterministic.

    Returns (rank, term, est, exact). The exact count here costs one
    extra groupBy over the vocabulary — kept because the pipeline use
    is *validated* filtering; drop it and the sketch alone bounds
    memory when even the vocabulary is too wide."""
    from pyspark.sql.window import Window

    from lindel_spark.util import ensure_parallelism

    # ensure_parallelism: the x-depth md5 bucket hashing otherwise
    # runs in the single scan task of a one-file term source (round
    # 15); no-op once the input has >= parallelism splits.
    terms = ensure_parallelism(terms)
    sk = cms_sketch(terms, term_col=term_col, depth=depth, width=width)
    exact = terms.groupBy(F.col(term_col).alias("term")).agg(
        F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sk, exact, depth=depth, width=width)
    w = Window.orderBy(F.col("est").desc(), F.col("term").asc())
    return (
        est.join(exact, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "term", "est", "exact")
    )


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Fixed-grid histogram sketch of a numeric column: ``(bin, cnt)``
    over ``n_bins`` equi-width bins spanning ``[lo, hi]`` (values
    clamp into the edge bins, NULLs are skipped).

    The mergeable quantile primitive: state is O(n_bins) regardless of
    input size, shards combine with :func:`histogram_merge` (cell-wise
    sum, same as CMS), and because the bin math is plain column
    algebra the sketch — and every quantile read off it — is bit-
    replayable by any engine. One map-side-combined groupBy.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not (hi > lo):
        raise ValueError("need hi > lo")
    v = F.col(col).cast("double")
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)))
    ).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Combine histogram sketches built on the SAME (lo, hi, n_bins)
    grid: cell-wise count sum — shards/days/streams sketch
    independently and merge associatively."""
    if len(sketches) < 2:
        raise ValueError("need at least two sketches to merge")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    quantiles,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Quantile estimates read off a :func:`histogram_sketch`:
    ``(q, est)`` with linear interpolation inside the containing bin.

    Deterministic closed form — ``t = q·n``; the first bin whose
    cumulative count reaches ``t`` contains the quantile; ``est = lo +
    (bin + (t − cum_before)/cnt) · width`` — so estimates are exactly
    replayable, unlike opaque sketch internals. Error is bounded by
    the bin width. Quantiles must lie in (0, 1] — the first-bin
    boundary condition has no row for q = 0 (use ``lo`` directly
    instead). Stays distributed: a cumulative window over
    ``n_bins`` rows joined to a broadcast quantile list.
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    total = sketch.agg(F.sum("cnt").cast("double").alias("n"))
    qdf = local_frame(sketch.sparkSession,
                      [(float(q),) for q in quantiles], "q double")
    t = F.col("q") * F.col("n")
    return (
        qdf.crossJoin(F.broadcast(total))
        .join(F.broadcast(cum),
              (F.col("cum") >= t) & (F.col("cum_prev") < t))
        .select(
            "q",
            (F.lit(lo)
             + (F.col("bin")
                + (t - F.col("cum_prev")) / F.col("cnt"))
             * F.lit(width)).alias("est"),
        )
    )


def histogram_sketch_grouped(
    df: DataFrame,
    keys,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Per-group :func:`histogram_sketch`: ``(*keys, bin, cnt)``.
    State is O(groups × n_bins); one map-side-combined groupBy on
    (keys, bin). Feed :func:`histogram_quantiles_grouped` for
    per-group quantiles without a per-group sort — the shape that
    gives every tenant/day/domain its own p99 in one pass."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not (hi > lo):
        raise ValueError("need hi > lo")
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(col).cast("double")
    width = (hi - lo) / n_bins
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)))
    ).cast("long")
    return (
        df.filter(v.isNotNull())
        .groupBy(*keys, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantiles_grouped(
    sketch: DataFrame,
    keys,
    quantiles,
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Per-group quantiles off a :func:`histogram_sketch_grouped`:
    ``(*keys, q, est)``, same closed-form interpolation as the global
    reader. The cumulative window partitions by the group keys (≤
    n_bins rows per partition), and the quantile list joins in as a
    broadcast — no global sort anywhere."""
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*keys).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = sketch.select(
        *keys, "bin", "cnt",
        F.sum("cnt").over(w).alias("cum"),
    ).withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    totals = sketch.groupBy(*keys).agg(
        F.sum("cnt").cast("double").alias("n"))
    qdf = local_frame(sketch.sparkSession,
                      [(float(q),) for q in quantiles], "q double")
    t = F.col("q") * F.col("n")
    return (
        cum.join(totals, keys)
        .join(F.broadcast(qdf),
              (F.col("cum") >= t) & (F.col("cum_prev") < t))
        .select(
            *keys, "q",
            (F.lit(lo)
             + (F.col("bin")
                + (t - F.col("cum_prev")) / F.col("cnt"))
             * F.lit(width)).alias("est"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    keys,
    col: str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the ``k`` smallest
    60-bit md5 hashes of ``col`` — ``(*keys, rank, h)``.

    The deterministic, engine-replayable alternative to opaque HLL
    registers: every value is a plain md5 integer, so a SQL oracle
    reproduces the sketch AND its estimate bit-for-bit. Mergeable —
    union sketches and re-rank (:func:`kmv_merge`). State is O(k) per
    group. Plan: hash map-side, distinct, one window per group
    (Spark's rank-limit pushdown keeps at most k rows per partition
    before the shuffle).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
               16, 10).cast("long")
    hashed = df.select(*keys, h.alias("h")).distinct()
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmv_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Merge KMV sketches built with the same ``k``: union, dedupe
    hashes, keep each group's k smallest again.

    ``k`` is a REQUIRED keyword (no default — a default of 256 would
    just move the silent-mismatch hole to sketches built with any
    other k; ADVICE round-9) and must match the ``k`` the inputs
    were built with (same contract as :func:`kmv_estimate`). It is
    deliberately NOT inferred from the max rank present: when every
    input shard is under-filled (all groups < k distinct), inference
    truncates the merged sketch at the largest observed rank, and
    :func:`kmv_estimate` then reports that truncated size as an EXACT
    cardinality — e.g. two disjoint 100-distinct shards merged with
    inferred k would estimate 100, a silent 2x undercount
    (ADVICE round-8).
    """
    if len(sketches) < 2:
        raise ValueError("need at least two sketches to merge")
    from pyspark.sql import Window

    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    keys = [c for c in u.columns if c not in ("rank", "h")]
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        u.select(*keys, "h").distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: ``(k-1) · 2^60 / h_(k)``
    when the group filled its sketch, else the observed count is
    EXACT (fewer than k distinct values ⇒ the sketch holds all of
    them). Deterministic closed form over the sketch rows."""
    keys = [c for c in sketch.columns if c not in ("rank", "h")]
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_in"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("kth"),
    )
    dom = float(1 << 60)
    return agg.select(
        *keys,
        F.when(F.col("kth").isNotNull(),
               F.lit(float(k - 1)) * F.lit(dom)
               / F.col("kth").cast("double"))
        .otherwise(F.col("n_in").cast("double")).alias("est"),
    )


def kmv_intersect_estimate(
    a: DataFrame,
    b: DataFrame,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style set arithmetic on two UNGROUPED KMV sketches
    (columns ``rank, h``): one row with ``est_union``,
    ``est_intersection``, and ``jaccard_est``.

    The merged k smallest hashes are an unbiased sample of A ∪ B; the
    fraction of that sample present in BOTH input sketches estimates
    the Jaccard similarity, and intersection = jaccard · union. All
    plain integer/hash math — deterministic and SQL-replayable, unlike
    opaque theta registers. Distinct-count set algebra without ever
    re-reading the raw data: exactly what cross-day / cross-source
    audience overlap needs at 100 TB.
    """
    from pyspark.sql import Window

    au = a.select("h").distinct()
    bu = b.select("h").distinct()
    w = Window.orderBy("h")
    merged = (
        au.unionByName(bu).distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    both = merged.join(au, "h", "left_semi").join(bu, "h", "left_semi")
    kth = merged.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("kth"))
    dom = float(1 << 60)
    est_union = F.when(
        F.col("kth").isNotNull(),
        F.lit(float(k - 1)) * F.lit(dom) / F.col("kth").cast("double")
    ).otherwise(F.col("n_in").cast("double"))
    return (
        kth.crossJoin(F.broadcast(
            both.agg(F.count(F.lit(1)).alias("n_both"))))
        .select(
            est_union.alias("est_union"),
            (F.col("n_both").cast("double")
             / F.greatest(F.least(F.col("n_in"), F.lit(k)), F.lit(1))
             .cast("double")).alias("jaccard_est"),
        )
        .select(
            "est_union", "jaccard_est",
            (F.col("est_union") * F.col("jaccard_est"))
            .alias("est_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# round 11: bound-free mergeable quantile sketch (KLL-style levels,
# deterministic hash compaction)
# ---------------------------------------------------------------------------

KLL_CAPACITY = 4096
_KLL_MAX_LEVEL = 40


def _kll_level(h: Column) -> Column:
    """Sampling level of a 60-bit hash: its trailing-zero count
    (P[lvl >= j] = 2^-j) — ``log2(h & -h)`` is exact because
    ``h & -h`` is a power of two; ``round`` guards libm noise. This
    IS the deterministic compaction coin: membership in level j
    depends only on the row's hash, never on buffer order, which is
    what makes the sketch order-independent, merge-exact and
    SQL-replayable (a literal KLL compactor keeps alternate
    *positions* of a sorted buffer — order-dependent, so two runs of
    the same plan could disagree)."""
    return F.when(h == 0, F.lit(_KLL_MAX_LEVEL)).otherwise(
        F.least(
            F.lit(_KLL_MAX_LEVEL),
            F.round(F.log2(h.bitwiseAND(-h))).cast("long"),
        )
    )


def _kll_threshold(n: int, capacity: int) -> int:
    """Smallest j with ``n <= capacity * 2^j`` (exact integer loop —
    no float log whose rounding could flip an exact power of two)."""
    j = 0
    while n > (capacity << j) and j < _KLL_MAX_LEVEL:
        j += 1
    return j


def kll_sketch(
    df: DataFrame,
    col: str,
    key_cols,
    capacity: int = KLL_CAPACITY,
) -> DataFrame:
    """Bound-free quantile sketch: ``(v, lvl, w, n)`` — a
    deterministic geometric-level sample of ``col`` with NO prior
    ``[lo, hi]`` bounds (the case :func:`histogram_sketch`'s fixed
    grid cannot serve). Costs one count pass + one filtered scan
    (the threshold needs n first); :func:`kll_sketch_grouped` resolves
    thresholds in-plan and is the single-action form.

    KLL-style level hierarchy (Karnin-Lang-Liberty 2016) with the
    compaction coin replaced by the row's own hash: each row gets
    ``lvl`` = trailing zeros of its 60-bit md5 key hash, and the
    sketch keeps rows with ``lvl >= j*`` where ``j*`` is the smallest
    level holding expected size under ``capacity``. Kept rows are a
    uniform hash-sample of rate ``2^-j*`` — so the sample's empirical
    quantiles estimate the population's with rank error
    ``O(sqrt(q(1-q)/capacity))`` w.h.p. — and membership is a pure
    function of (row key, j*): two sketches MERGE EXACTLY (union +
    re-threshold ≡ one pass over the concatenation,
    :func:`kll_merge`), shards/streams/days compose, and a SQL engine
    replays every kept row bit-for-bit (the repo's md5 idiom, see
    :func:`cms_bucket`).

    ``key_cols`` must identify rows uniquely (exact-duplicate keys
    sample together, biasing duplicate-heavy columns); ``n`` — the one
    bounded driver scalar, same contract as ``graph.pagerank`` — rides
    along as a constant column so the sketch is self-contained.
    NULLs in ``col`` are skipped. State is O(capacity) regardless of
    input size.
    """
    if capacity < 16:
        raise ValueError("capacity must be >= 16")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    v = F.col(col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                "|", F.lit("kll"),
                *[F.col(c).cast("string") for c in key_cols])),
            1, 15),
        16, 10,
    ).cast("long")
    base = df.filter(v.isNotNull())
    n = base.count()
    j = _kll_threshold(n, capacity)
    # membership `lvl >= j` ⟺ `h & (2^j - 1) == 0` (trailing zeros
    # >= j; h == 0 passes both) — the mask form mentions the md5 hash
    # ONCE, where the lvl CASE pushed below the project re-evaluated
    # it three times per row (round-15; guide §2.3 cheaper per-row
    # work). `lvl` is then computed only for the O(capacity) kept
    # rows. j <= _KLL_MAX_LEVEL, so the cap never diverges.
    return (
        base.filter(h.bitwiseAND(F.lit((1 << j) - 1)) == 0)
        .select(v.alias("v"), _kll_level(h).alias("lvl"))
        .withColumn("w", F.lit(1 << j).cast("long"))
        .withColumn("n", F.lit(n).cast("long"))
    )


def kll_merge(*sketches: DataFrame, capacity: int) -> DataFrame:
    """Merge KLL sketches built with the same ``capacity``: union,
    re-threshold at the combined size. EXACTLY the single-pass sketch
    of the concatenated inputs (level membership is a pure function
    of the row hash; the combined threshold ``j**`` >= every input's
    ``j*``, and each input kept ALL its rows with ``lvl >= j*``) —
    asserted row-identical in tests/test_sketch_kll.py. ``capacity``
    is a REQUIRED keyword and must match the inputs' (the kmv_merge
    precedent, ADVICE r9: a default would silently mis-threshold
    sketches built with any other capacity)."""
    if len(sketches) < 2:
        raise ValueError("need at least two sketches to merge")
    n_tot = 0
    for s in sketches:
        row = s.select(F.max("n").alias("n")).first()
        n_tot += int(row["n"] or 0)
    j = _kll_threshold(n_tot, capacity)
    u = sketches[0].select("v", "lvl")
    for s in sketches[1:]:
        u = u.unionByName(s.select("v", "lvl"))
    return (
        u.filter(F.col("lvl") >= j)
        .withColumn("w", F.lit(1 << j).cast("long"))
        .withColumn("n", F.lit(n_tot).cast("long"))
    )


def kll_quantiles(sketch: DataFrame, quantiles) -> DataFrame:
    """Quantile estimates off a :func:`kll_sketch`: ``(q, est)`` with
    ``est`` = the sample's type-1 (nearest-rank) empirical quantile —
    the sorted sample's value at position ``ceil(q * |sample|)``.
    Deterministic closed form, no interpolation floats — replayable
    value-for-value by any engine. Quantiles must lie in (0, 1].
    Stays distributed: one window over O(capacity) rows joined to a
    broadcast quantile list."""
    from pyspark.sql import Window

    w = Window.orderBy("v")
    ranked = (
        sketch.select("v")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))))
    )
    qdf = local_frame(sketch.sparkSession,
                      [(float(q),) for q in quantiles], "q double")
    return (
        qdf.join(
            F.broadcast(ranked),
            F.col("rn") == F.ceil(F.col("q") * F.col("m")).cast("long"),
        )
        .select("q", F.col("v").alias("est"))
    )


def kll_sketch_grouped(
    df: DataFrame,
    keys,
    col: str,
    key_cols,
    capacity: int = KLL_CAPACITY,
) -> DataFrame:
    """Per-group :func:`kll_sketch`: ``(*keys, v, lvl, w, n)`` — every
    tenant/day/domain gets its own bound-free quantile sample in ONE
    pass with NO driver scalar at all: group sizes come from one
    aggregate, and each group's threshold ``j*`` (smallest j with
    ``n_g <= capacity * 2^j``) resolves IN-PLAN by joining a
    broadcast 41-row levels frame on the exact integer inequality
    (``n <= capacity << j``) and taking the min — no float ``log2``
    whose rounding could flip an exact power of two, and the same
    trick a SQL oracle replays verbatim. Per-group state is
    O(capacity); membership stays a pure function of (row key, j*),
    so per-group merges compose exactly like the global sketch."""
    if capacity < 16:
        raise ValueError("capacity must be >= 16")
    keys = [keys] if isinstance(keys, str) else list(keys)
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    v = F.col(col).cast("double")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(
                "|", F.lit("kll"),
                *[F.col(c).cast("string") for c in key_cols])),
            1, 15),
        16, 10,
    ).cast("long")
    # hash in its own projection: the lvl CASE references it three
    # times, and a collapsed single Project would re-evaluate the md5
    # per reference (CollapseProject keeps the split because the
    # producer is non-cheap and multiply-referenced) — round-15,
    # guide §2.3 cheaper per-row work
    rows = (df.filter(v.isNotNull())
            .select(*keys, v.alias("v"), h.alias("__h"))
            .select(*keys, "v", _kll_level(F.col("__h")).alias("lvl")))
    counts = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    spark = df.sparkSession
    levels = local_frame(
        spark, [(j, capacity << j) for j in range(_KLL_MAX_LEVEL + 1)],
        "j long, cap_at long")
    thresholds = (
        counts.join(F.broadcast(levels), F.col("n") <= F.col("cap_at"))
        .groupBy(*keys, "n").agg(F.min("j").alias("j"))
    )
    return (
        rows.join(thresholds, keys)
        .filter(F.col("lvl") >= F.col("j"))
        .select(*keys, "v", "lvl",
                # 2^j: exact in double for j <= 40 (shiftleft takes
                # only a literal bit count, not a Column)
                F.pow(F.lit(2.0), F.col("j"))
                .cast("long").alias("w"),
                "n")
    )


def kll_quantiles_grouped(sketch: DataFrame, keys, quantiles) -> DataFrame:
    """Per-group quantiles off a :func:`kll_sketch_grouped`:
    ``(*keys, q, est)`` — the sorted sample's type-1 value per group,
    one window partitioned by the group keys (≤ ~capacity rows per
    partition), quantile list broadcast in. Quantiles in (0, 1]."""
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys).orderBy("v")
    ranked = (
        sketch.select(*keys, "v")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(
            Window.partitionBy(*keys)))
    )
    qdf = local_frame(sketch.sparkSession,
                      [(float(q),) for q in quantiles], "q double")
    return (
        ranked.join(
            F.broadcast(qdf),
            F.col("rn") == F.ceil(F.col("q") * F.col("m")).cast("long"),
        )
        .select(*keys, "q", F.col("v").alias("est"))
    )


# ---------------------------------------------------------------- HLL

_HLL_HASH_BITS = 60


def _hll_cols(value: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) of a value under the repo's 60-bit md5 idiom.

    ``bucket`` = top ``p`` hash bits; ``rho`` = trailing-zero count of
    the remaining ``60-p`` bits + 1 (all-zero remainder saturates at
    ``60-p+1``). Trailing — not leading — zeros on purpose: the bits
    are iid, so P[rho = k] = 2^-k either way, and trailing zeros are
    exact in BOTH engines as ``round(log2(rem & -rem))`` (a power of
    two is exactly representable; the leading-zero form needs
    ``floor(log2(rem))``, which libm can put on the wrong side of an
    integer). Same geometric observable, none of the float risk.
    """
    rem_bits = _HLL_HASH_BITS - p
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, 15),
               16, 10).cast("long")
    bucket = F.shiftright(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.round(F.log2(rem.bitwiseAND(-rem))).cast("long") + F.lit(1))
    return bucket, rho


def hll_sketch(
    df: DataFrame,
    keys,
    col: str,
    p: int = 9,
) -> DataFrame:
    """HyperLogLog distinct sketch per group, deterministic and
    SQL-replayable: ``(*keys, bucket, rho)`` — the max trailing-zero
    rank observed in each of the ``2^p`` register buckets (absent
    buckets mean register 0; the sketch is stored SPARSE).

    The fixed-size counterpart to :func:`kmv_sketch`: KMV state is
    O(k) VALUES and supports set algebra (:func:`kmv_intersect_estimate`),
    HLL state is ≤ 2^p 1-byte-ish registers with a cheaper merge (max
    per bucket, :func:`hll_merge`) and the standard ~1.04/sqrt(2^p)
    relative error (Flajolet et al. 2007). Every register is a pure
    function of the value's md5, so DuckDB replays sketch AND estimate
    bit-for-bit — no opaque engine HLL state.

    Plan: hash + bucket/rho map-side, one map-side-combined groupBy on
    ``(*keys, bucket)`` — at most groups × 2^p rows ever shuffle.
    NULLs are skipped (COUNT DISTINCT semantics).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    keys = [keys] if isinstance(keys, str) else list(keys)
    # staged projections so the md5 hash and the masked remainder are
    # each EVALUATED ONCE per row: the one-Project form of `_hll_cols`
    # re-expanded the hash per reference (bucket + the rho CASE's
    # condition and both `rem & -rem` arms — conditional branches sit
    # outside codegen CSE). CollapseProject keeps the splits because
    # the producers are non-cheap and multiply-referenced. Identical
    # expressions per reference — registers bit-unchanged (round-15;
    # guide §2.3 cheaper per-row work).
    rem_bits = _HLL_HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
               16, 10).cast("long")
    rem = F.col("__rem")
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.round(F.log2(rem.bitwiseAND(-rem))).cast("long") + F.lit(1))
    return (df.filter(F.col(col).isNotNull())
            .select(*keys, h.alias("__h"))
            .select(*keys,
                    F.shiftright(F.col("__h"), rem_bits).alias("bucket"),
                    F.col("__h").bitwiseAND(
                        F.lit((1 << rem_bits) - 1)).alias("__rem"))
            .select(*keys, "bucket", rho.alias("rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame, p: int) -> DataFrame:
    """Merge HLL sketches built with the same ``p``: union + per-bucket
    max — EXACTLY the sketch of the concatenated inputs (register
    content is a max over per-value observables, and max is
    associative/commutative/idempotent), so shards, days and streams
    compose losslessly. ``p`` is a REQUIRED keyword (the
    ``kmv_merge``/``kll_merge`` precedent): merging sketches built
    with different ``p`` would silently mix register spaces.

    ``p`` is validated (4..16) and cross-checked IN-PLAN against the
    register contents (round-12 advice): a bucket ≥ 2^p or a rho over
    the p-implied ceiling means some input was built under a
    different p — the merge raises at execution instead of silently
    blending register spaces."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    if len(sketches) < 2:
        raise ValueError("need at least two sketches to merge")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    u = _hll_p_guard(u, p, "hll_merge")
    keys = [c for c in u.columns if c not in ("bucket", "rho")]
    return u.groupBy(*keys, "bucket").agg(F.max("rho").alias("rho"))


def _hll_p_guard(sketch: DataFrame, p: int, where: str) -> DataFrame:
    """In-plan consistency check between a sketch and a claimed ``p``:
    a register with ``bucket >= 2^p`` (built under a larger p) or
    ``rho`` above the p-implied ceiling (built under a smaller p)
    raises AT EXECUTION — no extra job, the guard rides the existing
    scan. A wrong p would otherwise just return a silently wrong
    estimate (wrong m and alpha). The guard wraps RHO (the column
    every downstream aggregate actually reads) — wrapping bucket
    would be column-pruned away by Catalyst in hll_estimate, whose
    aggregate never touches it."""
    m = 1 << p
    rho_max = _HLL_HASH_BITS - p + 1
    bad = (F.col("bucket") >= m) | (F.col("rho") > rho_max)
    guard = F.when(
        bad,
        F.raise_error(F.concat(
            F.lit(f"LINDEL: {where}: register (bucket="),
            F.col("bucket").cast("string"), F.lit(", rho="),
            F.col("rho").cast("string"),
            F.lit(f") inconsistent with p={p} — the sketch was built "
                  f"with a different p"))).cast("long")
    ).otherwise(F.col("rho"))
    return sketch.withColumn("rho", guard)


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """Distinct-count estimate per group from an HLL sketch:
    ``alpha_m · m² / (Σ 2^-M_j)`` with the standard small-range
    correction ``m·ln(m/V)`` when the raw estimate is under ``2.5m``
    and ``V`` registers are still zero (Flajolet et al. 2007, fig. 3).
    Absent (sparse) buckets contribute ``2^0 = 1`` to the denominator:
    ``Σ = (m − n_present) + Σ_present 2^-rho``. Closed-form column
    algebra over the sketch rows — deterministic, engine-replayable.
    ``p`` is validated and cross-checked in-plan against the register
    contents (round-12 advice — a mismatched p used to return a
    silently wrong estimate).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    sketch = _hll_p_guard(sketch, p, "hll_estimate")
    m = 1 << p
    # Flajolet et al. 2007 fig. 3: fixed constants below m = 128, the
    # asymptotic formula above (review catch, round 11 — the formula
    # at m=16 is a deterministic ~0.4% bias, not noise)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m))
    keys = [c for c in sketch.columns if c not in ("bucket", "rho")]
    grp = sketch.groupBy(*keys) if keys else sketch.groupBy()
    agg = grp.agg(
        F.count(F.lit(1)).cast("long").alias("__present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho").cast("double")))
        .alias("__sum_present"),
    )
    denom = (F.lit(float(m)) - F.col("__present").cast("double")
             + F.col("__sum_present"))
    raw = F.lit(alpha * m * m) / denom
    zeros = F.lit(float(m)) - F.col("__present").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*keys, est.alias("est")) if keys \
        else agg.select(est.alias("est"))
