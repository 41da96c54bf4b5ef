"""Deterministic sampling & dataset splitting.

``df.randomSplit`` / ``df.sample`` are seed-dependent AND
partitioning-dependent — rerun the same pipeline after a repartition
and rows migrate between train and test, silently contaminating
evaluation. Training pipelines want *content-deterministic* splits:
the assignment is a pure function of a stable key, reproducible on any
cluster layout, any engine, any day.

Mechanism: a 60-bit md5 hash of the key column scaled to [0, 1) — the
same primitive both Spark and any SQL engine compute identically, so
splits are exactly replayable (and oracle-checkable) cross-engine.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lindel_spark.util import local_frame

_HASH_SPACE = float(1 << 60)


def split_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction from a stable key: first 15 md5 hex
    chars as an integer / 2^60. Pure column algebra; identical in any
    engine with md5 (DuckDB: ``('0x'||substr(md5(..),1,15))::BIGINT``).
    """
    return (
        F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                          F.lit(salt))), 1, 15), 16, 10)
        .cast("double") / F.lit(_HASH_SPACE)
    )


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float],
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashing ``key_col``.

    Properties ``randomSplit`` cannot give you:
    - stable under repartitioning, reordering, and engine changes;
    - all rows sharing a key land in the same split (no leakage of a
      near-duplicate group across train/test — pass a dedup cluster id
      or document fingerprint as the key);
    - ``salt`` derives independent re-splits from the same keys.

    ``weights`` are normalized; one ``when`` chain over cumulative
    thresholds, no shuffle at all.
    """
    if len(weights) != len(names):
        raise ValueError("LINDEL: weights and names must align")
    total = float(sum(weights))
    frac = split_fraction(F.col(key_col), salt)
    out = None
    acc = 0.0
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w / total
        cond = frac < F.lit(acc)
        out = F.when(cond, F.lit(name)) if out is None else out.when(
            cond, F.lit(name))
    out = (F.lit(names[-1]) if out is None
           else out.otherwise(F.lit(names[-1])))
    return df.withColumn(out_col, out)


def stratified_deterministic_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key hash
    falls under its stratum's fraction. The content-stable analogue of
    ``df.sampleBy`` — same rows survive on any layout. Strata missing
    from ``fractions`` use ``default_fraction``.
    """
    frac = split_fraction(F.col(key_col), salt)
    thresh = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(strata_col) == F.lit(stratum)
        thresh = (F.when(cond, F.lit(float(f))) if thresh is None
                  else thresh.when(cond, F.lit(float(f))))
    thresh = (F.lit(float(default_fraction)) if thresh is None
              else thresh.otherwise(F.lit(float(default_fraction))))
    return df.filter(frac < thresh)


def mixture_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_weights: dict,
    total_rows: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic domain-mixture sampling: draw ~``total_rows``
    rows distributed across strata per ``target_weights`` (normalized;
    strata absent from the dict get weight 0).

    The training-mixture step ("40% web, 30% code, ...") as pure
    column algebra: per-stratum keep-fractions are target_share *
    total / observed_count (capped at 1.0 — an under-represented
    domain yields what it has), then rows keep iff their stable key
    hash falls under the fraction. The only driver-side data is one
    row per stratum (bounded by domain count, never corpus size);
    row selection is content-deterministic under any layout.
    """
    total_w = float(sum(target_weights.values()))
    counts = {r[0]: r[1]
              for r in df.groupBy(strata_col).count().collect()}
    fractions = {
        s: min(1.0, total_rows * (w / total_w) / counts[s])
        for s, w in target_weights.items() if s in counts
    }
    return stratified_deterministic_sample(
        df, key_col, strata_col, fractions,
        default_fraction=0.0, salt=salt)


def upsample_mixture(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    target_weights: dict,
    total_rows: int,
    salt: str = "",
    out_col: str = "copy_idx",
) -> DataFrame:
    """Mixture sampling where a stratum's target may EXCEED its size:
    epoch-style upsampling. A stratum needing ``f`` times its rows
    emits ``floor(f)`` full copies plus a content-deterministic
    partial copy of the remaining fraction — e.g. f = 2.3 duplicates
    every row twice and keeps a stable 30% subset a third time.

    Each emitted row carries ``out_col`` (0-based copy index) so a
    downstream :func:`deterministic_shuffle` interleaves the copies
    instead of streaming them back-to-back. Strata absent from
    ``target_weights`` emit nothing; a weight naming a stratum with
    zero rows raises — the emitted mixture could not meet
    ``total_rows``.

    Scale: one bounded ``groupBy().count().collect()`` (one row per
    domain, never corpus-sized) to derive per-stratum factors; the
    duplication itself is a map-side ``explode`` of a per-row
    ``sequence`` — no shuffle, no driver data path.
    """
    total_w = float(sum(target_weights.values()))
    counts = {r[0]: r[1]
              for r in df.groupBy(strata_col).count().collect()}
    missing = [s for s in target_weights if s not in counts]
    if missing:
        # silently dropping a weighted-but-absent stratum would emit a
        # mixture far short of total_rows with no signal
        raise ValueError(
            "LINDEL: upsample_mixture target_weights name strata with "
            f"zero rows in {strata_col!r}: {sorted(missing)!r} — the "
            "emitted mixture cannot meet total_rows; drop them or fix "
            "the stratum labels")
    factors = {
        s: total_rows * (w / total_w) / counts[s]
        for s, w in target_weights.items()
    }
    f_col = None
    for s, f in sorted(factors.items()):
        cond = F.col(strata_col) == F.lit(s)
        f_col = (F.when(cond, F.lit(float(f))) if f_col is None
                 else f_col.when(cond, F.lit(float(f))))
    f_col = F.lit(0.0) if f_col is None else f_col.otherwise(F.lit(0.0))
    n_full = F.floor(f_col)
    extra = (split_fraction(F.col(key_col), salt)
             < (f_col - n_full)).cast("long")
    n_copies = (n_full.cast("long") + extra)
    # sequence(a, b) runs DESCENDING for b < a — guard the zero-copy
    # case to an explicit empty array so explode drops the row
    seq = F.when(
        n_copies >= 1, F.sequence(F.lit(0).cast("long"), n_copies - 1)
    ).otherwise(F.array().cast("array<long>"))
    return df.withColumn(out_col, F.explode(seq))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight,
    salt: str = "",
) -> DataFrame:
    """Per-row weighted deterministic sampling: keep a row iff its
    stable key hash falls under its own weight (clamped to [0, 1]).

    The quality-weighted downsampling pass of a training pipeline —
    pass a quality score (or any per-row Column/column name) as
    ``weight`` and each row survives with that probability,
    content-deterministically: the same rows survive on any cluster
    layout, any engine, any rerun (and a higher-quality row that
    survived never disappears when the corpus is repartitioned).
    Expected kept-count = sum of clamped weights. Map-only, no
    shuffle; cross-engine replayable through the same md5-fraction
    primitive as :func:`deterministic_split`.
    """
    w = weight if isinstance(weight, Column) else F.col(weight)
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w.cast("double")))
    return df.filter(split_fraction(F.col(key_col), salt) < w)


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    salt: str = "",
    out_col: str = "shuffle_key",
) -> DataFrame:
    """Content-deterministic global training order: order by
    ``md5(key || salt)`` — the same order on any cluster layout, any
    engine, any day; ``salt`` derives independent epoch orders from
    the same corpus.

    ``orderBy`` executes as range-partition + per-partition sort (the
    scalable global sort — no single-task bottleneck at any size);
    writing the result one file per partition materializes the order
    for sequential training readers. The sort key is kept as
    ``out_col`` so the order is reconstructable and auditable after
    any further layout change.
    """
    k = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn(out_col, k).orderBy(out_col)


def weighted_sample_n(
    df: DataFrame,
    key_col: str,
    weight,
    n: int,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Exactly-``n`` weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): each row draws the deterministic
    uniform u = md5-fraction(key) and ranks by ``ln(u) / w`` — the
    top ``n`` keys are a true weighted sample, rows competing with
    probability proportional to weight. Complements
    :func:`weighted_sample` (per-row keep-probability, random total)
    when the budget is a COUNT, not a rate.

    Content-deterministic like every sampler here: same rows win on
    any layout/engine/rerun. ``strata_col`` takes n per stratum. One
    window (per stratum or global); weights must be > 0 — rows with
    w <= 0 are dropped (they'd rank at -inf anyway).
    """
    from pyspark.sql.window import Window

    w = weight if isinstance(weight, Column) else F.col(weight)
    w = w.cast("double")
    u = split_fraction(F.col(key_col), salt)
    # u in [0, 1): guard the exact-0 edge so ln() stays finite
    key = F.log(F.greatest(u, F.lit(1e-18))) / w
    parts = [F.col(strata_col)] if strata_col else []
    win = Window.partitionBy(*parts).orderBy(
        key.desc(), F.col(key_col).asc())
    return (
        df.filter(w > 0)
        .withColumn("__wrank", F.row_number().over(win))
        .filter(F.col("__wrank") <= n)
        .drop("__wrank")
    )


def negative_sample(
    interactions: DataFrame,
    items: DataFrame,
    k: int,
    user_col: str = "user_id",
    item_col: str = "item_id",
    salt: str = "",
    oversample: int = 2,
) -> DataFrame:
    """Deterministic negative sampling for contrastive / recsys
    training: for every user in ``interactions``, draw up to ``k``
    items the user did NOT interact with, content-deterministically
    (same negatives on any cluster layout, any rerun — so training
    runs are reproducible and the oracle can replay the draw).

    Draw mechanics: candidate ``i`` for a user picks the item at index
    ``floor(md5_fraction(user || ':' || i || salt) * n_items)`` in the
    (``item_col``-sorted) catalog — a uniform pseudo-random pick both
    Spark and SQL engines compute identically. ``k x oversample``
    candidates are drawn, positives and same-user duplicate draws
    dropped, and the first ``k`` surviving draws (by draw index) kept;
    a user keeps fewer than ``k`` only if oversampling could not clear
    their positives (dense users + tiny catalogs — raise
    ``oversample``).

    Scale shape: the draw is a map-side ``explode`` over distinct
    users (k x oversample rows each); the catalog index is a broadcast
    join when the catalog is dim-sized (the common case), and the
    positives check is one anti-join keyed on (user, item) — no
    cartesian anywhere. Returns (user, item, draw_idx) with
    draw_idx 0..k-1 re-densified per user.
    """
    from pyspark.sql.window import Window

    from lindel_spark.util import global_rank

    n_items = items.count()
    if n_items == 0:
        raise ValueError("LINDEL: negative_sample needs a non-empty "
                         "item catalog")
    catalog = global_rank(
        items.select(F.col(item_col)), [item_col], out_col="__idx"
    ).withColumn("__idx", F.col("__idx") - 1)
    users = interactions.select(
        F.col(user_col).alias("__u")).distinct()
    draws = users.select(
        "__u",
        F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1)))
        .alias("__i"),
    )
    frac = split_fraction(
        F.concat(F.col("__u").cast("string"), F.lit(":"),
                 F.col("__i").cast("string")), salt)
    cand = draws.withColumn(
        "__idx", F.floor(frac * F.lit(float(n_items))).cast("long"))
    # dim-sized catalogs broadcast; a huge catalog (rare — negatives
    # usually draw from a bounded item universe) degrades to a shuffle
    # join on the draw index rather than overflowing the driver
    cat = F.broadcast(catalog) if n_items <= 5_000_000 else catalog
    cand = cand.join(cat, "__idx").select(
        "__u", "__i", F.col(item_col))
    # same item drawn twice for one user: keep the earliest draw
    w_dup = Window.partitionBy("__u", item_col).orderBy("__i")
    cand = (cand.withColumn("__first", F.row_number().over(w_dup))
            .filter(F.col("__first") == 1).drop("__first"))
    pos = interactions.select(
        F.col(user_col).alias("__u"), F.col(item_col)).distinct()
    neg = cand.join(pos, ["__u", item_col], "left_anti")
    w = Window.partitionBy("__u").orderBy("__i")
    return (
        neg.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(F.col("__u").alias(user_col), item_col,
                (F.col("__rank") - 1).cast("long").alias("draw_idx"))
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    size_col: str,
    target_weights: dict,
    budget: int,
) -> DataFrame:
    """Token-budget mixture PLANNING: given per-row sizes (tokens,
    chars, bytes) and target domain shares, compute — per stratum —
    what a sampler must do to hit ``budget`` total size at those
    shares. :func:`mixture_sample` draws rows; this computes the
    numbers to drive it (and :func:`upsample_mixture`) when the
    contract is a TOKEN budget, not a row count — the form mixture
    specs are actually written in ("500B tokens, 40% web, 30% code").

    One map-side-combined aggregate (sum of ``size_col`` per stratum)
    joined to the broadcast target table; everything after is exact
    algebra on the bounded per-stratum frame:

    - ``need_size``      = normalized share × budget
    - ``keep_fraction``  = min(1, need/observed)   (downsample knob)
    - ``epochs``         = ceil(need/observed)     (upsample knob; 0
      for zero-weight strata)
    - ``deficit_size``   = max(0, need − observed) (what upsampling
      must cover)

    Strata present in the data but absent from ``target_weights`` get
    weight 0 (dropped by the plan, visibly: keep_fraction 0). Ratios
    round to 9 decimals — engine-stable doubles, oracle-replayable.
    Driver-side data is one row per stratum, never corpus-sized.
    """
    total_w = float(sum(target_weights.values()))
    if total_w <= 0:
        raise ValueError("LINDEL: target_weights must sum > 0")
    spark = df.sparkSession
    tgt = local_frame(
        spark, [(k, float(v) / total_w) for k, v in target_weights.items()],
        f"{strata_col} string, __share double")
    obs = (df.groupBy(F.col(strata_col).cast("string").alias(strata_col))
           .agg(F.sum(F.col(size_col).cast("long"))
                .alias("observed_size")))
    j = obs.join(F.broadcast(tgt), strata_col, "left").select(
        strata_col, "observed_size",
        F.coalesce(F.col("__share"), F.lit(0.0)).alias("__share"))
    need = F.col("__share") * F.lit(float(budget))
    ratio = need / F.col("observed_size").cast("double")
    return j.select(
        strata_col,
        "observed_size",
        F.round(need, 9).alias("need_size"),
        F.round(F.least(F.lit(1.0), ratio), 9).alias("keep_fraction"),
        F.ceil(ratio).cast("long").alias("epochs"),
        F.round(F.greatest(F.lit(0.0),
                           need - F.col("observed_size").cast("double")),
                9).alias("deficit_size"),
    )


def cluster_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[float] = (0.9, 0.1),
    names: Sequence[str] = ("train", "test"),
    salt: str = "",
    cluster_col: str = "cluster",
    out_col: str = "split",
) -> DataFrame:
    """Near-dup-aware leak-safe split: every document splits by its
    DEDUP CLUSTER representative, so a near-duplicate family can
    never straddle train/test (the eval-contamination hole a
    row-level split leaves open even after dedup keeps one COPY — the
    kept copy and a paraphrase may both survive distinct clusters
    only if they really are distinct). ``clusters`` is any
    ``(id, cluster)`` frame — :func:`lindel_spark.dedup.dup_clusters`
    over whichever pair family fits (exact / MinHash / SemDeDup);
    documents absent from it are their own singleton representative.

    One left join docs→clusters (cluster frame is id-keyed and
    usually much smaller than the corpus), then the same md5
    split-algebra as :func:`deterministic_split` on the
    representative — no shuffle beyond the join, engine-replayable.
    """
    cl = clusters.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(cluster_col).cast("long").alias("__rep"))
    joined = (df.withColumn(id_col, F.col(id_col).cast("long"))
              .join(cl, id_col, "left")
              .withColumn("__rep", F.coalesce(F.col("__rep"),
                                              F.col(id_col))))
    return (deterministic_split(joined, "__rep", weights, names,
                                salt=salt, out_col=out_col)
            .drop("__rep"))


def kfold(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "",
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: fold id in ``[0, k)`` from the
    60-bit md5 of the key — the cross-validation counterpart of
    :func:`deterministic_split`, with the same guarantees a
    ``randomSplit`` loop cannot give: stable under repartitioning and
    engines, all rows sharing a key (a dedup-cluster id, a user id —
    whatever must not straddle folds) land in one fold, and ``salt``
    derives independent re-folds. ``fold = h mod k`` over the md5
    integer, so folds are balanced to within the hash's uniformity
    and a SQL oracle replays every assignment. Map-only, no shuffle;
    train/test for fold i = ``fold != i`` / ``fold == i``.

    NULL keys raise in-plan (round-12 advice): Spark's ``concat_ws``
    SKIPS nulls (every NULL key would silently pile into the
    ``md5(salt)`` fold) while SQL string concat propagates NULL — a
    cross-engine contract hole. A row with no key has no well-defined
    fold; pre-filter or coalesce a sentinel upstream if that is the
    intent.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    key = F.when(
        F.col(key_col).isNull(),
        F.raise_error(F.lit(
            f"LINDEL: kfold: NULL in key column {key_col!r} — fold "
            "assignment is undefined for NULL keys (coalesce a "
            "sentinel upstream if intended)"))
    ).otherwise(F.col(key_col).cast("string"))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), key)),
            1, 15),
        16, 10).cast("long")
    return df.withColumn(out_col, F.pmod(h, F.lit(int(k))).cast("int"))


def temporal_split(
    df: DataFrame,
    ts_col: str,
    tiebreak: str,
    test_fraction: float = 0.2,
    embargo_rows: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Time-ordered train/test split with an EMBARGO — the
    time-series-CV leakage guard :func:`deterministic_split` (hash)
    and :func:`kfold` cannot express: the newest ``test_fraction`` of
    rows (under the ``(ts, tiebreak)`` total order) become ``test``,
    the ``embargo_rows`` rows immediately before the boundary become
    ``embargo`` (dropped from both sides by the caller — they're the
    rows whose windows/targets overlap the boundary), everything
    older is ``train``.

    Count-based rather than timestamp-threshold-based on purpose: the
    boundary is an exact rank cut, so the split is deterministic even
    when many rows share the boundary timestamp (the tiebreaker
    orders them), and an engine replays it with plain integer rank
    algebra — no interpolated-percentile semantics to align. Rank
    comes from :func:`lindel_spark.util.global_rank` (never a
    single-task window); the only driver scalar is the row count.
    """
    if not 0.0 < test_fraction < 1.0:
        raise ValueError("test_fraction must be in (0, 1)")
    if embargo_rows < 0:
        raise ValueError("embargo_rows must be >= 0")
    from lindel_spark.util import global_rank

    ranked = global_rank(df, [ts_col, tiebreak], out_col="__r")
    n = ranked.count()
    cut = n - int(math.floor(test_fraction * n))  # first test rank - 1
    lo = cut - embargo_rows
    return (ranked.withColumn(
        out_col,
        F.when(F.col("__r") > cut, F.lit("test"))
        .when(F.col("__r") > lo, F.lit("embargo"))
        .otherwise(F.lit("train")))
        .drop("__r"))


def _hashed_features(df: DataFrame, id_col: str | None, text_col: str,
                     n_buckets: int, bigrams: bool,
                     salt: str) -> DataFrame:
    """Exploded hashed n-gram features: ``(doc_id?, bucket)`` with
    one row per token (and adjacent bigram when ``bigrams``) —
    bucket = 60-bit md5 of the feature mod ``n_buckets`` (the
    :func:`kfold` hash idiom, so any SQL engine replays every
    bucket)."""
    toks = F.filter(F.split(F.col(text_col), " "),
                    lambda t: t != F.lit(""))
    feats = toks
    if bigrams:
        big = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b))
        feats = F.concat(toks, big)
    cols = ([F.col(id_col).alias("doc_id")] if id_col else [])
    ex = df.select(*cols, F.explode(feats).alias("__f"))
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col("__f"))),
            1, 15), 16, 10).cast("long"),
        F.lit(int(n_buckets)))
    return ex.select(*(["doc_id"] if id_col else []),
                     bucket.alias("bucket"))


def importance_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    bigrams: bool = True,
    salt: str = "",
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every ``raw`` document by how much more likely its hashed n-gram
    features are under the TARGET distribution than under the raw
    pool — ``logw(doc) = Σ_f m_f · [ln p̂_t(f) − ln p̂_r(f)]`` with
    Laplace-smoothed bucket unigram models ``p̂(b) = (cnt_b + 1) /
    (total + B)``. Returns ``(doc_id, n_feats, logweight)``; feed it
    to :func:`weighted_sample_n` / Gumbel top-k to actually resample
    (the paper's recipe: sample ∝ exp(logw)). The principled upgrade
    over single-signal quality gates when "looks like the target
    corpus" IS the selection criterion.

    Scale shape: two bucket-count aggregates (B-bounded), one
    doc×feature explode (the BM25 postings family), one
    bucket-keyed join against the two B-row count tables (broadcast)
    — never doc × vocab. Buckets hash through md5 (the
    :func:`kfold` idiom) and scoring is log-count algebra, so the
    whole pipeline — buckets, counts, logs — replays value-for-value
    in any SQL engine.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    B = float(n_buckets)
    t_counts = (_hashed_features(target, None, text_col, n_buckets,
                                 bigrams, salt)
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("long").alias("ct")))
    r_counts = (_hashed_features(raw, None, text_col, n_buckets,
                                 bigrams, salt)
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("long").alias("cr")))
    t_tot = t_counts.agg(F.sum("ct").cast("double").alias("__tt"))
    r_tot = r_counts.agg(F.sum("cr").cast("double").alias("__tr"))
    doc_f = (_hashed_features(raw, id_col, text_col, n_buckets,
                              bigrams, salt)
             .groupBy("doc_id", "bucket")
             .agg(F.count(F.lit(1)).cast("long").alias("m")))
    scored = (doc_f
              .join(F.broadcast(t_counts), "bucket", "left")
              .join(F.broadcast(r_counts), "bucket", "left")
              .select(
                  "doc_id", "m",
                  (F.col("m").cast("double")
                   * (F.log(F.coalesce(F.col("ct"), F.lit(0))
                            .cast("double") + F.lit(1.0))
                      - F.log(F.coalesce(F.col("cr"), F.lit(0))
                              .cast("double") + F.lit(1.0))))
                  .alias("__num")))
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("m").cast("long").alias("n_feats"),
        F.sum("__num").alias("__s"))
    return (per_doc
            .crossJoin(F.broadcast(t_tot))
            .crossJoin(F.broadcast(r_tot))
            .select(
                "doc_id", "n_feats",
                (F.col("__s")
                 - F.col("n_feats").cast("double")
                 * (F.log(F.col("__tt") + F.lit(B))
                    - F.log(F.col("__tr") + F.lit(B))))
                .alias("logweight")))
