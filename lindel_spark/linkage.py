"""Record linkage / entity resolution: blocked multi-field matching.

Dedup (`dedup.py`) asks "is this the same *text*?"; linkage asks "do
these two *records* refer to the same entity?" across several fields
at once — the master-data step a training pipeline runs before joining
user/customer/supplier dimensions collected from different systems.
The classic recipe (Fellegi & Sunter 1969; Christen, *Data Matching*
2012) is the one that scales:

1. **Blocking** — candidate pairs come from an EQUI-JOIN on a cheap
   deterministic block key (nation + segment + a value bucket), never
   an all-pairs cross join. Cost is Σ|block|², bounded by the block
   design; ``max_block_rows`` guards a degenerate key IN-PLAN (the
   LSH hot-bucket pattern, `dedup.py:366`): the violating block fails
   loudly, named, before it can make the join quadratic.
2. **Field scoring** — each compared field contributes a [0,1]
   similarity: ``levenshtein`` (1 − dist/maxlen), ``exact`` (0/1), or
   ``numeric`` (1 − |a−b|/scale, clamped at 0). All three are closed
   forms both Spark and DuckDB evaluate identically, so the whole
   match decision is value-level oracle-replayable.
3. **Weighted decision** — score = Σ wᵢ·simᵢ (weights normalized),
   pairs at/above ``threshold`` survive. Rounded to 9 decimals so the
   emitted double is engine-stable.

Everything is one blocked self-join (or A×B join) plus map-side
expressions — no UDFs, no driver materialization; at 100 TB the plan
is a shuffle equi-join on the block key with AQE handling block skew.

The reference has no linkage surface (curve functions only,
src/lindel_extension.cpp:948-1026); this is the brief's pipeline tier.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinkField:
    """One compared field: ``kind`` ∈ {levenshtein, jaro_winkler,
    exact, numeric}.

    ``scale`` (numeric only): the difference at which similarity
    reaches 0 — sim = max(0, 1 − |a−b|/scale). ``jaro_winkler``
    (round 11) forgives transpositions and rewards shared prefixes —
    the name/address comparator; it is the one Python-side (Arrow
    pandas-batch) term, every other kind stays whole-stage codegen.
    """

    col: str
    kind: str = "levenshtein"
    weight: float = 1.0
    scale: float = 1.0


def _field_sim(a: Column, b: Column, f: LinkField) -> Column:
    if f.kind == "levenshtein":
        denom = F.greatest(F.length(a), F.length(b))
        sim = F.lit(1.0) - F.levenshtein(a, b).cast("double") / denom
        # two empty strings are identical, not 0/0
        return F.when(denom == 0, F.lit(1.0)).otherwise(sim)
    if f.kind == "jaro_winkler":
        return jaro_winkler(a, b)
    if f.kind == "exact":
        return F.when(a.eqNullSafe(b), F.lit(1.0)).otherwise(F.lit(0.0))
    if f.kind == "numeric":
        return F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.abs(a.cast("double") - b.cast("double"))
            / F.lit(float(f.scale)))
    raise ValueError(f"LINDEL: unknown LinkField kind: {f.kind!r}")


def _block_key(block_cols: list[str]) -> Column:
    """One string join key from the block columns. A NULL component
    renders as a marker distinct from any real value (plain concat_ws
    would make NULL collide with ''); rows sharing a NULL block value
    therefore still block together — linkage blocking treats NULL as
    a category, unlike SQL join-key NULL semantics."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
             for c in block_cols]
    return F.concat_ws("\x1f", *parts)


def record_linkage(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[LinkField],
    threshold: float = 0.85,
    other: DataFrame | None = None,
    max_block_rows: int | None = 100_000,
) -> DataFrame:
    """Linked pairs ``(id_a, id_b, score)`` with ``score >=
    threshold``; self-linkage (``other=None``) emits each unordered
    pair once (``id_a < id_b``), A×B linkage (``other`` given, same
    compared columns) emits every cross match.

    The ONLY join is the blocking equi-join on a composite string
    key; every score term is a whole-stage-codegen column expression.
    ``max_block_rows`` is enforced the way ``near_dup_pairs`` guards
    hot LSH buckets: a map-side-combined block count filtered to
    violators (normally zero rows) broadcast-left-joins onto the
    probe side, and the guard lives inside the LOAD-BEARING join key
    so Catalyst cannot prune it — an over-cap block raises in-plan
    with its key and size instead of silently going quadratic.
    """
    if not fields:
        raise ValueError("LINDEL: record_linkage needs >= 1 LinkField")
    total_w = float(sum(f.weight for f in fields))
    blk = _block_key(block_cols)

    a = df.select(F.col(id_col).alias("__id_a"), blk.alias("__blk"),
                  *[F.col(f.col).alias(f"__a_{f.col}") for f in fields])
    right = df if other is None else other
    b = right.select(F.col(id_col).alias("__id_b"), blk.alias("__blk"),
                     *[F.col(f.col).alias(f"__b_{f.col}") for f in fields])

    if max_block_rows is not None:
        viol = (a.groupBy("__blk")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .filter(F.col("__bn") > F.lit(int(max_block_rows))))
        guarded = F.when(
            F.col("__bn").isNotNull(),
            F.raise_error(F.format_string(
                "LINDEL: linkage block %s holds %s rows > "
                f"max_block_rows={int(max_block_rows)} — the blocking "
                "join is quadratic in that block. Tighten block_cols, "
                "raise the bound, or pass None to accept it.",
                F.col("__blk"), F.col("__bn").cast("string"),
            )).cast("string"),
        ).otherwise(F.col("__blk"))
        a = (a.join(F.broadcast(viol), "__blk", "left")
             .select("__id_a", guarded.alias("__blk"),
                     *[f"__a_{f.col}" for f in fields]))

    pairs = a.join(b, "__blk")
    if other is None:
        pairs = pairs.filter(F.col("__id_a") < F.col("__id_b"))

    score = None
    for f in fields:
        term = (F.lit(f.weight / total_w)
                * _field_sim(F.col(f"__a_{f.col}"),
                             F.col(f"__b_{f.col}"), f))
        score = term if score is None else score + term
    scored = pairs.withColumn("score", F.round(score, 9))
    return (scored.filter(F.col("score") >= F.lit(float(threshold)))
            .select(F.col("__id_a").alias("id_a"),
                    F.col("__id_b").alias("id_b"), "score"))


def incremental_linkage(
    batch: DataFrame,
    master: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[LinkField],
    threshold: float = 0.85,
    max_block_rows: int | None = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """Link an incoming batch against a persisted MASTER record table
    — the MDM ingest shape (the linkage leg of the incremental triad
    beside `dedup.incremental_exact_dedup` and
    `dedup.incremental_near_dup`): the master is matched, never
    rebuilt, so daily ingest cost is one blocked A×B join against the
    master plus one blocked self-join within the batch.

    Returns ``(matches, new_records)``:

    - ``matches`` — (id_a = master id, id_b = batch id, score >=
      threshold) via :func:`record_linkage` A×B; route these to
      survivorship/merge.
    - ``new_records`` — batch rows matching NO master record and not
      a within-batch duplicate of a lower-id batch row (self-linkage
      at the same threshold, min-id survivor): the rows to append to
      the master for the next increment.

    Both anti-join keys are match-id sets (bounded by match counts,
    uniform ids) — the batch is never re-scanned per master row.
    """
    matches = record_linkage(
        master, id_col, block_cols, fields, threshold,
        other=batch, max_block_rows=max_block_rows)
    batch_pairs = record_linkage(
        batch, id_col, block_cols, fields, threshold,
        max_block_rows=max_block_rows)
    matched = matches.select(F.col("id_b").alias(id_col)).distinct()
    # id_a < id_b in self mode: the higher id is the duplicate
    batch_dups = batch_pairs.select(
        F.col("id_b").alias(id_col)).distinct()
    new_records = (batch.join(matched, id_col, "left_anti")
                   .join(batch_dups, id_col, "left_anti"))
    return matches, new_records


def _jaro_winkler_py(a, b) -> float:
    """Plain-Python Jaro–Winkler, pinned to the standard definition
    DuckDB's ``jaro_winkler_similarity`` implements (verified against
    it case-by-case in tests/test_linkage_jw.py): match window
    ``max(len)//2 − 1``, transpositions ``t//2``, Winkler prefix boost
    (scale 0.1, prefix ≤ 4) only when jaro > 0.7, empty input → 0.0.
    Executor-side helper for the Arrow-batched UDF below."""
    if not a or not b:
        return 0.0
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_match = [False] * la
    b_match = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        for j in range(lo, hi):
            if not b_match[j] and b[j] == ca:
                a_match[i] = b_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    if jaro > 0.7:
        pfx = 0
        for i in range(min(4, la, lb)):
            if a[i] != b[i]:
                break
            pfx += 1
        jaro = jaro + pfx * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler(a: Column, b: Column) -> Column:
    """Jaro–Winkler similarity as an Arrow-batched pandas UDF — the
    short-string comparator edit distance gets wrong (it forgives
    transpositions and rewards shared prefixes, which is what human
    name/address variants look like). Spark has no built-in, so this
    is one of the repo's few Python-side kernels: pandas-batch (never
    row-at-a-time), pure function, NULL in → NULL out (SQL
    semantics, matching DuckDB's jaro_winkler_similarity which the
    oracle uses)."""
    global _JW_UDF
    if _JW_UDF is None:
        import pandas as pd

        def _jw(sa, sb):
            out = [
                None if (x is None or y is None)
                else _jaro_winkler_py(x, y)
                for x, y in zip(sa, sb)
            ]
            return pd.Series(out, dtype="float64")

        _JW_UDF = F.pandas_udf(_jw, "double")
    return _JW_UDF(a, b)


_JW_UDF = None
