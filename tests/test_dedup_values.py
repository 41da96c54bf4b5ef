"""Value-level checks of the dedup hash primitives against hashlib.

Round-6 regression: building N sibling ``array_min(transform(...))``
expressions in one projection silently computed md5 of the wrong
strings on Spark 4.1 (each piece correct alone, wrong together, and
unstable across evaluations in long sessions — which dropped a
near-dup pair from ``dedup_clusters`` in full oracle runs). Both
MinHash forms must replay exactly as ``md5(f"{seed}:{shingle}")``
minima so the documented formula, the DuckDB oracle, and any external
reimplementation agree bit-for-bit.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from lindel_spark import dedup as LD

DOCS = [
    (0, "table small sort order small hash stream data big key group dup"),
    (1, "table small sort order small hash stream data big key group"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),
    (3, "completely different content with no overlap whatsoever here now"),
]


def py_shingles(text, k=LD.DEFAULT_SHINGLE_K):
    toks = [t for t in text.split(" ") if t]
    out, seen = [], set()
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i:i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def py_sig(sh, num=LD.DEFAULT_NUM_HASHES):
    return [min(hashlib.md5(f"{j}:{s}".encode()).hexdigest() for s in sh)
            for j in range(num)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_signature_column_form_matches_hashlib(spark, docs_df):
    rows = docs_df.select(
        "doc_id",
        LD.word_shingles(F.col("text")).alias("sh"),
        LD.minhash_signature(LD.word_shingles(F.col("text"))).alias("sig"),
    ).collect()
    for r in rows:
        assert list(r.sig) == py_sig(list(r.sh)), r.doc_id


def test_minhash_signatures_df_form_matches_hashlib(spark, docs_df):
    sh = docs_df.select(
        F.col("doc_id").alias("id"),
        LD.word_shingles(F.col("text")).alias("sh"))
    got = {r.id: [getattr(r, f"_h{j}")
                  for j in range(LD.DEFAULT_NUM_HASHES)]
           for r in LD.minhash_signatures(sh).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_sig(py_shingles(text)), doc_id


def test_band_key_columns_match_array_form(spark, docs_df):
    """DataFrame band keys == lsh_band_keys over the same signature."""
    sh = docs_df.select(
        F.col("doc_id").alias("id"),
        LD.word_shingles(F.col("text")).alias("sh"))
    df_keys = {r.id: list(r.bk) for r in LD.minhash_signatures(sh).select(
        "id", F.array(*LD.band_key_columns()).alias("bk")).collect()}
    arr_keys = {r.id: list(r.bk) for r in sh.select(
        "id", LD.lsh_band_keys(
            LD.minhash_signature(F.col("sh"))).alias("bk")).collect()}
    assert df_keys == arr_keys


def test_let_bound_band_keys_match_plain_form(spark, docs_df):
    """The round-10 near_dup_pairs band expression — lsh_band_keys over
    a minhash_signature LET-BOUND through a singleton-array transform —
    is value-identical to the un-bound form (guards the Catalyst
    projection-collapse / nested-lambda surface the rewrite leans on)."""
    sh = docs_df.select(
        F.col("doc_id").alias("id"),
        LD.word_shingles(F.col("text")).alias("sh"))
    bound = F.element_at(
        F.transform(
            F.array(LD.minhash_signature(F.col("sh"))),
            lambda s: LD.lsh_band_keys(s),
        ),
        1,
    )
    got = {r.id: list(r.bk)
           for r in sh.select("id", bound.alias("bk")).collect()}
    want = {r.id: list(r.bk) for r in sh.select(
        "id", LD.lsh_band_keys(
            LD.minhash_signature(F.col("sh"))).alias("bk")).collect()}
    assert got == want


def test_near_dup_pairs_finds_borderline_short_docs(spark, docs_df):
    """Docs 0/1 differ by one trailing token (jaccard 0.9, all bands
    shared) — the pair the round-6 session flake dropped."""
    pairs = {(r.id_a, r.id_b) for r in LD.near_dup_pairs(docs_df).collect()}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_matches_hashlib(spark, docs_df):
    def py_simhash(text, bits=LD.SIMHASH_BITS):
        toks = [t for t in text.split(" ") if t]
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
              for t in toks]
        out = 0
        for b in range(bits):
            vote = sum(((h >> b) & 1) * 2 - 1 for h in hs)
            out |= int(vote > 0) << b
        return out

    rows = docs_df.select(
        "doc_id", "text",
        LD.simhash(F.col("text")).alias("slow"),
        LD.simhash_fast(F.col("text")).alias("fast")).collect()
    for r in rows:
        want = py_simhash(r.text)
        assert r.slow == want and r.fast == want, r.doc_id
