"""Hypothesis property tests for the round-10 operators: random
corpora beyond the fixed-seed unit tests (SURVEY §5.2).

Each example runs real Spark jobs, so example counts are small and
deadlines disabled; the generators aim at duplicate-heavy corpora
(shared spans everywhere) and tiny vocabularies (maximum accidental
gram collisions)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lindel_spark.dedup import substring_dup_spans

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _brute_substring_dedup(docs: dict, k: int) -> dict:
    """All-pairs Python reference of the operator's contract: k-gram
    in >= 2 distinct docs -> covered everywhere but min-doc owner."""
    toks = {i: t.split() for i, t in docs.items()}
    gram_docs = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            gram_docs.setdefault(tuple(ts[p:p + k]), set()).add(i)
    covered = {i: set() for i in docs}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p:p + k])
            if len(gram_docs[g]) >= 2 and i != min(gram_docs[g]):
                covered[i].update(range(p, p + k))
    out = {}
    for i, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in covered[i]]
        out[i] = (" ".join(kept), len(ts) - len(kept))
    return out


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=24),
        min_size=1, max_size=14),
    k=st.sampled_from([3, 5]),
)
def test_substring_dedup_equals_bruteforce(spark, docs, k):
    """substring_dup_spans must equal the all-pairs reference on ANY
    corpus — a 6-word vocabulary makes cross-doc k-gram collisions
    the norm, exercising overlap merging and owner selection hard."""
    rows = [(i, " ".join(f"w{t}" for t in ts))
            for i, ts in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_clean, r.n_removed)
           for r in substring_dup_spans(df, k=k).collect()}
    want = _brute_substring_dedup({i: t for i, t in rows}, k)
    assert got == want
