"""TextRank keywords, Benford first-digit audit, chi-square
independence — round-11 batch 3."""

import math

import pytest

from lindel_spark.profile import benford_report, chi_square_independence
from lindel_spark.text import textrank_keywords


# ------------------------------------------------------- textrank

@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "spark streaming engine runs fast",
        "spark batch engine runs jobs",
        "spark sql engine plans queries",
        "tiny note",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_textrank_hub_words_win(corpus):
    out = textrank_keywords(corpus, "text", window=2, iterations=5,
                            top_n=3)
    rows = sorted(out.collect(), key=lambda r: r.pos)
    # "engine" co-occurs (within window 2) with the most distinct
    # neighbors; "spark" close behind
    assert rows[0].token in ("engine", "spark")
    assert {r.token for r in rows[:2]} >= {"engine"}


def test_textrank_scores_sum_to_one(corpus):
    out = textrank_keywords(corpus, "text", window=2, iterations=5,
                            top_n=1000)
    total = sum(r.score for r in out.collect())
    assert total == pytest.approx(1.0, abs=1e-9)


def test_textrank_min_token_len_filters(corpus, spark):
    df = spark.createDataFrame(
        [(0, "a b fox ant a b fox bee")], ["doc_id", "text"])
    out = textrank_keywords(df, "text", window=2, iterations=3,
                            top_n=10, min_token_len=3)
    toks = {r.token for r in out.collect()}
    assert "a" not in toks and "b" not in toks
    assert {"fox", "ant", "bee"} <= toks


def test_textrank_deterministic(corpus):
    a = [(r.pos, r.token, r.score) for r in
         textrank_keywords(corpus, "text", top_n=10).collect()]
    b = [(r.pos, r.token, r.score) for r in
         textrank_keywords(
             corpus.repartition(5), "text", top_n=10).collect()]
    assert sorted(a) == sorted(b)


def test_textrank_validations(corpus):
    with pytest.raises(ValueError):
        textrank_keywords(corpus, "text", window=0)
    with pytest.raises(ValueError):
        textrank_keywords(corpus, "text", top_n=0)


# -------------------------------------------------------- benford

def test_benford_perfect_corpus_zero_chi2(spark):
    # counts proportional to Benford mass out of 1000
    rows = []
    n = 0
    for d in range(1, 10):
        c = round(1000 * math.log10(1 + 1 / d))
        rows += [(float(d * 10 + 3),)] * c
        n += c
    df = spark.createDataFrame(rows, ["v"])
    out = {r.digit: r for r in benford_report(df, "v").collect()}
    assert len(out) == 9
    # rounding to integer counts leaves only tiny chi2 mass
    assert sum(r.chi2_term for r in out.values()) < 0.1
    assert sum(r.cnt for r in out.values()) == n


def test_benford_excludes_sub_one_and_null(spark):
    df = spark.createDataFrame(
        [(0.5,), (0.0,), (None,), (-23.0,), (199.0,)], ["v"])
    out = {r.digit: r.cnt for r in benford_report(df, "v").collect()}
    # only -23 (digit 2) and 199 (digit 1) count; |.5| truncates to 0
    assert out[1] == 1 and out[2] == 1
    assert sum(out.values()) == 2


def test_benford_missing_digits_still_reported(spark):
    df = spark.createDataFrame([(111.0,)] * 10, ["v"])
    rows = benford_report(df, "v").collect()
    assert len(rows) == 9
    got = {r.digit: r for r in rows}
    assert got[1].cnt == 10 and got[1].obs_share == 1.0
    for d in range(2, 10):
        assert got[d].cnt == 0
        # absent digit: chi2 term = n*p
        assert got[d].chi2_term == pytest.approx(
            10 * math.log10(1 + 1 / d), abs=1e-9)


# ----------------------------------------------------- chi-square

def test_chi2_textbook_2x2(spark):
    rows = ([("x", "p")] * 10 + [("x", "q")] * 20
            + [("y", "p")] * 20 + [("y", "q")] * 10)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r.n == 60 and r.dof == 1
    # e = 15 everywhere; chi2 = 4 * 25/15
    assert r.chi2 == pytest.approx(100 / 15, abs=1e-9)
    assert r.cramers_v == pytest.approx(math.sqrt(100 / 15 / 60),
                                        abs=1e-9)


def test_chi2_exact_independence_is_zero(spark):
    rows = [(str(i % 2), str(j % 3))
            for i in range(2) for j in range(3) for _ in range(5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-9)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-9)


def test_chi2_zero_joint_cell_contributes(spark):
    # 'x' never pairs with 'q': cell (x,q) has o=0 but e>0
    rows = [("x", "p")] * 10 + [("y", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    # marginals: x=10,y=10; p=15,q=5; n=20
    # e: (x,p)=7.5 (x,q)=2.5 (y,p)=7.5 (y,q)=2.5
    exp = ((10 - 7.5) ** 2 / 7.5 + (0 - 2.5) ** 2 / 2.5
           + (5 - 7.5) ** 2 / 7.5 + (5 - 2.5) ** 2 / 2.5)
    assert r.chi2 == pytest.approx(exp, abs=1e-9)


def test_chi2_constant_column(spark):
    df = spark.createDataFrame(
        [("k", str(i % 3)) for i in range(30)], ["a", "b"])
    r = chi_square_independence(df, "a", "b").collect()[0]
    assert r.dof == 0 and r.chi2 == pytest.approx(0.0, abs=1e-12)
    assert r.cramers_v == 0.0


def test_benford_extreme_magnitudes_not_dropped(spark):
    """round-12 advice: values >= 2^63 used to NULL out under the
    bigint truncation and silently vanish from the audit; the
    string-form extraction keeps them, and non-finite values fall
    out cleanly."""
    from lindel_spark.profile import benford_report

    df = spark.createDataFrame(
        [(4.5e18,), (9.3e21,), (123.4,), (2.0e63,),
         (float("inf",),), (float("nan"),), (0.5,), (None,)],
        "v double")
    rows = {r.digit: r.cnt for r in benford_report(df, "v").collect()}
    # 4.5e18 -> 4, 9.3e21 -> 9, 123.4 -> 1, 2.0e63 -> 2; inf/nan/0.5/
    # NULL drop; all 9 digit rows still emitted
    assert sum(rows.values()) == 4
    assert rows[4] == 1 and rows[9] == 1 and rows[1] == 1 and rows[2] == 1
    assert set(rows) == set(range(1, 10))
