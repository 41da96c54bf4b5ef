"""Similarity-search tier tests: exact/fast agreement and ANN recall."""

import pytest
from pyspark.sql import functions as F

from lindel_spark import similarity as LS


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


@pytest.fixture(scope="module")
def queries_df(emb):
    return emb.filter(F.col("vec_id") % 50 == 0)


@pytest.fixture(scope="module")
def brute(emb, queries_df):
    return LS.brute_force_knn(emb, queries_df, k=10).collect()


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_brute_force_shape(brute):
    by_q = _topk_sets(brute)
    assert len(by_q) == 10
    assert all(len(v) == 10 for v in by_q.values())
    for r in brute:
        assert -1.0 <= r.cos <= 1.0
        assert r.neighbor_id != r.query_id


def test_fast_matches_exact_topk(emb, queries_df, brute):
    fast = LS.brute_force_knn_fast(emb, queries_df, k=10).collect()
    exact_sets = _topk_sets(brute)
    fast_sets = _topk_sets(fast)
    assert exact_sets == fast_sets
    # values agree to float tolerance (SIMD accumulation order differs)
    exact_cos = {(r.query_id, r.neighbor_id): r.cos for r in brute}
    for r in fast:
        assert abs(exact_cos[(r.query_id, r.neighbor_id)] - r.cos) < 1e-9


def test_ann_recall_at_10(emb, queries_df, brute):
    ann = LS.ann_knn(emb, queries_df, k=10).collect()
    exact_sets = _topk_sets(brute)
    ann_sets = _topk_sets(ann)
    hits = sum(len(exact_sets[q] & ann_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    recall = hits / total
    assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9"


def test_ann_scores_fewer_pairs(emb, queries_df):
    """The LSH join must actually prune the candidate space."""
    n_corpus = emb.count()
    n_q = queries_df.count()
    cand = LS.ann_knn(emb, queries_df, k=n_corpus)  # keep every candidate
    n_cand = cand.count()
    # sf0.01's 500 near-random vectors are close to LSH's worst case
    # (top-10 neighbor cos ~0.31); even so the bucketed join must beat
    # all-pairs. Real clustered embeddings prune far harder.
    assert n_cand < 0.85 * n_q * (n_corpus - 1), (
        f"ANN scored {n_cand} of {n_q * (n_corpus - 1)} possible pairs"
    )


def test_embedding_near_dup_recall(emb):
    """LSH near-dup pairs vs brute force at cos >= 0.4."""
    rows = emb.collect()
    import numpy as np
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    iu = np.triu_indices(len(ids), 1)
    qual = S[iu] >= 0.4
    brute = {(int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
             for a, b in zip(iu[0][qual], iu[1][qual])}
    assert brute, "expected some pairs at this threshold"
    got = {(r.id_a, r.id_b)
           for r in LS.embedding_near_dup_pairs(emb, threshold=0.4).collect()}
    assert got <= brute or all(  # verification keeps only true pairs
        S[np.where(ids == a)[0][0], np.where(ids == b)[0][0]] >= 0.4 - 1e-12
        for a, b in got)
    recall = len(got & brute) / len(brute)
    assert recall >= 0.8, f"near-dup recall {recall:.3f} < 0.8"


def test_ivf_recall_and_pruning(emb, queries_df, brute):
    ivf = LS.ivf_knn(emb, queries_df, k=10, n_centroids=16, nprobe=8)
    got = _topk_sets(ivf.collect())
    exact = _topk_sets(brute)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.7, f"IVF recall {recall:.3f} < 0.7 (random-vector data)"
    # nprobe=n_centroids must be exhaustive within assignment: recall 1.0
    full = LS.ivf_knn(emb, queries_df, k=10, n_centroids=16, nprobe=16)
    full_sets = _topk_sets(full.collect())
    assert full_sets == exact


def test_normalize_and_quantize(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    u = LS.normalize_embeddings(df)
    rows = {r.vec_id: r for r in u.collect()}
    assert abs(rows[1].unit[0] - 0.6) < 1e-15
    assert abs(rows[1].unit[1] - 0.8) < 1e-15
    q = LS.quantize_embeddings(df)
    qr = {r.vec_id: list(r.q) for r in q.collect()}
    assert qr[1] == [round(3.0 / (4.0 / 127) + 0.5 - 0.5), 127] or qr[1][1] == 127
    assert max(abs(x) for x in qr[1]) <= 127
    assert qr[2] == [-127, 0]


def test_ivf_write_partition_pruned_scan(spark, tmp_path):
    """Stored-IVF probes must be partition-pruned scans: the plan reads
    only the probed cell directories, and results equal a full-scan
    filter."""
    import contextlib, io

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    C = LS.ivf_write(emb, path, n_centroids=8)
    assert C.shape[0] == 8
    probe = LS.ivf_scan_cells(spark, path, [0, 3])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p and "cell" in p
    full = spark.read.parquet(path)
    assert probe.count() == full.filter(F.col("cell").isin([0, 3])).count()
    assert probe.count() > 0
    # every row's nearest centroid really is its stored cell
    ids = {r.vec_id for r in probe.collect()}
    reassigned = emb.select(
        "vec_id",
        F.element_at(LS._cell_assign_udf(C, 1)(F.col("embedding")), 1)
        .alias("c")).filter(F.col("c").isin([0, 3]))
    assert ids == {r.vec_id for r in reassigned.collect()}


def test_ivf_append_extends_store_under_same_quantizer(spark, tmp_path):
    """Appended vectors land in the cells the ORIGINAL quantizer
    assigns, resident rows are untouched, pruned scans see both."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 150)
    new = emb.filter(F.col("vec_id") >= 150)
    path = str(tmp_path / "ivf")
    C = LS.ivf_write(old, path, n_centroids=8)
    before = {(r.vec_id, r.cell) for r in
              spark.read.parquet(path).select("vec_id", "cell").collect()}
    LS.ivf_append(new, path, C)
    after = {(r.vec_id, r.cell) for r in
             spark.read.parquet(path).select("vec_id", "cell").collect()}
    # resident assignment unchanged; total = old + new
    assert before <= after
    assert len(after) == emb.count()
    # every appended row sits in its nearest cell under the ORIGINAL C
    want = {(r.vec_id, r.c) for r in new.select(
        "vec_id",
        F.element_at(LS._cell_assign_udf(C, 1)(F.col("embedding")), 1)
        .alias("c")).collect()}
    assert want <= after
    # pruned scan still returns exactly the cells asked for
    probe = LS.ivf_scan_cells(spark, path, [0, 1])
    assert {r.cell for r in probe.select("cell").distinct().collect()} \
        <= {0, 1}
    # centroids are not optional
    import pytest as _pt
    with _pt.raises(ValueError, match="centroids"):
        LS.ivf_append(new, path, None)


def test_normalize_quantize_fast_matches_column_form(emb):
    cols = LS.quantize_embeddings(LS.normalize_embeddings(emb))
    fast = LS.normalize_quantize_fast(emb)
    a = {r.vec_id: (list(r.q), list(r.unit)) for r in cols.collect()}
    b = {r.vec_id: (list(r.q), list(r.unit)) for r in fast.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0], f"quantized mismatch at {k}"
        assert all(abs(x - y) < 1e-12
                   for x, y in zip(a[k][1], b[k][1]))


def test_auto_ivf_config_scales_with_corpus():
    # ~sqrt(n), clamped; nprobe ~ nc/8 with a floor of 4
    assert LS.auto_ivf_config(100) == (16, 4)
    assert LS.auto_ivf_config(2000) == (45, 5)
    assert LS.auto_ivf_config(20000) == (141, 17)
    nc, npb = LS.auto_ivf_config(100_000_000_000)
    assert nc == 4096 and npb == 512  # clamp holds at 100 TB scale


def test_ivf_knn_adaptive_defaults(emb, queries_df, brute):
    # defaults (no n_centroids/nprobe) must pick the auto config and
    # still hit the recall bar; centroids= without n_centroids infers
    # the codebook size from the matrix
    ivf = LS.ivf_knn(emb, queries_df, k=10)
    got = _topk_sets(ivf.collect())
    exact = _topk_sets(brute)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.5, f"adaptive IVF recall {recall:.3f}"
    C = LS.train_centroids(emb, 8)
    again = LS.ivf_knn(emb, queries_df, k=10, centroids=C, nprobe=8)
    # nprobe == len(C): exhaustive within assignment -> exact top-k
    assert _topk_sets(again.collect()) == exact


def test_train_centroids_clamps_to_sample():
    # asking for more centroids than sample rows must not crash
    from lindel_spark.session import get_spark
    spark = get_spark("test-clamp")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(5)
    C = LS.train_centroids(emb, 64)
    assert C.shape[0] == 5


def test_pq_roundtrip_and_recall(emb, queries_df, brute):
    books = LS.train_pq(emb, m=8, ks=256)
    assert books.shape[0] == 8 and books.shape[2] == 8  # 64-dim / 8
    codes = LS.pq_encode(emb, books)
    row = codes.first()
    assert len(row.code) == 8 and all(0 <= c < 256 for c in row.code)
    assert codes.count() == emb.count()
    exact = _topk_sets(brute)
    got = _topk_sets(
        LS.pq_knn(codes, queries_df, books, k=10,
                  refine_with=emb, refine=8).collect())
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.7, f"PQ refined recall {recall:.3f}"


def test_pq_codes_deterministic_under_layout(emb):
    books = LS.train_pq(emb, m=4, ks=32)
    a = {r.vec_id: tuple(r.code)
         for r in LS.pq_encode(emb, books).collect()}
    b = {r.vec_id: tuple(r.code)
         for r in LS.pq_encode(emb.repartition(11), books).collect()}
    assert a == b


def test_train_pq_rejects_bad_m(emb):
    import pytest as _pt
    with _pt.raises(ValueError, match="not divisible"):
        LS.train_pq(emb, m=7)


def test_ivf_pq_full_probe_equals_plain_pq(spark, emb):
    """With residual=False, probing every cell reduces IVF-PQ to plain
    PQ exactly — same codebooks, same refine, identical ranked output.
    (Under the residual default the code REPRESENTATION differs by
    construction, so this equivalence is the raw-layout contract.)"""
    from lindel_spark import similarity as LS
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % 100 == 0)
    books = LS.train_pq(emb, m=8, ks=64)
    cents = LS.train_centroids(emb, 8)
    codes = LS.ivf_pq_encode(emb, cents, books, residual=False)
    full = LS.ivf_pq_knn(emb, q, k=5, centroids=cents, codebooks=books,
                         codes=codes, nprobe=8, refine_with=emb, refine=4,
                         residual=False)
    plain = LS.pq_knn(LS.pq_encode(emb, books), q, books, k=5,
                      refine_with=emb, refine=4)
    fs = sorted((r.query_id, r.neighbor_id, r.rank) for r in full.collect())
    ps = sorted((r.query_id, r.neighbor_id, r.rank) for r in plain.collect())
    assert fs == ps and len(fs) > 0


def test_ivf_pq_residual_adc_matches_numpy_replay(spark, emb):
    """Residual IVFADC scores decompose as q·C[cell] + LUT(q, code):
    the unrefined full-probe Spark scores must equal a driver-side
    NumPy replay of exactly that decomposition."""
    import numpy as np
    from lindel_spark import similarity as LS
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = LS.train_centroids(emb, 8, spherical=False)
    books = LS.train_pq(emb, m=8, ks=64, centroids=cents)
    codes = LS.ivf_pq_encode(emb, cents, books)
    got = LS.ivf_pq_knn(emb, q, k=3, centroids=cents, codebooks=books,
                        codes=codes, nprobe=8).collect()

    code_rows = {r.vec_id: (r.cell, np.asarray(r.code, np.int64))
                 for r in codes.collect()}
    qvecs = {r.vec_id: np.asarray(r.embedding, np.float64)
             for r in q.collect()}
    m, ks, sub = books.shape
    assert len(got) > 0
    for r in got:
        qn = qvecs[r.query_id] / np.linalg.norm(qvecs[r.query_id])
        cell, code = code_rows[r.neighbor_id]
        lut = np.einsum("js,jcs->jc", qn.reshape(m, sub), books)
        expect = qn @ cents[cell] + lut[np.arange(m), code].sum()
        assert abs(r.cos - expect) < 1e-9, (r, expect)


def test_ivf_pq_residual_reconstruction_beats_raw(emb):
    """The point of residual encoding: reconstruction error of
    C[cell] + decode(code) under residual-trained books is strictly
    below decode(code) under raw-trained books at the same (m, ks)
    budget — the mechanism behind the recall-gate raise."""
    import numpy as np
    from lindel_spark import similarity as LS

    V = np.array([r.embedding for r in emb.select("embedding").collect()],
                 np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cents = LS.train_centroids(emb, 16, spherical=False)
    cells = np.argmax(LS._nearest_scores(Vn, cents), axis=1)
    books_raw = LS.train_pq(emb, m=8, ks=64)
    books_res = LS.train_pq(emb, m=8, ks=64, centroids=cents)
    m, ks, sub = books_raw.shape

    def decode(X, books):
        codes = LS._pq_codes_np(X, books)
        return np.concatenate(
            [books[j][codes[:, j]] for j in range(m)], axis=1)

    err_raw = ((Vn - decode(Vn, books_raw)) ** 2).sum(1).mean()
    rec_res = cents[cells] + decode(Vn - cents[cells], books_res)
    err_res = ((Vn - rec_res) ** 2).sum(1).mean()
    assert err_res < err_raw, (err_res, err_raw)


def test_ivf_pq_pruning_restricts_to_probed_cells(spark, emb):
    """With nprobe=1 every returned neighbor must live in its query's
    single probed cell (exact IVFADC semantics, not union-filtering)."""
    import numpy as np
    from lindel_spark import similarity as LS
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = LS.train_centroids(emb, 8)
    books = LS.train_pq(emb, m=8, ks=64)
    codes = LS.ivf_pq_encode(emb, cents, books)
    got = LS.ivf_pq_knn(emb, q, k=5, centroids=cents, codebooks=books,
                        codes=codes, nprobe=1)
    cell_of = {r.vec_id: r.cell for r in codes.select("vec_id", "cell").collect()}
    qrows = {r.vec_id: np.asarray(r.embedding, np.float64)
             for r in q.collect()}
    C = cents
    for r in got.collect():
        v = qrows[r.query_id]
        probe = int(np.argmax((v / np.linalg.norm(v)) @ C.T))
        assert cell_of[r.neighbor_id] == probe, r


def test_ivf_pq_codes_require_their_quantizer(spark, emb):
    """codes= without the centroids=/codebooks= that produced them is
    rejected — fresh training would silently probe the wrong cells."""
    import pytest
    from lindel_spark import similarity as LS
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = LS.train_centroids(emb, 8)
    books = LS.train_pq(emb, m=8, ks=64)
    codes = LS.ivf_pq_encode(emb, cents, books)
    with pytest.raises(ValueError, match="centroids.*codebooks"):
        LS.ivf_pq_knn(emb, q, k=5, codes=codes)
    with pytest.raises(ValueError, match="centroids.*codebooks"):
        LS.ivf_pq_knn(emb, q, k=5, codes=codes, codebooks=books)


def test_knn_join_exact_matches_brute(emb, queries_df, brute):
    """nprobe unset => every cell probed => exact: identical
    (query, neighbor, rank) to the broadcast brute-force path."""
    got = LS.knn_join(emb, queries_df, k=10, n_centroids=8).collect()
    a = {(r.query_id, r.rank): r.neighbor_id for r in brute}
    b = {(r.query_id, r.rank): r.neighbor_id for r in got}
    assert a == b


def test_knn_join_plan_no_cartesian(emb, queries_df):
    """The distributed path must be a cell-keyed equi-join: no
    CartesianProduct, no BroadcastNestedLoopJoin, and the query side
    is NOT collected (no driver data path in the plan)."""
    df = LS.knn_join(emb, queries_df, k=10, n_centroids=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_small_queries_delegates_to_broadcast(emb, queries_df,
                                                       brute):
    """Below broadcast_rows with no IVF config the broadcast
    brute-force path is used — same exact results."""
    got = LS.knn_join(emb, queries_df, k=10).collect()
    a = {(r.query_id, r.rank): r.neighbor_id for r in brute}
    b = {(r.query_id, r.rank): r.neighbor_id for r in got}
    assert a == b


def test_knn_join_nprobe_trades_recall(emb, queries_df, brute):
    """An ANN operating point (nprobe < n_centroids) keeps decent
    recall while scanning a fraction of cells."""
    got = LS.knn_join(emb, queries_df, k=10, n_centroids=16, nprobe=8)
    hits = 0
    want = _topk_sets(brute)
    have = _topk_sets(got.collect())
    total = sum(len(v) for v in want.values())
    for qid, s in want.items():
        hits += len(s & have.get(qid, set()))
    assert hits / total >= 0.8


def test_knn_join_pq_agrees_with_collect_path(emb, queries_df):
    """The distributed PQ query path must produce the SAME ranked
    result as the collect-based ivf_pq_knn under identical quantizers
    and probe settings (all cells probed, same exact-refine depth) —
    the two strategies differ only in where the queries live."""
    cents = LS.train_centroids(emb, 8, spherical=False)
    books = LS.train_pq(emb, m=8, ks=64, centroids=cents)
    codes = LS.ivf_pq_encode(emb, cents, books)
    a = LS.ivf_pq_knn(emb, queries_df, k=10, centroids=cents,
                      codebooks=books, codes=codes, nprobe=8,
                      refine_with=emb, refine=8).collect()
    b = LS.knn_join_pq(codes, queries_df, cents, books, k=10,
                       refine_with=emb, refine=8).collect()
    ra = {(r.query_id, r.rank): r.neighbor_id for r in a}
    rb = {(r.query_id, r.rank): r.neighbor_id for r in b}
    assert ra == rb


def test_knn_join_pq_plan_no_cartesian_no_collect(emb, queries_df):
    """The PQ distributed path must be a cell-keyed equi-join feeding
    Arrow-batch ADC scoring: no CartesianProduct, no
    BroadcastNestedLoopJoin (the refine joins are shuffled id joins —
    the query side is the unbounded one and must never broadcast)."""
    cents = LS.train_centroids(emb, 8)
    books = LS.train_pq(emb, m=8, ks=64)
    codes = LS.ivf_pq_encode(emb, cents, books)
    df = LS.knn_join_pq(codes, queries_df, cents, books, k=10,
                        refine_with=emb, refine=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_pq_unrefined_adc_ranks(emb, queries_df):
    """Without refine the output ranks by raw ADC scores — top-1 by
    ADC must match the collect-based pq scorer's top-1 under the same
    codebooks (sanity that LUT math is identical across paths —
    residual=False so the cell term drops and plain pq_knn is the
    reference)."""
    cents = LS.train_centroids(emb, 8)
    books = LS.train_pq(emb, m=8, ks=64)
    codes = LS.ivf_pq_encode(emb, cents, books, residual=False)
    got = LS.knn_join_pq(codes, queries_df, cents, books, k=5,
                         residual=False).collect()
    ref = LS.pq_knn(codes.drop("cell"), queries_df, books, k=5).collect()
    a = {(r.query_id, r.rank): r.neighbor_id for r in got}
    b = {(r.query_id, r.rank): r.neighbor_id for r in ref}
    assert a == b


# ---------------------------------------------------------------------------
# round-10 size-bound auto-routing (round-9 verdict item 3)
# ---------------------------------------------------------------------------

def _rows_key(rows):
    return sorted((r.query_id, r.neighbor_id, round(r.cos, 9), r.rank)
                  for r in rows)


def test_pq_knn_routes_large_queries_distributed(emb, queries_df):
    """pq_knn above max_collect_rows takes the salted distributed plan
    — value-identical (same ADC math, same tie-breaks) to the
    collect-based route, with and without exact refine."""
    books = LS.train_pq(emb, m=8)
    codes = LS.pq_encode(emb, books)
    for refine_with in (None, emb):
        small = LS.pq_knn(codes, queries_df, books, k=5,
                          refine_with=refine_with)
        large = LS.pq_knn(codes, queries_df, books, k=5,
                          refine_with=refine_with, max_collect_rows=1)
        assert _rows_key(large.collect()) == _rows_key(small.collect())
    # the forced-distributed plan is a shuffle equi-join, never a
    # cartesian, and carries the Arrow scorer
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_pq_knn_routes_large_queries_to_knn_join_pq(emb,
                                                        queries_df):
    """ivf_pq_knn above max_collect_rows delegates to knn_join_pq —
    same IVFADC semantics, query side never collected. With every cell
    probed both routes are exhaustive and value-identical."""
    C = LS.train_centroids(emb, 16)
    books = LS.train_pq(emb, m=8)
    codes = LS.ivf_pq_encode(emb, C, books)
    small = LS.ivf_pq_knn(None, queries_df, k=5, centroids=C,
                          codebooks=books, codes=codes,
                          nprobe=len(C), refine_with=emb)
    large = LS.ivf_pq_knn(None, queries_df, k=5, centroids=C,
                          codebooks=books, codes=codes,
                          nprobe=len(C), refine_with=emb,
                          max_collect_rows=1)
    assert _rows_key(large.collect()) == _rows_key(small.collect())


def test_ann_knn_large_queries_drop_broadcast(emb, queries_df):
    """ann_knn above broadcast_rows keeps the band-keyed equi-join but
    stops broadcasting the query side: the physical plan switches from
    BroadcastHashJoin to a shuffle join, values unchanged."""
    small = LS.ann_knn(emb, queries_df, k=5)
    large = LS.ann_knn(emb, queries_df, k=5, broadcast_rows=1)
    assert _rows_key(large.collect()) == _rows_key(small.collect())
    plan_large = large._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan_large
    assert "BroadcastNestedLoopJoin" not in plan_large
    # the large route must not PIN a broadcast: no hint in the logical
    # plan (AQE may still choose broadcast at runtime when the actual
    # exchange is tiny — as here — which is exactly the point: the
    # strategy is left to size facts, not forced by the operator)
    log_small = small._jdf.queryExecution().optimizedPlan().toString()
    log_large = large._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in log_small
    assert "strategy=broadcast" not in log_large


def test_lloyd_refinement_improves_skewed_inertia(spark):
    """Round-10 distributed Lloyd refinement: on a corpus whose driver
    sample (a LIMIT — first rows) misses whole clusters, full-corpus
    refine iterations produce centroids with inertia <= the
    sample-only codebook's (mean cosine to nearest centroid >=)."""
    import numpy as np

    rng = np.random.RandomState(7)
    # 4 well-separated clusters in 16-d; the first 64 rows (the
    # sample) come from cluster 0 ONLY — sample-only training cannot
    # see the other three
    centers = rng.randn(4, 16) * 4
    rows = []
    vid = 0
    for _ in range(64):
        rows.append((vid, (centers[0] + rng.randn(16) * 0.1).tolist()))
        vid += 1
    for c in (1, 2, 3):
        for _ in range(200):
            rows.append(
                (vid, (centers[c] + rng.randn(16) * 0.1).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .coalesce(1)  # keep LIMIT deterministic: first rows = cluster 0

    C0 = LS.train_centroids(df, 4, sample_limit=64)
    C1 = LS.train_centroids(df, 4, sample_limit=64, refine_iters=4)

    V = np.array([r[1] for r in rows], np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def inertia(C):
        return float(np.mean(1.0 - np.max(Vn @ np.asarray(C).T, axis=1)))

    i0, i1 = inertia(C0), inertia(C1)
    assert i1 <= i0
    # and the refinement must recover a material part of the missed
    # structure (Lloyd cannot always split a degenerate seed, so the
    # bar is a large relative improvement, not global optimality)
    assert i1 <= 0.5 * i0, (i0, i1)


def test_lloyd_refine_zero_iters_is_identity(emb):
    """refine_iters=0 (the default) leaves the sample-trained codebook
    bit-identical — existing IVF/PQ recall entries are untouched."""
    import numpy as np

    a = LS.train_centroids(emb, 16)
    b = LS.train_centroids(emb, 16, refine_iters=0)
    assert np.array_equal(a, b)


def test_ivf_knn_large_queries_drop_broadcast(emb, queries_df):
    """ivf_knn above broadcast_rows keeps the cell-keyed equi-join but
    stops pinning the broadcast — values unchanged, no hint in the
    logical plan."""
    small = LS.ivf_knn(emb, queries_df, k=5, n_centroids=16, nprobe=16)
    large = LS.ivf_knn(emb, queries_df, k=5, n_centroids=16, nprobe=16,
                       broadcast_rows=1)
    assert _rows_key(large.collect()) == _rows_key(small.collect())
    log_large = large._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in log_large


def test_hard_negatives_candidates_path_matches_exact(emb, queries_df):
    """The ANN-overfetch candidates path (knn_join output, k*4) must
    reproduce the exact path's top-k once exclusions are applied —
    the production recipe for mining at corpus scale."""
    positives = queries_df.select(
        F.col("vec_id").alias("anchor_id"),
        (F.col("vec_id") + 1).alias("item_id"))
    exact = LS.hard_negatives(emb, queries_df, positives, k=5)
    cands = LS.knn_join(emb, queries_df, k=5 * 4, n_centroids=16,
                        nprobe=None)  # exact candidate set
    via = LS.hard_negatives(emb, queries_df, positives, k=5,
                            candidates=cands)
    key = lambda df: sorted(  # noqa: E731
        (r.anchor_id, r.rank, r.item_id, r.cos_r) for r in df.collect())
    assert key(via) == key(exact)


def test_hard_negatives_excludes_positives(emb, queries_df):
    """No (anchor, positive) pair survives, and ranks stay dense 1..k."""
    positives = queries_df.select(
        F.col("vec_id").alias("anchor_id"),
        (F.col("vec_id") + 1).alias("item_id"))
    got = LS.hard_negatives(emb, queries_df, positives, k=5).collect()
    banned = {(r.anchor_id, r.item_id) for r in positives.collect()}
    assert not any((r.anchor_id, r.item_id) in banned for r in got)
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 6))
               for v in by_anchor.values())


def test_propagate_labels_majority_and_tiebreak(spark):
    # 2-D unit-ish vectors: cluster A near (1,0) labeled 0 (x2) and 1
    # (x1); cluster B near (0,1) labeled 7. k=3 -> A-probe majority 0;
    # B-probe gets all three A/B... construct probe exactly on B.
    labeled = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (2, [0.99, 0.1], 0), (4, [0.98, 0.15], 1),
         (6, [0.0, 1.0], 7), (8, [0.1, 0.99], 7)],
        "vec_id long, embedding array<double>, label long")
    probes = spark.createDataFrame(
        [(101, [0.97, 0.05]), (103, [0.05, 0.97])],
        "vec_id long, embedding array<double>")
    from lindel_spark.similarity import propagate_labels
    got = {r.vec_id: (r.predicted_label, r.votes)
           for r in propagate_labels(labeled, probes, k=3).collect()}
    assert got[101] == (0, 2)          # two 0-votes beat one 1-vote
    # probe 103: neighbors are 6, 8 (label 7) and one A vector -> 7
    assert got[103][0] == 7 and got[103][1] == 2


def test_propagate_labels_tie_prefers_smaller_label(spark):
    labeled = spark.createDataFrame(
        [(0, [1.0, 0.0], 5), (2, [0.0, 1.0], 3)],
        "vec_id long, embedding array<double>, label long")
    probes = spark.createDataFrame(
        [(11, [1.0, 1.0])], "vec_id long, embedding array<double>")
    from lindel_spark.similarity import propagate_labels
    r = propagate_labels(labeled, probes, k=2).collect()[0]
    assert (r.predicted_label, r.votes) == (3, 1)  # 1-1 tie -> label 3


def test_arrow_cosine_bit_identical_to_expression_fold(spark):
    """_cos_exact_udf must equal the interpreted sequential fold
    BITWISE on adversarial float32 inputs — the contract that lets
    the cell joins score via Arrow without perturbing oracle
    hashes."""
    import random
    import numpy as np
    from lindel_spark.similarity import (cosine_similarity,
                                         _cos_exact_udf)
    rng = random.Random(11)
    rows = []
    for i in range(500):
        d = rng.choice([3, 17, 64])
        rows.append((i,
                     [rng.uniform(-1e3, 1e3) for _ in range(d)],
                     [rng.uniform(-1e3, 1e3) for _ in range(d)]))
    # group same-dim rows so np.stack sees rectangular batches
    rows.sort(key=lambda r: len(r[1]))
    dfs = []
    for d in (3, 17, 64):
        part = [r for r in rows if len(r[1]) == d]
        dfs.append(spark.createDataFrame(
            part, "id long, a array<float>, b array<float>"))
    for df in dfs:
        got = df.select(
            "id",
            cosine_similarity(F.col("a"), F.col("b")).alias("expr"),
            _cos_exact_udf()(F.col("a"), F.col("b")).alias("arrow"),
        ).collect()
        for r in got:
            assert r.expr == r.arrow, (r.id, r.expr, r.arrow)


# ---------------------------------------------------------------------------
# round-11 size-bound auto-routing (round-10 verdict item 2): the last
# two collect()/broadcast-ceiling entry points
# ---------------------------------------------------------------------------

def test_brute_force_knn_fast_routes_large_queries(emb, queries_df):
    """brute_force_knn_fast above max_collect_rows routes through
    knn_join ALL-PROBE — exact (every pair scored once), no query
    collect, identical ids/ranks; cos agrees to 1e-9 (BLAS matmul vs
    sequential-accumulate fp summation orders)."""
    small = LS.brute_force_knn_fast(emb, queries_df, k=5)
    large = LS.brute_force_knn_fast(emb, queries_df, k=5,
                                    max_collect_rows=1)
    a, b = small.collect(), large.collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id) for r in rows)
    assert key(a) == key(b)
    ca = {(r.query_id, r.neighbor_id): r.cos for r in a}
    assert all(abs(ca[(r.query_id, r.neighbor_id)] - r.cos) < 1e-9
               for r in b)
    plan = large._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hard_negatives_routes_large_anchors(emb, queries_df):
    """hard_negatives above max_collect_rows auto-routes through the
    knn_join all-probe overfetch + the existing anti-join/rank tail —
    value-identical to the broadcast-anchor exact path (same
    _cos_exact_udf scores both routes, so cos_r is bit-equal)."""
    positives = queries_df.select(
        F.col("vec_id").alias("anchor_id"),
        (F.col("vec_id") + 1).alias("item_id"))
    exact = LS.hard_negatives(emb, queries_df, positives, k=5)
    routed = LS.hard_negatives(emb, queries_df, positives, k=5,
                               max_collect_rows=1)
    key = lambda df: sorted(  # noqa: E731
        (r.anchor_id, r.rank, r.item_id, r.cos_r) for r in df.collect())
    assert key(routed) == key(exact)
    # the routed plan must not pin a broadcast of the anchor frame
    log = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in log


# ---------------------------------------------------------------------------
# round 11: multi-round label propagation
# ---------------------------------------------------------------------------

def test_propagate_multi_one_round_bit_identical(emb, queries_df):
    """rounds=1, no threshold: output must be propagate_labels plus a
    round=1 column, row-for-row."""
    seeds = emb.filter(F.col("vec_id") % 2 == 0)
    probes = emb.filter(F.col("vec_id") % 20 == 1)
    one = LS.propagate_labels(seeds, probes, k=5, n_centroids=16)
    multi = LS.propagate_labels_multi(seeds, probes, k=5, rounds=1,
                                      n_centroids=16)
    a = sorted((r.vec_id, r.predicted_label, r.votes)
               for r in one.collect())
    b = sorted((r.vec_id, r.predicted_label, r.votes, r.round)
               for r in multi.collect())
    assert [(i, p, v, 1) for i, p, v in a] == b


def test_propagate_multi_converges_through_rounds(spark):
    """Two-cluster synthetic: a midpoint probe splits its 2-NN vote
    1-1 in round 1 (below the unanimous threshold), then adopts in
    round 2 through the round-1 adoptee that sits between it and its
    cluster — the label flowed one hop per round."""
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.99, 0.14], 0),
         (2, [0.0, 1.0], 7), (3, [0.14, 0.99], 7)],
        "vec_id long, embedding array<double>, label long")
    probes = spark.createDataFrame(
        [(10, [0.9, 0.44]),    # 2-NN both cluster-A -> round 1
         (11, [0.74, 0.67])],  # 2-NN split A/B -> round 2 via 10
        "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.predicted_label, r.votes, r.round)
           for r in LS.propagate_labels_multi(
               seeds, probes, k=2, rounds=3, min_votes=2).collect()}
    assert got[10] == (0, 2, 1)
    assert got[11][0] == 0 and got[11][2] == 2


def test_propagate_multi_below_threshold_rows_absent(spark):
    """A probe that never reaches min_votes stays unlabeled (absent),
    and the loop early-stops when a round adopts nothing."""
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (2, [0.0, 1.0], 7)],
        "vec_id long, embedding array<double>, label long")
    probes = spark.createDataFrame(
        [(11, [1.0, 1.0])],  # exact 1-1 split forever
        "vec_id long, embedding array<double>")
    out = LS.propagate_labels_multi(seeds, probes, k=2, rounds=4,
                                    min_votes=2).collect()
    assert out == []


def test_propagate_multi_validates(spark):
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label long")
    probes = spark.createDataFrame(
        [(1, [1.0, 0.1])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="rounds"):
        LS.propagate_labels_multi(seeds, probes, rounds=0)
    with pytest.raises(ValueError, match="min_votes"):
        LS.propagate_labels_multi(seeds, probes, k=3, min_votes=9)


def test_random_project_matches_numpy_and_preserves_distance(spark):
    import numpy as np

    from lindel_spark.similarity import projection_signs, random_project

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 32)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>")
    k = 16
    out = random_project(df, "embedding", in_dim=32, out_dim=k)
    got = {r.vec_id: np.array(r.projected)
           for r in out.select("vec_id", "projected").collect()}
    S = np.array(projection_signs(32, k), dtype=float)  # (k, 32)
    want = (vecs.astype(float) @ S.T) / np.sqrt(k)
    for i in range(40):
        np.testing.assert_allclose(got[i], want[i], atol=1e-9)
    # JL distance preservation, loose bound for k=16
    d_in = np.linalg.norm(vecs[:, None, :].astype(float)
                          - vecs[None, :, :], axis=2)
    P = np.stack([want[i] for i in range(40)])
    d_out = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=2)
    iu = np.triu_indices(40, 1)
    ratio = d_out[iu] / d_in[iu]
    assert 0.4 < ratio.min() and ratio.max() < 2.1
    assert abs(np.median(ratio) - 1.0) < 0.2


def test_random_project_deterministic_across_seeds_and_layout(spark):
    from lindel_spark.similarity import random_project

    df = spark.createDataFrame(
        [(i, [float(i), 1.0, -2.0]) for i in range(10)],
        "vec_id long, embedding array<float>")
    a = {r.vec_id: tuple(r.projected) for r in
         random_project(df, in_dim=3, out_dim=4).collect()}
    b = {r.vec_id: tuple(r.projected) for r in
         random_project(df.repartition(5), in_dim=3,
                        out_dim=4).collect()}
    assert a == b
    c = {r.vec_id: tuple(r.projected) for r in
         random_project(df, in_dim=3, out_dim=4,
                        seed="other").collect()}
    assert a != c

    import pytest
    with pytest.raises(ValueError):
        random_project(df, in_dim=3, out_dim=0)


def test_ivf_health_hand_computed(spark, tmp_path):
    import math

    from lindel_spark.similarity import ivf_health

    # fake store layout: hive 'cell' partitions with known sizes
    rows = ([(i, 0) for i in range(8)] + [(100 + i, 1) for i in range(2)]
            + [(200 + i, 3) for i in range(6)])
    df = spark.createDataFrame(rows, "vec_id long, cell int")
    path = str(tmp_path / "ivf")
    df.write.partitionBy("cell").parquet(path)
    h = ivf_health(spark, path, n_centroids=5).collect()[0]
    assert h.n_vectors == 16 and h.cells_used == 3
    assert h.cells_total == 5 and h.empty_cells == 2
    assert h.min_cell == 2 and h.max_cell == 8
    assert abs(h.max_share - 8 / 16) < 1e-12
    want_H = math.log(16) - (8 * math.log(8) + 2 * math.log(2)
                             + 6 * math.log(6)) / 16
    assert abs(h.balance_entropy - want_H) < 1e-12
    want_scan = (64 + 4 + 36) / 256
    assert abs(h.expected_scan_frac - want_scan) < 1e-12

    import pytest
    with pytest.raises(ValueError):
        ivf_health(spark, path, n_centroids=0)


# ---------------------------------------------------------------------------
# round-12 OPQ rotation (r11 verdict task 6)
# ---------------------------------------------------------------------------

def test_opq_rotation_orthogonal_and_identity_on_isotropic(spark):
    import numpy as np

    # isotropic: one-hot basis vectors, each direction equally loaded
    rows = [(i * 8 + j, [1.0 if t == j else 0.0 for t in range(8)])
            for i in range(10) for j in range(8)]
    iso = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    R = LS.opq_rotation(iso, m=4)
    assert np.allclose(R, np.eye(8)), "flat spectrum must be identity"

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    R2 = LS.opq_rotation(emb, m=8)
    assert np.allclose(R2 @ R2.T, np.eye(R2.shape[0]), atol=1e-10)
    import pytest as _pt
    with _pt.raises(ValueError, match="not divisible"):
        LS.opq_rotation(emb, m=7)


def test_opq_reduces_quantization_error(spark, emb):
    """The OPQ objective: reconstruction MSE under the rotation is
    below unrotated PQ at the same (m, ks) budget — on the driver
    embeddings AND on a constructed anisotropic set (geometric
    per-dim variances, where eigenvalue allocation must spread the
    heavy directions across subquantizers)."""
    import numpy as np

    def mse(X, books):
        m = books.shape[0]
        codes = LS._pq_codes_np(X, books)
        rec = np.concatenate([books[j][codes[:, j]] for j in range(m)],
                             axis=1)
        return ((X - rec) ** 2).sum(1).mean()

    def check(df, m, ks):
        V = np.array([r.embedding for r in
                      df.select("embedding").collect()], np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        R = LS.opq_rotation(df, m=m)
        raw = mse(Vn, LS.train_pq(df, m=m, ks=ks))
        rot = mse(Vn @ R.T, LS.train_pq(df, m=m, ks=ks, rotation=R))
        assert rot < raw, (rot, raw)

    check(emb, m=8, ks=64)
    rng = np.random.RandomState(7)
    sigma = np.geomspace(8.0, 0.05, 16)
    V = rng.randn(600, 16) * sigma
    aniso = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(600)],
        "vec_id long, embedding array<double>")
    check(aniso, m=4, ks=32)


def test_pq_knn_rotation_route_parity(emb, queries_df):
    """Rotation flows through BOTH pq_knn routes (collect-based LUT
    and the salted distributed plan) value-identically."""
    R = LS.opq_rotation(emb, m=8)
    books = LS.train_pq(emb, m=8, ks=64, rotation=R)
    codes = LS.pq_encode(emb, books, rotation=R)
    small = LS.pq_knn(codes, queries_df, books, k=5, rotation=R,
                      refine_with=emb)
    large = LS.pq_knn(codes, queries_df, books, k=5, rotation=R,
                      refine_with=emb, max_collect_rows=1)
    assert _rows_key(large.collect()) == _rows_key(small.collect())


def test_opq_refined_recall_floor(emb, queries_df, brute):
    """Production shape (rotation + exact refine) clears the same 0.7
    floor as unrotated refined PQ — rotation must never break the
    two-stage recipe. (Unrefined recall on these near-isotropic
    driver embeddings differs from raw PQ by ±0.01 — rank-flip noise;
    the rotation's contract is the MSE test above.)"""
    n = emb.count()
    R = LS.opq_rotation(emb, m=8)
    books = LS.train_pq(emb, m=8, ks=256, rotation=R)
    codes = LS.pq_encode(emb, books, rotation=R)
    got = _topk_sets(
        LS.pq_knn(codes, queries_df, books, k=10, rotation=R,
                  refine_with=emb, refine=max(8, n // 250)).collect())
    exact = _topk_sets(brute)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.7, f"OPQ refined recall {recall:.3f}"


def test_opq_residual_composition_matches_numpy_replay(spark, emb):
    """OPQ × IVFADC composition: cells assign in the ORIGINAL space
    (L2-nearest is rotation-invariant), the residual rotates before
    coding, and ADC decomposes as q·C[cell] + (R·q)·r̃ — the
    unrefined full-probe Spark scores must equal the NumPy replay of
    exactly that."""
    import numpy as np
    from pyspark.sql import functions as F

    q = emb.filter(F.col("vec_id") % 100 == 0)
    cents = LS.train_centroids(emb, 8, spherical=False)
    R = LS.opq_rotation(emb, m=8)
    books = LS.train_pq(emb, m=8, ks=64, centroids=cents, rotation=R)
    codes = LS.ivf_pq_encode(emb, cents, books, rotation=R)
    got = LS.ivf_pq_knn(emb, q, k=3, centroids=cents, codebooks=books,
                        codes=codes, nprobe=8, rotation=R).collect()

    code_rows = {r.vec_id: (r.cell, np.asarray(r.code, np.int64))
                 for r in codes.collect()}
    qvecs = {r.vec_id: np.asarray(r.embedding, np.float64)
             for r in q.collect()}
    m, ks, sub = books.shape
    assert len(got) > 0
    for r in got:
        qn = qvecs[r.query_id] / np.linalg.norm(qvecs[r.query_id])
        cell, code = code_rows[r.neighbor_id]
        qr = R @ qn
        lut = np.einsum("js,jcs->jc", qr.reshape(m, sub), books)
        expect = qn @ cents[cell] + lut[np.arange(m), code].sum()
        assert abs(r.cos - expect) < 1e-9, (r, expect)


def test_opq_residual_composition_route_parity(emb, queries_df):
    """Residual + rotation flows through BOTH ivf_pq_knn routes
    (collect LUT and knn_join_pq) value-identically."""
    cents = LS.train_centroids(emb, 16, spherical=False)
    R = LS.opq_rotation(emb, m=8)
    books = LS.train_pq(emb, m=8, ks=64, centroids=cents, rotation=R)
    codes = LS.ivf_pq_encode(emb, cents, books, rotation=R)
    small = LS.ivf_pq_knn(None, queries_df, k=5, centroids=cents,
                          codebooks=books, codes=codes, nprobe=16,
                          refine_with=emb, rotation=R)
    large = LS.ivf_pq_knn(None, queries_df, k=5, centroids=cents,
                          codebooks=books, codes=codes, nprobe=16,
                          refine_with=emb, rotation=R,
                          max_collect_rows=1)
    assert _rows_key(large.collect()) == _rows_key(small.collect())


def test_opq_residual_composition_reduces_error_on_anisotropic(spark):
    """On a variance-skewed set the composed layout (rotate the
    residual before coding) reconstructs at least as well as residual
    alone at the same budget — the reason the seam was closed."""
    import numpy as np

    rng = np.random.RandomState(11)
    sigma = np.geomspace(8.0, 0.05, 16)
    V = rng.randn(600, 16) * sigma
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(600)],
        "vec_id long, embedding array<double>")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    cents = LS.train_centroids(df, 8, spherical=False)
    cells = np.argmax(LS._nearest_scores(Vn, cents), axis=1)
    res = Vn - cents[cells]
    m = 4

    def mse(X, books):
        codes = LS._pq_codes_np(X, books)
        rec = np.concatenate([books[j][codes[:, j]] for j in range(m)],
                             axis=1)
        return ((X - rec) ** 2).sum(1).mean()

    books_res = LS.train_pq(df, m=m, ks=32, centroids=cents)
    R = LS.opq_rotation(df, m=m)
    books_both = LS.train_pq(df, m=m, ks=32, centroids=cents, rotation=R)
    e_res = mse(res, books_res)
    e_both = mse(res @ R.T, books_both)
    assert e_both < e_res * 1.001, (e_both, e_res)


def test_silhouette_two_blobs_high_and_shared_assignment(spark):
    """Two tight, well-separated blobs with their exact centers as
    centroids: simplified silhouette near 1; per-cell counts match;
    constructed overlap drives it toward 0."""
    import numpy as np

    rng = np.random.RandomState(3)
    A = np.array([1.0] + [0.0] * 7) + rng.randn(60, 8) * 0.02
    B = np.array([0.0] * 7 + [1.0]) + rng.randn(60, 8) * 0.02
    V = np.vstack([A, B])
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<double>")
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = np.vstack([Vn[:60].mean(0), Vn[60:].mean(0)])
    rows = {r.cell: r for r in
            LS.silhouette_by_cell(df, C).collect()}
    assert sum(r.n_vectors for r in rows.values()) == 120
    assert all(r.mean_s > 0.9 for r in rows.values()), rows
    # one shared centroid twice -> b == a is impossible; instead test
    # an overlapping blob pair: silhouette collapses toward 0
    O = np.vstack([A, A + rng.randn(60, 8) * 0.002])
    df2 = spark.createDataFrame(
        [(int(i), [float(x) for x in O[i]]) for i in range(len(O))],
        "vec_id long, embedding array<double>")
    On = O / np.linalg.norm(O, axis=1, keepdims=True)
    C2 = np.vstack([On[:60].mean(0), On[60:].mean(0)])
    rows2 = LS.silhouette_by_cell(df2, C2).collect()
    overall = sum(r.n_vectors * r.mean_s for r in rows2) / 120
    assert overall < 0.2, overall
    import pytest as _pt
    with _pt.raises(ValueError, match="2 centroids"):
        LS.silhouette_by_cell(df, C[:1])


def test_silhouette_matches_numpy_replay(emb):
    import numpy as np

    C = LS.train_centroids(emb, 8)
    rows = LS.silhouette_by_cell(emb, C).collect()
    V = np.array([r.embedding for r in
                  emb.select("embedding").collect()], np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    d2 = np.maximum(1.0 + (C * C).sum(1)[None, :] - 2.0 * (Vn @ C.T),
                    0.0)
    order = np.argsort(d2, axis=1, kind="stable")
    a = np.sqrt(d2[np.arange(len(Vn)), order[:, 0]])
    b = np.sqrt(d2[np.arange(len(Vn)), order[:, 1]])
    s = (b - a) / np.maximum(np.maximum(a, b), 1e-300)
    for r in rows:
        mask = order[:, 0] == r.cell
        assert r.n_vectors == int(mask.sum())
        assert abs(r.mean_s - float(s[mask].mean())) < 1e-12
