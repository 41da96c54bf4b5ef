"""SemDeDup semantic dedup on handcrafted clustered vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lindel_spark import similarity as LS


def _vec(base, jitter, rng, dim=8):
    v = base + jitter * rng.standard_normal(dim)
    return [float(x) for x in v]


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(3)
    a = rng.standard_normal(8) * 4
    b = rng.standard_normal(8) * 4
    rows = []
    # two tight groups of near-dups plus two isolated vectors
    for i in range(3):
        rows.append((i, _vec(a, 0.05, rng)))
    for i in range(3, 5):
        rows.append((i, _vec(b, 0.05, rng)))
    rows.append((5, _vec(rng.standard_normal(8) * 4, 0.0, rng)))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_dup_pairs_finds_within_cluster_dups(spark, clustered):
    pairs = LS.semantic_dup_pairs(clustered, threshold=0.95, n_clusters=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= got
    assert all(a < b for a, b in got)
    assert not any(5 in p for p in got)


def test_semantic_dedup_keeps_smallest_id_per_group(spark, clustered):
    kept = LS.semantic_dedup(clustered, threshold=0.95, n_clusters=3)
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert ids == [0, 3, 5]


def test_semantic_dedup_preserves_schema(spark, clustered):
    kept = LS.semantic_dedup(clustered, threshold=0.95, n_clusters=3)
    assert kept.columns == clustered.columns


def test_semantic_dedup_no_dups_is_identity(spark):
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8) * 4])
            for i in range(6)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kept = LS.semantic_dedup(df, threshold=0.999, n_clusters=2)
    assert kept.count() == 6


def test_semantic_pairs_join_is_cell_keyed_not_cartesian(spark, clustered):
    pairs = LS.semantic_dup_pairs(clustered, threshold=0.95, n_clusters=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
