"""Isolate the r03 knn_brute_fast bench regression.

Times knn_brute_fast (and dedup_simhash_pairs) in three regimes:
  A. alone in a fresh session
  B. after the bench's preceding entries (replaying leaked persists)
  C. same as B but with spark.catalog.clearCache() between entries

Usage: python scripts/probe_knn_regression.py [A|B|C]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MODE = sys.argv[1] if len(sys.argv) > 1 else "A"


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    from lindel_spark import dedup as LD
    from lindel_spark import functions as LF
    from lindel_spark import similarity as LS
    from lindel_spark import text as LT
    from lindel_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("probe")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    li.count(); docs.count(); emb.count()

    i2 = [F.col("l_orderkey").cast("int"), F.col("l_partkey").cast("int")]
    d2 = [F.col("l_extendedprice"), F.col("l_discount")]

    def run4(fn, name):
        fn()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        print(f"{name}: {med:.3f}s  (runs: {[round(t,3) for t in times]})",
              flush=True)
        return med

    def q_knn_fast():
        queries_df = emb.filter(F.col("vec_id") % 50 == 0)
        _noop(LS.brute_force_knn_fast(emb, queries_df, k=10))

    def q_dedup_simhash():
        _noop(LD.simhash_near_dup_pairs(docs))

    if MODE == "A":
        run4(q_knn_fast, "knn_brute_fast[alone]")
        spark.catalog.clearCache()
        run4(q_dedup_simhash, "dedup_simhash[after knn, cleared]")
    else:
        preceding = [
            ("hilbert_i32", lambda: _noop(
                li.select(LF.hilbert_encode(i2, "int32").alias("h")))),
            ("hilbert_f64", lambda: _noop(
                li.select(LF.hilbert_encode(d2, "float64").alias("h")))),
            ("text_stats", lambda: _noop(LT.text_stats(docs))),
            ("dedup_near", lambda: _noop(LD.near_dup_pairs(docs))),
            ("dedup_simhash", q_dedup_simhash),
        ]
        for name, fn in preceding:
            run4(fn, name)
            if MODE == "C":
                spark.catalog.clearCache()
        run4(q_knn_fast, f"knn_brute_fast[after-prefix mode={MODE}]")
        sc = spark.sparkContext._jsc.sc()
        n_cached = sc.getRDDStorageInfo()
        print(f"cached RDD blocks at end: {len(n_cached)}")


if __name__ == "__main__":
    main()
