"""Dump .explain('formatted') for registry queries to plans/<tag>/.

Usage::

    python scripts/dump_plans.py <tag-dir> <suffix> query [query ...]

Writes ``plans/<tag-dir>/<query>_<suffix>.txt``. For queries whose
operator collects driver-side (e.g. the PCA power iteration), the
returned frame is a LocalTableScan; pass ``--internal`` names listed
in ``INTERNAL`` below to dump the operator's distributed subplan
instead.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _pca_internal(spark):
    """The PCA operator's distributed step (the returned frame is a
    driver-side LocalTableScan in both formulations)."""
    from lindel_spark import similarity as LS
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    vecs = emb.select(
        F.transform(F.col("embedding"), lambda x: x.cast("double"))
        .alias("__v")).filter(F.col("__v").isNotNull())
    core = LS._pca_power_core
    src = core.__code__
    if "mapInPandas" in src.co_names or any(
            "_gram" in str(c) for c in src.co_consts):
        # round-15 Gram formulation: one mapInPandas pass + one
        # (pos)-keyed aggregate
        import numpy as np  # noqa: F401
        import pandas as pd

        d = 64

        def _gram(batches):
            import numpy as np
            G = np.zeros((d, d), np.float64)
            s = np.zeros(d, np.float64)
            c = 0
            for pdf in batches:
                X = np.array([np.asarray(v, np.float64)
                              for v in pdf["__v"]], np.float64)
                G += X.T @ X
                s += X.sum(axis=0)
                c += X.shape[0]
            if c:
                flat = np.concatenate([G.ravel(), s, [float(c)]])
                yield pd.DataFrame({"part": [flat.tolist()]})

        parts = vecs.mapInPandas(_gram, "part array<double>")
        return (parts.select(F.posexplode("part").alias("pos", "x"))
                .groupBy("pos").agg(F.sum("x").alias("s")))
    # pre-round-15: one per-iteration dot + posexplode + groupBy
    v = [1.0 / 8.0] * 64
    lit_v = F.array(*[F.lit(x) for x in v])
    dot = F.aggregate(
        F.zip_with("__v", lit_v, lambda x, s: x * s),
        F.lit(0.0), lambda acc, x: acc + x)
    return (vecs.select(F.posexplode("__v").alias("pos", "x"),
                        dot.alias("__d"))
            .groupBy("pos")
            .agg(F.sum(F.col("x") * F.col("__d")).alias("s")))


INTERNAL = {"embedding_pca_component": _pca_internal}


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--executed"]
    executed = "--executed" in sys.argv[1:]
    tag, suffix, names = argv[0], argv[1], argv[2:]
    import __spark_entry__ as E
    from lindel_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("plan-dump")
    qs = E.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        if executed:
            # execute the query's OWN QueryExecution (collect — all
            # registry queries return oracle-collected, query-sized
            # results), then dump the POST-AQE executed plan — the
            # evidence static dumps cannot carry (ReusedExchange,
            # AQEShuffleRead, runtime join rewrites appear only here)
            df.collect()
            txt = df._jdf.queryExecution().executedPlan().toString()
        else:
            txt = _explain_str(df)
        if name in INTERNAL:
            txt += ("\n\n-- internal distributed step (the returned "
                    "frame is a driver-side LocalTableScan) --\n\n")
            txt += _explain_str(INTERNAL[name](spark))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print("wrote", path, len(txt), "bytes")


if __name__ == "__main__":
    main()
