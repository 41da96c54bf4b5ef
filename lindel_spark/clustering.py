"""Density clustering as DataFrame programs: exact 2-D grid DBSCAN
composed from the package's own primitives — the Morton-cell spatial
range join (:func:`lindel_spark.joins.spatial_range_join`, 3×3
neighborhood probe, never all-pairs) for ε-neighborhoods and the
large-star/small-star connected components
(:func:`lindel_spark.graph.connected_components`, O(log n) rounds)
for cluster formation.

The reference's host engine has no clustering operators; a
training-data pipeline wants DBSCAN for spatial/low-dimensional
structure discovery (geo events, 2-D projections of embeddings via
:func:`lindel_spark.similarity.random_project`) where k-means-style
cell quantizers (the IVF tier) assume convex blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dbscan_2d(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Exact DBSCAN (Ester et al. 1996) on 2-D points: returns
    ``(id, role, cluster)`` with ``role`` ∈ core/border/noise and
    ``cluster`` the MINIMUM core-point id reachable (NULL for
    noise). Semantics are the textbook ones with one determinism
    fix: a border point within ε of cores from several clusters is
    assigned the SMALLEST cluster id (classic DBSCAN leaves that
    order-dependent; pipelines need replayable output). L2 metric;
    a point counts itself toward ``min_pts``.

    Plan — three shipped primitives, zero new shuffle machinery:
    ε-pairs from the Morton-cell grid join (each point probes its
    3×3 cell neighborhood — pair volume is true-neighbor-bounded,
    never all-pairs), core flags from one map-side-combined
    neighbor count, clusters from large-star/small-star connected
    components over the CORE-CORE edges only (border points hang
    off the result via one more join, so the CC never sees the
    non-core fringe). At 100 TB the density knob is the same one
    DBSCAN always has: ε must keep per-cell occupancy sane — run
    the degree-profile audit on the pair graph if unsure.
    """
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    if eps <= 0:
        raise ValueError("eps must be > 0")
    from pyspark import StorageLevel

    from lindel_spark.graph import connected_components
    from lindel_spark.joins import spatial_range_join

    pts = df.select(F.col(id_col).alias("id"),
                    F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y"))
    pairs = (spatial_range_join(pts, pts, ["x", "y"], ["x", "y"],
                                radius=float(eps), metric="l2")
             .filter(F.col("l_id") != F.col("r_id"))
             .select(F.col("l_id").alias("a"), F.col("r_id").alias("b"))
             .persist(StorageLevel.MEMORY_AND_DISK))
    # +1: the point itself is in its own ε-neighborhood
    counts = pairs.groupBy("a").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_nbrs"))
    flagged = (pts.join(counts, pts["id"] == counts["a"], "left")
               .select("id", "x", "y",
                       (F.coalesce(F.col("n_nbrs"), F.lit(1))
                        >= F.lit(int(min_pts))).alias("is_core"))
               .persist(StorageLevel.MEMORY_AND_DISK))
    cores = flagged.filter("is_core").select(F.col("id").alias("node"))
    core_edges = (pairs
                  .join(cores.withColumnRenamed("node", "a"), "a")
                  .join(cores.withColumnRenamed("node", "b"), "b")
                  .filter(F.col("a") < F.col("b"))
                  .select(F.col("a").alias("src"),
                          F.col("b").alias("dst")))
    # alias the CC output columns before joining back: comp derives
    # FROM cores, so an unaliased self-join is ambiguous lineage
    comp = (connected_components(core_edges, nodes=cores)
            .select(F.col("node").alias("__cn"),
                    F.col("component").alias("__cc")))
    core_out = (cores.join(comp, F.col("node") == F.col("__cn"),
                           "left")
                .select(F.col("node").alias("id"),
                        F.lit("core").alias("role"),
                        # isolated cores (no core neighbor) are their
                        # own singleton cluster
                        F.coalesce(F.col("__cc"), F.col("node"))
                        .alias("cluster")))
    # border: non-core with >= 1 core neighbor -> smallest cluster id
    # among its core neighbors (the determinism fix)
    noncore = flagged.filter(~F.col("is_core")).select("id")
    border = (pairs.join(noncore.withColumnRenamed("id", "a"), "a")
              .join(core_out.select(F.col("id").alias("b"),
                                    F.col("cluster").alias("__cl")),
                    "b")
              .groupBy("a")
              .agg(F.min("__cl").alias("cluster"))
              .select(F.col("a").alias("id"),
                      F.lit("border").alias("role"), "cluster"))
    noise = (noncore.join(border.select("id"), "id", "left_anti")
             .select("id", F.lit("noise").alias("role"),
                     F.lit(None).cast(
                         dict(core_out.dtypes)["cluster"])
                     .alias("cluster")))
    return core_out.unionByName(border).unionByName(noise)
