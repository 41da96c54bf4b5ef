"""Round-15 ADVICE regressions: the friedman duplicate guard fires on
the PRE-completeness-filter frame, and the linear-probe stream sink
refuses a checkpoint-less restart against multi-batch state."""

import pytest
from pyspark.sql import functions as F

from lindel_spark.profile import friedman_test
from lindel_spark import streaming as ST


def test_friedman_duplicate_in_incomplete_block_raises(spark):
    # k = 3 (A, B, C each appear somewhere). Block 9 holds a
    # duplicate (9, A) but only 2 distinct treatments, so its row
    # count (3) coincidentally equals k and — worse — a variant with
    # row count != k used to be DROPPED by the completeness filter
    # before the old in-row guard ever evaluated (ADVICE r14). Both
    # shapes must raise now that the guard rides the completeness
    # aggregation itself.
    base = [(1, "A", 1.0), (1, "B", 2.0), (1, "C", 3.0)]
    df = spark.createDataFrame(
        base + [(9, "A", 9.0), (9, "A", 8.0)],
        "b long, t string, v double")
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(df, "b", "t", "v").collect()
    df2 = spark.createDataFrame(
        base + [(9, "A", 9.0), (9, "A", 8.0), (9, "B", 7.0),
                (9, "C", 6.0)],
        "b long, t string, v double")
    with pytest.raises(Exception, match="duplicate"):
        friedman_test(df2, "b", "t", "v").collect()


def _run_probe_stream(spark, src_dir, out_dir):
    schema = "t long, y double, x0 double"
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", "1")
           .option("recursiveFileLookup", "true").parquet(src_dir))
    q = ST.linear_probe_stream_sink(src, "y", ["x0"], out_dir) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    return q


def test_linear_probe_sink_restart_without_checkpoint_raises(
        spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("lp_guard_src"))
    out = str(tmp_path_factory.mktemp("lp_guard_out"))
    rows = [(i, 1.0 + 2.0 * i, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "t long, y double, x0 double")
    for lo, hi, p in ((0, 10, "p1"), (10, 20, "p2")):
        (df.filter((F.col("t") >= lo) & (F.col("t") < hi))
         .coalesce(1).write.parquet(f"{src}/{p}"))
    _run_probe_stream(spark, src, out)
    state = spark.read.parquet(out + "/state")
    assert state.count() == 2  # two batches committed

    # a fresh start (no checkpoint -> batch ids restart at 0) against
    # the same path must fail loudly instead of mixing runs' moments
    from pyspark.sql.streaming import StreamingQueryException
    with pytest.raises(StreamingQueryException,
                       match="later batches"):
        src2 = (spark.readStream
                .schema("t long, y double, x0 double")
                .option("maxFilesPerTrigger", "1")
                .option("recursiveFileLookup", "true").parquet(src))
        q = ST.linear_probe_stream_sink(src2, "y", ["x0"], out) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)
    # the guard fired before writing: state is untouched
    assert spark.read.parquet(out + "/state").count() == 2


def test_host_factor_clamps_and_normalizes():
    from lindel_spark.bench_anchors import (
        CANARY_PRE_ANCHOR, host_factor)
    assert host_factor(None) == 1.0
    assert host_factor(0.0) == 1.0
    # fast host: clamped to 1 (never inflates a verdict)
    assert host_factor(CANARY_PRE_ANCHOR / 2) == 1.0
    # slow host: linear in measured canary slowness
    assert host_factor(CANARY_PRE_ANCHOR * 2) == pytest.approx(2.0)
    # the r14 false flag replayed through the fixed ladder: raw
    # 2.217x with canary-pre 0.2635 normalizes inside the 2x contract
    assert 2.217 / host_factor(0.2635) < 2.0
