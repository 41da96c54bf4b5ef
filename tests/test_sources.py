"""Schema-disciplined source readers: fidelity + loud failures."""

import os

import pytest
from pyspark.sql import functions as F

from lindel_spark import sources as SRC


def test_csv_roundtrip_exact(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "csv")
    SRC.write_csv(li, p)
    back = SRC.read_csv(spark, p, li.schema)
    assert back.schema == li.schema
    a = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    b = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b and back.count() == li.count()


def test_jsonl_roundtrip_exact(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    p = str(tmp_path / "jsonl")
    SRC.write_jsonl(li, p)
    back = SRC.read_jsonl(spark, p, li.schema)
    assert back.count() == li.count()


def test_csv_failfast_raises_on_corrupt(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    df = SRC.read_csv(spark, str(p), "a int, b int")
    with pytest.raises(Exception, match="Malformed|FAILFAST|BadRecord"):
        df.collect()


def test_orc_roundtrip_lossless(spark, tmp_path):
    from lindel_spark.sources import read_orc, write_orc
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", -0.25, None)],
        "id long, s string, v double, flag boolean")
    write_orc(df, str(tmp_path / "o"))
    rb = read_orc(spark, str(tmp_path / "o"))
    assert rb.schema == df.schema
    assert sorted(map(tuple, rb.collect())) == sorted(map(tuple, df.collect()))


def test_orc_schema_pinning_projection_semantics(spark, tmp_path):
    from lindel_spark.sources import read_orc, write_orc
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_orc(df, str(tmp_path / "o2"))
    # pinning projects: a pinned column absent from the files reads
    # as NULL (same as parquet), it does not raise
    pinned = read_orc(spark, str(tmp_path / "o2"),
                      schema="id long, zzz string")
    assert pinned.collect() == [(1, None)]
    ok = read_orc(spark, str(tmp_path / "o2"), schema="id long, s string")
    assert ok.count() == 1


def test_read_parquet_evolving_merges_added_column(spark, tmp_path):
    from lindel_spark.sources import read_parquet_evolving
    old = spark.createDataFrame([(1, "x")], "id long, s string")
    new = spark.createDataFrame([(2, "y", 9.0)], "id long, s string, q double")
    old.write.parquet(str(tmp_path / "part=2023"))
    new.write.parquet(str(tmp_path / "part=2024"))
    df = read_parquet_evolving(
        spark, str(tmp_path / "part=2023"), str(tmp_path / "part=2024"))
    rows = {r["id"]: (r["s"], r["q"]) for r in df.collect()}
    assert rows == {1: ("x", None), 2: ("y", 9.0)}


def test_load_events_missing_file_raises_original_error(spark):
    """A missing events file must surface the first read's error —
    not be masked by the NANOS-legacy fallback path (and the legacy
    conf must not leak into the session)."""
    import pytest
    from lindel_spark.sources import _NANOS_CONF, load_events

    # another test may have legitimately enabled the legacy conf for
    # the shared session (it must outlive a legacy-layout load): the
    # contract here is that a failing load leaves it UNCHANGED
    before = spark.conf.get(_NANOS_CONF, None)
    with pytest.raises(Exception) as exc:
        load_events(spark, "/tmp/lindel_no_such_dir_xyz")
    assert "NANOS" not in str(exc.value)
    assert spark.conf.get(_NANOS_CONF, None) == before


def test_load_events_normalizes_ts(spark):
    import os as _os

    from lindel_spark.sources import load_events
    sf = _os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    ev = load_events(spark, sf)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.count() > 0
