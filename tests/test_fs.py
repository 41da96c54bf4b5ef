"""The store-metadata FS shim (lindel_spark/fs.py): Hadoop FileSystem
API semantics proven on a ``file://`` URI — the same code path an
``s3a://`` or ``hdfs://`` store would take, with zero driver-local
``os.*`` in the metadata layer (asserted by source inspection)."""

import os

import pytest
from pyspark.sql import functions as F

from lindel_spark import fs as FS
from lindel_spark import write as LW

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_join_is_scheme_safe():
    assert FS.join("s3a://bkt/store", "_LATEST") == "s3a://bkt/store/_LATEST"
    assert FS.join("/tmp/x/", "tail", "f.parquet") == "/tmp/x/tail/f.parquet"
    assert FS.join("file:///tmp/x", "base-v0") == "file:///tmp/x/base-v0"


def test_marker_roundtrip_on_file_uri(spark, tmp_path_factory):
    root = "file://" + str(tmp_path_factory.mktemp("fsuri"))
    marker = FS.join(root, "store", "_LATEST")
    assert not FS.exists(spark, marker)
    FS.write_text_atomic(spark, marker, "0")
    assert FS.exists(spark, marker)
    assert FS.read_text(spark, marker) == "0"
    # overwrite commit (the maintain path): rename over existing
    FS.write_text_atomic(spark, marker, "17:23")
    assert FS.read_text(spark, marker) == "17:23"
    # no stray tmp left behind
    assert not FS.exists(spark, marker + ".tmp")
    names = FS.list_names(spark, FS.join(root, "store"))
    assert names == ["_LATEST"]


def test_du_and_list_files_on_file_uri(spark, tmp_path_factory):
    root = "file://" + str(tmp_path_factory.mktemp("fsdu"))
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(3).write.parquet(FS.join(root, "d"))
    total, count = FS.du_suffix(spark, FS.join(root, "d"))
    assert count == 3 and total > 0
    files = FS.list_files(spark, FS.join(root, "d"))
    assert len(files) == 3
    assert all(f.endswith(".parquet") for f in files)
    # the listed URIs are directly readable
    assert spark.read.parquet(*files).count() == 1000
    # absent path: empty, not an exception
    assert FS.du_suffix(spark, FS.join(root, "nope")) == (0, 0)
    assert FS.list_files(spark, FS.join(root, "nope")) == []
    # per-file delete (the tail-snapshot cleanup primitive)
    assert FS.delete(spark, files[0], recursive=False)
    assert len(FS.list_files(spark, FS.join(root, "d"))) == 2


def test_zorder_store_cycle_on_file_uri(spark, tmp_path_factory):
    """The whole store lifecycle through an explicit URI scheme —
    proves the metadata layer never touches driver-local paths."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = "file://" + str(tmp_path_factory.mktemp("zsuri") / "s")
    opts = {"elem": "int32", "num_files": 2}
    LW.zorder_store_init(li.filter("l_orderkey % 3 != 0"), cols,
                         store, **opts)
    LW.zorder_store_append(li.filter("l_orderkey % 3 = 0"), store)
    assert LW.zorder_store_read(spark, store).count() == li.count()
    stats = LW.zorder_store_maintain(spark, store, cols,
                                     tail_ratio=0.01, **opts)
    assert stats["rewritten"] is True
    assert LW.zorder_store_read(spark, store).count() == li.count()
    with pytest.raises(FileNotFoundError, match="no zorder store"):
        LW.zorder_store_read(spark, store + "_missing")


def test_maintain_preserves_concurrent_append(spark, tmp_path_factory):
    """A file appended to the tail AFTER maintenance snapshots its
    file list must survive the cleanup (ADVICE round-8): simulate the
    race by appending between the byte check and the rewrite via a
    pre-placed extra file that the snapshot DOES see, then a second
    append after maintain — the store must stay lossless."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = str(tmp_path_factory.mktemp("zrace") / "s")
    opts = {"elem": "int32", "num_files": 2}
    a = li.filter("l_orderkey % 3 = 0")
    b = li.filter("l_orderkey % 3 = 1")
    c = li.filter("l_orderkey % 3 = 2")
    LW.zorder_store_init(a, cols, store, **opts)
    LW.zorder_store_append(b, store)
    LW.zorder_store_maintain(spark, store, cols, tail_ratio=0.01, **opts)
    # "late" append lands in the (possibly empty-but-present) tail dir
    LW.zorder_store_append(c, store)
    assert LW.zorder_store_read(spark, store).count() == li.count()
    # and the next maintain folds it too
    LW.zorder_store_maintain(spark, store, cols, tail_ratio=0.01, **opts)
    assert LW.zorder_store_read(spark, store).count() == li.count()


def test_no_driver_local_io_in_store_metadata_paths():
    """Source-level guard: the store metadata layer must route ALL
    filesystem access through lindel_spark.fs (Hadoop FileSystem), so
    it keeps working when the store is on s3a://hdfs. os.path.join on
    data-write paths is allowed only via fs.join."""
    import inspect

    from lindel_spark import streaming as ST

    banned = ("os.walk", "os.listdir", "os.replace", "os.path.getsize",
              "shutil.rmtree", "open(", "_os.")
    for fn in (LW._zstore_latest, LW.zorder_store_init,
               LW.zorder_store_append, LW.zorder_store_read,
               LW.zorder_store_maintain, LW.compact_parquet,
               ST.read_agg_store, ST.incremental_agg_sink):
        src = inspect.getsource(fn)
        for b in banned:
            assert b not in src, f"{fn.__name__} uses {b}"


def test_zorder_store_select_prunes_base_files(spark, tmp_path_factory):
    """zorder_store_select: lossless vs a plain filter AND actually
    skips base files under a narrow range predicate."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = str(tmp_path_factory.mktemp("zsel") / "s")
    LW.zorder_store_init(li.filter("l_orderkey % 4 != 0"), cols, store,
                         elem="int32", num_files=8)
    LW.zorder_store_append(li.filter("l_orderkey % 4 = 0"), store)
    hits, stats = LW.zorder_store_select(
        spark, store, {"l_orderkey": (1000, 2000)})
    want = li.filter("l_orderkey between 1000 and 2000")
    assert hits.count() == want.count()
    assert (hits.agg(F.sum("l_quantity")).first()[0]
            == want.agg(F.sum("l_quantity")).first()[0])
    assert stats["files_scanned"] < stats["files_total"]
