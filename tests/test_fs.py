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


def test_commit_log_roundtrip_on_file_uri(spark, tmp_path_factory):
    """Append-only version log (round 9): commits are fresh names,
    latest = max listed — a torn or missing marker is impossible by
    construction because NO committed object is ever rewritten or
    deleted (there is no mutable object to tear)."""
    root = "file://" + str(tmp_path_factory.mktemp("fsuri"))
    commits = FS.join(root, "store", "_commits")
    assert FS.committed_versions(spark, commits) == []
    FS.commit_new(spark, FS.join(commits, "v0"), "init")
    FS.commit_new(spark, FS.join(commits, "v1"))
    assert FS.committed_versions(spark, commits) == [0, 1]
    assert FS.read_text(spark, FS.join(commits, "v0")) == "init"
    # no stray tmp left behind
    assert not FS.exists(spark, FS.join(commits, "v1.tmp"))
    # a second writer racing on the same version fails LOUDLY —
    # the committed file is never touched
    import pytest as _pytest
    with _pytest.raises(IOError, match="already committed"):
        FS.commit_new(spark, FS.join(commits, "v1"))
    assert FS.committed_versions(spark, commits) == [0, 1]
    # a crashed commit (orphan tmp) is ignored by the listing
    FS.commit_new(spark, FS.join(commits, "v2.tmp.tmp"))  # fake orphan
    assert FS.committed_versions(spark, commits) == [0, 1]


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


def test_zorder_store_select_prunes_base_files(spark, tmp_path_factory,
                                               monkeypatch):
    """zorder_store_select: lossless vs a plain filter, actually skips
    base files under a narrow range predicate, and — round-9 verdict
    item 1 — reads the PERSISTED manifest: after the store is built,
    the footer-sweep builder is poisoned, so a select that touched any
    parquet footer would blow up."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = str(tmp_path_factory.mktemp("zsel") / "s")
    LW.zorder_store_init(li.filter("l_orderkey % 4 != 0"), cols, store,
                         stat_cols=["l_orderkey"],
                         elem="int32", num_files=8)
    LW.zorder_store_append(li.filter("l_orderkey % 4 = 0"), store)

    from lindel_spark import profile as LP

    def _boom(*a, **k):
        raise AssertionError(
            "zorder_store_select swept parquet footers at query time")

    monkeypatch.setattr(LP, "file_minmax_manifest", _boom)
    hits, stats = LW.zorder_store_select(
        spark, store, {"l_orderkey": (1000, 2000)})
    want = li.filter("l_orderkey between 1000 and 2000")
    assert hits.count() == want.count()
    assert (hits.agg(F.sum("l_quantity")).first()[0]
            == want.agg(F.sum("l_quantity")).first()[0])
    assert stats["files_scanned"] < stats["files_total"]


def test_zorder_store_append_incremental_stats(spark, tmp_path_factory):
    """Append writes stats for exactly the NEW tail files, and select
    prunes tail files through them: two disjoint-range appends, a
    query hitting one range scans only that append's files."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = str(tmp_path_factory.mktemp("zinc") / "s")
    LW.zorder_store_init(li.filter("l_orderkey < 1000"), cols, store,
                         stat_cols=["l_orderkey"],
                         elem="int32", num_files=2)
    mx = li.agg(F.max("l_orderkey")).first()[0]
    cut = int(mx * 4 // 5)
    lo = li.filter(f"l_orderkey >= 1000 and l_orderkey < {cut}")
    hi = li.filter(f"l_orderkey >= {cut}")
    LW.zorder_store_append(lo.repartition(2), store)
    n_parts_1 = len(FS.list_files(spark, FS.join(store, "manifest-tail")))
    assert n_parts_1 >= 1
    rows_1 = spark.read.parquet(FS.join(store, "manifest-tail")).count()
    assert rows_1 == 2  # one stats row per appended file
    LW.zorder_store_append(hi.repartition(3), store)
    man = spark.read.parquet(FS.join(store, "manifest-tail"))
    assert man.count() == 5  # incremental: old rows kept, 3 added
    hits, stats = LW.zorder_store_select(
        spark, store, {"l_orderkey": (cut, None)})
    assert stats["tail_files_total"] == 5
    assert stats["tail_files_scanned"] == 3  # hi-range files only
    assert hits.count() == hi.count()


def test_zorder_store_maintain_rebuilds_manifest(spark,
                                                 tmp_path_factory,
                                                 monkeypatch):
    """After maintain folds the tail, the NEW base version has its own
    persisted manifest (select still needs zero footer reads) and the
    stale tail stats are gone."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    store = str(tmp_path_factory.mktemp("zman") / "s")
    opts = {"elem": "int32", "num_files": 4}
    LW.zorder_store_init(li.filter("l_orderkey % 3 != 0"), cols, store,
                         stat_cols=["l_orderkey"], **opts)
    LW.zorder_store_append(li.filter("l_orderkey % 3 = 0"), store)
    st = LW.zorder_store_maintain(spark, store, cols, tail_ratio=0.01,
                                  **opts)
    assert st["rewritten"] is True
    assert FS.is_dir(spark, FS.join(store, "manifest-v1"))
    assert FS.list_files(spark, FS.join(store, "manifest-tail")) == []
    from lindel_spark import profile as LP
    monkeypatch.setattr(
        LP, "file_minmax_manifest",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("footer sweep")))
    hits, stats = LW.zorder_store_select(
        spark, store, {"l_orderkey": (0, 500)})
    assert hits.count() == li.filter("l_orderkey <= 500").count()
    assert stats["files_scanned"] < stats["files_total"]


def test_commit_new_unique_tmp_and_duplicate_refusal(spark,
                                                     tmp_path_factory):
    """Round-10 (ADVICE): per-writer uuid tmp names — a successful
    commit leaves NO .tmp sibling of any name, and a second commit of
    the same version refuses loudly."""
    import os
    import pytest as _p

    from lindel_spark import fs as FS

    root = str(tmp_path_factory.mktemp("fscommit"))
    target = FS.join(root, "v7")
    FS.commit_new(spark, target, "payload")
    assert FS.read_text(spark, target) == "payload"
    leftovers = [n for n in os.listdir(root) if n.endswith(".tmp")]
    assert leftovers == []
    with _p.raises(IOError, match="already committed"):
        FS.commit_new(spark, target, "other")
    # the refused commit must not have clobbered the original
    assert FS.read_text(spark, target) == "payload"


# ---------------------------------------------------------------------------
# round 11: row-level tombstone deletes
# ---------------------------------------------------------------------------

def test_zorder_store_delete_lifecycle(spark, tmp_path):
    """Tombstone -> every read path excludes immediately -> maintain
    purges physically (even below the tail threshold), drains the
    tombstone files, results stable; time-travel to the pre-delete
    base still sees the rows."""
    from pyspark.sql import functions as F

    from lindel_spark import fs as _fs
    from lindel_spark import write as LW
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    store = str(tmp_path / "s")
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    LW.zorder_store_init(li.filter("l_orderkey % 5 != 0"), cols, store,
                         stat_cols=["l_orderkey"],
                         bloom_cols=["l_orderkey"],
                         elem="int32", num_files=4)
    LW.zorder_store_append(li.filter("l_orderkey % 5 = 0"), store)
    victims = li.filter("l_orderkey % 7 = 3") \
        .select("l_orderkey").distinct()
    a_victim = int(victims.first().l_orderkey)
    n = LW.zorder_store_delete(spark, store, "l_orderkey", victims)
    assert n == victims.count()
    expect = li.filter("l_orderkey % 7 != 3").count()
    assert LW.zorder_store_read(spark, store).count() == expect
    hits, _ = LW.zorder_store_select(
        spark, store, {"l_orderkey": (0, 10 ** 9)})
    assert hits.count() == expect
    h2, _ = LW.zorder_store_lookup(spark, store, "l_orderkey",
                                   a_victim)
    assert h2.count() == 0
    st = LW.zorder_store_maintain(spark, store, cols,
                                  tail_ratio=100.0, elem="int32",
                                  num_files=4)
    assert st["rewritten"] is True  # tombstones force the rewrite
    assert not _fs.list_files(spark, store + "/deletes/l_orderkey")
    assert LW.zorder_store_read(spark, store).count() == expect
    base1 = spark.read.parquet(store + "/base-v1")
    assert base1.filter(F.col("l_orderkey") % 7 == 3).count() == 0
    # historical read: the retained pre-delete base keeps its rows
    v0 = LW.zorder_store_read(spark, store, version=0)
    assert v0.filter(F.col("l_orderkey") % 7 == 3).count() > 0


def test_zorder_store_delete_empty_and_missing(spark, tmp_path):
    from pyspark.sql import functions as F

    from lindel_spark import write as LW
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    store = str(tmp_path / "s2")
    with pytest.raises(FileNotFoundError):
        LW.zorder_store_delete(spark, store, "l_orderkey", [1])
    cols = [F.col("l_orderkey").cast("int"),
            F.col("l_partkey").cast("int")]
    LW.zorder_store_init(li, cols, store, elem="int32", num_files=4)
    assert LW.zorder_store_delete(spark, store, "l_orderkey", []) == 0
    n_all = li.count()
    assert LW.zorder_store_read(spark, store).count() == n_all
    # maintain without tombstones keeps the no-op economics
    st = LW.zorder_store_maintain(spark, store, cols,
                                  tail_ratio=100.0, elem="int32",
                                  num_files=4)
    assert st["rewritten"] is False
