"""Events dual-schema contract: the generator has shipped ``ts`` as
TIMESTAMP(NANOS) (Spark-readable only as long, behind the legacy
``nanosAsLong`` conf) and as plain ``timestamp[us]``. ``load_events``
must normalize both to the same TIMESTAMP instants, and must not touch
the legacy conf when the modern layout is read."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory):
    """The sf0.001 events rewritten in the legacy TIMESTAMP(NANOS)
    layout (parquet 2.6 keeps nanos instead of coercing to micros)."""
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, pa.field("ts", pa.timestamp("ns")),
                     t.column("ts").cast(pa.timestamp("ns")))
    d = str(tmp_path_factory.mktemp("nanos_events"))
    pq.write_table(t, os.path.join(d, "events.parquet"), version="2.6",
                   coerce_timestamps=None)
    return d


def test_modern_layout_reads_as_timestamp(spark):
    from lindel_spark.sources import load_events

    ev = load_events(spark, SF_DIR)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert ev.filter(ev.ts.isNull()).count() == 0


def test_layouts_produce_identical_instants(spark, nanos_dir):
    from lindel_spark.sources import load_events

    modern = load_events(spark, SF_DIR)
    legacy = load_events(spark, nanos_dir)
    assert dict(legacy.dtypes)["ts"] == "timestamp"
    m = [(r.event_id, r.ts)
         for r in modern.orderBy("event_id").limit(100).collect()]
    l = [(r.event_id, r.ts)
         for r in legacy.orderBy("event_id").limit(100).collect()]
    assert m == l


def test_raw_loader_preserves_stored_layout(spark, nanos_dir):
    from lindel_spark.sources import load_events_raw

    assert dict(load_events_raw(spark, SF_DIR).dtypes)["ts"].startswith(
        "timestamp")
    assert dict(load_events_raw(spark, nanos_dir).dtypes)["ts"] == "bigint"


def test_data_contract_green_on_driver_data():
    from lindel_spark.contract import check_data_contract

    assert check_data_contract(SF_DIR) == []


def test_data_contract_flags_retyped_column(tmp_path, nanos_dir):
    """A re-typed column (the round-5 failure mode) must be reported
    with the observed schema, and nanos events must stay accepted."""
    from lindel_spark.contract import check_data_contract

    probs = check_data_contract(nanos_dir)  # only events.parquet there
    assert not [p for p in probs if p.startswith("events")]

    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    i = t.schema.get_field_index("ts")
    t = t.set_column(i, pa.field("ts", pa.int64()),
                     t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()))
    pq.write_table(t, str(tmp_path / "events.parquet"))
    probs = check_data_contract(str(tmp_path))
    bad = [p for p in probs if p.startswith("events.ts")]
    assert bad and "int64" in bad[0] and "timestamp[us]" in bad[0]
