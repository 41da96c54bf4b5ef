"""Source/sink surface: schema-disciplined readers + clustered writers.

The reference's motivating workload starts from a CSV scan and ends in
``COPY TO ... (FORMAT PARQUET)`` (reference docs/README.md:55-70); the
engine itself registers no table functions — the host provides scans.
On Spark the host primitives are ``spark.read.*``, but the defaults
are scale-hostile: schema inference reads the data twice (a full extra
pass at 100 TB), permissive parsing silently nulls corrupt fields, and
CSV without an explicit schema types everything string. These wrappers
pin the safe-at-scale settings and fail loudly.

All readers return plain DataFrames — every operator in this package
composes directly; ``zorder_write`` / ``zorder_stream_writer`` are the
matching cluster-preserving sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _read_events_any(spark: SparkSession, path: str):
    """Read an events parquet under either historical ``ts`` layout.

    The test-data generator has shipped ``ts`` two ways across rounds:
    TIMESTAMP(NANOS) (which Spark can only read as LongType, behind the
    ``nanosAsLong`` legacy conf) and plain ``timestamp[us]``. Probe the
    footer by reading normally first; only when that fails (the NANOS
    layout raises at schema resolution) enable the legacy conf. The
    conf is deliberately NOT restored on that fallback path: the scan
    is lazy, so the setting must outlive this function for the returned
    DataFrame to stay executable. On the modern layout the conf is
    never touched, so nothing leaks into the session.

    Returns ``(df, ts_dtype)`` with the stored (unconverted) ``ts``.
    """
    try:
        ev = spark.read.parquet(path)
        dt = dict(ev.dtypes).get("ts")
    except Exception as ex:
        # fall back ONLY on the NANOS-layout schema error — a missing
        # file / corrupt footer must surface as-is, not be masked by a
        # second read attempt under the legacy conf
        if "NANOS" not in str(ex):
            raise
        ev, dt = None, None
    if ev is None:
        prev = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")
        try:
            ev = spark.read.parquet(path)
            dt = dict(ev.dtypes).get("ts")
        except Exception:
            # the first failure wasn't the NANOS layout (missing file,
            # corrupt footer, ...) — don't leak the legacy conf
            # session-wide on the way out
            if prev is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev)
            raise
    return ev, dt


def load_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Events with ``ts`` exactly as stored (bigint nanos under the
    legacy layout, timestamp under the modern one). Use when only the
    *ordering* of ``ts`` matters, or for schema discovery — raw values
    compare consistently with an oracle reading the same file."""
    # append only when the path isn't already the table: a
    # '.parquet'-named *directory* of part files is a valid table
    # layout, and an isdir check would double-append the filename
    if not path.endswith(".parquet"):
        path = os.path.join(path, "events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev, _ = _read_events_any(spark, path)
    return ev


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Events with ``ts`` normalized to TIMESTAMP at microsecond
    precision regardless of the stored layout.

    Legacy nanos-as-long: rebuild the instant with *integer* division
    (``/`` would route epoch nanos ~1.7e18 through a double, which
    holds only 53 integer bits — off-by-1-us corruption). Modern
    ``timestamp[us]`` (possibly NTZ in the footer): a plain cast; the
    session timezone is pinned UTC first, so the NTZ→TZ cast re-tags
    the same wall-clock micros rather than shifting the instant, and
    downstream ``F.window`` epoch alignment is fixed.
    """
    if not path.endswith(".parquet"):
        path = os.path.join(path, "events.parquet")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev, dt = _read_events_any(spark, path)
    if dt == "bigint":
        return ev.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt is not None and dt.startswith("timestamp"):
        return ev.withColumn("ts", F.col("ts").cast("timestamp"))
    raise TypeError(
        f"events.ts: unsupported dtype {dt!r} in {path} — expected "
        "bigint (legacy TIMESTAMP(NANOS) via nanosAsLong) or timestamp")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sep: str = ",",
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """CSV with a **required** schema and FAILFAST parsing.

    No inference pass (inference scans the whole input once before the
    real read — 2x I/O at scale) and no silent nulls: malformed rows
    raise instead of corrupting downstream dedup/aggregation results.
    Pass ``mode='PERMISSIVE'`` plus a ``columnNameOfCorruptRecord``
    option to quarantine bad rows instead.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    mode: str = "FAILFAST",
    **options,
) -> DataFrame:
    """JSON-lines with a required schema (same rationale as CSV).

    Multi-line JSON arrays are refused implicitly: one record per line
    is the only JSON layout that splits across workers — a multiline
    file is a single-task bottleneck at any scale.
    """
    reader = spark.read.schema(schema).option("mode", mode)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite", **options) -> None:
    """CSV sink (interchange only — parquet is the analytical format;
    CSV drops types, stats, and row-group skipping)."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                **options) -> None:
    """JSON-lines sink (one record per line, splittable on re-read)."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.json(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | str | None = None,
             **options) -> DataFrame:
    """ORC source. Unlike CSV/JSONL the schema is optional — ORC is
    self-describing with footer statistics, so there is no inference
    double-scan to avoid; pass ``schema`` to pin an expected layout
    (pinning PROJECTS: absent columns read as NULL, parquet-style;
    it fixes types and column order, it does not validate presence). ORC
    carries column stats and predicate pushdown like parquet, so it
    is a first-class analytical format, not interchange.

    (Avro is NOT offered: it ships as an external Spark module that
    this environment cannot install; gate any future use behind an
    import-try per the build's no-new-packages constraint.)
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              **options) -> None:
    """ORC sink (zlib by default; pass compression= to change)."""
    writer = df.write.mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.orc(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema: columns added
    over time are unioned via ``mergeSchema`` (absent columns read as
    NULL in older files). This is the data-lake reality at 100 TB —
    a pipeline's schema grows, and re-writing history is not an
    option. Footer-merge cost is bounded: Spark samples footers in
    parallel, and partition/filter pruning still applies."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
