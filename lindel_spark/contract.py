"""Driver-data contract: the dtypes every query in this repo assumes.

The test-data generator is outside this repo's control and has changed
layouts between rounds (round 5: ``events.ts`` flipped from
TIMESTAMP(NANOS) to ``timestamp[us]``, silently breaking 13 queries).
This module turns the next such change into a one-line diagnosis:
``assert_data_contract(sf_dir)`` checks the parquet footer of every
driver table against the dtypes the queries rely on and raises with
the *observed* schema on any mismatch. It runs at the top of
``bench.py`` and ``tools/oracle_check.py``; pyarrow footer reads only,
so it costs milliseconds regardless of SF.

Columns may be listed with a set of dtypes where more than one layout
is explicitly supported (``events.ts`` — see ``sources.load_events``).
Extra columns in the data are fine; missing or re-typed ones are not.
"""

from __future__ import annotations

import os

# column -> pyarrow dtype string, or a set of accepted dtype strings
_EXPECTED: dict[str, dict[str, str | set[str]]] = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string",
               "n_regionkey": "int32"},
    "customer": {"c_custkey": "int64", "c_name": "string",
                 "c_nationkey": "int32", "c_acctbal": "double",
                 "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "int64", "s_name": "string",
                 "s_nationkey": "int32", "s_acctbal": "double"},
    "part": {"p_partkey": "int64", "p_name": "string", "p_brand": "string",
             "p_type": "string", "p_size": "int32",
             "p_retailprice": "double"},
    "orders": {"o_orderkey": "int64", "o_custkey": "int64",
               "o_orderstatus": "string", "o_totalprice": "double",
               # date-like; queries use half-open timestamp-safe bounds
               "o_orderdate": {"timestamp[us]", "timestamp[ns]", "date32"},
               "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "int64", "l_partkey": "int64",
                 "l_suppkey": "int64", "l_linenumber": "int32",
                 "l_quantity": "double", "l_extendedprice": "double",
                 "l_discount": "double", "l_tax": "double",
                 "l_returnflag": "string", "l_linestatus": "string",
                 "l_shipdate": {"timestamp[us]", "timestamp[ns]", "date32"}},
    "events": {"event_id": "int64",
               # dual schema handled by sources.load_events
               "ts": {"timestamp[us]", "timestamp[ns]"},
               "user_id": "int64", "event_type": "string",
               "value": "double", "props": "string"},
    "documents": {"doc_id": "int64", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64",
                   "embedding": {"list<element: float>", "list<item: float>"},
                   "label": "int32"},
}

# PQ trains m=8 sub-codebooks: the embedding width must divide by 8
_EMBEDDING_DIM_MULTIPLE = 8


def check_data_contract(sf_dir: str, allow_missing: bool = False) -> list[str]:
    """Return a list of human-readable violations (empty == conforming).

    Footer-only reads except one 1-row batch of ``embeddings`` to
    check the array width assumption PQ/IVF rely on.

    ``allow_missing=True`` skips absent tables instead of flagging them
    — for derived datasets (e.g. the sf1 scale-up, which materializes
    only the four benchmarked tables); present tables are still
    dtype-checked. A ``table.parquet`` *directory* of part files (how
    the scale-up writes) is probed via its first part.
    """
    import pyarrow.parquet as pq

    problems: list[str] = []
    for table, cols in _EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(path):
            parts = sorted(
                p for p in os.listdir(path) if p.endswith(".parquet"))
            if parts:
                path = os.path.join(path, parts[0])
        if not os.path.exists(path) or os.path.isdir(path):
            if not allow_missing:
                problems.append(f"{table}: missing file {path}")
            continue
        schema = pq.read_schema(path)
        observed = {f.name: str(f.type) for f in schema}
        for col, want in cols.items():
            got = observed.get(col)
            accepted = want if isinstance(want, set) else {want}
            if got is None:
                problems.append(
                    f"{table}.{col}: column missing "
                    f"(observed schema: {observed})")
            elif got not in accepted:
                problems.append(
                    f"{table}.{col}: dtype {got!r}, queries assume "
                    f"{sorted(accepted)} (observed schema: {observed})")

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(emb_path):
        parts = sorted(
            p for p in os.listdir(emb_path) if p.endswith(".parquet"))
        emb_path = os.path.join(emb_path, parts[0]) if parts else emb_path
    if os.path.isfile(emb_path):
        try:
            f = pq.ParquetFile(emb_path)
            batch = next(f.iter_batches(batch_size=1))
            dim = len(batch.column("embedding")[0])
            if dim % _EMBEDDING_DIM_MULTIPLE:
                problems.append(
                    f"embeddings.embedding: width {dim} not a multiple "
                    f"of {_EMBEDDING_DIM_MULTIPLE} (PQ m=8 assumption)")
        except Exception as ex:  # unreadable data beats a silent pass
            problems.append(f"embeddings: width probe failed: {ex}")
    return problems


def assert_data_contract(sf_dir: str, allow_missing: bool = False) -> None:
    """Raise AssertionError listing every violation, or return None."""
    problems = check_data_contract(sf_dir, allow_missing=allow_missing)
    if problems:
        raise AssertionError(
            "driver data at %s violates the query contract:\n  %s"
            % (sf_dir, "\n  ".join(problems)))
