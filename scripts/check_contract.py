"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet tables, compare row count + sorted-
column value multisets. Usage:

    PYTHONPATH=/root/repo python scripts/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return norm_cell(v.item())
    import datetime
    import decimal

    # match tools/oracle_check.py's pandas-mediated canonicalization:
    # Decimals become floats (int() truncated 0.9 -> 0 and flagged
    # three green queries), dates compare as their ISO string
    if isinstance(v, decimal.Decimal):
        return norm_cell(float(v))
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort(key=repr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from lindel_spark.contract import assert_data_contract
    from lindel_spark.session import get_spark

    assert_data_contract(sf_dir)  # fail loudly on driver-layout drift
    spark = get_spark("contract-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failures.append(name)
            continue
        s, o = canon(srows, scols), canon(orows, ocols)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures.append(name)
        elif len(s) != len(o):
            print(f"FAIL  {name}: rows {len(s)} != {len(o)}")
            failures.append(name)
        elif s != o:
            bad = next(i for i, (a, b) in enumerate(zip(s, o)) if a != b)
            print(f"FAIL  {name}: values differ, first at sorted row {bad}:")
            print(f"      spark:  {s[bad]}")
            print(f"      oracle: {o[bad]}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
