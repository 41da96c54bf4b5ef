"""Oracle-diff harness (SURVEY §5.2 t2): Spark vs DuckDB, value-level.

Runs ``entry(spark)`` plus every ``queries()`` entry from
``__spark_entry__`` against its ``oracle_sql()`` in DuckDB over the
same parquet tables, comparing row counts and an order-insensitive
value hash with columns sorted by name — the same canonicalization the
build driver applies, so a green run here predicts a green
CORRECTNESS row.

Usage::

    python tools/oracle_check.py [query-name ...]   # default: all
    python tools/oracle_check.py --json out.json [query-name ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/oracle_check.py

Unknown query names are an error (exit 2) — a typo must never read as
a green run. ``--json`` writes a driver-shaped artifact (same fields
as CORRECTNESS_r{N}.json) so local verification runs are evidenced.

Known benign divergence (SURVEY §2.4): the reference's float[4] morton
actually computes hilbert (src/lindel_extension.cpp:752 calls the
wrong kernel); this port implements intended Morton semantics, and the
oracles here encode the *intended* values, so no whitelist entry is
needed when comparing against DuckDB-computed math.
"""

import hashlib
import math
import os
import sys
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df) -> tuple[int, str]:
    """(row_count, md5) of the sorted, name-ordered, normalized rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.10g}"
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    rows = sorted(
        ",".join(norm(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return len(rows), hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    from lindel_spark.contract import assert_data_contract
    from lindel_spark.session import get_spark

    import __spark_entry__ as entry_mod

    assert_data_contract(SF_DIR)  # fail loudly on driver-layout drift

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    # harness-only driver knob (see lindel_spark.session.get_spark):
    # the sf1 value sweeps collect multi-GiB result sets
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "4g")
    spark = get_spark("lindel-oracle-check")
    con = duckdb.connect()
    # let big oracles (set-similarity joins at sf1) spill instead of
    # dying on a bad-allocation: DuckDB's default limit assumes the
    # whole host's RAM, but the Spark JVM holds a large slice here
    try:
        import os as _os

        ram_gb = (_os.sysconf("SC_PAGE_SIZE")
                  * _os.sysconf("SC_PHYS_PAGES")) / (1 << 30)
        # a Spark JVM shares the host: cap DuckDB at a third of RAM
        # (floor 2 GB, ceiling 48 GB) so big oracles spill to disk
        # instead of malloc-failing, and halve the thread default
        # (r12: the 16 GB ceiling stranded 100+ GiB on the 128 GiB
        # host and the sf1 kcore oracle's materialized rounds hit the
        # wall mid-window — windows pin state spill can't fully cover)
        budget = max(2, min(48, int(ram_gb // 3)))
        con.execute("SET temp_directory='/tmp/lindel_duck_spill'")
        con.execute(f"SET memory_limit='{budget}GB'")
        con.execute(f"SET threads={max(2, (_os.cpu_count() or 8) // 2)}")
        con.execute("SET preserve_insertion_order=false")
    except Exception:
        pass  # older duckdb / exotic host: defaults
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # derived scale-up dirs write table.parquet/ as a DIRECTORY of
        # part files; DuckDB needs the glob form for those
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    try:
        r = entry_mod.entry(spark)
        print(f"ENTRY OK rows={r.count()} "
              f"schema={[f.name for f in r.schema.fields]}")
    except Exception:
        print("ENTRY FAIL")
        traceback.print_exc()

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(argv) or None
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            print(f"ERROR: unknown query name(s): {unknown}")
            print(f"       known: {sorted(qs)}")
            return 2
    print(f"{len(qs)} queries, {len(oracles)} oracles")
    fails = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                sn, sh = canon(sdf)
                on, oh = canon(odf)
                ok = sn == on and sh == oh
                if not ok:
                    fails.append(name)
                    dump = os.environ.get("ORACLE_DUMP_DIR")
                    if dump:
                        os.makedirs(dump, exist_ok=True)
                        sdf.to_csv(os.path.join(dump, f"{name}.spark.csv"),
                                   index=False)
                        odf.to_csv(os.path.join(dump, f"{name}.oracle.csv"),
                                   index=False)
                results[name] = {
                    "rows_match": sn == on,
                    "schema_match": sorted(sdf.columns) == sorted(odf.columns),
                    "hash_match": sh == oh,
                    "spark_rows": sn, "oracle_rows": on, "err": None,
                }
                print(f"{'OK  ' if ok else 'FAIL'} {name}: "
                      f"spark rows={sn} hash={sh[:10]} | "
                      f"oracle rows={on} hash={oh[:10]}")
                if not ok and sorted(sdf.columns) != sorted(odf.columns):
                    print(f"     cols spark={sorted(sdf.columns)} "
                          f"oracle={sorted(odf.columns)}")
            else:
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": len(sdf),
                    "oracle_rows": None, "err": None,
                }
                print(f"ROWS {name}: rows={len(sdf)} (no oracle)")
        except Exception as e:
            fails.append(name)
            results[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"{type(e).__name__}: {e}",
            }
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    if json_out:
        import json as _json
        with open(json_out, "w") as f:
            _json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} entries)")
    print("FAILS:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
