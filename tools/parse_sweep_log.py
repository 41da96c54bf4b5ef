"""Rebuild a CORRECTNESS-shaped JSON artifact from an oracle_check
console log — used when a long scale sweep is timeboxed and killed
before its ``--json`` writer runs (the per-query OK/FAIL lines carry
rows + hashes, which is the evidence that matters).

Usage: python tools/parse_sweep_log.py sweep.log out.json [--manifest]
With --manifest, also records which registry queries are NOT in the
log (excluded/not-reached) so coverage is explicit.
"""

import json
import re
import sys


def main() -> int:
    log_path, out_path = sys.argv[1], sys.argv[2]
    want_manifest = "--manifest" in sys.argv
    text = open(log_path, errors="replace").read()
    results = {}
    ok_re = re.compile(
        r"(OK|FAIL) {1,3}(\w+): spark rows=(\d+) hash=(\w+) \| "
        r"oracle rows=(\d+) hash=(\w+)")
    for m in ok_re.finditer(text):
        status, name, sr, sh, orr, oh = m.groups()
        results[name] = {
            "rows_match": sr == orr,
            "schema_match": status == "OK",
            "hash_match": sh == oh and status == "OK",
            "spark_rows": int(sr),
            "oracle_rows": int(orr),
            "err": None,
        }
    err_re = re.compile(r"ERR {1,3}(\w+): (.+)")
    for m in err_re.finditer(text):
        name, msg = m.groups()
        results.setdefault(name, {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "spark_rows": -1, "oracle_rows": -1,
            "err": msg.strip()[:200],
        })
    out = dict(results)
    if want_manifest:
        sys.path.insert(0, ".")
        from lindel_spark.queries import all_queries

        names = list(all_queries())
        out = {
            "__manifest__": {
                "registry_total": len(names),
                "completed": len(results),
                "not_reached": [n for n in names if n not in results],
            },
            **results,
        }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"{len(results)} parsed, {n_ok} hash-green -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
