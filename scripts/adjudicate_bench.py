"""Mechanical bench-drift adjudication (round-11 verdict task 8).

Three rounds running, host drift in the driver's bench session has
manufactured false 2x-bar breaches on unchanged code.  ``bench.py``
now self-adjudicates in-run (``over_bar_reruns`` + ``canary`` in the
artifact); this script is the same protocol for a REVIEWER holding a
prior artifact (e.g. the judge holding ``BENCH_r{N}.json``):

1. load the prior artifact (driver format ``{"parsed": {...}}`` or
   the raw ``bench.py`` JSON line — both accepted);
2. find its over-bar entries against the BASELINE.md anchors
   (``lindel_spark/bench_anchors.py`` — the same table bench.py uses);
3. re-measure exactly those entries fresh on THIS machine
   (``python bench.py --only a,b,...`` — fresh JVM, entry-scoped
   setup, its own canary);
4. emit one JSON verdict per entry: fresh median back inside the bar
   -> "drift" (the prior session, not the code), still over ->
   "regression", known scheduling-floor entries -> "noise_band".

Usage::

    python scripts/adjudicate_bench.py BENCH_r10.json
    python scripts/adjudicate_bench.py BENCH_r10.json --all   # every
        anchored entry, not just over-bar ones (full fresh-run diff)

Exit code 1 iff any entry's verdict is "regression".
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from lindel_spark.bench_anchors import (  # noqa: E402
    ANCHORS, NOISE_BAND, OVER_BAR_X, host_factor, over_bar,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    # driver format wraps the parsed bench line; raw format is the
    # bench line itself
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    q = doc.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no queries block found")
    return {k: float(v) for k, v in q.items()}


def _fresh_run(names: list[str]) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--only", ",".join(names)]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=1800)
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(
        f"fresh rerun produced no JSON (rc={proc.returncode}):\n"
        f"{proc.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--all"]
    check_all = "--all" in sys.argv[1:]
    if len(args) != 1:
        raise SystemExit(__doc__)
    prior = _load_queries(args[0])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.1":
        print(f"WARNING: anchors are sf0.1 numbers; fresh rerun uses "
              f"{sf_dir} — ratios are not bar-comparable", file=sys.stderr)

    if check_all:
        targets = sorted(n for n in prior if n in ANCHORS)
    else:
        targets = sorted(over_bar(prior))
    if not targets:
        print(json.dumps({"artifact": args[0], "over_bar": {},
                          "verdicts": {}, "any_regression": False}))
        return

    fresh = _fresh_run(targets)
    fq = fresh.get("queries", {})
    # canary-normalize this host against the anchor protocol (round
    # 15, same ladder as bench.py's in-run adjudicator): a reviewer
    # machine 2x slower than the anchor host must not stamp unchanged
    # code "regression"; the factor is clamped >= 1, raw stays in rec
    hf = host_factor(fresh.get("canary", {}).get("pre"))
    verdicts = {}
    any_reg = False
    for name in targets:
        a = ANCHORS[name]
        rec = {
            "anchor": a,
            "artifact": prior[name],
            "artifact_ratio": round(prior[name] / a, 3),
            "fresh": fq.get(name),
            "fresh_reps": fresh.get("reps", {}).get(name),
        }
        if rec["fresh"] is None:
            rec["verdict"] = "rerun_failed"
        else:
            rec["fresh_ratio"] = round(rec["fresh"] / a, 3)
            rec["host_factor"] = round(hf, 3)
            rec["fresh_norm"] = round(rec["fresh"] / a / hf, 3)
            if rec["fresh"] / hf <= OVER_BAR_X * a:
                rec["verdict"] = ("noise_band" if name in NOISE_BAND
                                  and rec["artifact_ratio"] > OVER_BAR_X
                                  else "drift"
                                  if rec["artifact_ratio"] > OVER_BAR_X
                                  else "ok")
            else:
                rec["verdict"] = ("noise_band" if name in NOISE_BAND
                                  else "regression")
                any_reg = rec["verdict"] == "regression" or any_reg
        verdicts[name] = rec

    print(json.dumps({
        "artifact": args[0],
        "over_bar": over_bar(prior),
        "fresh_canary": fresh.get("canary"),
        "verdicts": verdicts,
        "any_regression": any_reg,
    }, indent=2))
    if any_reg:
        sys.exit(1)


if __name__ == "__main__":
    main()
