"""Audit every registry query for silent whole-stage-codegen failures.

janino's 64 KB method limit turns oversized generated code into an
*interpreted fallback* — the query still runs, just 2-5x slower with
run-to-run jitter, and the only signal is an ERROR log line that is
easy to miss (this is exactly how spatial_range_join shipped slow in
round 2). This tool plans each registry query at sf0.001 with AQE off
and parses ``maxMethodCodeSize`` out of ``debug.codegenString``:
``-1`` means a subtree failed to compile.

Usage: python tools/codegen_audit.py [query ...]
"""

import importlib.util
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from lindel_spark.session import get_spark

    spark = get_spark("codegen-audit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    names = sys.argv[1:] or sorted(mod.queries())
    bad = []
    for name in names:
        fn = mod.queries()[name]
        try:
            df = fn(spark, SF_DIR)
            s = spark._jvm.org.apache.spark.sql.execution.debug.package \
                .codegenString(df._jdf.queryExecution().executedPlan())
            sizes = [int(x)
                     for x in re.findall(r"maxMethodCodeSize:(-?\d+)", s)]
        except Exception as e:  # noqa: BLE001 — audit keeps going
            print(f"SKIP {name}: {type(e).__name__}: {str(e)[:90]}")
            continue
        worst = max(sizes, default=0)
        failed = [x for x in sizes if x < 0]
        flag = "FAIL" if failed else ("WARN" if worst > 49152 else "ok  ")
        print(f"{flag} {name}: subtrees={len(sizes)} max={worst}"
              + (f" failed={len(failed)}" if failed else ""))
        if failed:
            bad.append(name)
    print("\nFAILED:", bad if bad else "none")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
