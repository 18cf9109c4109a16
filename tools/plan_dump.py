#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to files —
the before/after plan evidence the optimization rounds commit under
``plans/r<N>/`` (r15; prior rounds did this ad hoc).

Usage:
  python tools/plan_dump.py OUTDIR SUFFIX QUERY [QUERY ...] [--sf DIR]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` per query. The plan is the
ANALYZED/OPTIMIZED formatted physical plan (pre-execution, AQE
isFinalPlan=false) — the same artifact earlier rounds committed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    outdir, suffix, names = args[0], args[1], args[2:]
    sf = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    os.makedirs(outdir, exist_ok=True)

    from workshoop2_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_session(app_name="plan_dump", master=f"local[{cpus}]")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
