#!/usr/bin/env python
"""Per-STAGE metrics probe for one registry query — the adjudication
tool the wall-time-only bench can't be: where did the seconds go?

Runs the named query in a fresh session (same confs as bench.py via
session.get_session), then dumps every completed stage from the
AppStatusStore: wall duration (submission→completion), executor run /
CPU / GC time, shuffle bytes, spill, task count. Driver-side time
(Python work between jobs — e.g. a toPandas + union-find) shows up as
the gap between total wall time and the sum of stage durations.

Usage:
  python tools/stage_probe.py QUERY [--sf DIR] [--reps N]

Prints one JSON line per rep:
  {"query":..., "rep":..., "wall_sec":..., "stage_sum_sec":...,
   "driver_gap_sec":..., "stages":[{...}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stage_rows(sc, after_stage_id: int):
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.Collections.emptyList()
    darr = sc._gateway.new_array(jvm.double, 0)
    jlist = store.stageList(empty, False, False, darr, empty)
    rows = []
    for i in range(jlist.size()):
        s = jlist.apply(i)
        if s.stageId() <= after_stage_id:
            continue
        sub = s.submissionTime()
        com = s.completionTime()
        dur = None
        if sub.isDefined() and com.isDefined():
            dur = (com.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append(
            {
                "stage": s.stageId(),
                "name": str(s.name())[:80],
                "dur_sec": dur,
                "run_ms": s.executorRunTime(),
                "cpu_ms": s.executorCpuTime() // 1_000_000,
                "gc_ms": s.jvmGcTime(),
                "shuf_w": s.shuffleWriteBytes(),
                "shuf_w_rec": s.shuffleWriteRecords(),
                "shuf_r": s.shuffleReadBytes(),
                "spill_mem": s.memoryBytesSpilled(),
                "spill_disk": s.diskBytesSpilled(),
                "tasks": s.numTasks(),
            }
        )
    rows.sort(key=lambda r: r["stage"])
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf = "/root/testdata/sf0.1"
    reps = 3
    if "--sf" in sys.argv:
        sf = sys.argv[sys.argv.index("--sf") + 1]
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from bench import _materialize
    from workshoop2_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    spark = get_session(app_name="stage_probe", master=f"local[{cpus}]")
    sc = spark.sparkContext
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]
    last_stage = -1
    for rep in range(reps):
        t0 = time.monotonic()
        _materialize(fn(spark, sf))
        wall = time.monotonic() - t0
        stages = _stage_rows(sc, last_stage)
        if stages:
            last_stage = max(r["stage"] for r in stages)
        stage_sum = sum(r["dur_sec"] or 0 for r in stages)
        print(
            json.dumps(
                {
                    "query": name,
                    "rep": rep,
                    "wall_sec": round(wall, 3),
                    "stage_sum_sec": round(stage_sum, 3),
                    "driver_gap_sec": round(wall - stage_sum, 3),
                    "n_stages": len(stages),
                    "stages": stages,
                }
            )
        )
        sys.stdout.flush()
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
