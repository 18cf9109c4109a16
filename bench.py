#!/usr/bin/env python
"""Per-query wall-time bench over the engine's query registry.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints
ONE JSON line::

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is materialized with the ``noop`` sink (full execution of
every output column, no driver-side collect, no disk write) so the
timing covers scan → shuffle → aggregate and nothing else. A query
that raises is recorded as ``null`` and does NOT abort the loop.

All diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _materialize(df) -> int:
    """Execute the full plan via the noop sink; return row count lazily
    only when the sink is unavailable (very old Spark)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from workshoop2_etl_spark.session import get_session

    spark = get_session(app_name="bench", master=f"local[{cpus}]")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    # JVM/codegen warmup so the first measured query isn't charged
    # for executor start, whole-stage compilation, or the parquet
    # datasource's first-use class loading (region is 5 rows — this
    # warms code paths, not data).
    try:
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
    except Exception as exc:  # pragma: no cover
        print(f"warmup failed: {exc}", file=sys.stderr)

    def revive_if_dead(s):
        """A query OOM-killing the local JVM must not void the rest of
        the run: detect a dead gateway and relaunch a fresh session."""
        try:
            s.sql("SELECT 1").collect()
            return s
        except Exception:
            print("session dead — relaunching JVM", file=sys.stderr)
            from pyspark import SparkContext
            from pyspark.sql import SparkSession

            try:
                s.stop()
            except Exception:
                pass
            SparkContext._active_spark_context = None
            SparkContext._gateway = None
            SparkContext._jvm = None
            SparkSession._instantiatedSession = None
            SparkSession._activeSession = None
            return get_session(app_name="bench", master=f"local[{cpus}]")

    times: dict[str, float | None] = {}
    total = 0.0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            _materialize(df)
            dt = round(time.perf_counter() - t0, 3)
            times[name] = dt
            total += dt
            print(f"{name}: {dt}s", file=sys.stderr)
        except Exception as exc:
            times[name] = None
            print(f"{name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
            spark = revive_if_dead(spark)

    # Full per-query detail first; then a SHORT headline as the very
    # last line. The driver keeps only the tail of stdout (~2 KB), so
    # the parseable summary must be the final line and must stay small
    # — the 59-query detail object alone overflows the buffer.
    n_failed = sum(1 for v in times.values() if v is None)
    print(
        json.dumps(
            {
                "metric": "per_query_sec",
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    ok = {k: v for k, v in times.items() if v is not None}
    slowest = dict(sorted(ok.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf,
                "n_queries": len(times),
                "n_failed": n_failed,
                "slowest": slowest,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
