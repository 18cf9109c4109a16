#!/usr/bin/env python
"""Per-query shuffle-bytes probe over an arbitrary data directory.

Companion to tools/gen_scaledata.py: runs a named subset of the
registry against a given table directory and prints one JSON object
{query: shuffle_write_bytes}. Used round 8 to (a) VALIDATE the
synthetic generator — same queries on the driver's sf0.1 vs a
generated sf0.1-equivalent must shuffle comparable bytes — and
(b) sanity-probe new scale points before a full bench run.

Usage:
  python tools/shuffle_probe.py DATA_DIR query1 query2 ...
  python tools/shuffle_probe.py DATA_DIR --all          # every query
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    data_dir = sys.argv[1]
    names = sys.argv[2:]
    from bench import _materialize, _shuffle_snapshot
    from workshoop2_etl_spark.session import get_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 16))
    spark = get_session(app_name="shuffle_probe", master=f"local[{cpus}]")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    if names == ["--all"]:
        names = list(qs)
    out: dict[str, int | None] = {}
    for name in names:
        s0 = _shuffle_snapshot(spark)
        try:
            _materialize(qs[name](spark, data_dir))
        except Exception as exc:
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            out[name] = None
            continue
        s1 = _shuffle_snapshot(spark)
        out[name] = (s1 - s0) if (s0 is not None and s1 is not None) else None
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
