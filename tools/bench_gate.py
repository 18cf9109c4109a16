#!/usr/bin/env python
"""Round-close bench gate (round 12 — VERDICT r11 item 2: the
committed r11 headline carried 15 unadjudicated regression flags
from a noisy post-pytest sweep while SCALE_NOTES documented the
quiet run; the two self-contradicted).

Reads the freshly-written BENCH_DETAIL.json and exits non-zero when
any regression flag is UNADJUDICATED, so close_round.sh refuses to
commit a final bench that contradicts the round's scale notes. A
flag counts as adjudicated when either

- ``shuffle_identical`` is true — byte-identical shuffle bytes vs
  the previous round at the same sf is the documented noise
  signature (unchanged plan, unchanged data; bench.py also re-pins
  every provisional flag in a fresh session before it can reach the
  artifact, so these survivors are wall-noise leads, named on
  stderr for the watch list), or
- the query name appears in SCALE_NOTES.md — a written adjudication
  with measured evidence (the standing >1.5-slope rule's format).

Shuffle-superlinear flags are held to the SAME rule: every flagged
query must have a SCALE_NOTES entry (there is no byte-identical
escape hatch — the bytes ARE the evidence of a plan-shape problem).

Usage: python tools/bench_gate.py [DETAIL_PATH]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _adjudicated(name: str, notes: str) -> bool:
    """Whole-name match only (r12 ADVICE: a raw substring test let a
    flagged ``link_graph_documents`` ride on a note about
    ``wat_link_graph_documents``). Query names are [a-z0-9_], so the
    boundary is any non-name character or line edge."""
    return re.search(rf"(?<![a-z0-9_]){re.escape(name)}(?![a-z0-9_])", notes) is not None


def main() -> None:
    detail_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "BENCH_DETAIL.json")
    )
    with open(detail_path) as f:
        detail = json.load(f)
    notes_path = os.path.join(REPO, "SCALE_NOTES.md")
    notes = ""
    if os.path.exists(notes_path):
        with open(notes_path) as f:
            notes = f.read()

    bad: list[str] = []
    for name, r in (detail.get("regressions") or {}).items():
        if r.get("shuffle_identical") is True:
            print(
                f"gate: {name} flagged but shuffle bytes byte-identical "
                f"({r.get('ratio')}x wall) — noise class, accepted; "
                "watch-list it",
                file=sys.stderr,
            )
        elif _adjudicated(name, notes):
            print(
                f"gate: {name} flagged ({r.get('ratio')}x) — adjudicated "
                "in SCALE_NOTES.md, accepted",
                file=sys.stderr,
            )
        else:
            bad.append(
                f"regression {name}: {r.get('prev_sec')}s -> "
                f"{r.get('sec')}s ({r.get('ratio')}x, shuffle_identical="
                f"{r.get('shuffle_identical')})"
            )
    for name, fl in (detail.get("shuffle_superlinear") or {}).items():
        if _adjudicated(name, notes):
            print(
                f"gate: superlinear {name} "
                f"({fl.get('ratio_vs_linear')}x linear, {fl.get('pair')}) "
                "— adjudicated in SCALE_NOTES.md, accepted",
                file=sys.stderr,
            )
        else:
            bad.append(
                f"superlinear shuffle {name}: {fl.get('bytes_base')}B @sf"
                f"{fl.get('sf_base')} -> {fl.get('bytes')}B @sf"
                f"{fl.get('sf_top')} ({fl.get('ratio_vs_linear')}x linear)"
            )

    if bad:
        print(
            "BENCH GATE FAILED — unadjudicated flags (write the "
            "SCALE_NOTES.md adjudication with measured evidence, or fix "
            "the plan, then rerun the sweep):",
            file=sys.stderr,
        )
        for line in bad:
            print(f"  - {line}", file=sys.stderr)
        sys.exit(1)
    print(
        f"bench gate clean: n_regressed="
        f"{len(detail.get('regressions') or {})} (all adjudicated), "
        f"n_superlinear={len(detail.get('shuffle_superlinear') or {})}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
