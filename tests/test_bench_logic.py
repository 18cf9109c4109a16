"""bench.py's pure decision logic: machine-factor-normalized
regression flags and the superlinear-shuffle gate — no Spark
needed (the bench CLI itself is exercised by the driver and the
round's smoke runs)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import (  # noqa: E402
    CALIBRATION_FACTOR_MAX,
    CALIBRATION_FACTOR_MIN,
    _regression_flags,
    _superlinear_flags,
)


def _prev(sf=0.1, factor=None, **queries):
    out = {
        "sf": sf,
        "queries": {k: {"sec": v} for k, v in queries.items()},
    }
    if factor is not None:
        out["calibration"] = {"machine_factor": factor}
    return out


def test_uniform_slowdown_not_flagged():
    """The r7 failure mode: every query 2x slower because the VM is
    2x slower. With the probe showing factor 2.0, nothing flags."""
    prev = _prev(factor=1.0, q1=1.0, q2=2.0, q3=0.5)
    times = {"q1": 2.0, "q2": 4.0, "q3": 1.0}
    assert _regression_flags(times, prev, 0.1, machine_factor=2.0) == {}


def test_real_single_query_regression_still_flags():
    """One query 3x slower on a machine the probe says is at speed
    — that's code, and it must flag."""
    prev = _prev(factor=1.0, q1=1.0, q2=2.0)
    times = {"q1": 3.0, "q2": 2.1}
    flags = _regression_flags(times, prev, 0.1, machine_factor=1.0)
    assert list(flags) == ["q1"]
    assert flags["q1"]["ratio"] == 3.0


def test_regression_on_slow_machine_normalizes_both_sides():
    """Previous run on a 2x-slow machine, current on a fast one:
    equal normalized times, no flag — raw comparison would have
    called the fast run a 'speedup' and a truly-regressed query's
    ratio would be understated."""
    prev = _prev(factor=2.0, q1=4.0)
    # normalized prev = 2.0; current 2.0 at factor 1.0 -> equal
    assert _regression_flags({"q1": 2.0}, prev, 0.1, 1.0) == {}
    # current 4.0 at factor 1.0 -> 2x normalized regression
    flags = _regression_flags({"q1": 4.0}, prev, 0.1, 1.0)
    assert flags["q1"]["ratio"] == 2.0


def test_cross_sf_never_compared():
    prev = _prev(sf=0.01, factor=1.0, q1=0.1)
    assert _regression_flags({"q1": 10.0}, prev, 0.1, 1.0) == {}


def test_absolute_floor_suppresses_tiny_queries():
    prev = _prev(factor=1.0, q1=0.05)
    # 3x ratio but only +0.1s absolute — noise, not a flag
    assert _regression_flags({"q1": 0.15}, prev, 0.1, 1.0) == {}


def test_factor_clamps_exist():
    assert 0 < CALIBRATION_FACTOR_MIN < 1 < CALIBRATION_FACTOR_MAX


def test_superlinear_gate_flags_quadratic(tmp_path):
    """3x data, 9x bytes (a quadratic term) flags; 3x bytes
    (linear) and 5x-but-tiny do not. The artifact gains the new
    scale point either way."""
    hist = {
        "0.1": {
            "quad": 50 * 1024 * 1024,
            "lin": 50 * 1024 * 1024,
            "tiny": 1024,
        }
    }
    (tmp_path / "BENCH_SHUFFLE.json").write_text(json.dumps(hist))
    cur = {
        "quad": 9 * 50 * 1024 * 1024,
        "lin": 3 * 50 * 1024 * 1024,
        "tiny": 5 * 1024,
    }
    flags = _superlinear_flags(str(tmp_path), 0.3, cur)
    assert list(flags) == ["quad"]
    assert flags["quad"]["ratio_vs_linear"] == 3.0
    merged = json.loads((tmp_path / "BENCH_SHUFFLE.json").read_text())
    assert merged["0.3"] == cur and "0.1" in merged


def test_superlinear_gate_uses_nearest_smaller_sf(tmp_path):
    hist = {"0.01": {"q": 1024 * 1024}, "0.1": {"q": 60 * 1024 * 1024}}
    (tmp_path / "BENCH_SHUFFLE.json").write_text(json.dumps(hist))
    # vs 0.1 (nearest smaller): 3x scale, 3x bytes -> linear, clean.
    # (vs 0.01 it would be 180x for 30x — the gate must pick 0.1.)
    flags = _superlinear_flags(str(tmp_path), 0.3, {"q": 180 * 1024 * 1024})
    assert flags == {}


def test_superlinear_gate_sees_history_top_pair(tmp_path):
    """An sf0.1 run must also check the recorded 0.1→0.3 step (r11
    VERDICT item 3: three >1.5-slope steepeners hid above the run's
    own sf). History bytes on both sides; 'run-vs-smaller' wins when
    the same query flags on both pairs."""
    m = 1024 * 1024
    hist = {
        "0.01": {"q": 5 * m, "r": 5 * m},
        "0.1": {"q": 50 * m, "r": 50 * m},
        # q grows 9x per 3x above this run's sf: must flag from
        # history even though the current 0.1 run is linear vs 0.01.
        "0.3": {"q": 9 * 50 * m, "r": 3 * 50 * m},
    }
    (tmp_path / "BENCH_SHUFFLE.json").write_text(json.dumps(hist))
    flags = _superlinear_flags(
        str(tmp_path), 0.1, {"q": 50 * m, "r": 50 * m}
    )
    assert list(flags) == ["q"]
    assert flags["q"]["pair"] == "history-top"
    assert flags["q"]["sf_base"] == 0.1 and flags["q"]["sf_top"] == 0.3
    # running AT the top sf: no history-top duplicate of the same pair
    flags_top = _superlinear_flags(
        str(tmp_path), 0.3, {"q": 9 * 50 * m, "r": 3 * 50 * m}
    )
    assert list(flags_top) == ["q"]
    assert flags_top["q"]["pair"] == "run-vs-smaller"


def test_bench_gate_adjudication(tmp_path, monkeypatch):
    """The close-round gate: byte-identical-shuffle flags and
    SCALE_NOTES-named flags pass; anything else exits 1."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    gate = importlib.import_module("bench_gate")
    detail = {
        "regressions": {
            "noisy": {"ratio": 2.0, "shuffle_identical": True},
            "written": {"ratio": 1.8, "shuffle_identical": False},
        },
        "shuffle_superlinear": {
            "steep": {"ratio_vs_linear": 2.2, "pair": "history-top"},
        },
    }
    dp = tmp_path / "BENCH_DETAIL.json"
    dp.write_text(json.dumps(detail))
    notes = tmp_path / "SCALE_NOTES.md"
    notes.write_text("### written — adjudicated\n### steep — adjudicated\n")
    monkeypatch.setattr(gate, "REPO", str(tmp_path))
    monkeypatch.setattr(_sys, "argv", ["bench_gate.py", str(dp)])
    gate.main()  # all adjudicated -> no SystemExit

    # an unadjudicated flag must fail the gate
    detail["regressions"]["fresh"] = {
        "ratio": 3.0, "shuffle_identical": False,
    }
    dp.write_text(json.dumps(detail))
    import pytest

    with pytest.raises(SystemExit):
        gate.main()


def test_bench_gate_whole_name_adjudication(tmp_path, monkeypatch):
    """r12 ADVICE (bench_gate.py:60): a flag named 'link_graph' must
    NOT count as adjudicated because a note mentions
    'wat_link_graph' — only a whole-name mention adjudicates."""
    import importlib
    import sys as _sys

    import pytest

    _sys.path.insert(0, "/root/repo/tools")
    gate = importlib.import_module("bench_gate")
    assert gate._adjudicated("written_q", "### written_q — evidence")
    assert not gate._adjudicated(
        "link_graph_documents",
        "### wat_link_graph_documents — adjudicated",
    )
    assert not gate._adjudicated("q1", "notes about q10 only")
    detail = {
        "regressions": {
            "link_graph_documents": {"ratio": 2.0, "shuffle_identical": False},
        },
        "shuffle_superlinear": {},
    }
    dp = tmp_path / "BENCH_DETAIL.json"
    dp.write_text(json.dumps(detail))
    (tmp_path / "SCALE_NOTES.md").write_text(
        "### wat_link_graph_documents — adjudicated with evidence\n"
    )
    monkeypatch.setattr(gate, "REPO", str(tmp_path))
    monkeypatch.setattr(_sys, "argv", ["bench_gate.py", str(dp)])
    with pytest.raises(SystemExit):
        gate.main()


def test_pinned_min_preferred_on_both_sides():
    """Quiet-session pinned minima beat machine-factor normalization:
    a pinned current value suppresses a sweep-time blip, and a pinned
    previous value catches a real regression the noisy sweep base
    would have hidden."""
    import bench

    prev = {
        "sf": 0.1,
        "queries": {
            "a": {"sec": 1.0, "pinned_min": 1.0},
            "b": {"sec": 9.0, "pinned_min": 1.0},
        },
        "calibration": {"machine_factor": 1.0},
    }
    # a: sweep says 5s (blip) but pin says 1.0 -> no flag
    # b: sweep base was a noisy 9s; pinned base 1.0 and current
    #    pinned 2.6 -> real 2.6x regression flagged
    flags = bench._regression_flags(
        {"a": 5.0, "b": 2.8},
        prev,
        0.1,
        1.0,
        pinned={"a": 1.0, "b": 2.6},
    )
    assert "a" not in flags
    assert flags["b"]["pinned"] and flags["b"]["ratio"] == 2.6


def test_pinned_absent_falls_back_to_normalized():
    import bench

    prev = {
        "sf": 0.1,
        "queries": {"a": {"sec": 1.0}},
        "calibration": {"machine_factor": 1.0},
    }
    flags = bench._regression_flags({"a": 3.0}, prev, 0.1, 1.0)
    assert flags["a"]["ratio"] == 3.0 and not flags["a"]["pinned"]


def test_pinned_min_normalized_by_machine_factor():
    """r9 ADVICE: pinned minima strip session-age drift but not
    machine speed — a pin taken on a 2x-slow VM must be divided by
    that run's machine factor before comparing against the previous
    round's pin (taken at factor 1.0), else unchanged code flags."""
    import bench

    prev = {
        "sf": 0.1,
        "queries": {"a": {"sec": 1.1, "pinned_min": 1.0}},
        "calibration": {"machine_factor": 1.0},
    }
    # current pin 2.0s, but this run's machine factor is 2.0 ->
    # normalized 1.0 == previous pin -> no flag
    flags = bench._regression_flags(
        {"a": 2.2}, prev, 0.1, 2.0, pinned={"a": 2.0}
    )
    assert flags == {}
    # same raw numbers on an equal-speed machine IS a regression
    flags = bench._regression_flags(
        {"a": 2.2}, prev, 0.1, 1.0, pinned={"a": 2.0}
    )
    assert flags["a"]["ratio"] == 2.0


def test_streaming_entries_compare_processing_time():
    """Streaming entries with a recorded activation/processing split
    on both sides compare PROCESSING seconds: a wall-time blip that
    is all activation overhead must not flag, while a genuine
    processing regression must."""
    import bench

    prev = {
        "sf": 0.1,
        "queries": {
            "streaming_x": {
                "sec": 2.0,
                "processing_sec": 1.0,
                "activation_sec": 1.0,
            },
            "streaming_y": {
                "sec": 2.0,
                "processing_sec": 1.0,
                "activation_sec": 1.0,
            },
        },
        "calibration": {"machine_factor": 1.0},
    }
    flags = bench._regression_flags(
        {"streaming_x": 9.0, "streaming_y": 3.5},
        prev,
        0.1,
        1.0,
        stream_split={
            # x: wall 9s but processing still 1.1s -> activation noise
            "streaming_x": {"processing_sec": 1.1, "activation_sec": 7.9},
            # y: processing itself tripled -> real flag
            "streaming_y": {"processing_sec": 3.0, "activation_sec": 0.5},
        },
    )
    assert "streaming_x" not in flags
    assert flags["streaming_y"]["basis"] == "processing"
    assert flags["streaming_y"]["ratio"] == 3.0


def test_zero_processing_measurement_falls_back_to_wall():
    """Regression (r10 ADVICE): a failed recentProgress parse records
    processing_sec=0.0; the processing basis must NOT be entered with
    cur_n=0 (which could never flag) — the gate falls back to the
    wall-time best-evidence basis and still catches the regression."""
    import bench

    prev = {
        "sf": 0.1,
        "queries": {
            "streaming_z": {
                "sec": 2.0,
                "processing_sec": 1.0,
                "activation_sec": 1.0,
            },
        },
        "calibration": {"machine_factor": 1.0},
    }
    flags = bench._regression_flags(
        {"streaming_z": 9.0},
        prev,
        0.1,
        1.0,
        stream_split={
            "streaming_z": {"processing_sec": 0.0, "activation_sec": 9.0},
        },
    )
    assert "streaming_z" in flags
    assert flags["streaming_z"]["basis"] == "wall"


def test_record_activation_unknowable_split_charges_wall():
    """Regression (r10 ADVICE): when recentProgress parsing raises or
    returns zero events, _record_activation must charge the whole
    wall to processing (conservative) instead of emitting
    processing_sec=0 — a zero would both disable this round's gate
    and poison next round's prev side."""
    from workshoop2_etl_spark.streaming import events as ev

    class _Boom:
        @property
        def recentProgress(self):
            raise RuntimeError("gateway gone")

    class _Empty:
        recentProgress = []

    class _Real:
        recentProgress = [
            {"durationMs": {"triggerExecution": 500}},
            {"durationMs": {"triggerExecution": 250}},
        ]

    def _pop():
        out = ev.pop_stream_timings()
        return (out or {}).get("processing_sec")

    ev.pop_stream_timings()  # reset accumulator
    ev._record_activation(4.0, _Boom())
    assert _pop() == 4.0
    ev._record_activation(4.0, _Empty())
    assert _pop() == 4.0
    ev._record_activation(4.0, _Real())
    assert _pop() == 0.75


def test_pin_extra_env_parsing():
    """SPARK_GRAFT_PIN_EXTRA adds watch-list queries to the pin set
    without duplicating ones already in the slowest tail."""
    import os

    # replicate the selection logic shape (names, not timings)
    ok_times = {"a": 1.0, "b": 5.0, "c": 0.2}
    pin_names = [
        k for k, _ in sorted(ok_times.items(), key=lambda kv: -kv[1])[:1]
    ]
    os.environ["SPARK_GRAFT_PIN_EXTRA"] = " b , c ,missing,"
    try:
        for extra in filter(
            None,
            (s.strip() for s in os.environ.get(
                "SPARK_GRAFT_PIN_EXTRA", ""
            ).split(",")),
        ):
            if extra in ok_times and extra not in pin_names:
                pin_names.append(extra)
    finally:
        del os.environ["SPARK_GRAFT_PIN_EXTRA"]
    assert pin_names == ["b", "c"]


def test_cross_cpus_artifacts_not_comparable(tmp_path):
    """A previous detail recorded at a different local[N] must not
    feed the regression gate (29 phantom flags in round 12), and a
    shuffle point tagged with different cpus is excluded from slope
    comparisons while this run's point retags its sf."""
    import bench

    prev = {
        "sf": 0.01,
        "cpus": 32,
        "queries": {"q": {"sec": 0.3}},
        "calibration": {"machine_factor": 1.0},
    }
    # same wall time that WOULD flag under a comparable base
    assert bench._regression_flags(
        {"q": 3.0}, prev, 0.01, 1.0, cpus=8
    ) == {}
    assert bench._regression_flags({"q": 3.0}, prev, 0.01, 1.0, cpus=32)
    # pre-round-12 artifact without cpus still compares
    del prev["cpus"]
    assert bench._regression_flags({"q": 3.0}, prev, 0.01, 1.0, cpus=8)

    m = 1024 * 1024
    hist = {
        "0.01": {"q": 5 * m},
        "_cpus": {"0.01": 32},
    }
    (tmp_path / "BENCH_SHUFFLE.json").write_text(json.dumps(hist))
    # 9x bytes for 10x scale would be fine; 9x for... make it flag
    # under comparable cpus: 200x bytes for 10x scale
    flags8 = bench._superlinear_flags(
        str(tmp_path), 0.1, {"q": 1000 * m}, cpus=8
    )
    assert flags8 == {}  # 32-cpu base excluded for an 8-cpu run
    merged = json.loads((tmp_path / "BENCH_SHUFFLE.json").read_text())
    assert merged["_cpus"]["0.1"] == 8 and merged["0.1"] == {"q": 1000 * m}
    # rewrite base as 8-cpu -> comparison happens and flags
    merged["_cpus"]["0.01"] = 8
    (tmp_path / "BENCH_SHUFFLE.json").write_text(json.dumps(merged))
    flags = bench._superlinear_flags(
        str(tmp_path), 0.1, {"q": 1000 * m}, cpus=8
    )
    assert list(flags) == ["q"]
