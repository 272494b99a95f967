"""Unit tests for the xplane interval-analysis logic (tools/xplane_summary).

The 2-step pipeline proof (docs/PERFORMANCE.md: device busy 99.8%, zero
un-overlapped transfers) rests on _union / intervals_report — pin their
semantics with synthetic planes so the measurement tool itself is tested,
not just trusted."""

import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from xplane_summary import _union, intervals_report  # noqa: E402


def test_union_merges_and_reports_gaps():
    covered, gaps = _union([(0, 10), (5, 15), (20, 30)])
    assert covered == 25  # [0,15) + [20,30)
    assert gaps == [(15, 20)]
    assert _union([]) == (0, [])
    covered, gaps = _union([(3, 4)])
    assert covered == 1 and gaps == []


def _plane(name, lines):
    """lines: [(timestamp_ns, [(meta_id, offset_ps, duration_ps)])]"""
    metas = {}
    mk_lines = []
    for ts, events in lines:
        evs = []
        for mid, off, dur in events:
            metas.setdefault(mid, types.SimpleNamespace(name=f"ev{mid}"))
            evs.append(types.SimpleNamespace(metadata_id=mid, offset_ps=off,
                                             duration_ps=dur))
        mk_lines.append(types.SimpleNamespace(timestamp_ns=ts, events=evs))
    return types.SimpleNamespace(name=name, lines=mk_lines,
                                 event_metadata=metas)


def test_intervals_report_busy_and_exclusive():
    # compute [0, 10ms) and transfer [5ms, 15ms): window 15 ms fully busy;
    # each class has 5 ms where ONLY it is active (the reported classes are
    # rounded to 0.001 ms, so use ms-scale events like real traces)
    MS = 1_000_000_000  # ps per ms
    plane = _plane("/device:TPU:0", [
        (0, [(1, 0, 10 * MS), (2, 5 * MS, 10 * MS)]),
    ])
    space = types.SimpleNamespace(planes=[plane])

    def classify(name):
        return "transfer" if name == "ev2" else "compute"

    rep = intervals_report(space, "TPU", gap_ms=0.1, classify=classify)
    row = rep["/device:TPU:0"]
    assert abs(row["busy_frac"] - 1.0) < 1e-9
    assert row["idle_gaps_over_0.10ms"] == []
    cls = row["classes"]
    assert abs(cls["transfer"]["exclusive_ms"] - 5.0) < 1e-6
    assert abs(cls["compute"]["exclusive_ms"] - 5.0) < 1e-6
    assert abs(cls["transfer"]["covered_ms"] - 10.0) < 1e-6


def test_intervals_report_finds_idle_gap():
    # two events with a 2e9 ps (2 ms) hole between them
    plane = _plane("/device:TPU:0", [
        (0, [(1, 0, 1_000_000_000)]),            # [0, 1ms)
        (0, [(1, 3_000_000_000, 1_000_000_000)]),  # [3ms, 4ms)
    ])
    space = types.SimpleNamespace(planes=[plane])
    rep = intervals_report(space, "TPU", gap_ms=1.0)
    row = rep["/device:TPU:0"]
    gaps = row["idle_gaps_over_1.00ms"]
    assert len(gaps) == 1
    start, width = gaps[0]
    assert abs(width - 2.0) < 1e-6 and abs(start - 1.0) < 1e-6
    assert abs(row["busy_ms"] - 2.0) < 1e-6
    # a non-matching plane filter yields nothing
    assert intervals_report(space, "GPU") == {}
