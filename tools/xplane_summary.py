#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: device time per HLO op.

Usage: python tools/xplane_summary.py /path/to/trace_dir [--top 30] [--xla]

Decodes the .xplane.pb produced by jax.profiler.start_trace using the
xplane proto descriptor set that ships inside the tensorflow wheel (no
tensorboard_plugin_profile needed). Aggregates XEvent durations on the
device plane(s) by event name and prints the top-k with totals — the
measurement behind docs/PERFORMANCE.md's per-HLO attributions.

--xla groups by the HLO op name (the event name on TPU device planes is
already the fused computation name, e.g. 'fusion.123'); the default also
folds events whose names differ only by a trailing .N instance id.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def _xspace_class():
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    import tensorflow as tf  # noqa: F401  (wheel carries the descriptor set)

    tf_root = os.path.dirname(tf.__file__)
    dset_path = os.path.join(
        tf_root, "include", "tensorflow", "tsl", "profiler", "protobuf",
        "xplane_proto-descriptor-set.proto.bin")
    with open(dset_path, "rb") as f:
        dset = descriptor_pb2.FileDescriptorSet.FromString(f.read())
    pool = descriptor_pool.DescriptorPool()
    for fd in dset.file:
        pool.Add(fd)
    desc = pool.FindMessageTypeByName("tensorflow.profiler.XSpace")
    return message_factory.GetMessageClass(desc)


def load_xspace(trace_dir: str):
    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    cls = _xspace_class()
    space = cls()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


_INSTANCE = re.compile(r"\.\d+$")


def summarize(space, fold_instances: bool = True):
    """Returns {plane_name: (total_ns, {event_name: (ns, count)})}."""
    out = {}
    for plane in space.planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()} \
            if hasattr(plane.event_metadata, "values") else {}
        if not ev_meta:  # map<int64, XEventMetadata>
            ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = collections.defaultdict(lambda: [0, 0])
        total = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                if fold_instances:
                    name = _INSTANCE.sub("", name)
                dur = ev.duration_ps // 1000  # ps -> ns
                agg[name][0] += dur
                agg[name][1] += 1
                total += dur
        if agg:
            out[plane.name] = (total, dict(agg))
    return out


def _union(intervals):
    """Total covered span of [start, end) ps intervals + the gap list."""
    if not intervals:
        return 0, []
    intervals.sort()
    covered = 0
    gaps = []
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            gaps.append((cur_e, s))
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s
    return covered, gaps


def intervals_report(space, plane_filter: str, *, gap_ms: float = 0.5,
                     classify=None):
    """Per-plane busy-coverage analysis: union of event intervals over the
    traced window, idle gaps above ``gap_ms``, and (with ``classify``, an
    event-name -> class function) per-class exclusive coverage. This is the
    measurement behind 'device idle X%, egress fully hidden' claims
    (VERDICT r4 #5): if the DMA/egress class only ever overlaps compute,
    its exclusive (non-overlapped) coverage is ~0."""
    out = {}
    for plane in space.planes:
        if plane_filter and plane_filter.lower() not in plane.name.lower():
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        by_class: dict = collections.defaultdict(list)
        allv = []
        for line in plane.lines:
            base = line.timestamp_ns * 1000  # ns -> ps
            for ev in line.events:
                s = base + ev.offset_ps
                iv = (s, s + ev.duration_ps)
                allv.append(iv)
                if classify:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    by_class[classify(name)].append(iv)
        if not allv:
            continue
        t0 = min(s for s, _ in allv)
        t1 = max(e for _, e in allv)
        window = t1 - t0
        covered, gaps = _union(list(allv))
        row = {
            "window_ms": window / 1e9,
            "busy_ms": covered / 1e9,
            "busy_frac": covered / max(window, 1),
            "idle_gaps_over_%.2fms" % gap_ms: [
                (round((s - t0) / 1e9, 3), round((e - s) / 1e9, 3))
                for s, e in gaps if (e - s) / 1e9 > gap_ms
            ],
        }
        if classify:
            # per-class union + exclusive coverage (class minus all others)
            classes = {}
            for cname, ivs in by_class.items():
                cov, _ = _union(list(ivs))
                others = [iv for oc, oivs in by_class.items()
                          if oc != cname for iv in oivs]
                both, _ = _union(list(ivs) + others)
                ocov, _ = _union(others)
                classes[cname] = {
                    "covered_ms": round(cov / 1e9, 3),
                    # time where ONLY this class is active: union(all) -
                    # union(others). ~0 for an egress/DMA class means every
                    # transfer overlapped compute.
                    "exclusive_ms": round((both - ocov) / 1e9, 3),
                }
            row["classes"] = classes
        out[plane.name] = row
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU",
                    help="substring filter on plane name (default: TPU; "
                         "use '' for all planes)")
    ap.add_argument("--no-fold", action="store_true",
                    help="keep .N instance suffixes separate")
    ap.add_argument("--intervals", action="store_true",
                    help="busy-coverage interval analysis per plane: "
                         "window, busy fraction, idle gaps, and exclusive "
                         "coverage of transfer-ish events vs compute")
    ap.add_argument("--gap-ms", type=float, default=0.5)
    args = ap.parse_args()

    if args.intervals:
        import json as _json

        space = load_xspace(args.trace_dir)

        def classify(name: str) -> str:
            n = name.lower()
            if any(k in n for k in ("copy", "transfer", "dma", "outfeed",
                                    "infeed", "send", "recv")):
                return "transfer"
            return "compute"

        rep = intervals_report(space, args.plane, gap_ms=args.gap_ms,
                               classify=classify)
        print(_json.dumps(rep, indent=2))
        return

    space = load_xspace(args.trace_dir)
    planes = summarize(space, fold_instances=not args.no_fold)
    shown = False
    for pname, (total, agg) in planes.items():
        if args.plane and args.plane.lower() not in pname.lower():
            continue
        shown = True
        print(f"== plane: {pname}  total {total/1e6:.2f} ms "
              f"({len(agg)} distinct events)")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
        for name, (ns, count) in rows:
            print(f"{ns/1e6:10.3f} ms {100.0*ns/max(total,1):6.2f}% "
                  f"x{count:<6} {name[:110]}")
        print()
    if not shown:
        print(f"(no plane matched {args.plane!r}; planes: "
              f"{list(planes)})", file=sys.stderr)


if __name__ == "__main__":
    main()
