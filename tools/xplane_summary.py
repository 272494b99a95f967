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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU",
                    help="substring filter on plane name (default: TPU; "
                         "use '' for all planes)")
    ap.add_argument("--no-fold", action="store_true",
                    help="keep .N instance suffixes separate")
    args = ap.parse_args()

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
