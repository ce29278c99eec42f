#!/usr/bin/env python
"""Aggregate a jax.profiler xplane trace into per-model-scope device time.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/trace_report.py /tmp/jtrace
Parses the TPU device plane directly (the tensorboard profile plugin's native
converter is incompatible with this TF build) and groups HLO op durations by
the jax name-scope recorded in each op's metadata.
"""

import collections
import glob
import sys


def main():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace"
    path = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    tpu = next(p for p in xs.planes if "TPU" in p.name)

    stat_names = {s.id: s.name for s in tpu.stat_metadata.values()}
    by_scope = collections.Counter()
    by_op = collections.Counter()
    by_copy = collections.Counter()
    total = 0
    # the op-level line carries per-HLO events; pick the busiest line
    line = max(tpu.lines, key=lambda l: len(l.events))
    for ev in line.events:
        md = tpu.event_metadata[ev.metadata_id]
        dur = ev.duration_ps / 1e6  # -> us
        total += dur
        scope = ""
        for st in list(ev.stats) + list(md.stats):
            nm = stat_names.get(st.metadata_id, "")
            if nm in ("tf_op", "hlo_module", "name") and st.str_value:
                if "/" in st.str_value:
                    scope = st.str_value
        src = scope or md.display_name or md.name
        parts = src.split("/")
        depth = 6 if "stages" in src else 4
        key = "/".join(parts[:depth]) if len(parts) > 1 else src
        by_scope[key] += dur
        op = (md.display_name or md.name).split(".")[0]
        by_op[op] += dur
        if op in ("copy", "fusion", "reshape", "pad"):
            by_copy[("/".join(parts[3:6]), op)] += dur
    print(f"line: {line.name}; total device us across trace: {total:.0f}")
    print("\ntop scopes (us):")
    for k, v in by_scope.most_common(30):
        print(f"  {v:10.0f}  {k}")
    print("\ntop op types (us):")
    for k, v in by_op.most_common(25):
        print(f"  {v:10.0f}  {k}")
    print("\ntop copy/fusion/reshape/pad sites (us):")
    for (k, op), v in by_copy.most_common(25):
        print(f"  {v:10.0f}  {op:8s} {k}")


if __name__ == "__main__":
    main()
