#!/usr/bin/env python
"""Aggregate device-op time from a JAX profiler trace (xplane.pb).

Parses the XSpace proto written by ``jax.profiler.trace`` and prints the
top-N device ops by total self time, grouped by a coarse category
(fusion kind / op family), so "where do the 2.4 ms/step go?" has a
data-backed answer without a TensorBoard UI.

Usage: python tools/trace_ops.py /tmp/sddm_trace_packed [-n 30]
"""

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
except ImportError:  # alternate packaging
    from tensorboard_plugin_profile.protobuf import xplane_pb2


def load_xspace(logdir: str) -> xplane_pb2.XSpace:
    pats = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)
    if not pats:
        sys.exit(f"no xplane.pb under {logdir}")
    path = max(pats, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    print(f"# {path}", file=sys.stderr)
    return xs


def categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or "conv" in n and "convert" not in n:
        return "conv"
    if "fusion" in n:
        m = re.match(r"([a-z0-9_.\-]*?)fusion", n)
        kind = (m.group(1) or "").strip("._-") if m else ""
        return f"fusion[{kind or 'plain'}]"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/transpose"
    if "rng" in n or "threefry" in n:
        return "rng"
    if "dynamic" in n and "slice" in n:
        return "dynamic-slice"
    if "reduce" in n:
        return "reduce"
    if "while" in n or "scan" in n:
        return "loop-overhead"
    return "other"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("logdir")
    ap.add_argument("-n", type=int, default=30)
    ns = ap.parse_args()
    xs = load_xspace(ns.logdir)

    per_op = defaultdict(float)   # full op name -> total ps
    for plane in xs.planes:
        # device planes are named like "/device:TPU:0" / "TPU:0" etc.
        pname = plane.name.lower()
        if "tpu" not in pname and "device" not in pname:
            continue
        if "stream" in pname and "host" in pname:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # skip derived step/annotation lines; keep op/kernel lines
            if "step" in lname and "xla" not in lname:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                if md is None:
                    continue
                per_op[md.name] += ev.duration_ps

    if not per_op:
        sys.exit("no device events found (is this a device trace?)")
    total = sum(per_op.values())
    per_cat = defaultdict(float)
    for name, ps in per_op.items():
        per_cat[categorize(name)] += ps

    print(f"total device time: {total/1e9:.3f} ms\n")
    print("== by category ==")
    for cat, ps in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ps/1e9:9.3f} ms  {100*ps/total:5.1f}%  {cat}")
    print(f"\n== top {ns.n} ops ==")
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:ns.n]:
        print(f"{ps/1e9:9.3f} ms  {100*ps/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
