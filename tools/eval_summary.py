#!/usr/bin/env python
"""Summarize many eval legs (eval_flagship / infer outputs) into ONE table.

Each leg is a directory holding ``{noisy,output}_<metric>.npy`` per-file
vectors (as written by ``sddm_tpu.evaluate.evaluate`` — the mirror of
reference evaluate_results.py:14-41).  A leg argument may point at the
vectors dir itself, at a run dir containing ``samples/``, or at an eval
root containing ``<ts>/samples/`` (newest run is picked).

Usage:
  python tools/eval_summary.py LABEL=PATH [LABEL=PATH ...] [--ref LABEL]

With --ref, every other leg gets a pesq/sisnr delta column and per-file
paired wins against that leg (legs must have equal file counts in the
same sorted order).
"""

import argparse
import glob
import os
import sys

import numpy as np

METRICS = ("sisnr", "stoi", "pesq_wb_approx")


def resolve(path):
    """Find the directory that actually holds the metric vectors."""
    for cand in (path, os.path.join(path, "samples")):
        if os.path.exists(os.path.join(cand, "output_sisnr.npy")):
            return cand
    runs = sorted(glob.glob(os.path.join(path, "*", "samples")))
    for cand in reversed(runs):
        if os.path.exists(os.path.join(cand, "output_sisnr.npy")):
            return cand
    return None


def load_leg(path):
    d = resolve(path)
    if d is None:
        return None
    out = {}
    for side in ("noisy", "output"):
        for m in METRICS:
            p = os.path.join(d, f"{side}_{m}.npy")
            if os.path.exists(p):
                out[f"{side}_{m}"] = np.load(p)
    out["_dir"] = d
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("legs", nargs="+", metavar="LABEL=PATH")
    ap.add_argument("--ref", default=None,
                    help="label of the comparison leg (adds delta + "
                    "paired-wins columns)")
    ns = ap.parse_args()

    legs = {}
    for spec in ns.legs:
        label, _, path = spec.partition("=")
        if not path:
            ap.error(f"leg '{spec}' is not LABEL=PATH")
        leg = load_leg(path)
        if leg is None:
            print(f"[skip] {label}: no metric vectors under {path}",
                  file=sys.stderr)
            continue
        legs[label] = leg
    if not legs:
        sys.exit("no legs resolved")

    ref = legs.get(ns.ref) if ns.ref else None
    hdr = ["leg", "n"] + list(METRICS)
    if ref is not None:
        hdr += [f"Δpesq vs {ns.ref}", "pesq wins"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))

    # one noisy row (from the first leg that has it)
    for leg in legs.values():
        if "noisy_sisnr" in leg:
            cells = ["noisy", str(len(leg["noisy_sisnr"]))]
            for m in METRICS:
                v = leg.get(f"noisy_{m}")
                cells.append("—" if v is None else f"{v.mean():.4f}")
            if ref is not None:
                cells += ["", ""]
            print("| " + " | ".join(cells) + " |")
            break

    for label, leg in legs.items():
        v0 = leg.get("output_sisnr")
        cells = [label, str(len(v0)) if v0 is not None else "—"]
        for m in METRICS:
            v = leg.get(f"output_{m}")
            cells.append("—" if v is None else f"{v.mean():.4f}")
        if ref is not None:
            rp = ref.get("output_pesq_wb_approx")
            op = leg.get("output_pesq_wb_approx")
            if label == ns.ref or rp is None or op is None:
                cells += ["", ""]
            elif len(rp) != len(op):
                cells += ["n mismatch", ""]
            else:
                cells += [f"{op.mean() - rp.mean():+.3f}",
                          f"{int((op > rp).sum())}/{len(op)}"]
        print("| " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
