#!/usr/bin/env python
"""Assemble the head-to-head quality table (VERDICT r3 #1).

Reads the per-file metric vectors (``{noisy,output}_{metric}.npy``) that
``sddm_tpu.evaluate`` writes next to each leg's enhanced WAVs, and prints
a markdown table comparing the torch reference leg and our leg on the
SAME test set with the SAME metric implementations (reference
evaluate_results.py:19-22 is the metric suite being mirrored).

Usage:
  python tools/head_to_head_table.py \
      --ref artifacts/head_to_head/ref_eval/samples \
      --ours saved/SDDM2_UNet_synth2_small/<run>/samples \
      [--label-ref "torch reference (CPU)"] [--label-ours "sddm_tpu (TPU)"]
"""

import argparse
import os

import numpy as np

METRICS = ("sisnr", "stoi", "pesq_wb_approx")


def leg_stats(samples_dir):
    out = {}
    for m in METRICS:
        for side in ("noisy", "output"):
            path = os.path.join(samples_dir, f"{side}_{m}.npy")
            if os.path.exists(path):
                v = np.load(path)
                out[f"{side}_{m}"] = (float(v.mean()), float(v.std()), len(v),
                                      v)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref", required=True)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--label-ref", default="torch reference")
    ap.add_argument("--label-ours", default="sddm_tpu")
    ns = ap.parse_args()

    ref, ours = leg_stats(ns.ref), leg_stats(ns.ours)
    if not ref or not ours:
        raise SystemExit(f"missing metric vectors: ref={sorted(ref)} "
                         f"ours={sorted(ours)}")

    n_ref = next(iter(ref.values()))[2]
    n_ours = next(iter(ours.values()))[2]
    print(f"| metric | noisy | {ns.label_ref} (n={n_ref}) "
          f"| {ns.label_ours} (n={n_ours}) | delta | ours better |")
    print("|---|---|---|---|---|---|")
    for m in METRICS:
        key_n, key_o = f"noisy_{m}", f"output_{m}"
        if key_o not in ref or key_o not in ours:
            continue
        noisy = ref.get(key_n, ours.get(key_n))[0]
        r, o = ref[key_o][0], ours[key_o][0]
        wins = "—"
        if ref[key_o][2] == ours[key_o][2]:
            # per-file paired comparison (same sorted test-file order)
            vr, vo = ref[key_o][3], ours[key_o][3]
            wins = f"{int((vo > vr).sum())}/{len(vr)}"
        fmt = (lambda x: f"{x:.2f}") if m == "sisnr" else (lambda x: f"{x:.4f}")
        print(f"| {m} | {fmt(noisy)} | {fmt(r)} | {fmt(o)} "
              f"| {'+' if o - r >= 0 else ''}{o - r:.3f} | {wins} |")


if __name__ == "__main__":
    main()
