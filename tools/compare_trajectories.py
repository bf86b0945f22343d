#!/usr/bin/env python
"""Merge a reference-torch trajectory (tools/train_reference_torch.py --out)
with an sddm_tpu run's scalars.jsonl into one side-by-side markdown table —
the quality-evidence artifact for PERFORMANCE.md.

Comparable columns: per-epoch train loss (both are L1 on eps) and full-
sampler validation SI-SNR.  (val_loss is NOT comparable: the torch leg logs
eps-prediction L1 while the sddm_tpu trainer logs L1 between the enhanced
waveform and the clean target, matching the reference Trainer._valid_epoch.)

Usage:
  python tools/compare_trajectories.py /tmp/ref_traj.json \
      saved/SDDM2_UNet_synth_small/<run>/scalars.jsonl [--steps-per-epoch 25]
"""

import argparse
import json
from collections import defaultdict


def load_ours(path, steps_per_epoch, valid_period):
    per_epoch_loss = defaultdict(list)
    val_groups = []  # list of [values] — one group per valid epoch
    last_val_step = None
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            tag, step, value = rec["tag"], rec["step"], rec["value"]
            if tag == "loss/train":
                per_epoch_loss[(step - 1) // steps_per_epoch + 1].append(value)
            elif tag == "sisnr/valid":
                # valid batches log at consecutive writer steps; a gap
                # starts the next valid epoch's group
                if last_val_step is None or step != last_val_step + 1:
                    val_groups.append([])
                val_groups[-1].append(value)
                last_val_step = step
    loss = {e: sum(v) / len(v) for e, v in per_epoch_loss.items()}
    val_sisnr = {
        (i + 1) * valid_period: sum(g) / len(g)
        for i, g in enumerate(val_groups)
    }
    return loss, val_sisnr


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ref_json")
    ap.add_argument("ours_jsonl")
    ap.add_argument("--steps-per-epoch", type=int, default=25)
    ap.add_argument("--valid-period", type=int, default=5)
    args = ap.parse_args()

    ref = {r["epoch"]: r for r in json.load(open(args.ref_json))}
    ours_loss, ours_sisnr = load_ours(
        args.ours_jsonl, args.steps_per_epoch, args.valid_period
    )

    print("| epoch | train L1 (torch ref) | train L1 (sddm_tpu) | "
          "val SI-SNR dB (torch ref) | val SI-SNR dB (sddm_tpu) |")
    print("|---|---|---|---|---|")
    for e in sorted(set(ref) | set(ours_loss)):
        r = ref.get(e, {})
        cells = [
            f"{r['loss']:.4f}" if "loss" in r else "",
            f"{ours_loss[e]:.4f}" if e in ours_loss else "",
            f"{r['val_sisnr']:.2f}" if "val_sisnr" in r else "",
            f"{ours_sisnr[e]:.2f}" if e in ours_sisnr else "",
        ]
        if any(cells):
            print(f"| {e} | " + " | ".join(cells) + " |")
    nz = [r for r in ref.values() if "noisy_sisnr" in r]
    if nz:
        print(f"\n(noisy input SI-SNR on the val crops: "
              f"{nz[0]['noisy_sisnr']:.2f} dB)")


if __name__ == "__main__":
    main()
