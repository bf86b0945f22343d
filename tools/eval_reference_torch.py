#!/usr/bin/env python
"""Evaluate a TRAINED torch reference checkpoint on the synthetic test set —
the reference-side leg of the head-to-head quality table (VERDICT r3 #1).

Uses the reference's own classes verbatim from /root/reference (imported,
not copied): GaussianDiffusion + UNetModified2 + SDDM with the
``condition_in`` sampler, exactly the small recipe that
tools/train_reference_torch.py trains.  The enhancement protocol mirrors
our infer.py / InferDataset (reference infer.py:20-133): each utterance is
zero-padded to a multiple of num_samples, enhanced as chunk rows, and the
concatenated output is written next to target/condition WAVs.  Metrics come
from sddm_tpu.evaluate — the IDENTICAL metric implementations score both
frameworks' outputs, so the head-to-head has no metric skew.

Usage:
  python tools/eval_reference_torch.py --ckpt artifacts/head_to_head/ref_ckpt/best.pth \
      [--data data/synth2/test] [--out saved/ref_eval] [--batch-rows 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from model.UNetModified2 import UNetModified2
from model.diffusion import GaussianDiffusion
from model.model import SDDM

from sddm_tpu.data import load_wav
from sddm_tpu.data.wav_io import save_wav

NUM_SAMPLES = 16448
T_STEPS = 100


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default="data/synth2/test")
    ap.add_argument("--out", default="saved/ref_eval")
    ap.add_argument("--batch-rows", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--resume-dir", default=None,
                    help="existing run dir (the one containing samples/) — "
                         "files already present in samples/output are "
                         "skipped, new outputs land in the same dir")
    args = ap.parse_args()

    torch.manual_seed(0)
    device = torch.device("cpu")
    diffusion = GaussianDiffusion(
        schedule="linear", n_timestep=T_STEPS,
        linear_start=1e-6, linear_end=1e-3, device=device,
    )
    network = UNetModified2(
        num_samples=NUM_SAMPLES, in_channel=2, out_channel=1,
        inner_channel=16, norm_groups=16, channel_mults=[1, 2, 3],
        res_blocks=1, dropout=0, segment_len=128, segment_stride=64,
    )
    model = SDDM(diffusion, network, noise_condition="sqrt_alpha_bar",
                 p_transition="condition_in", q_transition="original")
    payload = torch.load(args.ckpt, map_location="cpu")
    model.load_state_dict(payload["state_dict"])
    model.eval()
    print(f"loaded {args.ckpt} (epoch {payload.get('epoch')}, "
          f"val_loss {payload.get('val_loss')})", flush=True)

    clean_dir = os.path.join(args.data, "clean")
    names = sorted(n for n in os.listdir(clean_dir) if n.endswith(".wav"))
    if args.limit:
        names = names[: args.limit]

    if args.resume_dir:
        out_root = os.path.join(args.resume_dir, "samples")
    else:
        out_root = os.path.join(args.out, time.strftime("%m%d_%H%M%S"),
                                "samples")
    paths = {k: os.path.join(out_root, k)
             for k in ("target", "output", "condition")}
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    already = set(os.listdir(paths["output"]))
    if already:
        names = [n for n in names if n not in already]
        print(f"resume: {len(already)} files present, "
              f"{len(names)} remaining", flush=True)

    # flatten all files' chunk rows into one stream; fixed batches
    def rows():
        for name in names:
            c, _sr = load_wav(os.path.join(args.data, "clean", name))
            y, _sr = load_wav(os.path.join(args.data, "noisy", name))
            c, y = c.reshape(-1), y.reshape(-1)
            n_chunk = -(-len(c) // NUM_SAMPLES)
            pad = n_chunk * NUM_SAMPLES - len(c)
            c = np.pad(c, (0, pad)).reshape(n_chunk, 1, NUM_SAMPLES)
            y = np.pad(y, (0, pad)).reshape(n_chunk, 1, NUM_SAMPLES)
            for r in range(n_chunk):
                yield name, n_chunk, c[r], y[r]

    stream = list(rows())
    B = args.batch_rows
    pend = {}
    done = 0
    t0 = time.time()
    for start in range(0, len(stream), B):
        batch = stream[start : start + B]
        cond = np.stack([b[3] for b in batch])
        if len(batch) < B:  # pad the tail batch (rows discarded below)
            cond = np.concatenate(
                [cond, np.zeros((B - len(batch), 1, NUM_SAMPLES), np.float32)]
            )
        with torch.no_grad():
            out = model.infer(torch.from_numpy(cond))
        out = out.numpy()[: len(batch)]
        for (name, n_chunk, c, y), o in zip(batch, out):
            d = pend.setdefault(
                name, {"n": n_chunk, "target": [], "condition": [],
                       "output": []})
            d["target"].append(c)
            d["condition"].append(y)
            d["output"].append(o)
            if len(d["output"]) == d["n"]:
                for kind in ("target", "condition", "output"):
                    save_wav(
                        os.path.join(paths[kind], name),
                        np.concatenate(d[kind], -1).reshape(1, -1), 16000)
                pend.pop(name)
                done += 1
        print(f"\r{done}/{len(names)} files "
              f"({time.time() - t0:.0f}s)", end="", flush=True)
    print()
    assert not pend, f"unfinished files: {sorted(pend)}"

    from sddm_tpu.evaluate import evaluate

    metrics = evaluate(out_root, ".wav", 16000,
                       ["pesq_wb", "stoi", "sisnr"])
    print(json.dumps({"seconds": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
