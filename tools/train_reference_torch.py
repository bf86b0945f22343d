#!/usr/bin/env python
"""Train the REFERENCE (torch, CPU) on the synthetic corpus for the
trajectory-comparison leg of the quality evidence (VERDICT #5).

Uses the reference's own GaussianDiffusion / SDDM / UNetModified2 / l1_loss
classes verbatim from /root/reference (imported, not copied).  Only the WAV
IO is replaced (torchaudio is not installed in this container) — files are
read with the same native/stdlib reader the sddm_tpu data pipeline uses, so
both frameworks see identical samples.

The recipe mirrors configs/config_unet_synth_small.json (the scaled flagship:
inner 16, mults (1,2,3), T=100, Adam(2e-3, amsgrad), L1 on eps, batch 8,
16448-sample crops) so val-loss / SI-SNR trajectories are directly
comparable with `python train.py -c configs/config_unet_synth_small.json`.

Usage: python tools/train_reference_torch.py [--epochs 30] [--out /tmp/ref_traj.json]
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
from model.loss import l1_loss
from model.model import SDDM

from sddm_tpu.data import load_wav

NUM_SAMPLES = 16448
BATCH = 8
T_STEPS = 100


def load_dir(root, limit=None):
    clean_dir = os.path.join(root, "clean")
    names = sorted(n for n in os.listdir(clean_dir)
                   if n.endswith(".wav"))[:limit]
    clean, noisy = [], []
    for n in names:
        c, _sr = load_wav(os.path.join(root, "clean", n))
        y, _sr = load_wav(os.path.join(root, "noisy", n))
        clean.append(np.asarray(c, np.float32).reshape(-1))
        noisy.append(np.asarray(y, np.float32).reshape(-1))
    return clean, noisy


def crop_batch(clean, noisy, idxs, rng):
    tgt = np.zeros((len(idxs), 1, NUM_SAMPLES), np.float32)
    cnd = np.zeros((len(idxs), 1, NUM_SAMPLES), np.float32)
    for row, i in enumerate(idxs):
        n = clean[i].shape[0]
        if n >= NUM_SAMPLES:
            s = rng.randint(0, n - NUM_SAMPLES + 1)
            tgt[row, 0] = clean[i][s:s + NUM_SAMPLES]
            cnd[row, 0] = noisy[i][s:s + NUM_SAMPLES]
        else:
            tgt[row, 0, :n] = clean[i]
            cnd[row, 0, :n] = noisy[i]
    return torch.from_numpy(tgt), torch.from_numpy(cnd)


def sisnr(est, target, eps=1e-8):
    est = est - est.mean(axis=-1, keepdims=True)
    target = target - target.mean(axis=-1, keepdims=True)
    proj = (est * target).sum(-1, keepdims=True) * target / (
        (target**2).sum(-1, keepdims=True) + eps
    )
    noise = est - proj
    return float(np.mean(10 * np.log10(
        ((proj**2).sum(-1) + eps) / ((noise**2).sum(-1) + eps)
    )))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--valid-period", type=int, default=5)
    ap.add_argument("--data", default="data/synth")
    ap.add_argument("--out", default="/tmp/ref_traj.json")
    ap.add_argument("--ckpt-dir", default="",
                    help="if set, save state_dict checkpoints here "
                    "(last.pth each validation, best.pth on min val_loss) "
                    "so the converged reference model can be evaluated on "
                    "the full test set")
    ap.add_argument("--resume", default="",
                    help="path to a last.pth saved by this script: restarts "
                    "from its epoch+1 with its weights (and optimizer state "
                    "when present — older checkpoints lack it, in which case "
                    "Adam moments restart and the loss shows a brief "
                    "transient).  The data-order RNG is reseeded with the "
                    "start epoch, so shuffles/crops after a resume differ "
                    "from an uninterrupted run; training dynamics are "
                    "otherwise the reference's own.")
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
    model.to(device)
    opt = torch.optim.Adam(model.parameters(), lr=2e-3, weight_decay=0,
                           amsgrad=True)
    print("params:", sum(p.numel() for p in model.parameters()), flush=True)

    tr_clean, tr_noisy = load_dir(os.path.join(args.data, "train"),
                                  args.n_train)
    va_clean, va_noisy = load_dir(os.path.join(args.data, "test"), args.n_val)

    start_epoch = 1
    traj = []
    best_val = float("inf")
    if args.resume:
        payload = torch.load(args.resume, map_location=device)
        model.load_state_dict(payload["state_dict"])
        if "optimizer" in payload:
            opt.load_state_dict(payload["optimizer"])
        start_epoch = payload["epoch"] + 1
        best_val = payload.get("best_val", float("inf"))
        if os.path.exists(args.out):
            traj = [r for r in json.load(open(args.out))
                    if r["epoch"] <= payload["epoch"]]
            vals = [r["val_loss"] for r in traj if "val_loss" in r]
            if vals:
                best_val = min(best_val, min(vals))
        print(json.dumps({"resumed_from": args.resume,
                          "start_epoch": start_epoch,
                          "has_optimizer": "optimizer" in payload,
                          "best_val": best_val}), flush=True)

    rng = np.random.RandomState(start_epoch - 1)
    n = len(tr_clean)
    steps_per_epoch = n // BATCH
    if args.ckpt_dir:
        os.makedirs(args.ckpt_dir, exist_ok=True)
    for epoch in range(start_epoch, args.epochs + 1):
        model.train()
        perm = rng.permutation(n)
        ep_loss = 0.0
        t0 = time.time()
        for s in range(steps_per_epoch):
            idxs = perm[s * BATCH:(s + 1) * BATCH]
            target, condition = crop_batch(tr_clean, tr_noisy, idxs, rng)
            opt.zero_grad()
            predicted, noise = model(target, condition)
            loss = l1_loss(predicted, noise)
            loss.backward()
            opt.step()
            ep_loss += float(loss.detach())
        rec = {"epoch": epoch, "loss": ep_loss / steps_per_epoch,
               "sec": round(time.time() - t0, 1)}

        if epoch % args.valid_period == 0 or epoch == args.epochs:
            model.eval()
            with torch.no_grad():
                vrng = np.random.RandomState(1234)
                vt, vc = crop_batch(va_clean, va_noisy,
                                    np.arange(len(va_clean)), vrng)
                predicted, noise = model(vt, vc)
                rec["val_loss"] = float(l1_loss(predicted, noise))
                out = model.infer(vc).numpy()[:, 0, :]
                rec["val_sisnr"] = sisnr(out, vt.numpy()[:, 0, :])
                rec["noisy_sisnr"] = sisnr(vc.numpy()[:, 0, :],
                                           vt.numpy()[:, 0, :])
            if args.ckpt_dir:
                if rec["val_loss"] < best_val:
                    best_val = rec["val_loss"]
                    torch.save({"epoch": epoch,
                                "state_dict": model.state_dict(),
                                "val_loss": rec["val_loss"]},
                               os.path.join(args.ckpt_dir, "best.pth"))
                payload = {"epoch": epoch, "state_dict": model.state_dict(),
                           "optimizer": opt.state_dict(),
                           "val_loss": rec["val_loss"],
                           "best_val": best_val}
                torch.save(payload, os.path.join(args.ckpt_dir, "last.pth"))
        traj.append(rec)
        print(json.dumps(rec), flush=True)
        json.dump(traj, open(args.out, "w"), indent=1)


if __name__ == "__main__":
    main()
