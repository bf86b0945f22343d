#!/usr/bin/env python
"""Flagship quality evaluation via the packed serving engine.

Runs the full T-step reverse sampler over a paired clean/noisy corpus with
a trained checkpoint and writes target/condition/output WAV triplets + the
metric summary — the same output contract as infer.py (reference
infer.py:20-133).  Unlike infer.py (which pads every loader batch to the
dataset-wide max chunk count), this driver flattens ALL utterance chunks
into one row stream and processes fixed ``--batch-rows`` batches, so the
single compiled program is the SAME shape bench.py caches (packed engine,
8 chunk rows) — on this container that turns a >10-min fresh flagship
compile into a cache hit.

Usage:
  python tools/eval_flagship.py -r <ckpt> [--out DIR] [--batch-rows 8]
                                [--data data/synth/test] [--base]
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp

from sddm_tpu.data.datasets import InferDataset
from sddm_tpu.data.wav_io import save_wav
from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.evaluate import evaluate
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.train.checkpoints import load_checkpoint

SAMPLE_RATE = 16000
NUM_SAMPLES = 16448
T_STEPS = 100


def main():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logger = logging.getLogger("eval_flagship")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-r", "--resume", required=True)
    ap.add_argument("--out", default="saved/flagship_eval")
    ap.add_argument("--data", default="data/synth/test")
    ap.add_argument("--batch-rows", type=int, default=8,
                    help="chunk rows per compiled sampler call (8 matches "
                    "bench.py's cached program)")
    ap.add_argument("--base", action="store_true",
                    help="plain flax engine instead of the packed engine")
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate only the first N files (0 = all)")
    ap.add_argument("--ddim", type=float, default=None, nargs="?",
                    const=0.0, metavar="ETA",
                    help="DDIM sampler (deterministic at the default eta=0)")
    ap.add_argument("--steps", type=int, default=None,
                    help="fast sampling: reverse steps over a schedule "
                    "subsequence (composes with --ddim)")
    ap.add_argument("--f32", action="store_true",
                    help="float32 activations (numerics-ladder probe; "
                    "serving default is bf16)")
    ap.add_argument("--seed", type=int, default=0,
                    help="sampler noise-stream seed (vary to measure "
                    "the stochastic sampler's quality spread)")
    ns = ap.parse_args()

    # Build diffusion + network from the run dir's config.json when present
    # (any UNetModified2 recipe — e.g. the head-to-head small leg); fall
    # back to the flagship recipe for bare checkpoints.
    run_cfg = os.path.join(os.path.dirname(os.path.abspath(ns.resume)),
                           "config.json")
    net_args = dict(inner_channel=32, norm_groups=32,
                    channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
                    segment_len=128, segment_stride=64)
    diff_args = dict(schedule="linear", n_timestep=T_STEPS,
                     linear_start=1e-6, linear_end=1e-3)
    num_samples = NUM_SAMPLES
    if os.path.exists(run_cfg):
        cfg = json.load(open(run_cfg))
        assert cfg["network"]["type"] == "UNetModified2", cfg["network"]
        net_args.update(cfg["network"]["args"])
        diff_args.update(cfg["diffusion"]["args"])
        num_samples = cfg.get("num_samples", NUM_SAMPLES)
        logger.info("model/schedule from %s", run_cfg)

    d = dict(diff_args)
    sched = DiffusionSchedule.create(
        d.pop("schedule"), d.pop("n_timestep"),
        d.pop("linear_start"), d.pop("linear_end"), **d)
    net = UNetModified2(
        num_samples=num_samples,
        dtype=jnp.float32 if ns.f32 else jnp.bfloat16, **net_args)
    base = SDDM(sched, net, p_transition="condition_in")
    key = jax.random.PRNGKey(0)
    init_params = base.init(key, (1, 1, num_samples))
    ckpt = load_checkpoint(ns.resume, params_template=init_params)
    params = ckpt["params"]
    if ns.base:
        model = base
    else:
        from sddm_tpu.models.unet_packed import PackedUNetModified2

        engine = PackedUNetModified2(net)
        params = engine.pack(params)
        model = SDDM(sched, engine, p_transition="condition_in")
    if ns.ddim is not None:
        model = model.with_ddim(ns.ddim)
    if ns.steps is not None:
        model = model.with_sampling_steps(ns.steps)
    infer = jax.jit(model.infer)
    key = jax.random.PRNGKey(ns.seed)

    dataset = InferDataset(data_root=ns.data, datatype=".wav",
                           sample_rate=SAMPLE_RATE, T=num_samples)
    n_files = len(dataset.inventory)
    if ns.limit:
        n_files = min(n_files, ns.limit)

    out_root = os.path.join(
        ns.out, time.strftime("%m%d_%H%M%S"), "samples")
    paths = {k: os.path.join(out_root, k)
             for k in ("target", "output", "condition")}
    for p in paths.values():
        os.makedirs(p, exist_ok=True)

    # flatten every utterance's chunk rows into one stream; fixed-size
    # batches keep ONE compiled program regardless of per-file chunk counts
    def row_stream():
        for fi in range(n_files):
            clean, noisy, _ = dataset[fi]
            for r in range(clean.shape[0]):
                yield fi, clean[r], noisy[r]

    B = ns.batch_rows
    pend = {}   # file idx -> {"rows": [...], "target": [...], "cond": [...]}
    done = 0
    t0 = time.perf_counter()

    def flush(fi):
        nonlocal done
        d = pend.pop(fi)
        name = dataset.get_name(fi)
        for kind in ("output", "target", "condition"):
            save_wav(os.path.join(paths[kind], f"{name}.wav"),
                     np.concatenate(d[kind], -1).reshape(1, -1), SAMPLE_RATE)
        done += 1

    batch_rows, meta = [], []
    stream = list(row_stream())
    for pos, (fi, clean, noisy) in enumerate(stream):
        batch_rows.append((clean, noisy))
        meta.append(fi)
        if len(batch_rows) == B or pos == len(stream) - 1:
            real = len(batch_rows)
            tgt = np.stack([c for c, _ in batch_rows])
            cnd = np.stack([x for _, x in batch_rows])
            if real < B:
                z = np.zeros((B - real,) + tgt.shape[1:], tgt.dtype)
                tgt, cnd = np.concatenate([tgt, z]), np.concatenate([cnd, z])
            key, sub = jax.random.split(key)
            out = np.asarray(infer(params, sub, jnp.asarray(cnd)))[:real]
            for r in range(real):
                fi_r = meta[r]
                d = pend.setdefault(
                    fi_r, {"output": [], "target": [], "condition": []})
                d["output"].append(out[r])
                d["target"].append(tgt[r])
                d["condition"].append(cnd[r])
            # a file is complete once the stream has moved past it
            for fi_done in [k for k in pend
                            if k < (meta[-1] if pos < len(stream) - 1
                                    else n_files)]:
                flush(fi_done)
            batch_rows, meta = [], []
    for fi_done in sorted(pend):
        flush(fi_done)
    dt = time.perf_counter() - t0
    logger.info(json.dumps({"files": done, "rows": len(stream),
                            "seconds": round(dt, 1)}))
    evaluate(out_root, ".wav", SAMPLE_RATE,
             {"pesq_wb", "sisnr", "stoi"}, logger)


if __name__ == "__main__":
    main()
