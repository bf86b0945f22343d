#!/usr/bin/env python
"""On-chip A/B: is the _GN optimization_barrier still needed post-clamp?

Loads the TRAINED flagship checkpoint (the weight regime that exposed the
round-3 GroupNorm cancellation NaN), runs the packed sampler with the
barrier ON and OFF, and reports finiteness + per-call time for each leg.

Usage: python tools/barrier_ab.py [--ckpt artifacts/flagship_synth/model_best.ckpt]
"""

import argparse
import json
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

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.train.checkpoints import load_checkpoint

NUM_SAMPLES = 16448
T_STEPS = 100
BATCH = 8


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="artifacts/flagship_synth/model_best.ckpt")
    ap.add_argument("--iters", type=int, default=5)
    ns = ap.parse_args()

    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 1e-3)
    net = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=32, norm_groups=32,
        channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
        segment_len=128, segment_stride=64, dtype=jnp.bfloat16,
    )
    base = SDDM(sched, net, p_transition="condition_in")
    key = jax.random.PRNGKey(0)
    init_params = base.init(key, (BATCH, 1, NUM_SAMPLES))
    params = load_checkpoint(ns.ckpt, params_template=init_params)["params"]
    condition = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 1, NUM_SAMPLES))

    from sddm_tpu.models import unet_packed
    from sddm_tpu.models.unet_packed import PackedUNetModified2

    for barrier in (True, False):
        unet_packed._STATS_BARRIER = barrier
        engine = PackedUNetModified2(net)
        packed = engine.pack(params)
        model = SDDM(sched, engine, p_transition="condition_in")
        infer = jax.jit(model.infer)
        out = infer(packed, key, condition)
        finite = [bool(jnp.isfinite(out).all())]
        out.block_until_ready()
        start = time.perf_counter()
        for i in range(ns.iters):
            out = infer(packed, jax.random.fold_in(key, i), condition)
            finite.append(bool(jnp.isfinite(out).all()))
        dt = (time.perf_counter() - start) / ns.iters
        rtf = BATCH * NUM_SAMPLES / 16000.0 / dt
        print(json.dumps({
            "barrier": barrier,
            "finite_calls": f"{sum(finite)}/{len(finite)}",
            "sampler_ms": round(dt * 1e3, 2),
            "rtf": round(rtf, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
