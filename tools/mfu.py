#!/usr/bin/env python
"""End-to-end MFU of the flagship reverse sampler (VERDICT r2 weak #2).

Times the full T-step packed (or base) sampler and divides XLA's own cost
analysis (compiled.cost_analysis()["flops"]) by wall-clock to get sustained
TFLOP/s and %-of-peak.  Peak defaults to TPU v5e bf16 (197 TFLOP/s/chip).

Usage: python tools/mfu.py [--engine packed|base] [--batch 8] [--peak 197e12]
"""

import argparse
import json
import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2

SAMPLE_RATE = 16000
NUM_SAMPLES = 16448
T_STEPS = 100


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", choices=("packed", "base"), default="packed")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 8 (sampler) / 16 (--train, the "
                    "production config_unet.json batch)")
    ap.add_argument("--peak", type=float, default=197e12,
                    help="chip peak FLOP/s for the %%-of-peak figure "
                    "(default: v5e bf16)")
    ap.add_argument("--train", action="store_true",
                    help="measure the PRODUCTION train step "
                    "(make_train_step at the flagship batch 16, plain "
                    "engine) instead of the sampler — VERDICT r3 item 4a")
    ns = ap.parse_args()
    if ns.batch is None:
        ns.batch = 16 if ns.train else 8

    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 1e-3)
    net = UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=32, norm_groups=32,
        channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
        segment_len=128, segment_stride=64, dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    base = SDDM(sched, net, p_transition="condition_in")
    if ns.train:
        return mfu_train(sched, net, base, key, ns)
    params = base.init(key, (ns.batch, 1, NUM_SAMPLES))
    if ns.engine == "packed":
        from sddm_tpu.models.unet_packed import PackedUNetModified2

        engine = PackedUNetModified2(net)
        params = engine.pack(params)
        model = SDDM(sched, engine, p_transition="condition_in")
    else:
        model = base
    condition = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (ns.batch, 1, NUM_SAMPLES)
    )

    lowered = jax.jit(model.infer).lower(params, key, condition)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    # XLA's cost analysis counts a while-loop BODY ONCE regardless of trip
    # count (verified: T=5 and T=20 samplers report identical flops), so the
    # reported figure is per reverse STEP; scale by T for the full call.
    flops = float(cost.get("flops", float("nan"))) * T_STEPS

    compiled(params, key, condition).block_until_ready()  # warmup
    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        out = compiled(params, jax.random.fold_in(key, i), condition)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    per_call = elapsed / iters
    tflops = flops / per_call / 1e12
    print(json.dumps({
        "engine": ns.engine,
        "batch": ns.batch,
        "sampler_ms": round(per_call * 1e3, 2),
        "flops_per_call": flops,
        "sustained_tflops": round(tflops, 2),
        "pct_of_peak": round(100 * tflops * 1e12 / ns.peak, 1),
        "rtf": round(
            ns.batch * NUM_SAMPLES / SAMPLE_RATE / per_call, 2
        ),
    }))


def mfu_train(sched, net, base, key, ns):
    """MFU of the production train step at the flagship recipe (batch 16,
    plain engine — packed training is runtime-disabled, artifacts/nan_repro/).
    No while loop in the step, so cost_analysis()["flops"] is per call."""
    import optax

    from sddm_tpu.models.losses import l1_loss
    from sddm_tpu.train.state import TrainState
    from sddm_tpu.train.trainer import make_train_step

    batch = ns.batch
    params = base.init(key, (batch, 1, NUM_SAMPLES))
    tx = optax.amsgrad(2e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(base, l1_loss, tx), donate_argnums=(0,))

    rng = jax.random.PRNGKey(7)
    target = 0.1 * jax.random.normal(rng, (batch, 1, NUM_SAMPLES))
    condition = target + 0.02 * jax.random.normal(
        jax.random.fold_in(rng, 1), (batch, 1, NUM_SAMPLES)
    )
    lowered = step.lower(state, key, target, condition)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", float("nan")))
    bytes_accessed = float(cost.get("bytes accessed", float("nan")))

    state, loss = compiled(state, key, target, condition)
    jax.block_until_ready(loss)
    iters = 20
    start = time.perf_counter()
    for i in range(iters):
        state, loss = compiled(state, jax.random.fold_in(key, i), target,
                               condition)
    jax.block_until_ready(loss)
    per_call = (time.perf_counter() - start) / iters

    tflops = flops / per_call / 1e12
    print(json.dumps({
        "mode": "train_step",
        "batch": batch,
        "step_ms": round(per_call * 1e3, 2),
        "flops_per_call": flops,
        "hbm_bytes_per_call": bytes_accessed,
        "hbm_gbps": round(bytes_accessed / per_call / 1e9, 1),
        "sustained_tflops": round(tflops, 2),
        "pct_of_peak": round(100 * tflops * 1e12 / ns.peak, 1),
        "crops_per_sec": round(batch / per_call, 1),
    }))


if __name__ == "__main__":
    main()
