#!/usr/bin/env python
"""Perf probe: A/B micro-benchmarks for the flagship denoiser on one TPU chip.

Measures the network FORWARD (the sampler's inner hot path,
reference model/UNetModified2.py:237-269) and the full T-step sampler under
controlled variants, so layout/dtype levers can be compared without
recompiling the whole training stack.

Usage: python tools/perf_probe.py [variant ...]
Variants:
  fwd            flagship forward, bf16, norm f32 (round-1 baseline)
  fwd-normbf16   flagship forward, bf16, GroupNorm arithmetic in bf16
  fwd-c64        inner_channel=64 variant forward
  sampler        full 100-step sampler, norm f32 (bench.py baseline)
  sampler-normbf16  full sampler with bf16 norms
  trace          profile one sampler call to /tmp/sddm_trace
"""

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

NUM_SAMPLES = 16448
BATCH = 8
T_STEPS = 100


def make_net(inner=32, norm_dtype=jnp.float32):
    return UNetModified2(
        num_samples=NUM_SAMPLES, inner_channel=inner, norm_groups=32,
        channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
        segment_len=128, segment_stride=64, dtype=jnp.bfloat16,
        norm_dtype=norm_dtype,
    )


def timeit(fn, *args, iters=20, warmup=True):
    """DO NOT time repeated identical calls on this container: the axon
    relay result-caches (executable, inputs) pairs and reports impossibly
    fast times.  Callers must chain inputs; this helper is kept only for
    jitted fns whose output feeds nothing (it perturbs args each iter)."""
    if warmup:
        fn(*args).block_until_ready()
        fn(*args).block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - start) / iters


def timeit_chained(fn, x, *args, iters=10):
    """Time fn by feeding its output back as the first argument."""
    x = fn(x, *args)
    x.block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        x = fn(x, *args)
    x.block_until_ready()
    return (time.perf_counter() - start) / iters


def bench_forward(name, net):
    key = jax.random.PRNGKey(0)
    cond = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1, NUM_SAMPLES))
    x_t = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 1, NUM_SAMPLES))
    lvl = jnp.full((BATCH, 1, 1), 0.7)
    params = net.init(key, cond, x_t, lvl)
    fwd = jax.jit(
        lambda x, p, c, l: net.apply(p, c, x, l).astype(x.dtype)
    )
    dt = timeit_chained(fwd, x_t, params, cond, lvl)
    print(f"{name}: {dt*1e3:.3f} ms/forward (batch {BATCH}, chained)",
          flush=True)
    return dt


def bench_sampler(name, net, trace=False):
    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 1e-3)
    model = SDDM(sched, net, p_transition="condition_in")
    key = jax.random.PRNGKey(0)
    params = model.init(key, (BATCH, 1, NUM_SAMPLES))
    cond = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1, NUM_SAMPLES))
    infer = jax.jit(model.infer)
    dt = timeit(infer, params, key, cond, iters=5)
    rtf = BATCH * NUM_SAMPLES / 16000 / dt
    print(f"{name}: {dt*1e3:.1f} ms/sampler  RTF {rtf:.1f}x  "
          f"({T_STEPS/dt:.0f} steps/s)", flush=True)
    if trace:
        with jax.profiler.trace("/tmp/sddm_trace"):
            infer(params, key, cond).block_until_ready()
        print("trace written to /tmp/sddm_trace", flush=True)
    return dt


def bench_scan_forward(name, net, unroll=1, python_loop=False):
    """100 chained forwards — the sampler minus transitions.  Isolates the
    while-loop penalty from the p_transition/PRNG tail.  ``unroll`` unrolls
    the scan body; ``python_loop`` instead dispatches 100 separate jit calls
    (the reference's execution model)."""
    key = jax.random.PRNGKey(0)
    cond = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 1, NUM_SAMPLES))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, 1, NUM_SAMPLES))
    lvl = jnp.full((BATCH, 1, 1), 0.7)
    params = net.init(key, cond, x0, lvl)

    if python_loop:
        fwd = jax.jit(lambda p, c, x: net.apply(p, c, x, lvl).astype(x.dtype))
        fwd(params, cond, x0).block_until_ready()
        start = time.perf_counter()
        x = x0
        for _ in range(T_STEPS):
            x = fwd(params, cond, x)
        x.block_until_ready()
        dt = time.perf_counter() - start
    else:
        def run(p, c, x):
            def step(carry, _):
                out = net.apply(p, c, carry, lvl)
                return out.astype(carry.dtype), None
            y, _ = jax.lax.scan(step, x, None, length=T_STEPS, unroll=unroll)
            return y

        fn = jax.jit(run)
        dt = timeit(fn, params, cond, x0, iters=5)
    print(f"{name}: {dt*1e3:.1f} ms ({dt/T_STEPS*1e3:.3f} ms/forward)",
          flush=True)
    return dt


def bench_packed_sampler(name, net, trace=False, batch=BATCH):
    from sddm_tpu.models.unet_packed import PackedUNetModified2

    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 1e-3)
    base = SDDM(sched, net, p_transition="condition_in")
    key = jax.random.PRNGKey(0)
    params = base.init(key, (batch, 1, NUM_SAMPLES))
    engine = PackedUNetModified2(net)
    model = SDDM(sched, engine, p_transition="condition_in")
    packed = engine.pack(params)
    cond = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                   (batch, 1, NUM_SAMPLES))
    infer = jax.jit(model.infer)
    dt = timeit(infer, packed, key, cond, iters=5)
    rtf = batch * NUM_SAMPLES / 16000 / dt
    print(f"{name}: {dt*1e3:.1f} ms/sampler  RTF {rtf:.1f}x  "
          f"({T_STEPS/dt:.0f} steps/s, batch {batch})", flush=True)
    if trace:
        with jax.profiler.trace("/tmp/sddm_trace_packed"):
            infer(packed, key, cond).block_until_ready()
        print("trace written to /tmp/sddm_trace_packed", flush=True)
    return dt


def bench_train_step(name, net, packed=False, batch=16):
    """fwd+bwd+AMSGrad step A/B: plain flax model vs packed training engine
    (models/unet_packed.py::PackedTrainUNetModified2)."""
    import optax

    from sddm_tpu.models.losses import l1_loss
    from sddm_tpu.train.state import TrainState

    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 1e-3)
    if packed:
        from sddm_tpu.models.unet_packed import PackedTrainUNetModified2

        model = SDDM(sched, PackedTrainUNetModified2(net),
                     p_transition="condition_in")
    else:
        model = SDDM(sched, net, p_transition="condition_in")
    key = jax.random.PRNGKey(0)
    params = model.init(key, (batch, 1, NUM_SAMPLES))
    tx = optax.amsgrad(2e-3)
    state = TrainState.create(params, tx)
    target = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                     (batch, 1, NUM_SAMPLES))
    cond = target + 0.02

    def step(state, k, target, cond):
        def loss_fn(p):
            pred, noise = model.forward(p, k, target, cond,
                                        deterministic=False)
            return l1_loss(pred, noise)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(step=state.step + 1,
                       params=optax.apply_updates(state.params, updates),
                       opt_state=opt_state),
            loss,
        )

    step_jit = jax.jit(step, donate_argnums=(0,))
    state, loss = step_jit(state, key, target, cond)
    jax.block_until_ready(loss)
    iters = 20
    start = time.perf_counter()
    for i in range(iters):
        state, loss = step_jit(state, jax.random.fold_in(key, i), target,
                               cond)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - start) / iters
    crops = batch / dt
    print(f"{name}: {dt*1e3:.1f} ms/step (batch {batch}, {crops:.0f} crops/s)",
          flush=True)
    return dt


def main():
    variants = sys.argv[1:] or ["fwd"]
    for v in variants:
        if v == "fwd":
            bench_forward("fwd bf16/norm-f32", make_net())
        elif v == "fwd-normbf16":
            bench_forward("fwd bf16/norm-bf16", make_net(norm_dtype=None))
        elif v == "fwd-c64":
            bench_forward("fwd c64 bf16/norm-f32", make_net(inner=64))
        elif v == "sampler":
            bench_sampler("sampler norm-f32", make_net())
        elif v == "sampler-normbf16":
            bench_sampler("sampler norm-bf16", make_net(norm_dtype=None))
        elif v == "trace":
            bench_sampler("sampler traced", make_net(), trace=True)
        elif v == "scanfwd":
            bench_scan_forward("scan of 100 forwards", make_net())
        elif v == "scanfwd-unroll4":
            bench_scan_forward("scan unroll=4", make_net(), unroll=4)
        elif v == "loopfwd":
            bench_scan_forward("python-loop 100 forwards", make_net(),
                               python_loop=True)
        elif v == "sampler-barrier":
            from sddm_tpu.models import blocks
            blocks._ENTRY_BARRIER = True
            bench_sampler("sampler conv/GN barrier", make_net())
            blocks._ENTRY_BARRIER = False
        elif v == "sampler-barrier-normbf16":
            from sddm_tpu.models import blocks
            blocks._ENTRY_BARRIER = True
            bench_sampler("sampler barrier+norm-bf16",
                          make_net(norm_dtype=None))
            blocks._ENTRY_BARRIER = False
        elif v == "packed-sampler":
            bench_packed_sampler("packed sampler", make_net())
        elif v == "packed-sampler-dense":
            # A/B leg: dense 3x3 packed res-block kernels (pre-round-3)
            from sddm_tpu.models import unet_packed
            unet_packed._OFFSET_RB = False
            bench_packed_sampler("packed sampler dense-rb", make_net())
            unet_packed._OFFSET_RB = True
        elif v == "packed-trace":
            bench_packed_sampler("packed sampler traced", make_net(),
                                 trace=True)
        elif v == "packed-sampler-b16":
            bench_packed_sampler("packed sampler b16", make_net(), batch=16)
        elif v == "train":
            bench_train_step("train step plain", make_net())
        elif v == "train-packed":
            bench_train_step("train step packed", make_net(), packed=True)
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
