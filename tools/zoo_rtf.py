#!/usr/bin/env python
"""Zoo sampler RTF: DiffWave and WaveGrad full reverse-diffusion samplers on
one chip, at their shipped-recipe geometry (VERDICT r2 #7 — these 1-D
small-channel stacks run UNPACKED; this records the measured gap vs the
packed flagship).

DiffWave (configs/config_diffwave.json): T=200, residual_channels=64,
30 layers, hop 256 spectrogram conditioning — reference model/diffwave.py.
WaveGrad (configs/config_wavegrad.json): T=1000, fixed 15M topology, hop 300
mel conditioning — reference model/wavegrad.py.

Usage: python tools/zoo_rtf.py [diffwave] [diffwave_fused] [wavegrad]
                                [--ddim N]
--ddim N serves every selected model through the DDIM sampler at N
reverse steps (model.with_ddim().with_sampling_steps(N)); --steps N
subsamples the ancestral schedule instead (composable: --ddim eta-form
with --steps) — the few-step
regime both papers ship (WaveGrad's released schedule is 6 iterations,
wavegrad.py's Appendix B; DiffWave's "fast" schedule is 6).  RTF rows
for the shipped ancestral T and for --ddim 6 live in PERFORMANCE.md.
Prints one JSON line per model: {"metric", "value", "unit"}.
"""

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
from sddm_tpu.models import DiffWave, SDDM_spectrogram, WaveGrad

BATCH = 8


def bench(name, model, params, condition, sample_rate, n_audio, t_steps,
          iters=3, peak=197e12):
    key = jax.random.PRNGKey(0)
    compiled = jax.jit(model.infer).lower(params, key, condition).compile()
    leaves = jax.tree_util.tree_leaves(compiled(params, key, condition))
    leaves[0].block_until_ready()  # warmup

    start = time.perf_counter()
    for i in range(iters):
        out = compiled(params, jax.random.fold_in(key, i), condition)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    elapsed = time.perf_counter() - start

    audio_seconds = iters * BATCH * n_audio / sample_rate
    rtf = audio_seconds / elapsed
    # XLA's flop count for the program -> sustained MFU.  cost_analysis
    # counts a while-loop body ONCE regardless of trip count (verified in
    # tools/mfu.py), so the figure is per reverse step; scale by t_steps.
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost["flops"]) * t_steps
        tflops = flops * iters / elapsed / 1e12
        mfu = 100.0 * tflops * 1e12 / peak
    except Exception:
        tflops, mfu = float("nan"), float("nan")
    print(json.dumps({
        "metric": f"{name}_sampler_rtf_per_chip",
        "value": round(rtf, 3),
        "unit": f"x_realtime (T={t_steps}, batch={BATCH}; "
                f"{iters * t_steps / elapsed:.1f} reverse steps/s; "
                f"{tflops:.1f} TFLOP/s = {mfu:.1f}% of v5e bf16 peak)",
    }))
    return rtf


def bench_diffwave(fused=False, ddim=0, steps=0):
    t_steps, hop, frames, sr = 200, 256, 64, 16000
    sched = DiffusionSchedule.create("linear", t_steps, 1e-4, 0.02)
    net = DiffWave(freq_bins=513, residual_channels=64, residual_layers=30,
                   dilation_cycle_length=10, dtype=jnp.bfloat16)
    if fused:
        from sddm_tpu.models import FusedDiffWave
        net_or_engine = FusedDiffWave(net)
    else:
        net_or_engine = net
    model = SDDM_spectrogram(sched, net_or_engine, hop_samples=hop,
                             noise_condition="time_step")
    if ddim:
        model = model.with_ddim()
    if ddim or steps:
        t_steps = steps or ddim
        model = model.with_sampling_steps(t_steps)
    spec = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 513, frames))
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((BATCH, 513, frames)),
        jnp.zeros((BATCH, 1, hop * frames)), jnp.ones((BATCH, 1, 1)))
    name = "diffwave_fused" if fused else "diffwave"
    if ddim:
        name += f"_ddim{ddim}"
    elif steps:
        name += f"_anc{steps}"
    bench(name, model, params, spec, sr, hop * frames, t_steps)


def bench_wavegrad(ddim=0, steps=0):
    t_steps, hop, frames, sr = 1000, 300, 54, 22050
    sched = DiffusionSchedule.create("linear", t_steps, 1e-6, 0.01)
    net = WaveGrad(dtype=jnp.bfloat16)
    model = SDDM_spectrogram(sched, net, hop_samples=hop)
    if ddim:
        model = model.with_ddim()
    if ddim or steps:
        t_steps = steps or ddim
        model = model.with_sampling_steps(t_steps)
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, frames))
    params = model.init(jax.random.PRNGKey(0), mel.shape)
    name = "wavegrad" + (f"_ddim{ddim}" if ddim
                         else f"_anc{steps}" if steps else "")
    bench(name, model, params, mel, sr, hop * frames, t_steps)


if __name__ == "__main__":
    argv = sys.argv[1:]
    ddim = steps = 0
    if "--ddim" in argv:
        i = argv.index("--ddim")
        ddim = int(argv[i + 1])
        del argv[i:i + 2]
    if "--steps" in argv:
        i = argv.index("--steps")
        steps = int(argv[i + 1])
        del argv[i:i + 2]
    unknown = [a for a in argv
               if a not in ("diffwave", "diffwave_fused", "wavegrad")]
    if unknown:
        sys.exit(f"unknown selector(s): {unknown}")
    which = argv or ["diffwave", "diffwave_fused", "wavegrad"]
    if "diffwave" in which:
        bench_diffwave(ddim=ddim, steps=steps)
    if "diffwave_fused" in which:
        bench_diffwave(fused=True, ddim=ddim, steps=steps)
    if "wavegrad" in which:
        bench_wavegrad(ddim=ddim, steps=steps)
