#!/usr/bin/env python
"""WaveGrad sampler perf probe: trace one T-step reverse sampler call and
A/B candidate forward variants at the shipped-recipe geometry
(reference model/wavegrad.py:140-179; configs/config_wavegrad.json).

The zoo table (PERFORMANCE.md) has WaveGrad at 1.9x RTF (T=1000, batch 8)
— the weakest zoo number.  This probe answers "where do the ~3 ms/step
go?" so any optimization is structural, not speculative.

Usage: python tools/wavegrad_probe.py [trace|fwd]
  trace   profile a short sampler run to /tmp/sddm_trace_wavegrad
          (aggregate with tools/trace_ops.py)
  fwd     time the bare network forward (one reverse-step body)
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
from sddm_tpu.models import SDDM_spectrogram, WaveGrad

BATCH = 8
HOP, FRAMES, SR = 300, 54, 22050
T_STEPS = 1000


def setup():
    sched = DiffusionSchedule.create("linear", T_STEPS, 1e-6, 0.01)
    net = WaveGrad(dtype=jnp.bfloat16)
    model = SDDM_spectrogram(sched, net, hop_samples=HOP)
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, FRAMES))
    params = model.init(jax.random.PRNGKey(0), mel.shape)
    return sched, net, model, mel, params


def probe_trace():
    sched, net, model, mel, params = setup()
    # a 50-step subsequence keeps the trace small; the step body is the
    # same compiled while-loop body as the full T=1000 run
    fast = model.with_sampling_steps(50)
    infer = jax.jit(fast.infer)
    key = jax.random.PRNGKey(0)
    infer(params, key, mel).block_until_ready()
    with jax.profiler.trace("/tmp/sddm_trace_wavegrad"):
        infer(params, jax.random.fold_in(key, 1), mel).block_until_ready()
    print("trace -> /tmp/sddm_trace_wavegrad (50 steps; divide by 50)")


def probe_fwd():
    sched, net, model, mel, params = setup()
    x = jax.random.normal(jax.random.PRNGKey(2),
                          (BATCH, 1, HOP * FRAMES), jnp.float32)
    nl = jnp.full((BATCH, 1, 1), 0.7)

    @jax.jit
    def fwd(x):
        return net.apply(params, mel, x, nl)

    x = fwd(x)
    x.block_until_ready()
    start = time.perf_counter()
    iters = 30
    for _ in range(iters):
        x = fwd(x)  # chained: the axon relay result-caches identical calls
    x.block_until_ready()
    dt = (time.perf_counter() - start) / iters
    print(f"wavegrad forward: {dt * 1e3:.3f} ms/call (batch {BATCH}, "
          f"T={HOP * FRAMES})")


if __name__ == "__main__":
    which = sys.argv[1:] or ["fwd"]
    if "trace" in which:
        probe_trace()
    if "fwd" in which:
        probe_fwd()
