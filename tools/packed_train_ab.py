#!/usr/bin/env python
"""A/B the packed-TRAINING miscompute against the gather-free packing.

artifacts/nan_repro/ established that the packed training step NaNs on
this container's axon PJRT within 2-4 steps at flagship scale (finite
inputs, CPU replay finite) and that the suspected trigger is the
in-graph flat-index weight gathers.  Round 4 added a second traced
packing implementation assembled purely from static slices + concats
(``SDDM_PACK_IMPL=blocks``, ops/packed.py::pack_kernel_blocks) with zero
gather/scatter ops in the lowered packing graph.  This driver runs the
same flagship-scale packed training loop under both implementations and
reports where (if anywhere) the loss goes non-finite.

Usage:
  python tools/packed_train_ab.py [--impl gather|blocks|both]
                                  [--steps 20] [--donate]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax.numpy as jnp
import optax

from sddm_tpu.cli import build_data_loader, build_dataset
from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.models.losses import l1_loss
from sddm_tpu.models.unet_packed import PackedTrainUNetModified2
from sddm_tpu.parallel import make_mesh, replicate, shard_batch
from sddm_tpu.train import make_optimizer
from sddm_tpu.train.state import TrainState
from sddm_tpu.utils import ConfigParser

NS = 16448


def run_leg(impl, n_steps, donate, dl, cfg, time_steps=0):
    os.environ["SDDM_PACK_IMPL"] = impl if impl != "plain" else "gather"
    net = UNetModified2(num_samples=NS, inner_channel=32, norm_groups=32,
                        channel_mults=(1, 2, 3, 4, 5), res_blocks=1,
                        segment_len=128, segment_stride=64,
                        dtype=jnp.bfloat16)
    sched = DiffusionSchedule.create("linear", 100, 1e-6, 1e-3)
    engine = net if impl == "plain" else PackedTrainUNetModified2(net)
    model = SDDM(sched, engine, p_transition="condition_in")
    params = model.init(jax.random.PRNGKey(0), (16, 1, NS))
    tx = make_optimizer(dict(cfg["optimizer"]))
    mesh = make_mesh()
    state = replicate(TrainState.create(params, tx), mesh)

    def deq(x):
        return x.astype(jnp.float32) / 32768.0 if x.dtype == jnp.int16 else x

    def step(state, k, tgt, cond):
        tgt, cond = deq(tgt), deq(cond)

        def loss_fn(p):
            pr, nz = model.forward(p, k, tgt, cond, deterministic=False)
            return l1_loss(pr, nz)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        up, os_ = tx.update(grads, state.opt_state, state.params)
        return TrainState(step=state.step + 1,
                          params=optax.apply_updates(state.params, up),
                          opt_state=os_), loss

    jstep = jax.jit(step, donate_argnums=(0,) if donate else ())
    key = jax.random.PRNGKey(0)
    losses, first_bad = [], None
    i = 0
    while i < n_steps:
        for t, c, _ in dl:
            if i >= n_steps:
                break
            batch = shard_batch(
                (jnp.asarray(np.asarray(t)), jnp.asarray(np.asarray(c))),
                mesh)
            key, k = jax.random.split(key)
            state, loss = jstep(state, k, *batch)
            loss = float(loss)
            losses.append(loss)
            print(f"[{impl}] step {i} loss {loss:.6f}", flush=True)
            if not np.isfinite(loss) and first_bad is None:
                first_bad = i
            if first_bad is not None and i >= first_bad + 1:
                i = n_steps  # one confirming step after the first NaN
                break
            i += 1
    out = {"impl": impl, "donate": donate, "steps": len(losses),
           "first_nonfinite_step": first_bad,
           "final_loss": losses[-1] if losses else None,
           "all_finite": first_bad is None}

    if time_steps and first_bad is None:
        # Steady-state step time on a FIXED resident batch (loader and
        # host->device excluded — comparable to bench.py's train metric).
        import time
        for t, c, _ in dl:
            batch = shard_batch(
                (jnp.asarray(np.asarray(t)), jnp.asarray(np.asarray(c))),
                mesh)
            break
        key2 = jax.random.PRNGKey(1)
        for _ in range(3):  # warm
            key2, k = jax.random.split(key2)
            state, loss = jstep(state, k, *batch)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(time_steps):
            key2, k = jax.random.split(key2)
            state, loss = jstep(state, k, *batch)
        jax.block_until_ready(loss)
        out["time_ms_per_step"] = (
            (time.perf_counter() - t0) / time_steps * 1e3)
        print(f"[{impl}] {out['time_ms_per_step']:.2f} ms/step "
              f"(donate={donate})", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--impl", default="both",
                    choices=("gather", "blocks", "plain", "both", "all"))
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state (the original trigger "
                    "configuration; default off = the round-3 NaN config)")
    ap.add_argument("--time", type=int, default=0, metavar="N",
                    help="after the finiteness check, time N steady-state "
                    "steps on a fixed resident batch (packed-vs-plain "
                    "train-step speed A/B)")
    ns = ap.parse_args()

    # v2 config: data/synth (v1) is not regenerated on this VM; corpus v2
    # is the standard quality corpus.  make_dirs=False — this is a probe,
    # not a training run; don't pollute saved/<name>/ (the queue resolves
    # checkpoints by newest run dir).
    cfg = ConfigParser(
        json.load(open("configs/config_unet_synth_flagship_v2.json")),
        make_dirs=False)
    ds = build_dataset(cfg, "tr_dataset", sample_rate=cfg["sample_rate"],
                       T=cfg["num_samples"])
    dl = build_data_loader(cfg, "data_loader", ds)

    impls = {"both": ("gather", "blocks"),
             "all": ("plain", "gather", "blocks")}.get(ns.impl, (ns.impl,))
    results = [run_leg(i, ns.steps, ns.donate, dl, cfg, time_steps=ns.time)
               for i in impls]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
