import numpy as np, jax, sys, os, json
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, optax
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from sddm_tpu.diffusion import DiffusionSchedule
from sddm_tpu.models import SDDM, UNetModified2
from sddm_tpu.models.unet_packed import PackedTrainUNetModified2
from sddm_tpu.models.losses import l1_loss
from sddm_tpu.train.state import TrainState
from sddm_tpu.utils import ConfigParser
from sddm_tpu.cli import build_dataset, build_data_loader
from sddm_tpu.train import make_optimizer
from sddm_tpu.parallel import make_mesh, replicate, shard_batch

cfg = ConfigParser(json.load(open('configs/config_unet_synth_flagship.json')))
ds = build_dataset(cfg, "tr_dataset", sample_rate=cfg["sample_rate"], T=cfg["num_samples"])
dl = build_data_loader(cfg, "data_loader", ds)
NS = 16448
net = UNetModified2(num_samples=NS, inner_channel=32, norm_groups=32,
                    channel_mults=(1,2,3,4,5), res_blocks=1, segment_len=128,
                    segment_stride=64, dtype=jnp.bfloat16)
sched = DiffusionSchedule.create("linear", 100, 1e-6, 1e-3)
model = SDDM(sched, PackedTrainUNetModified2(net), p_transition="condition_in")
params = model.init(jax.random.PRNGKey(0), (16,1,NS))
tx = make_optimizer(dict(cfg["optimizer"]))
mesh = make_mesh()
state = replicate(TrainState.create(params, tx), mesh)
DONATE = os.environ.get("DONATE", "1") == "1"
def deq(x):  # RAM-cached loader emits int16 PCM; dequant on device like Trainer._dequant
    return x.astype(jnp.float32) / 32768.0 if x.dtype == jnp.int16 else x
def step(state, k, tgt, cond):
    tgt, cond = deq(tgt), deq(cond)
    def loss_fn(p):
        pr, nz = model.forward(p, k, tgt, cond, deterministic=False)
        return l1_loss(pr, nz)
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    up, os_ = tx.update(grads, state.opt_state, state.params)
    return TrainState(step=state.step+1, params=optax.apply_updates(state.params, up), opt_state=os_), loss
jstep = jax.jit(step, donate_argnums=(0,) if DONATE else ())
key = jax.random.PRNGKey(0)
for i, (t, c, _) in enumerate(dl):
    batch = shard_batch((jnp.asarray(np.asarray(t)), jnp.asarray(np.asarray(c))), mesh)
    key, k = jax.random.split(key)
    state, loss = jstep(state, k, *batch)
    print("step", i, "loss", float(loss), "donate", DONATE, flush=True)
    if i >= 4: break
