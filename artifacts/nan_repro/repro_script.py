import numpy as np, jax, sys, os, json
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
from sddm_tpu.utils import ConfigParser
from sddm_tpu.cli import (build_arch, build_data_loader, build_dataset,
                          build_diffusion, build_loss, build_metrics,
                          build_network)
from sddm_tpu.parallel import make_mesh, shard_batch
from sddm_tpu.train import Trainer, make_optimizer

cfg_d = json.load(open('/tmp/flagship_debug.json'))
cfg_d['trainer']['save_dir'] = '/tmp/nan5_saved/'
config = ConfigParser(cfg_d, run_id="nan5")
tr_dataset = build_dataset(config, "tr_dataset", sample_rate=config["sample_rate"], T=config["num_samples"])
tr_dl = build_data_loader(config, "data_loader", tr_dataset)
diffusion = build_diffusion(config)
network = build_network(config, num_samples=config["num_samples"])
model = build_arch(config, diffusion, network)
tx = make_optimizer(config["optimizer"])
trainer = Trainer(model, build_loss(config), build_metrics(config), tx,
                  config=config, data_loader=tr_dl, valid_data_loader=None,
                  mesh=make_mesh())
print("init done", flush=True)
for i, (t, c, _) in enumerate(trainer.data_loader):
    batch = shard_batch((jnp.asarray(t), jnp.asarray(c)), trainer.mesh)
    trainer.key, k = jax.random.split(trainer.key)
    prev_params = jax.tree_util.tree_map(lambda x: np.asarray(x), trainer.state.params)
    trainer.state, loss = trainer._train_step(trainer.state, k, *batch)
    bad = [jax.tree_util.tree_util if False else "/".join(str(p.key) if hasattr(p,'key') else str(p) for p in path)
           for path, leaf in jax.tree_util.tree_leaves_with_path(trainer.state.params)
           if not np.isfinite(np.asarray(leaf)).all()]
    print("step", i, "loss", float(loss), "nan-param-leaves:", len(bad), bad[:4], flush=True)
    import pickle
    pickle.dump({"step": i, "params": prev_params,
                 "batch": (np.asarray(t), np.asarray(c)),
                 "key": np.asarray(k)},
                open(f"/tmp/nan_state_{i}.pkl", "wb"))
    if i >= 2: break
