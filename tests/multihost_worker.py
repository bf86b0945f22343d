"""Subprocess body for the 2-process multihost test (run by
tests/test_multihost.py, NOT collected by pytest).

Usage: python multihost_worker.py <process_id> <num_processes> <port> <data_root>

Each process initializes jax.distributed on the CPU backend (2 local
devices), loads ITS shard of the dataset through PerHostLoader, assembles
globally-sharded batches, and runs one jitted data-parallel loss+grad step.
Prints one JSON line with len(loader), global batch shape, and the loss —
the parent asserts the values agree across processes.
"""

import json
import os
import sys


def main():
    pid, nproc, port, data_root = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sddm_tpu.data import AudioDataset
    from sddm_tpu.parallel.multihost import PerHostLoader

    mesh = Mesh(np.array(jax.devices()), ("data",))
    ds = AudioDataset(data_root, ".wav", sample_rate=16000, T=64)
    loader = PerHostLoader(ds, batch_size=4, mesh=mesh, seed=0)

    # one data-parallel step: grads of an L2 toward zero over the batch
    w = jax.device_put(
        jnp.ones((64,), jnp.float32), NamedSharding(mesh, P())
    )

    @jax.jit
    def step(w, target):
        def loss_fn(w):
            pred = target[:, 0, :] * w[None, :]
            return jnp.mean(pred**2)

        loss, grad = jax.value_and_grad(loss_fn)(w)
        return loss, grad

    n_batches = 0
    last_loss = None
    for target, condition, idx in loader:
        loss, grad = step(w, target)
        last_loss = float(loss)  # same value on every host (global mean)
        n_batches += 1

    print(json.dumps({
        "process": pid,
        "len_loader": len(loader),
        "n_batches": n_batches,
        "global_batch": 4,
        "loss": round(last_loss, 6),
        "devices": jax.device_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
