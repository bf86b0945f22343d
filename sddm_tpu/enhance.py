"""High-level enhancement (serving) API.

``Enhancer`` wraps a trained SDDM checkpoint into a one-call, production
style interface: arbitrary-length waveforms are chunked to the model's
training length, chunk rows are padded to a STATIC batch size (one compiled
T-step sampler program serves every request), batches are sharded over the
data mesh when divisible, and outputs are overlap-free re-concatenations
trimmed to the input length.

This is the serving-path equivalent of the reference's infer.py loop
(reference infer.py:71-127) without its per-shape recompiles and with
multi-chip batch parallelism.
"""

from __future__ import annotations

import os
import threading
import time
from math import ceil
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .parallel.mesh import make_mesh, shard_batch


def enable_compile_cache(path: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``.jax_cache`` under the repo root, or $SDDM_COMPILE_CACHE).  Fresh
    flagship-size sampler programs can take minutes to compile on a remote
    relay; the cache makes every later process start instantly."""
    path = path or os.environ.get("SDDM_COMPILE_CACHE") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", path)
    return path


class Enhancer:
    def __init__(
        self,
        model,
        params,
        num_samples: int,
        batch_rows: int = 16,
        mesh=None,
        seed: int = 0,
        warmup: bool = False,
        warmup_timeout_s: Optional[float] = None,
    ):
        """``model``: an SDDM-style composite with ``infer(params, key, cond)``;
        ``num_samples``: the chunk length the model was trained on;
        ``batch_rows``: static chunk-row count per compiled call.

        ``warmup=True`` compiles the exact (batch_rows, 1, num_samples)
        sampler program at construction (persisted via the JAX compilation
        cache when enabled — see :func:`enable_compile_cache`), so the first
        request never pays — or wedges on — a fresh compile
        (PERFORMANCE.md "Known issue")."""
        self.model = model
        self.params = params
        self.num_samples = num_samples
        self.batch_rows = batch_rows
        self.mesh = mesh if mesh is not None else make_mesh()
        self.key = jax.random.PRNGKey(seed)
        self._infer = jax.jit(model.infer)
        if warmup:
            self.warmup(timeout_s=warmup_timeout_s)

    def validate(self) -> bool:
        """Canary: run the compiled sampler once on a small random condition
        and check every output element is finite.

        Defense in depth after the round-3 GroupNorm cancellation episode
        (PERFORMANCE.md): weight-dependent numerical failures can slip past
        random-init exactness tests, so the loader checks the packed engine
        ONCE with the real checkpoint weights at the serving shape.
        ``load_enhancer`` runs this when asked to serve the packed engine
        and falls back to the plain model if it fails."""
        cond = 0.05 * np.random.default_rng(0).standard_normal(
            (self.batch_rows, 1, self.num_samples)
        ).astype(np.float32)
        out = self._infer(self.params, jax.random.PRNGKey(17),
                          jnp.asarray(cond))
        return bool(jnp.isfinite(out).all())

    def warmup(self, timeout_s: Optional[float] = None) -> float:
        """Compile+run the sampler once on zeros at the serving shape.

        Returns the wall-clock seconds spent.  With ``timeout_s`` set, raises
        ``TimeoutError`` with a diagnostic if compilation does not finish in
        time (the known failure mode is a remote-compile service wedge on a
        fresh program shape) — the caller can fall back to a batch size whose
        program is already in the persistent cache."""
        cond = jnp.zeros((self.batch_rows, 1, self.num_samples), jnp.float32)
        if self.batch_rows % self.mesh.devices.size == 0:
            cond = shard_batch(cond, self.mesh)
        start = time.perf_counter()
        if timeout_s is None:
            self._infer(self.params, self.key, cond).block_until_ready()
            return time.perf_counter() - start

        done = threading.Event()
        err: list = []

        def _compile():
            try:
                self._infer(self.params, self.key, cond).block_until_ready()
            except Exception as e:  # surfaced below
                err.append(e)
            finally:
                done.set()

        t = threading.Thread(target=_compile, daemon=True)
        t.start()
        if not done.wait(timeout_s):
            raise TimeoutError(
                f"Enhancer.warmup: sampler compile for shape "
                f"({self.batch_rows}, 1, {self.num_samples}) exceeded "
                f"{timeout_s:.0f}s. This is the known remote-compile wedge "
                f"on fresh program shapes (PERFORMANCE.md). Use a batch_rows "
                f"whose program is already in the persistent compile cache, "
                f"or retry with a longer timeout."
            )
        if err:
            raise err[0]
        return time.perf_counter() - start

    def _chunk(self, audio: np.ndarray) -> np.ndarray:
        """[T] -> [n_chunk, 1, num_samples] zero-padded."""
        n = audio.shape[-1]
        n_chunk = ceil(n / self.num_samples)
        padded = np.zeros((n_chunk * self.num_samples,), np.float32)
        padded[:n] = np.asarray(audio, np.float32).reshape(-1)
        return padded.reshape(n_chunk, 1, self.num_samples)

    def enhance_batch(self, audios: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Enhance a list of arbitrary-length mono waveforms."""
        chunks = [self._chunk(a) for a in audios]
        rows = np.concatenate(chunks, axis=0)
        owners = np.concatenate(
            [np.full(c.shape[0], i) for i, c in enumerate(chunks)]
        )

        outputs = np.zeros_like(rows)
        for start in range(0, rows.shape[0], self.batch_rows):
            block = rows[start : start + self.batch_rows]
            n_real = block.shape[0]
            if n_real < self.batch_rows:  # static-shape pad
                block = np.concatenate(
                    [block, np.zeros(
                        (self.batch_rows - n_real,) + block.shape[1:],
                        block.dtype,
                    )],
                    axis=0,
                )
            cond = jnp.asarray(block)
            if self.batch_rows % self.mesh.devices.size == 0:
                cond = shard_batch(cond, self.mesh)
            self.key, sub = jax.random.split(self.key)
            out = np.asarray(self._infer(self.params, sub, cond))
            outputs[start : start + n_real] = out[:n_real]

        results = []
        for i, a in enumerate(audios):
            mine = outputs[owners == i]
            results.append(mine.reshape(-1)[: np.asarray(a).reshape(-1).shape[0]])
        return results

    def enhance(self, audio: np.ndarray) -> np.ndarray:
        return self.enhance_batch([audio])[0]


def load_enhancer(
    checkpoint_path,
    config: dict,
    batch_rows: int = 16,
    mesh=None,
    warmup: bool = False,
    warmup_timeout_s=None,
    packed: bool = True,
    validate_packed: bool = True,
    steps: int = 0,
    ddim: bool = False,
) -> Enhancer:
    """Build an Enhancer from a run-dir checkpoint + its config dict.
    Enables the persistent compile cache so warmed-up programs survive
    process restarts.

    ``packed=True`` (default) serves UNetModified2 checkpoints through the
    space-to-depth inference engine (models/unet_packed.py) — identical
    outputs, lane-aligned convs; silently ignored for other networks.
    With ``validate_packed=True`` the packed engine is canary-checked once
    with the REAL checkpoint weights at the serving shape
    (:meth:`Enhancer.validate`); if the output is non-finite the loader
    logs a warning and serves the plain engine instead (defense in depth
    after the round-3 GroupNorm cancellation bug, PERFORMANCE.md).

    ``steps=n`` serves through an n-step schedule subsequence and
    ``ddim=True`` through the DDIM update — the few-step serving configs
    from PERFORMANCE.md's round-3 table (``steps=12`` measured BETTER
    than the full T on the flagship at ~8x its speed).  Defaults keep
    the full trained-T ancestral sampler."""
    import logging

    enable_compile_cache()
    from .cli import build_arch, build_diffusion, build_network
    from .train.checkpoints import load_checkpoint

    class _Cfg(dict):
        def get(self, k, d=None):
            return dict.get(self, k, d)

    cfg = _Cfg(config)
    diffusion = build_diffusion(cfg)
    network = build_network(cfg, num_samples=config["num_samples"])
    model = build_arch(cfg, diffusion, network)

    def fewstep(m):
        if ddim:
            m = m.with_ddim()
        if steps:
            m = m.with_sampling_steps(int(steps))
        return m

    init_params = model.init(
        jax.random.PRNGKey(0), (1, 1, config["num_samples"])
    )
    ckpt = load_checkpoint(checkpoint_path, params_template=init_params)
    params = ckpt["params"]
    plain = (model, params)
    if packed and config["network"]["type"] == "UNetModified2" \
            and not network.dropout:
        from .models.unet_packed import PackedUNetModified2

        engine = PackedUNetModified2(network)
        packed_params = engine.pack(params)
        packed_model = fewstep(build_arch(cfg, diffusion, engine))
        enhancer = Enhancer(
            packed_model, packed_params, config["num_samples"], batch_rows,
            mesh, warmup=warmup, warmup_timeout_s=warmup_timeout_s,
        )
        if not validate_packed or enhancer.validate():
            return enhancer
        logging.getLogger("enhance").warning(
            "packed-engine canary produced non-finite output with the "
            "checkpoint weights (see PERFORMANCE.md round-3 notes) — "
            "serving the plain engine instead"
        )
        model, params = plain
    return Enhancer(
        fewstep(model), params, config["num_samples"], batch_rows, mesh,
        warmup=warmup, warmup_timeout_s=warmup_timeout_s,
    )
