"""Shared CLI wiring: build model objects from a ConfigParser.

Mirrors the reflection wiring of the reference entry points (train.py:17-65,
infer.py:20-51) against this framework's explicit registries.
"""

from __future__ import annotations

import argparse
import collections
import os

import jax
import jax.numpy as jnp

from .data import DATA_LOADERS, DATASETS
from .diffusion.schedule import DiffusionSchedule
from .models import SDDM, SDDM_spectrogram, get_network
from .models.losses import get_loss
from .models.metrics import get_metric
from .utils.config import ConfigParser

CustomArgs = collections.namedtuple("CustomArgs", "flags type target")

DEFAULT_OPTIONS = [
    CustomArgs(["--lr", "--learning_rate"], float, "optimizer;args;lr"),
    CustomArgs(["--bs", "--batch_size"], int, "data_loader;args;batch_size"),
]


def setup_compile_cache(path: str | None = None) -> None:
    """Persist XLA executables across runs (the axon remote-compile path
    takes minutes for fresh full-size programs; cached reloads are fast).

    Default cache dir is ``<repo>/.jax_cache`` (same as bench.py); override
    with ``SDDM_COMPILE_CACHE`` (empty string disables)."""
    if path is None:
        path = os.environ.get(
            "SDDM_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
    if path:
        jax.config.update("jax_compilation_cache_dir", path)


def setup_platform() -> None:
    """Honor ``SDDM_PLATFORM`` (e.g. ``cpu``, ``tpu``) for every CLI.

    The container may pin ``JAX_PLATFORMS`` via sitecustomize before user
    env vars apply, so a plain env override is ignored by JAX; calling
    ``jax.config.update`` before first backend use wins.  Useful for running
    the CLIs on hosts without an accelerator (the reference's ``-d`` flag
    serves the analogous CUDA_VISIBLE_DEVICES role, train.py:75-78)."""
    plat = os.environ.get("SDDM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)


def standard_argparser(description: str) -> argparse.ArgumentParser:
    setup_platform()
    setup_compile_cache()
    args = argparse.ArgumentParser(description=description)
    args.add_argument("-c", "--config", default=None, type=str,
                      help="config file path (default: None)")
    args.add_argument("-r", "--resume", default=None, type=str,
                      help="path to latest checkpoint (default: None)")
    args.add_argument("-d", "--device", default=None, type=str,
                      help="JAX platform override (e.g. 'cpu'); the "
                           "reference uses this slot for GPU indices")
    return args


def build_diffusion(config) -> DiffusionSchedule:
    """Schedule tables from the config's ``diffusion`` block."""
    dargs = dict(config["diffusion"]["args"])
    if config["diffusion"]["type"] != "GaussianDiffusion":
        raise NotImplementedError(config["diffusion"]["type"])
    return DiffusionSchedule.create(**dargs)


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_network(config, role="infer", **kwargs):
    """Construct the denoiser; a top-level ``"dtype": "bfloat16"`` config key
    selects the network compute dtype (params/norms stay f32).

    ``role``: "infer" (default) or "train".  With ``"packed": true`` the
    space-to-depth engine is used for inference/serving; for TRAINING the
    plain network is used instead — this container's axon PJRT runtime
    miscomputes the packed train step at flagship scale (forward loss and
    all gradients go NaN wholesale at step ~3 with fully-finite inputs,
    params, and batch; CPU replay of the same state is finite; donation
    on/off makes no difference — diagnostics in artifacts/nan_repro/).
    Checkpoints are identical either way (the packed engines repack the
    plain parameter tree on the fly), so plain-trained checkpoints serve
    packed.

    Extra kwargs (num_samples etc.) are filtered against the module's
    dataclass fields — the reference passes num_samples to every network
    unconditionally and crashes on those that don't take it
    (e.g. DenoiseWaveGrad1, train.py:34)."""
    import dataclasses

    net_cfg = config["network"]
    cls = get_network(net_cfg["type"])
    args = dict(net_cfg["args"])
    dtype_name = config.get("dtype") if hasattr(config, "get") else None
    if dtype_name and "dtype" not in args:
        args["dtype"] = _DTYPES[dtype_name]
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in kwargs.items() if k in fields}
    args = {k: v for k, v in args.items() if k in fields or not fields}
    net = cls(**args, **kwargs)
    # ``"packed": true`` (top-level) trains/infers UNetModified2 through the
    # space-to-depth engine — same checkpoints, same gradients (exactness
    # tests in tests/test_packed_train.py), lane-aligned convs on TPU
    if (config.get("packed") if hasattr(config, "get") else None):
        if net_cfg["type"] not in (
            "UNetModified2", "UNetModified2_VariableNoiseLevel", "DiffWave"
        ):
            raise ValueError(
                '"packed": true has no packed engine for network type '
                f'{net_cfg["type"]!r}; supported: UNetModified2, '
                "UNetModified2_VariableNoiseLevel, DiffWave (remove the "
                "flag to train the plain network)"
            )
        if getattr(net, "dropout", 0):
            raise ValueError("packed training requires dropout=0")
        if role == "train" and os.environ.get("SDDM_PACKED_TRAIN") != "1":
            import logging

            logging.getLogger("cli").warning(
                "packed TRAINING defaults to the plain network (a historical "
                "axon PJRT NaN, artifacts/nan_repro/; the round-5 on-chip A/B "
                "found it no longer reproduces — tools/packed_train_ab.py). "
                "Set SDDM_PACKED_TRAIN=1 to opt in; checkpoints remain "
                "packed-infer compatible either way"
            )
            return net
        if role == "train" and net_cfg["type"] == "DiffWave":
            # the fused Pallas stack is inference-only; train plain
            return net
        if net_cfg["type"] == "DiffWave":
            # fused Pallas residual-stack engine (inference only; same
            # checkpoints) — models/diffwave_fused.py
            from .models.diffwave_fused import FusedDiffWave

            return FusedDiffWave(net)
        if net_cfg["type"] == "UNetModified2":
            from .models.unet_packed import PackedTrainUNetModified2

            net = PackedTrainUNetModified2(net)
        else:
            from .models.unet_variable_packed import PackedTrainUNetVariable

            net = PackedTrainUNetVariable(net)
    return net


def build_arch(config, diffusion, network):
    arch = config["arch"]
    if arch["type"] == "SDDM":
        return SDDM(diffusion, network, **dict(arch.get("args", {})))
    if arch["type"] == "SDDM_spectrogram":
        return SDDM_spectrogram(diffusion, network, **dict(arch.get("args", {})))
    raise NotImplementedError(arch["type"])


def build_dataset(config, name: str, **kwargs):
    return config.init_obj(name, DATASETS, **kwargs)


def build_data_loader(config, name: str, dataset, **kwargs):
    return config.init_obj(name, DATA_LOADERS, dataset, **kwargs)


def build_loss(config):
    return get_loss(config["loss"])


def build_metrics(config):
    return [get_metric(m) for m in config["metrics"]]
