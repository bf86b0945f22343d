#!/usr/bin/env python
"""Waveform-domain diffusion training entry point.

Parity: reference train.py:17-84 — same CLI flags (-c/-r/-d, --lr/--bs
keypath overrides), same config schema, same wiring order.  TPU-native: the
model trains under a 1-D data mesh (all local devices) with a jitted,
state-donating train step.
"""

from sddm_tpu.cli import (
    DEFAULT_OPTIONS,
    build_arch,
    build_data_loader,
    build_dataset,
    build_diffusion,
    build_loss,
    build_metrics,
    build_network,
    standard_argparser,
)
from sddm_tpu.parallel import make_mesh, make_mesh_2d
from sddm_tpu.train import Trainer, make_optimizer
from sddm_tpu.utils import ConfigParser


def main(config):
    logger = config.get_logger("train")

    tr_dataset = build_dataset(
        config, "tr_dataset",
        sample_rate=config["sample_rate"], T=config["num_samples"],
    )
    val_dataset = build_dataset(
        config, "val_dataset",
        sample_rate=config["sample_rate"], T=config["num_samples"],
    )
    tr_data_loader = build_data_loader(config, "data_loader", tr_dataset)
    val_data_loader = build_data_loader(config, "data_loader", val_dataset)
    logger.info("Finished initializing datasets")

    diffusion = build_diffusion(config)
    network = build_network(config, role="train", num_samples=config["num_samples"])
    model = build_arch(config, diffusion, network)

    criterion = build_loss(config)
    metrics = build_metrics(config)
    tx = make_optimizer(config["optimizer"])

    trainer = Trainer(
        model,
        criterion,
        metrics,
        tx,
        config=config,
        data_loader=tr_data_loader,
        valid_data_loader=val_data_loader,
        mesh=make_training_mesh(config),
    )
    trainer.train()


def make_training_mesh(config):
    """1-D data mesh by default; ``trainer.model_parallel: k`` switches to a
    2-D (data, model) mesh with channel tensor parallelism
    (sddm_tpu/parallel/tensor.py) — a scaling axis the reference does not
    have (its distributed story is DataParallel only, train.py:43-44)."""
    mp = int(config["trainer"].get("model_parallel", 1))
    if mp <= 1:
        return make_mesh()
    import jax

    n = len(jax.devices())
    if n % mp:
        raise ValueError(f"model_parallel={mp} does not divide {n} devices")
    return make_mesh_2d(n // mp, mp)


if __name__ == "__main__":
    args = standard_argparser("Speech denoising diffusion model (TPU)")
    config = ConfigParser.from_args(args, DEFAULT_OPTIONS)
    main(config)
