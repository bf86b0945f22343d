#!/usr/bin/env python
"""Train the per-segment SNR estimator.

Parity: reference train_snr_estimator.py:16-77 — SNREstimator regresses
``segment_sisnr(segment(condition), segment(target))``.
"""

from sddm_tpu.cli import (
    DEFAULT_OPTIONS,
    build_data_loader,
    build_dataset,
    build_loss,
    build_metrics,
    standard_argparser,
)
from sddm_tpu.models.snr_estimator import SNREstimator
from sddm_tpu.ops.framing import Segmentor
from sddm_tpu.parallel import make_mesh
from sddm_tpu.train import SNREstimatorTrainer, make_optimizer
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

    segmentor = Segmentor(
        num_samples=config["num_samples"], **dict(config["segmentor"]["args"])
    )
    model = SNREstimator(
        n_segments=segmentor.n_frames,
        segment_len=segmentor.frame_len,
        **dict(config["arch"]["args"]),
    )

    trainer = SNREstimatorTrainer(
        model,
        segmentor,
        build_loss(config),
        build_metrics(config),
        make_optimizer(config["optimizer"]),
        config=config,
        data_loader=tr_data_loader,
        valid_data_loader=val_data_loader,
        mesh=make_mesh(),
    )
    trainer.train()


if __name__ == "__main__":
    args = standard_argparser("SNR estimator training (TPU)")
    config = ConfigParser.from_args(args, DEFAULT_OPTIONS)
    main(config)
