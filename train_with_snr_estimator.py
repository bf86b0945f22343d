#!/usr/bin/env python
"""Train SDDM with a FROZEN pre-trained SNR estimator driving a per-segment
variable noise schedule.

Parity: reference train_with_snr_estimator.py:19-106 — the ``-s`` flag points
at the estimator checkpoint; its params are loaded and never updated
(stop_gradient inside the composite + zero-grad Adam updates).
"""

from sddm_tpu.cli import (
    DEFAULT_OPTIONS,
    build_data_loader,
    build_dataset,
    build_loss,
    build_metrics,
    build_network,
    standard_argparser,
)
from sddm_tpu.models.sddm import SDDM_with_SNREstimator
from sddm_tpu.models.snr_estimator import SNREstimator
from sddm_tpu.ops.framing import Segmentor
from sddm_tpu.parallel import make_mesh
from sddm_tpu.train import Trainer, make_optimizer
from sddm_tpu.train.checkpoints import load_checkpoint
from sddm_tpu.utils import ConfigParser


def main(config, snr_estimator_checkpoint):
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

    network = build_network(config, role="train")
    segmentor = Segmentor(
        num_samples=config["num_samples"], **dict(config["segmentor"]["args"])
    )
    snr_estimator = SNREstimator(
        n_segments=segmentor.n_frames,
        segment_len=segmentor.frame_len,
        **dict(config["snr_estimator"]["args"]),
    )

    diffusion_args = dict(config["diffusion"]["args"])
    arch_args = dict(config["arch"].get("args", {}))
    model = SDDM_with_SNREstimator(
        diffusion_timesteps=diffusion_args["n_timestep"],
        network=network,
        snr_estimator=snr_estimator,
        segmentor=segmentor,
        snr_estimate_scale=diffusion_args.get("snr_estimate_scale", 100.0),
        **arch_args,
    )

    trainer = Trainer(
        model,
        build_loss(config),
        build_metrics(config),
        make_optimizer(config["optimizer"]),
        config=config,
        data_loader=tr_data_loader,
        valid_data_loader=val_data_loader,
        mesh=make_mesh(),
        sample_shape=(tr_data_loader.batch_size, 1, config["num_samples"]),
    )

    if snr_estimator_checkpoint is None:
        raise SystemExit(
            "-s/--snr_estimator_checkpoint is required "
            "(reference train_with_snr_estimator.py:92)"
        )
    logger.info(
        "Loading SNR estimator checkpoint: %s ...", snr_estimator_checkpoint
    )
    est_params = trainer.state.params["snr_estimator"]
    ckpt = load_checkpoint(snr_estimator_checkpoint, params_template=est_params)
    new_params = dict(trainer.state.params)
    new_params["snr_estimator"] = ckpt["params"]
    from sddm_tpu.parallel import replicate
    from sddm_tpu.train.state import TrainState

    trainer.state = replicate(
        TrainState(
            step=trainer.state.step,
            params=new_params,
            opt_state=trainer.state.opt_state,
        ),
        trainer.mesh,
    )
    trainer.train()


if __name__ == "__main__":
    args = standard_argparser("SDDM with SNR estimator training (TPU)")
    args.add_argument(
        "-s", "--snr_estimator_checkpoint", default=None, type=str,
        help="path to the frozen SNR estimator checkpoint",
    )
    config = ConfigParser.from_args(args, DEFAULT_OPTIONS)
    # re-parse for the extra flag (same double-parse as the reference
    # train_with_snr_estimator.py:101-106)
    parsed = args.parse_args()
    main(config, parsed.snr_estimator_checkpoint)
