#!/usr/bin/env python
"""Chunked enhancement with the SNR-estimator-driven variable schedule.

Parity: reference infer_with_snr_estimator.py:20-137 — same flow as infer.py
but the model is SDDM_with_SNREstimator (segmentation + frozen estimator +
per-segment schedule + cross-fade overlap-add).  The checkpoint saved by
train_with_snr_estimator.py carries both the network and the estimator
params, so no separate -s flag is needed at inference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.cli import (
    build_data_loader,
    build_dataset,
    build_loss,
    build_network,
    standard_argparser,
)
from sddm_tpu.data.wav_io import save_wav
from sddm_tpu.evaluate import evaluate
from sddm_tpu.models.sddm import SDDM_with_SNREstimator
from sddm_tpu.models.snr_estimator import SNREstimator
from sddm_tpu.ops.framing import Segmentor
from sddm_tpu.train.checkpoints import load_checkpoint
from sddm_tpu.utils import ConfigParser


def main(config):
    logger = config.get_logger("infer")
    sample_rate = config["sample_rate"]

    infer_dataset = build_dataset(
        config, "infer_dataset",
        sample_rate=sample_rate, T=config["num_samples"],
    )
    if "infer_data_loader" in config:
        infer_loader = build_data_loader(
            config, "infer_data_loader", infer_dataset
        )
    else:
        from sddm_tpu.data import InferDataLoader

        infer_loader = InferDataLoader(infer_dataset, batch_size=2)
    logger.info("Finished initializing datasets")

    network = build_network(config)
    segmentor = Segmentor(
        num_samples=config["num_samples"], **dict(config["segmentor"]["args"])
    )
    snr_estimator = SNREstimator(
        n_segments=segmentor.n_frames,
        segment_len=segmentor.frame_len,
        **dict(config["snr_estimator"]["args"]),
    )
    diffusion_args = dict(config["diffusion"]["args"])
    model = SDDM_with_SNREstimator(
        diffusion_timesteps=diffusion_args["n_timestep"],
        network=network,
        snr_estimator=snr_estimator,
        segmentor=segmentor,
        snr_estimate_scale=diffusion_args.get("snr_estimate_scale", 100.0),
        **dict(config["arch"].get("args", {})),
    )

    if config.resume is None:
        raise SystemExit("infer requires -r/--resume pointing at a checkpoint")
    logger.info("Loading checkpoint: %s ...", config.resume)
    key = jax.random.PRNGKey(0)
    init_params = model.init(key, (1, 1, config["num_samples"]))
    ckpt = load_checkpoint(config.resume, params_template=init_params)
    params = ckpt["params"]

    loss_fn = build_loss(config)
    infer_jit = jax.jit(model.infer)

    sample_path = config.save_dir / "samples"
    paths = {n: sample_path / n for n in ("target", "output", "condition")}
    for p in paths.values():
        p.mkdir(parents=True, exist_ok=True)

    total_loss, n_batches = 0.0, 0
    for target, condition, index in infer_loader:
        key, sub = jax.random.split(key)
        output = infer_jit(params, sub, jnp.asarray(condition))
        output_np = np.asarray(output)
        for file_idx in np.unique(index):
            rows = np.nonzero(index == file_idx)[0]
            name = infer_dataset.get_name(int(file_idx))
            save_wav(paths["output"] / f"{name}.wav",
                     output_np[rows].reshape(1, -1), sample_rate)
            save_wav(paths["target"] / f"{name}.wav",
                     np.asarray(target)[rows].reshape(1, -1), sample_rate)
            save_wav(paths["condition"] / f"{name}.wav",
                     np.asarray(condition)[rows].reshape(1, -1), sample_rate)
        total_loss += float(loss_fn(output, jnp.asarray(target)))
        n_batches += 1

    logger.info({"loss": total_loss / max(n_batches, 1)})
    evaluate(sample_path, ".wav", sample_rate, {"pesq_wb", "sisnr", "stoi"},
             logger)


if __name__ == "__main__":
    args = standard_argparser("SDDM+SNR estimator inference (TPU)")
    config = ConfigParser.from_args(args)
    main(config)
