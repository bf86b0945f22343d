#!/usr/bin/env python
"""Chunked full-utterance enhancement + evaluation.

Parity: reference infer.py:20-133 — chunk each utterance into T-sample rows,
run the full reverse sampler on the chunk batch, regroup chunks by file
index, save output/target/condition WAVs (undoing log-modulus companding for
``.logwav.npy``) and run PESQ/SI-SNR/STOI evaluation over the results dir.

Note: the reference's regrouping loop drops the final file of every batch
(flush only happens when the next index appears, infer.py:84-120); here all
files are flushed — intent, not the bug.

TPU-native: the T-step sampler is one jitted lax.scan; chunk rows are just
batch parallelism, sharded over the data mesh when divisible.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.cli import (
    build_arch,
    build_data_loader,
    build_dataset,
    build_diffusion,
    build_loss,
    standard_argparser,
)
from sddm_tpu.data.wav_io import save_wav
from sddm_tpu.evaluate import evaluate
from sddm_tpu.ops.logaudio import log_modulus_normalize_reverse
from sddm_tpu.train.checkpoints import load_checkpoint
from sddm_tpu.utils import ConfigParser

EXPAND_ORDER = 3


def main(config, continuous=False, num_steps=None, ddim_eta=None):
    logger = config.get_logger("infer")
    datatype = config["infer_dataset"]["args"]["datatype"]
    sample_rate = config["sample_rate"]

    infer_dataset = build_dataset(
        config, "infer_dataset",
        sample_rate=sample_rate, T=config["num_samples"],
    )
    loader_name = (
        "infer_data_loader" if "infer_data_loader" in config else "data_loader"
    )
    # (config_unet.json lacks the infer_data_loader block the reference
    # requires, SURVEY.md §2.9 — fall back to data_loader's batch size)
    if loader_name == "infer_data_loader":
        infer_data_loader = build_data_loader(
            config, "infer_data_loader", infer_dataset
        )
    else:
        from sddm_tpu.data import InferDataLoader

        infer_data_loader = InferDataLoader(
            infer_dataset,
            batch_size=config["data_loader"]["args"].get("batch_size", 4),
        )
    logger.info("Finished initializing datasets")

    diffusion = build_diffusion(config)
    network = build_network_with_samples(config)
    model = build_arch(config, diffusion, network)
    if ddim_eta is not None:
        model = model.with_ddim(ddim_eta)
        logger.info("DDIM sampler (eta=%g)", ddim_eta)
    if num_steps is not None:
        model = model.with_sampling_steps(num_steps)
        logger.info("fast sampling: %d reverse steps", model.num_timesteps)

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
    paths = {
        name: sample_path / name for name in ("target", "output", "condition")
    }
    for p in paths.values():
        p.mkdir(parents=True, exist_ok=True)

    def save_group(name, arrays):
        for kind, data in arrays.items():
            wav = np.asarray(data).reshape(1, -1)
            if datatype == ".logwav.npy":
                wav = np.asarray(
                    log_modulus_normalize_reverse(jnp.asarray(wav), EXPAND_ORDER)
                )
            save_wav(paths[kind] / f"{name}.wav", wav, sample_rate)

    if continuous:
        # intermediate samples every 1 | (T // 100) steps
        # (reference model/model.py:79-103 continuous mode)
        interm_path = sample_path / "intermediate"
        interm_path.mkdir(parents=True, exist_ok=True)
        traj_jit = jax.jit(
            lambda p, k, c: model.infer(p, k, c, return_trajectory=True)
        )

    # Static-shape batching: chunk counts vary per utterance, and every new
    # row count would retrace/recompile the T-step sampler (minutes per
    # shape on TPU).  Pad every chunk batch to the dataset-wide maximum so
    # ONE compiled program serves the whole run; padded rows are discarded.
    max_rows = 0
    for _t, _c, idx in infer_data_loader:
        max_rows = max(max_rows, len(idx))

    def pad_rows(arr):
        pad = max_rows - arr.shape[0]
        if pad <= 0:
            return arr
        return np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
        )

    total_loss, n_batches = 0.0, 0
    for target, condition, index in infer_data_loader:
        n_real = target.shape[0]
        target, condition = pad_rows(target), pad_rows(condition)
        key, sub = jax.random.split(key)
        if continuous:
            output, traj = traj_jit(params, sub, jnp.asarray(condition))
            stride = model.sample_interval()
            traj_np = np.asarray(traj)  # [T, B, 1, chunk]
            T = traj_np.shape[0]
            for file_idx in np.unique(index):
                rows = np.nonzero(index == file_idx)[0]
                name = infer_dataset.get_name(int(file_idx))
                for t_rev in range(0, T, stride):
                    step = T - t_rev  # diffusion step count remaining
                    save_wav(
                        interm_path / f"{name}_t{step:04d}.wav",
                        traj_np[t_rev][rows].reshape(1, -1),
                        sample_rate,
                    )
        else:
            output = infer_jit(params, sub, jnp.asarray(condition))
        output_np = np.asarray(output)[:n_real]
        target, condition = target[:n_real], condition[:n_real]

        # regroup chunk rows by file index and flush every file
        for file_idx in np.unique(index):
            rows = np.nonzero(index == file_idx)[0]
            name = infer_dataset.get_name(int(file_idx))
            save_group(
                name,
                {
                    "output": output_np[rows],
                    "target": target[rows],
                    "condition": condition[rows],
                },
            )

        total_loss += float(loss_fn(jnp.asarray(output_np),
                                    jnp.asarray(target)))
        n_batches += 1

    logger.info({"loss": total_loss / max(n_batches, 1)})
    evaluate(sample_path, ".wav", sample_rate, {"pesq_wb", "sisnr", "stoi"},
             logger)


def build_network_with_samples(config):
    from sddm_tpu.cli import build_network

    return build_network(config, num_samples=config["num_samples"])


if __name__ == "__main__":
    args = standard_argparser("Speech denoising diffusion model inference")
    args.add_argument(
        "--continuous", action="store_true",
        help="also save intermediate samples every 1|(T//100) steps",
    )
    args.add_argument(
        "--steps", type=int, default=None,
        help="fast sampling: run this many reverse steps (<= T) over a "
        "subsequence of the trained schedule",
    )
    args.add_argument(
        "--ddim", type=float, default=None, nargs="?", const=0.0,
        metavar="ETA",
        help="serve with the DDIM sampler (deterministic at the default "
        "eta=0); combine with --steps for few-step enhancement",
    )
    config = ConfigParser.from_args(args)
    parsed = args.parse_args()
    main(config, continuous=parsed.continuous, num_steps=parsed.steps,
         ddim_eta=parsed.ddim)
