#!/usr/bin/env python
"""Spectrogram-model evaluation over a test set.

Parity: reference test.py:19-104 — NumpyDataset/WaveGradDataLoader batches,
full reverse sampling per batch, per-batch loss + metrics, output/target WAVs
saved per utterance.  (The reference hardcodes model.wavegrad as the network
module, test.py:12; here the network comes from the registry like everywhere
else.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from sddm_tpu.cli import (
    build_data_loader,
    build_dataset,
    build_diffusion,
    build_loss,
    build_metrics,
    standard_argparser,
)
from sddm_tpu.data.wav_io import save_wav
from sddm_tpu.models import SDDM_spectrogram, get_network
from sddm_tpu.train.checkpoints import load_checkpoint
from sddm_tpu.utils import ConfigParser


def main(config, num_steps=None, ddim_eta=None):
    logger = config.get_logger("test")
    sample_rate = config.get("sample_rate", 16000)
    num_samples = config.get("num_samples", -1)
    spec_cfg = config.get("spectrogram", {})

    # on-device feature mode mirrors train_specmodel.py: datasets stream RAW
    # paired wav crops and the conditioning spectrogram is computed inside
    # the jitted sampler (ops/spectrogram.make_feature_fn)
    on_device = bool(spec_cfg.get("on_device")) or (
        config["test_dataset"]["type"] == "AudioDataset"
    )
    ds_extra = (
        {"sample_rate": sample_rate, "T": num_samples} if on_device else {}
    )
    test_dataset = build_dataset(config, "test_dataset", **ds_extra)
    test_loader = build_data_loader(config, "test_data_loader", test_dataset)
    logger.info("Finished initializing datasets (on_device=%s)", on_device)

    diffusion = build_diffusion(config)
    net_cfg = config["network"]
    freq_bins = (
        spec_cfg.get("freq_bins") or spec_cfg.get("stft_bins")
        or config.get("mel_spectrogram", {}).get("n_mels", 128)
    )
    net_extra = (
        {"freq_bins": freq_bins, "num_timesteps": diffusion.num_timesteps}
        if net_cfg["type"] == "DiffWave"
        else {}
    )
    network = get_network(net_cfg["type"])(**dict(net_cfg["args"]), **net_extra)
    arch_args = dict(config["arch"].get("args", {}))
    arch_args.setdefault(
        "hop_samples",
        config["test_data_loader"]["args"].get("hop_samples")
        or spec_cfg.get("hop_samples"),
    )
    if on_device:
        from sddm_tpu.ops.spectrogram import make_feature_fn

        kind = "mel" if "mel" in str(spec_cfg.get("kind", "spec")) else "spec"
        arch_args["feature_fn"] = make_feature_fn(
            kind,
            spec_cfg["window_length"],
            arch_args["hop_samples"],
            n_mels=config.get("mel_spectrogram", {}).get("n_mels"),
            sample_rate=sample_rate,
        )
    model = SDDM_spectrogram(diffusion, network, **arch_args)
    if ddim_eta is not None:
        model = model.with_ddim(ddim_eta)
    if num_steps is not None:
        model = model.with_sampling_steps(num_steps)

    if config.resume is None:
        raise SystemExit("test requires -r/--resume pointing at a checkpoint")
    logger.info("Loading checkpoint: %s ...", config.resume)
    key = jax.random.PRNGKey(0)
    first = next(iter(test_loader))
    init_params = model.init(key, first[1].shape)
    ckpt = load_checkpoint(config.resume, params_template=init_params)
    params = ckpt["params"]

    loss_fn = build_loss(config)
    metric_fns = build_metrics(config)
    infer_jit = jax.jit(model.infer)

    sample_path = config.save_dir / "samples"
    target_path = sample_path / "target"
    output_path = sample_path / "output"
    for p in (target_path, output_path):
        p.mkdir(parents=True, exist_ok=True)

    total_loss = 0.0
    total_metrics = np.zeros(len(metric_fns))
    n_total = 0
    for target, condition, name_index in test_loader:
        key, sub = jax.random.split(key)
        output = infer_jit(params, sub, jnp.asarray(condition))
        out_np = np.asarray(output)
        bsz = condition.shape[0]
        for b in range(bsz):
            name = test_dataset.get_name(int(name_index[b]))
            save_wav(output_path / f"{name}.wav", out_np[b].reshape(-1),
                     sample_rate)
            save_wav(target_path / f"{name}.wav",
                     np.asarray(target[b]).reshape(-1), sample_rate)
        t = jnp.asarray(target)
        ln = min(t.shape[-1], output.shape[-1])
        total_loss += float(loss_fn(output[..., :ln], t[..., :ln])) * bsz
        for i, m in enumerate(metric_fns):
            total_metrics[i] += float(m(output[..., :ln], t[..., :ln])) * bsz
        n_total += bsz

    log = {"loss": total_loss / max(n_total, 1)}
    log.update({
        m.__name__: total_metrics[i] / max(n_total, 1)
        for i, m in enumerate(metric_fns)
    })
    logger.info(log)


if __name__ == "__main__":
    args = standard_argparser("Spectrogram model evaluation (TPU)")
    args.add_argument("--steps", type=int, default=None,
                      help="fast sampling: reverse steps over a schedule "
                      "subsequence (vocoder papers ship 6-step schedules)")
    args.add_argument("--ddim", type=float, default=None, nargs="?",
                      const=0.0, metavar="ETA",
                      help="DDIM reverse process (default eta 0.0); "
                      "composes with --steps")
    config = ConfigParser.from_args(args)
    parsed = args.parse_args()
    main(config, num_steps=parsed.steps, ddim_eta=parsed.ddim)
