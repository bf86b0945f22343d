#!/usr/bin/env python
"""Spectrogram-conditioned (vocoder-style) diffusion training.

Parity: reference train_specmodel.py:17-95 — NumpyDataset + WaveGradDataLoader
with hop-aligned crops; SDDM_spectrogram couples the diffusion with DiffWave /
WaveGrad; DiffWave additionally receives ``freq_bins`` and ``num_timesteps``.
Robust to the config variants shipped (config_diffwave.json carries
``datatype``/``spectrogram`` blocks; config_wavegrad.json puts hop_samples in
the arch + data_loader args instead).
"""

from sddm_tpu.cli import (
    DEFAULT_OPTIONS,
    build_data_loader,
    build_dataset,
    build_diffusion,
    build_loss,
    build_metrics,
    standard_argparser,
)
from sddm_tpu.models import SDDM_spectrogram, get_network
from sddm_tpu.parallel import make_mesh
from sddm_tpu.train import Trainer, make_optimizer
from sddm_tpu.utils import ConfigParser


def main(config):
    logger = config.get_logger("train")

    sample_rate = config.get("sample_rate", 16000)
    num_samples = config.get("num_samples", -1)
    spec_cfg = config.get("spectrogram", {})
    loader_args = config["data_loader"]["args"]
    hop_samples = (
        loader_args.get("hop_samples")
        or spec_cfg.get("hop_samples")
        or dict(config["arch"].get("args", {})).get("hop_samples")
    )
    freq_bins = (
        spec_cfg.get("freq_bins")
        or spec_cfg.get("stft_bins")
        or config.get("mel_spectrogram", {}).get("n_mels", 128)
    )

    # TPU-native on-device feature mode: datasets stream RAW paired wav
    # crops (AudioDataset) and the spectrogram is computed inside the jitted
    # step — the offline prepare_spectrogram.py pass becomes optional
    on_device = bool(spec_cfg.get("on_device")) or (
        config["tr_dataset"]["type"] == "AudioDataset"
    )

    tr_dataset = build_dataset(
        config, "tr_dataset", sample_rate=sample_rate, T=num_samples
    )
    val_dataset = build_dataset(
        config, "val_dataset", sample_rate=sample_rate, T=num_samples
    )
    extra = {}
    if not on_device and "hop_samples" not in loader_args:
        extra = {"hop_samples": hop_samples}
    tr_loader = build_data_loader(config, "data_loader", tr_dataset, **extra)
    val_loader = build_data_loader(config, "data_loader", val_dataset, **extra)
    logger.info("Finished initializing datasets (on_device=%s)", on_device)

    diffusion = build_diffusion(config)
    net_cfg = config["network"]
    net_extra = (
        {"freq_bins": freq_bins, "num_timesteps": diffusion.num_timesteps}
        if net_cfg["type"] == "DiffWave"
        else {}
    )
    network = get_network(net_cfg["type"])(**dict(net_cfg["args"]), **net_extra)

    arch_args = dict(config["arch"].get("args", {}))
    arch_args.setdefault("hop_samples", hop_samples)
    if on_device:
        from sddm_tpu.ops.spectrogram import make_feature_fn

        datatype = config["tr_dataset"]["args"].get("datatype", ".wav")
        kind = "mel" if "mel" in str(spec_cfg.get("kind", "spec")) else "spec"
        arch_args["feature_fn"] = make_feature_fn(
            kind,
            spec_cfg["window_length"],
            hop_samples,
            n_mels=config.get("mel_spectrogram", {}).get("n_mels"),
            sample_rate=sample_rate,
        )
        if num_samples % hop_samples != 0:
            raise SystemExit(
                "on-device feature mode needs num_samples divisible by "
                f"hop_samples ({num_samples} % {hop_samples} != 0)"
            )
        sample_shape = (loader_args["batch_size"], 1, num_samples)
    else:
        crop = loader_args["crop_mel_frames"]
        sample_shape = (loader_args["batch_size"], freq_bins, crop)
    model = SDDM_spectrogram(diffusion, network, **arch_args)

    trainer = Trainer(
        model,
        build_loss(config),
        build_metrics(config),
        make_optimizer(config["optimizer"]),
        config=config,
        data_loader=tr_loader,
        valid_data_loader=val_loader,
        mesh=make_mesh(),
        sample_shape=sample_shape,
    )
    trainer.train()


if __name__ == "__main__":
    args = standard_argparser("Spectrogram diffusion model training (TPU)")
    config = ConfigParser.from_args(args, DEFAULT_OPTIONS)
    main(config)
