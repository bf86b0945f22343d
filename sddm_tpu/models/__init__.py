"""Denoiser network registry.

Parity: reference model/network.py:1-12 exposes the denoiser classes by name
for config reflection.  Here an explicit registry dict replaces
getattr-on-module (typo-safe; SURVEY.md §7 architecture mapping).
"""

from .losses import LOSSES, get_loss, l1_loss, l2_loss, log_loss
from .metrics import METRICS, get_metric, segment_sisnr, sisnr
from .sddm import SDDM, SDDM_spectrogram, SDDM_with_SNREstimator
from .unet_modified2 import UNetModified2
from .unet_modified import UNetModified
from .unet_variable import UNetModified2_VariableNoiseLevel
from .snr_estimator import SNREstimator
from .tstnn import TSTNN
from .diffwave import DiffWave
from .diffwave_fused import FusedDiffWave
from .wavegrad import (
    DenoiseWaveGrad1,
    DenoiseWaveGrad2,
    DenoiseWaveGrad3,
    WaveGrad,
)
from .unet_sp import UNetSP
from .unet_tst import UNetTST
from .caunet import CAUNet
from .waveunet import Waveunet, Waveunet2
from .waveunet3 import Waveunet3

NETWORKS = {
    "UNetModified2": UNetModified2,
    "UNetModified": UNetModified,
    "UNetModified2_VariableNoiseLevel": UNetModified2_VariableNoiseLevel,
    "TSTNN": TSTNN,
    "DiffWave": DiffWave,
    "WaveGrad": WaveGrad,
    "DenoiseWaveGrad1": DenoiseWaveGrad1,
    "DenoiseWaveGrad2": DenoiseWaveGrad2,
    "DenoiseWaveGrad3": DenoiseWaveGrad3,
    "UNetSP": UNetSP,
    "UNetTST": UNetTST,
    "CAUNet": CAUNet,
    "Waveunet": Waveunet,
    "Waveunet2": Waveunet2,
    "Waveunet3": Waveunet3,
}


def register_network(name, cls):
    NETWORKS[name] = cls
    return cls


def get_network(name):
    if name not in NETWORKS:
        raise KeyError(
            f"unknown network '{name}'; available: {sorted(NETWORKS)}"
        )
    return NETWORKS[name]


__all__ = [
    "SDDM",
    "SDDM_spectrogram",
    "SDDM_with_SNREstimator",
    "UNetModified2",
    "NETWORKS",
    "get_network",
    "register_network",
    "LOSSES",
    "METRICS",
    "get_loss",
    "get_metric",
    "l1_loss",
    "l2_loss",
    "log_loss",
    "sisnr",
    "segment_sisnr",
]
