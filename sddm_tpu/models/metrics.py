"""In-graph speech metrics.

Parity: ``sisnr`` (reference model/metric.py:5-34) and ``segment_sisnr``
(reference model/segmentor.py:7-31).  Host-side PESQ/STOI live in
``sddm_tpu.evaluate`` (they wrap C libraries, like the reference's
torchmetrics usage).
"""

from __future__ import annotations

import jax.numpy as jnp


def sisnr(s_hat: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SNR in dB, meaned over the batch; returns a scalar."""
    if s_hat.ndim == 2:
        s_hat = s_hat[:, None, :]
    if s.ndim == 2:
        s = s[:, None, :]
    s_hat = s_hat - jnp.mean(s_hat, axis=-1, keepdims=True)
    s = s - jnp.mean(s, axis=-1, keepdims=True)
    s_shat = jnp.sum(s_hat * s, axis=-1, keepdims=True)
    s_2 = jnp.sum(s**2, axis=-1, keepdims=True)
    s_target = s_shat * s / s_2
    e_noise = s_hat - s_target
    ratio = jnp.sum(s_target**2, axis=-1, keepdims=True) / jnp.sum(
        e_noise**2, axis=-1, keepdims=True
    )
    return jnp.squeeze(jnp.mean(10.0 * jnp.log10(ratio)))


def segment_sisnr(
    s_hat: jnp.ndarray, s: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Per-segment SI-SNR; inputs ``[..., n_segments, L]``, returns ``[B, n]``
    (squeezing singleton dims like the reference's ``.squeeze()``).

    Guarded against degenerate segments the reference formula
    (model/segmentor.py:7-33) NaNs on: an exactly-silent CLEAN segment
    (``sum(s^2) == 0`` — division by zero; real on synthetic/quantized
    corpora where inter-syllable gaps hit digital zero) maps to a finite
    ~-80 dB "all noise" label, and a noise-free segment (``e_noise == 0``,
    log10 of +inf) to a finite ~+80 dB one.  For ordinary segments the
    eps terms perturb the label by O(eps / energy) — far below label
    noise."""
    s_hat = s_hat - jnp.mean(s_hat, axis=-1, keepdims=True)
    s = s - jnp.mean(s, axis=-1, keepdims=True)
    s_shat = jnp.sum(s_hat * s, axis=-1, keepdims=True)
    s_2 = jnp.sum(s**2, axis=-1, keepdims=True)
    s_target = s_shat * s / (s_2 + eps)
    e_noise = s_hat - s_target
    out = 10.0 * jnp.log10(
        (jnp.sum(s_target**2, axis=-1, keepdims=True) + eps)
        / (jnp.sum(e_noise**2, axis=-1, keepdims=True) + eps)
    )
    return jnp.squeeze(out)


METRICS = {"sisnr": sisnr}


def get_metric(name: str):
    return METRICS[name]
