"""Log-modulus companding of waveforms.

Parity: reference prepare_logaudio.py:12-26.  Pure jnp — runs on device
inside the jitted data path (the reference precomputes ``.logwav.npy`` files
on host; we support both that offline flow and on-the-fly companding).
"""

from __future__ import annotations

import jax.numpy as jnp


def log_modulus_normalize(audio: jnp.ndarray, expand_order: float = 3) -> jnp.ndarray:
    """sign(x) * log10(|x * 10^order| + 1) / (2 * order); maps (-1,1)->(-1,1)."""
    out = jnp.sign(audio) * jnp.log10(jnp.abs(10.0**expand_order * audio) + 1.0)
    return out / (2 * expand_order)


def log_modulus_normalize_reverse(
    audio_log_modulus: jnp.ndarray, expand_order: float = 3
) -> jnp.ndarray:
    """Inverse of :func:`log_modulus_normalize` (prepare_logaudio.py:22-26)."""
    x = audio_log_modulus * 2 * expand_order
    return jnp.sign(x) * (jnp.power(10.0, jnp.abs(x)) - 1.0) / 10.0**expand_order
