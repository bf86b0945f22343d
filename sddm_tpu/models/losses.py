"""Training losses.  Parity: reference model/loss.py:4-7."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(pred - target))


def log_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """mean-abs over last axis -> clamp(1e-20) -> log -> mean (model/loss.py:6-7)."""
    per = jnp.mean(jnp.abs(pred - target), axis=-1)
    return jnp.mean(jnp.log(jnp.clip(per, min=1e-20)))


LOSSES = {"l1_loss": l1_loss, "l2_loss": l2_loss, "log_loss": log_loss}


def get_loss(name: str):
    return LOSSES[name]
