"""Train state + optimizer construction.

Parity: the reference instantiates ``torch.optim.<type>`` from the config's
``optimizer`` block by reflection (train.py:54, parse_config.py:82-95), e.g.
``Adam(lr=2e-3, weight_decay=0, amsgrad=true)`` for the flagship recipe.
Optax equivalents are registered under the same names so the shipped configs
carry over verbatim.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    """Minimal functional train state (params + optimizer state + step)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
        )


def _adam(lr=1e-3, weight_decay=0.0, amsgrad=False, betas=(0.9, 0.999), eps=1e-8):
    if amsgrad:
        base = optax.amsgrad(lr, b1=betas[0], b2=betas[1], eps=eps)
    else:
        base = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        # torch Adam's weight_decay is L2 regularization added to the gradient
        return optax.chain(
            optax.add_decayed_weights(weight_decay), base
        )
    return base


def _adamw(lr=1e-3, weight_decay=1e-2, betas=(0.9, 0.999), eps=1e-8):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def _sgd(lr=1e-3, momentum=0.0, weight_decay=0.0, nesterov=False):
    base = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


def _rmsprop(lr=1e-2, alpha=0.99, eps=1e-8, momentum=0.0, weight_decay=0.0):
    base = optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


OPTIMIZERS = {
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
}


def make_optimizer(opt_config: dict) -> optax.GradientTransformation:
    """Build from a config block ``{"type": ..., "args": {...}}``."""
    name = opt_config["type"]
    if name not in OPTIMIZERS:
        raise KeyError(f"unknown optimizer '{name}'; available: {sorted(OPTIMIZERS)}")
    return OPTIMIZERS[name](**opt_config.get("args", {}))
