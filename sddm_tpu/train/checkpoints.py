"""Checkpoint save/restore with current/last/best rotation.

Parity: reference base/base_trainer.py:100-155 —
``checkpoint_current`` is renamed to ``checkpoint_last`` before each save, and
``model_best`` is written when the monitored metric improves; the payload
carries ``{arch, epoch, state_dict(params), optimizer(opt_state),
monitor_best, config}`` and resume restores epoch/monitor-best/optimizer with
config-mismatch warnings only.

Format: a single msgpack file via flax.serialization (atomic rename-friendly,
fast host-side IO; arrays come back as numpy and are re-sharded by the
trainer on restore).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

CKPT_CURRENT = "checkpoint_current.ckpt"
CKPT_LAST = "checkpoint_last.ckpt"
CKPT_BEST = "model_best.ckpt"

logger = logging.getLogger(__name__)


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path,
    *,
    arch: str,
    epoch: int,
    params: Any,
    opt_state: Any,
    monitor_best: float,
    config: Optional[dict] = None,
) -> None:
    payload = {
        "arch": arch,
        "epoch": epoch,
        "params": _to_host(serialization.to_state_dict(params)),
        "opt_state": _to_host(serialization.to_state_dict(opt_state)),
        "monitor_best": float(monitor_best),
        "config_json": json.dumps(config or {}),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = Path(str(path) + ".tmp")
    tmp.write_bytes(data)
    tmp.rename(path)


def save_rotating_checkpoint(
    checkpoint_dir,
    *,
    arch: str,
    epoch: int,
    params: Any,
    opt_state: Any,
    monitor_best: float,
    config: Optional[dict] = None,
    save_best: bool = False,
) -> None:
    """current -> last rename, then write current; optionally write best
    (reference base_trainer.py:117-128)."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    current = checkpoint_dir / CKPT_CURRENT
    if current.is_file():
        current.rename(checkpoint_dir / CKPT_LAST)
    kwargs = dict(
        arch=arch, epoch=epoch, params=params, opt_state=opt_state,
        monitor_best=monitor_best, config=config,
    )
    save_checkpoint(current, **kwargs)
    logger.info("Saved checkpoint epoch %d as %s", epoch, CKPT_CURRENT)
    if save_best:
        save_checkpoint(checkpoint_dir / CKPT_BEST, **kwargs)
        logger.info("Saved checkpoint epoch %d as %s", epoch, CKPT_BEST)


def save_best_checkpoint(
    checkpoint_dir,
    *,
    arch: str,
    epoch: int,
    params: Any,
    opt_state: Any,
    monitor_best: float,
    config: Optional[dict] = None,
) -> None:
    """Write model_best.ckpt only, without touching current/last.

    Used by BaseTrainer at monitor-improvement time so the best weights
    are never lost to the save-period gate (the reference template's
    base/base_trainer.py:96-97 only writes model_best when
    ``epoch % save_period == 0``)."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    save_checkpoint(
        checkpoint_dir / CKPT_BEST,
        arch=arch, epoch=epoch, params=params, opt_state=opt_state,
        monitor_best=monitor_best, config=config,
    )
    logger.info("Saved checkpoint epoch %d as %s", epoch, CKPT_BEST)


def load_checkpoint(
    path,
    params_template: Optional[Any] = None,
    opt_state_template: Optional[Any] = None,
) -> dict:
    """Restore a checkpoint payload.

    ``params``/``opt_state`` are restored into the provided templates when
    given (required for opt_state, whose named-tuple structure does not
    round-trip through msgpack alone).
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    out = {
        "arch": raw["arch"],
        "epoch": int(raw["epoch"]),
        "monitor_best": float(raw["monitor_best"]),
        "config": json.loads(raw.get("config_json", "{}")),
    }
    if params_template is not None:
        out["params"] = serialization.from_state_dict(
            params_template, raw["params"]
        )
    else:
        out["params"] = raw["params"]
    if opt_state_template is not None:
        out["opt_state"] = serialization.from_state_dict(
            opt_state_template, raw["opt_state"]
        )
    else:
        out["opt_state"] = raw["opt_state"]
    return out
