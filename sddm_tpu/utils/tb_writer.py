"""TensorBoard scalar writer with train/valid tag modes.

Parity: reference logger/visualization.py:5-73 — a duck-typed proxy that tags
scalars ``<tag>/<mode>``, tracks a per-step ``steps_per_sec`` scalar, and
degrades to a no-op when no TensorBoard backend is importable.  A JSONL
scalar sidecar (``scalars.jsonl``) is always written so runs are inspectable
without TB.
"""

from __future__ import annotations

import importlib
import json
import time
from pathlib import Path

_TB_MODULES = ["torch.utils.tensorboard", "tensorboardX"]

_PROXIED = {
    "add_scalar",
    "add_scalars",
    "add_image",
    "add_images",
    "add_audio",
    "add_text",
    "add_histogram",
    "add_pr_curve",
    "add_embedding",
}
_TAG_MODE_EXCEPTIONS = {"add_histogram", "add_embedding"}


class TensorboardWriter:
    def __init__(self, log_dir, logger=None, enabled=True):
        self.writer = None
        self.enabled = enabled
        self._jsonl = None
        if enabled:
            for module in _TB_MODULES:
                try:
                    self.writer = importlib.import_module(module).SummaryWriter(
                        str(log_dir)
                    )
                    break
                except ImportError:
                    continue
            if self.writer is None and logger is not None:
                logger.warning(
                    "TensorBoard requested but not importable; falling back to "
                    "JSONL scalars only."
                )
            try:
                self._jsonl = (Path(log_dir) / "scalars.jsonl").open("a")
            except OSError:
                self._jsonl = None

        self.step = 0
        self.mode = ""
        self.timer = time.monotonic()

    def set_step(self, step, mode="train"):
        """Advance the global step; records steps_per_sec like the reference
        (logger/visualization.py:40-48)."""
        self.mode = mode
        self.step = step
        if step == 0:
            self.timer = time.monotonic()
        else:
            duration = time.monotonic() - self.timer
            if duration > 0:
                self.add_scalar("steps_per_sec", 1.0 / duration)
            self.timer = time.monotonic()

    def _record_jsonl(self, tag, value):
        if self._jsonl is not None:
            try:
                self._jsonl.write(
                    json.dumps(
                        {"step": self.step, "tag": tag, "value": float(value)}
                    )
                    + "\n"
                )
                self._jsonl.flush()
            except (TypeError, ValueError, OSError):
                pass

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._jsonl is not None:
            self._jsonl.close()

    def __getattr__(self, name):
        if name in _PROXIED:
            add_data = getattr(self.writer, name, None)

            def wrapper(tag, data, *args, **kwargs):
                if name not in _TAG_MODE_EXCEPTIONS and self.mode:
                    tag = f"{tag}/{self.mode}"
                if name == "add_scalar":
                    self._record_jsonl(tag, data)
                if add_data is not None:
                    add_data(tag, data, self.step, *args, **kwargs)

            return wrapper
        raise AttributeError(name)
