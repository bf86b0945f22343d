"""Small utilities.  Parity: reference utils/util.py:9-67 (read/write json,
inf_loop, MetricTracker — pandas replaced by a plain dict, same API)."""

from __future__ import annotations

import json
from collections import OrderedDict
from itertools import repeat
from pathlib import Path


def ensure_dir(dirname):
    dirname = Path(dirname)
    if not dirname.is_dir():
        dirname.mkdir(parents=True, exist_ok=False)


def read_json(fname):
    with Path(fname).open("rt") as handle:
        return json.load(handle, object_hook=OrderedDict)


def write_json(content, fname):
    with Path(fname).open("wt") as handle:
        json.dump(content, handle, indent=4, sort_keys=False)


def inf_loop(data_loader):
    """Endless data loader (reference utils/util.py:24-27)."""
    for loader in repeat(data_loader):
        yield from loader


def param_count(params) -> int:
    """Total trainable parameter count of a params pytree."""
    import jax
    import numpy as np

    return int(
        sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    )


def model_summary(name: str, params) -> str:
    """Human-readable summary line (reference BaseModel.__str__ prints
    trainable-parameter count, base/base_model.py:14-25)."""
    return f"{name}\nTrainable parameters: {param_count(params)}"


class MetricTracker:
    """Running averages keyed by metric name (reference utils/util.py:46-67)."""

    def __init__(self, *keys, writer=None):
        self.writer = writer
        self._total = {k: 0.0 for k in keys}
        self._counts = {k: 0 for k in keys}

    def reset(self):
        for k in self._total:
            self._total[k] = 0.0
            self._counts[k] = 0

    def update(self, key, value, n=1):
        if self.writer is not None:
            self.writer.add_scalar(key, value)
        self._total[key] += float(value) * n
        self._counts[key] += n

    def avg(self, key):
        c = self._counts[key]
        return self._total[key] / c if c else 0.0

    def result(self):
        return {k: self.avg(k) for k in self._total}
