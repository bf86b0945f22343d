from .util import (
    MetricTracker,
    ensure_dir,
    inf_loop,
    read_json,
    write_json,
)
from .config import ConfigParser
from .logging import setup_logging
from .tb_writer import TensorboardWriter

__all__ = [
    "ConfigParser",
    "MetricTracker",
    "TensorboardWriter",
    "ensure_dir",
    "inf_loop",
    "read_json",
    "write_json",
    "setup_logging",
]
