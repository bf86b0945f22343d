from .framing import Framer, Segmentor, frame_signal, overlap_add
from .logaudio import log_modulus_normalize, log_modulus_normalize_reverse

__all__ = [
    "Framer",
    "Segmentor",
    "frame_signal",
    "overlap_add",
    "log_modulus_normalize",
    "log_modulus_normalize_reverse",
]
