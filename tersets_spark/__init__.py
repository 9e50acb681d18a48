"""tersets_spark — a PySpark-native time-series rollup + compression engine.

Built from scratch against the behavior of tomlouisklein/TerseTS (read-only
reference at /root/reference); architecture is Spark-first per SURVEY.md.

Public API:
    compress(values, method, error_bound) -> bytes
    decompress(blob) -> np.ndarray
    Method — codec registry (Zig-order ids 0..12 + extensions 13..14)
    is_within_error_bound(a, b, eb) -> bool
"""

from .codecs import (
    compress,
    decompress,
    implemented_methods,
    is_within_error_bound,
)
from .methods import ALWAYS_LOSSLESS, LOSSLESS_AT_ZERO, Method

__version__ = "0.1.0"

__all__ = [
    "ALWAYS_LOSSLESS",
    "LOSSLESS_AT_ZERO",
    "Method",
    "compress",
    "decompress",
    "implemented_methods",
    "is_within_error_bound",
    "__version__",
]
