"""Codec dispatch — semantic mirror of /root/reference/src/tersets.zig:64-254.

``compress`` validates (non-empty input, non-negative error bound — zig
:70-71), dispatches on method, and appends the method id as the blob's last
byte (zig :176) so blobs are self-describing. ``decompress`` reads the method
from the last byte (zig :189-193) and dispatches.

Unlike the reference, every decoder here receives the blob *without* the
trailing method byte. (The reference accidentally passes the full blob
including the method byte to the SlidingWindow decoder, zig :227-229 — a
latent bug we do not replicate; divergence documented in
codecs/sliding_window.py.)
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from ..errors import (
    UnknownMethodError,
    UnsupportedErrorBoundError,
    UnsupportedInputError,
)
from ..methods import ALWAYS_LOSSLESS, LOSSLESS_AT_ZERO, Method, max_method_index
from . import (
    abc_linear,
    delta_of_delta,
    gorilla,
    histogram,
    line_simplification,
    mix_piece,
    pmc,
    sim_piece,
    swing_slide,
)

#: method -> compress(values: f64[:], error_bound: float) -> bytes (no method byte)
_COMPRESSORS: dict[Method, Callable[[np.ndarray, float], bytes]] = {
    Method.PoorMansCompressionMidrange: pmc.compress_midrange,
    Method.PoorMansCompressionMean: pmc.compress_mean,
    Method.SwingFilter: swing_slide.compress_swing,
    Method.SwingFilterDisconnected: swing_slide.compress_swing_disconnected,
    Method.SlideFilter: swing_slide.compress_slide,
    Method.SimPiece: sim_piece.compress,
    Method.PiecewiseConstantHistogram: histogram.compress_pwch,
    Method.PiecewiseLinearHistogram: histogram.compress_pwlh,
    Method.ABCLinearApproximation: abc_linear.compress,
    Method.VisvalingamWhyatt: line_simplification.compress_vw,
    Method.SlidingWindow: line_simplification.compress_sliding_window,
    Method.BottomUp: line_simplification.compress_bottom_up,
    Method.MixPiece: mix_piece.compress,
    Method.GorillaXOR: gorilla.compress,
    Method.DeltaOfDelta: delta_of_delta.compress,
}

#: method -> decompress(blob without method byte) -> np.ndarray
_DECOMPRESSORS: dict[Method, Callable[[bytes], np.ndarray]] = {
    Method.PoorMansCompressionMidrange: pmc.decompress,
    Method.PoorMansCompressionMean: pmc.decompress,
    Method.SwingFilter: swing_slide.decompress_swing,
    Method.SwingFilterDisconnected: swing_slide.decompress_slide,
    Method.SlideFilter: swing_slide.decompress_slide,
    Method.SimPiece: sim_piece.decompress,
    Method.PiecewiseConstantHistogram: histogram.decompress_pwch,
    Method.PiecewiseLinearHistogram: histogram.decompress_pwlh,
    Method.ABCLinearApproximation: abc_linear.decompress,
    Method.VisvalingamWhyatt: line_simplification.decompress_vw,
    Method.SlidingWindow: line_simplification.decompress_sliding_window,
    Method.BottomUp: line_simplification.decompress_bottom_up,
    Method.MixPiece: mix_piece.decompress,
    Method.GorillaXOR: gorilla.decompress,
    Method.DeltaOfDelta: delta_of_delta.decompress,
}


def register(method: Method, compressor, decompressor) -> None:
    """Hook for codec modules implemented in later milestones."""
    _COMPRESSORS[method] = compressor
    _DECOMPRESSORS[method] = decompressor


def implemented_methods() -> list[Method]:
    return sorted(_COMPRESSORS, key=int)


def compress(values, method: Method, error_bound: float = 0.0) -> bytes:
    values = np.ascontiguousarray(values, dtype=np.float64)
    if len(values) == 0:
        raise UnsupportedInputError("empty input")  # zig :70
    if error_bound < 0:
        raise UnsupportedErrorBoundError("negative error bound")  # zig :71
    method = Method(method)
    try:
        body = _COMPRESSORS[method](values, error_bound)
    except KeyError:
        raise UnknownMethodError(f"method {method!r} not implemented") from None
    return body + bytes([int(method)])


def decompress(blob: bytes) -> np.ndarray:
    if len(blob) == 0:
        raise UnsupportedInputError("empty blob")  # zig :187
    method_index = blob[-1]
    if method_index > max_method_index():
        raise UnknownMethodError(f"method byte {method_index}")  # zig :190-191
    method = Method(method_index)
    try:
        out = _DECOMPRESSORS[method](blob[:-1])
    except KeyError:
        raise UnknownMethodError(f"method {method!r} not implemented") from None
    return np.ascontiguousarray(out, dtype=np.float64)


def is_within_error_bound(
    uncompressed: np.ndarray, decompressed: np.ndarray, error_bound: float
) -> bool:
    """Mirror of isWithinErrorBound (/root/reference/src/tersets.zig:239-254)."""
    uncompressed = np.asarray(uncompressed, dtype=np.float64)
    decompressed = np.asarray(decompressed, dtype=np.float64)
    if uncompressed.shape != decompressed.shape:
        return False
    return bool(np.all(np.abs(uncompressed - decompressed) <= np.float32(error_bound)))


__all__ = [
    "ALWAYS_LOSSLESS",
    "LOSSLESS_AT_ZERO",
    "Method",
    "compress",
    "decompress",
    "implemented_methods",
    "is_within_error_bound",
    "register",
]
