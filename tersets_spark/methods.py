"""Compression-method registry.

Integer values 0..12 follow the *Zig* enum order of the reference
(``/root/reference/src/tersets.zig:44-58``), which is pinned by the reference's
own C-ABI stability test (``/root/reference/src/capi.zig:113-126``).

NOTE: the reference's Python binding swaps SlidingWindow/BottomUp
(``/root/reference/bindings/python/tersets/__init__.py:89-90`` declares
``BottomUp = 10, SlidingWindow = 11``) — that is a bug in the binding, since
the Zig side defines blob semantics. We use the Zig order and add a regression
test mirroring ``capi.zig:113-126``.

Methods 13/14 are engine extensions required by the north star (Gorilla XOR
float encoding and delta-of-delta integer packing, from Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", PVLDB 8(12),
2015). They do not exist in the reference snapshot.
"""

from __future__ import annotations

import enum


class Method(enum.IntEnum):
    PoorMansCompressionMidrange = 0
    PoorMansCompressionMean = 1
    SwingFilter = 2
    SwingFilterDisconnected = 3
    SlideFilter = 4
    SimPiece = 5
    PiecewiseConstantHistogram = 6
    PiecewiseLinearHistogram = 7
    ABCLinearApproximation = 8
    VisvalingamWhyatt = 9
    SlidingWindow = 10
    BottomUp = 11
    MixPiece = 12
    # --- engine extensions (not in the reference snapshot) ---
    GorillaXOR = 13
    DeltaOfDelta = 14


#: Methods that are lossless at error_bound == 0 per the reference's own
#: Python round-trip test (/root/reference/bindings/python/tests/__init__.py:52-61),
#: plus the always-lossless engine extensions.
LOSSLESS_AT_ZERO = (
    Method.PoorMansCompressionMean,
    Method.PoorMansCompressionMidrange,
    Method.SwingFilter,
    Method.ABCLinearApproximation,
    Method.SwingFilterDisconnected,
    Method.SlideFilter,
)

ALWAYS_LOSSLESS = (Method.GorillaXOR, Method.DeltaOfDelta)


def max_method_index() -> int:
    """Mirror of getMaxMethodIndex (/root/reference/src/tersets.zig:257-266)."""
    return max(int(m) for m in Method)
