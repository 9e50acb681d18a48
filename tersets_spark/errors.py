"""Typed errors for the tersets_spark engine.

Mirrors the reference error set (``/root/reference/src/tersets.zig:33-41``) with
one Python exception class per variant, plus the stable C-ABI integer codes
(``/root/reference/src/capi.zig:101-111``). Unlike the reference Python binding
(which only surfaces code 1, ``bindings/python/tersets/__init__.py:116-117``),
every error is a distinct exception type here.
"""

from __future__ import annotations


class TersetsError(Exception):
    """Base class for all engine errors."""

    code: int = 0


class UnknownMethodError(TersetsError):
    code = 1


class UnsupportedInputError(TersetsError):
    code = 2


class UnsupportedErrorBoundError(TersetsError):
    code = 3


class ItemNotFoundError(TersetsError):
    code = 4


class OutOfMemoryError(TersetsError):
    code = 5


class EmptyConvexHullError(TersetsError):
    code = 6


class EmptyQueueError(TersetsError):
    code = 7


#: C-ABI-stable code -> exception class (codes 1..7 as in the reference).
ERROR_BY_CODE = {
    cls.code: cls
    for cls in (
        UnknownMethodError,
        UnsupportedInputError,
        UnsupportedErrorBoundError,
        ItemNotFoundError,
        OutOfMemoryError,
        EmptyConvexHullError,
        EmptyQueueError,
    )
}
