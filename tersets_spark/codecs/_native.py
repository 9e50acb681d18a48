"""Compile-on-first-use loader for the C histogram kernel.

The C source ships INSIDE the package (and inside the ``--py-files`` zip —
shipping.py includes ``.c`` files), so any node that has a C compiler can
build it locally; the build is cached in the system temp dir keyed by the
source hash, with an atomic rename so concurrent Python workers race
safely. No compiler, no ctypes, any failure at all -> ``None``, and the
pure-Python path (histogram.py) serves identical results — the native
kernel is a fast path, never a correctness dependency (differential suite:
tests/test_native_histogram.py).

Set ``TERSETS_SPARK_NO_NATIVE=1`` to force the Python path.

Compile flags: ``-O3 -march=native -ffp-contract=off`` (portable
``-O2 -ffp-contract=off`` fallback) — contraction off is load-bearing
(GCC would otherwise fuse a*b+c into fma and change results vs NumPy);
no fast-math flags, so all arithmetic stays strict IEEE-754.  -march
only unlocks guarded SIMD paths whose folds are value-exact.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

def _read_source(source_name: str) -> bytes | None:
    # importlib.resources works both from the filesystem and from the
    # shipped zip (zipimport), unlike a plain open(__file__-relative).
    try:
        from importlib.resources import files

        return files(__package__).joinpath(source_name).read_bytes()
    except Exception:
        return None


def _cache_dir() -> str | None:
    """Per-user 0700 cache dir; refuse dirs we don't own or that others can
    write (a world-shared predictable path would let another local user
    plant a malicious .so that we then ctypes.CDLL)."""
    path = os.path.join(tempfile.gettempdir(), f"tersets-{os.getuid()}")
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
        st = os.stat(path)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            return None
    except OSError:
        return None
    return path


def _safe_to_load(so_path: str) -> bool:
    """Only CDLL cache files we own and nobody else can write."""
    try:
        st = os.stat(so_path)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _build(src: bytes, source_name: str) -> str | None:
    digest = hashlib.sha256(src).hexdigest()[:16]
    cache = _cache_dir()
    if cache is None:
        return None
    so_path = os.path.join(cache, f"tersets_{digest}.so")
    if os.path.exists(so_path):
        return so_path if _safe_to_load(so_path) else None
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    tmpdir = tempfile.mkdtemp(prefix="tersets_build_")
    try:
        c_path = os.path.join(tmpdir, source_name)
        with open(c_path, "wb") as f:
            f.write(src)
        tmp_so = os.path.join(tmpdir, "out.so")
        # -march=native unlocks the guarded AVX2 paths (exact-value SIMD
        # min/max folds, bit-identical by construction; differential
        # suites re-verify at test time).  Contraction stays off — FMA
        # fusion WOULD change results.  Falls back to portable flags on
        # any compiler that rejects -march=native.
        flag_sets = (
            ["-O3", "-march=native", "-ffp-contract=off"],
            ["-O2", "-ffp-contract=off"],
        )
        proc = None
        for flags in flag_sets:
            proc = subprocess.run(
                [cc, *flags, "-fPIC", "-shared", c_path, "-o", tmp_so, "-lm"],
                capture_output=True,
                timeout=120,
            )
            if proc.returncode == 0:
                break
        if proc is None or proc.returncode != 0:
            return None
        os.replace(tmp_so, so_path)  # atomic: concurrent builders converge
        return so_path
    except Exception:
        return None
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _load(source_name: str, func_name: str):
    if os.environ.get("TERSETS_SPARK_NO_NATIVE"):
        return None
    src = _read_source(source_name)
    if src is None:
        return None
    so_path = _build(src, source_name)
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
        return getattr(lib, func_name)
    except Exception:
        return None


def load_histogram_kernel():
    """Return the configured Min-Merge kernel or None (Python fallback)."""
    fn = _load("_histogram_native.c", "tersets_histogram")
    if fn is None:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_lp = ctypes.POINTER(ctypes.c_long)
    fn.restype = ctypes.c_long
    fn.argtypes = [
        c_dp, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        c_lp, c_lp, c_dp, c_dp, c_dp, c_dp,
    ]
    return fn


def load_histogram_mabr_setter():
    """Return the kernel's MABR-mode setter (1 = force the O(p^2) exact
    scan, 0 = candidate-pruned fast path) or None. Differential tests use
    it to pin fast-vs-exact bit-identity inside the same binary."""
    fn = _load("_histogram_native.c", "tersets_histogram_set_mabr_exact")
    if fn is None:
        return None
    fn.restype = None
    fn.argtypes = [ctypes.c_int]
    return fn


def load_swing_kernel():
    """Return the configured Swing/Slide kernel or None (Python fallback)."""
    fn = _load("_swing_native.c", "tersets_swing")
    if fn is None:
        return None
    fn.restype = ctypes.c_long
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_double,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    return fn


def load_piece_kernels():
    """Return {name: fn} for the Sim/Mix-Piece kernels, or None."""
    out = {}
    for name in ("tersets_sim_piece", "tersets_mix_piece"):
        fn = _load("_piece_native.c", name)
        if fn is None:
            return None
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.POINTER(ctypes.c_ubyte),
        ]
        out[name] = fn
    return out


def load_lttb_kernel():
    """Return the batched LTTB kernel or None (Python fallback)."""
    fn = _load("_lttb_native.c", "tersets_lttb")
    if fn is None:
        return None
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_lp = ctypes.POINTER(ctypes.c_long)
    fn.restype = ctypes.c_long
    fn.argtypes = [c_dp, c_lp, ctypes.c_long, ctypes.c_long, c_dp, c_lp]
    return fn


def load_linesimp_kernels():
    """Return {name: fn} for the VW/SlidingWindow/BottomUp/ABC kernels, or
    None (Python fallback). One shared object, four entry points."""
    out = {}
    for name in ("tersets_vw", "tersets_sliding_window", "tersets_bottom_up",
                 "tersets_abc"):
        fn = _load("_linesimp_native.c", name)
        if fn is None:
            return None
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_double,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        out[name] = fn
    return out
