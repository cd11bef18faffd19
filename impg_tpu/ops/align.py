"""Native pairwise alignment binding (see native/align.cpp).

Fills the reference's WFA2 FFI role (impg.rs:43-71): base-level CIGAR
reconstruction for bounded segments.
"""

from __future__ import annotations

import ctypes

import numpy as np

from impg_tpu.io import native

DEFAULT_SCORING = (1, 4, 6, 2)  # match, mismatch, gap_open, gap_ext


def _bind(lib):
    if getattr(lib, "_align_bound", False):
        return lib
    lib.impg_align_pair.restype = ctypes.c_int64
    lib.impg_align_pair.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64,
    ]
    lib._align_bound = True
    return lib


def align_pair(
    query: bytes, target: bytes, scoring=DEFAULT_SCORING
) -> np.ndarray:
    """Globally align query vs target; returns packed CIGAR runs
    ('I' consumes query, 'D' consumes target — PAF convention)."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native alignment library unavailable")
    _bind(lib)
    m, x, go, ge = scoring
    cap = len(query) + len(target) + 4
    out = (ctypes.c_uint32 * cap)()
    n = lib.impg_align_pair(
        query, len(query), target, len(target), m, x, go, ge, out, cap
    )
    if n < 0:
        raise ValueError(
            f"alignment failed (segment too large: {len(query)}x{len(target)})"
        )
    return np.frombuffer(out, np.uint32, int(n)).copy()


def align_pair_wfa(
    query: bytes, target: bytes, scoring=DEFAULT_SCORING
) -> np.ndarray | None:
    """Direct wavefront (WFA) global alignment — same optimum as
    `align_pair`'s Gotoh oracle by the score-domain transform (see
    native/align.cpp align_wfa). Returns None when WFA declines
    (unsupported scoring / divergence exceeds the cell budget)."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native alignment library unavailable")
    _bind(lib)
    if not hasattr(lib, "_wfa_bound"):
        lib.impg_align_wfa.restype = ctypes.c_int64
        lib.impg_align_wfa.argtypes = lib.impg_align_pair.argtypes
        lib._wfa_bound = True
    m, x, go, ge = scoring
    cap = len(query) + len(target) + 4
    out = (ctypes.c_uint32 * cap)()
    n = lib.impg_align_wfa(
        query, len(query), target, len(target), m, x, go, ge, out, cap
    )
    if n == -3:
        return None
    if n < 0:
        raise ValueError("WFA alignment failed (capacity)")
    return np.frombuffer(out, np.uint32, int(n)).copy()


def align_extend(
    query: bytes, target: bytes, scoring=DEFAULT_SCORING
) -> tuple[int, int]:
    """Ends-free extension: align ALL of `query` against the best-scoring
    PREFIX of `target` (the reference's BiWFA boundary-refinement mode,
    syng_transitive.rs:436).  Returns (target bp consumed, matched bp)."""
    lib = native.load()
    if lib is None:
        raise RuntimeError("native alignment library unavailable")
    _bind(lib)
    if not hasattr(lib, "_prefix_bound"):
        lib.impg_align_prefix.restype = ctypes.c_int64
        lib.impg_align_prefix.argtypes = lib.impg_align_pair.argtypes
        lib._prefix_bound = True
    m, x, go, ge = scoring
    cap = len(query) + len(target) + 4
    out = (ctypes.c_uint32 * cap)()
    n = lib.impg_align_prefix(
        query, len(query), target, len(target), m, x, go, ge, out, cap
    )
    if n < 0:
        raise ValueError(
            f"extension failed (segment too large: {len(query)}x{len(target)})"
        )
    runs = np.frombuffer(out, np.uint32, int(n))
    ops = runs >> np.uint32(29)
    lens = (runs & np.uint32((1 << 29) - 1)).astype(np.int64)
    consumed = int(lens[(ops == 0) | (ops == 1) | (ops == 3)].sum())
    matches = int(lens[ops == 0].sum())
    return consumed, matches
