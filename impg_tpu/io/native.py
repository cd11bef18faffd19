"""ctypes binding to the native C++ ingest library (auto-built on demand).

Falls back gracefully: `load()` returns None when the shared library is
missing and cannot be built, and io/paf.py then uses the pure-Python parser.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC_NAMES = (
    "paf_parser.cpp", "poa.cpp", "align.cpp", "seqwish_uf.cpp", "gbwt.cpp",
    "seqwish_emit.cpp", "visited.cpp", "syncmer.cpp", "gfa_parser.cpp",
    "spellc.cpp", "host_engine.cpp",
)
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libimpg_native.so")

_lib = None
_load_attempted = False
_malloc_tuned = False

# glibc mallopt parameter numbers (malloc.h).
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc_for_reuse(threshold_bytes: int = 256 << 20) -> bool:
    """Keep big freed buffers on the heap for reuse (glibc mallopt).

    This environment faults fresh pages at ~3-6 ms/MB (cold-page
    demotion; see graph/columnar_ops.py), and glibc serves any
    allocation above M_MMAP_THRESHOLD (dynamic, <=32 MiB) with a private
    mmap that is munmap'd on free — so a loop that materializes a large
    result buffer per chunk pays the full first-touch fault cost on
    every iteration even though it frees the previous buffer.  Raising
    M_MMAP_THRESHOLD and M_TRIM_THRESHOLD keeps those buffers on the
    main heap, where free()+malloc() hands back the same hot pages.

    Called once from load(), so every native-engine process (CLI, bench,
    tests) gets it.  Kill switch: IMPG_MALLOC_TUNE=0.  Returns False
    (no-op) on non-glibc platforms.
    """
    global _malloc_tuned
    if _malloc_tuned:
        return True
    if os.environ.get("IMPG_MALLOC_TUNE", "1") == "0":
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        mallopt = libc.mallopt
    except (OSError, AttributeError):
        return False
    mallopt.restype = ctypes.c_int
    mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
    ok = mallopt(_M_MMAP_THRESHOLD, threshold_bytes)
    ok = mallopt(_M_TRIM_THRESHOLD, threshold_bytes) and ok
    _malloc_tuned = bool(ok)
    return _malloc_tuned


def _host_supports_avx2() -> bool:
    """True only when the running CPU reports AVX2.

    Gating on compile success is not enough: g++ compiles AVX2 code on any
    x86 host, and the resulting .so would SIGILL at runtime on a pre-AVX2
    CPU.  /proc/cpuinfo's flags line reflects the actual hardware (Linux);
    on other platforms we conservatively skip the flag (the kernels are
    autovectorized, not intrinsics, so baseline codegen stays correct).
    """
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    return "avx2" in line.split(":", 1)[1].split()
    except OSError:
        pass
    return False


def _build() -> bool:
    srcs = [os.path.join(_NATIVE_DIR, f) for f in _SRC_NAMES]
    if not all(os.path.exists(s) for s in srcs):
        return False
    # Flags must match native/Makefile — notably -mavx2, which the POA
    # kernel's vectorized pass relies on (8 int32 lanes vs SSE2's 4).
    # -mavx2 is added only when the host CPU actually has it; a plain
    # baseline build remains as the fallback ISA and for non-x86.
    isa_choices = ([["-mavx2"], []] if _host_supports_avx2() else [[]])
    for isa in isa_choices:
        try:
            subprocess.run(
                ["g++", "-O3", *isa, "-std=c++17", "-fPIC", "-pthread",
                 "-shared", "-o", _SO_PATH, *srcs],
                check=True,
                capture_output=True,
                timeout=240,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        return _lib
    _load_attempted = True
    tune_malloc_for_reuse()
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(os.path.join(_NATIVE_DIR, "paf_parser.cpp"))
        and os.path.getmtime(_SO_PATH)
        < max(os.path.getmtime(os.path.join(_NATIVE_DIR, f)) for f in _SRC_NAMES)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.impg_paf_parse.restype = ctypes.c_void_p
    lib.impg_paf_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
    ]
    if hasattr(lib, "impg_paf_parse_mt"):
        lib.impg_paf_parse_mt.restype = ctypes.c_void_p
        lib.impg_paf_parse_mt.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int32,
        ]
    lib.impg_paf_error.restype = ctypes.c_char_p
    lib.impg_paf_error.argtypes = [ctypes.c_void_p]
    for name in (
        "impg_paf_n_records",
        "impg_paf_n_runs",
        "impg_paf_n_names",
        "impg_paf_names_size",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    ptr_getters = {
        "impg_paf_query_name_idx": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_target_name_idx": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_q_start": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_q_end": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_t_start": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_t_end": ctypes.POINTER(ctypes.c_int32),
        "impg_paf_strand": ctypes.POINTER(ctypes.c_int8),
        "impg_paf_runs": ctypes.POINTER(ctypes.c_uint32),
        "impg_paf_run_offsets": ctypes.POINTER(ctypes.c_int64),
        "impg_paf_name_offsets": ctypes.POINTER(ctypes.c_int64),
        "impg_paf_name_lengths": ctypes.POINTER(ctypes.c_int64),
    }
    for name, restype in ptr_getters.items():
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [ctypes.c_void_p]
    lib.impg_paf_names_buf.restype = ctypes.POINTER(ctypes.c_char)
    lib.impg_paf_names_buf.argtypes = [ctypes.c_void_p]
    lib.impg_paf_free.restype = None
    lib.impg_paf_free.argtypes = [ctypes.c_void_p]

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.uf_create.restype = ctypes.c_void_p
    lib.uf_create.argtypes = [ctypes.c_int64]
    lib.uf_destroy.restype = None
    lib.uf_destroy.argtypes = [ctypes.c_void_p]
    lib.uf_union_runs.restype = None
    lib.uf_union_runs.argtypes = [
        ctypes.c_void_p, i64p, i8p, i64p, i64p, u8p, ctypes.c_int64,
    ]
    lib.uf_find_all.restype = None
    lib.uf_find_all.argtypes = [ctypes.c_void_p, i64p, u8p, ctypes.c_int64]
    lib.uf_union_pairs.restype = None
    lib.uf_union_pairs.argtypes = [ctypes.c_void_p, i64p, i64p,
                                   ctypes.c_int64]

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.impg_gbwt_build.restype = ctypes.c_void_p
    lib.impg_gbwt_build.argtypes = [ctypes.c_int64, i64p, i32p, u64p, ctypes.c_int32]
    lib.impg_gbwt_destroy.restype = None
    lib.impg_gbwt_destroy.argtypes = [ctypes.c_void_p]
    lib.impg_gbwt_num_steps.restype = ctypes.c_int64
    lib.impg_gbwt_num_steps.argtypes = [ctypes.c_void_p]
    lib.impg_gbwt_node_count.restype = ctypes.c_int64
    lib.impg_gbwt_node_count.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.impg_gbwt_match_walk.restype = ctypes.c_int64
    lib.impg_gbwt_match_walk.argtypes = [
        ctypes.c_void_p, i32p, u64p, ctypes.c_int64, i64p, i64p, i64p,
    ]
    lib.impg_gbwt_locate_segment.restype = ctypes.c_int64
    lib.impg_gbwt_locate_segment.argtypes = [
        ctypes.c_void_p, i32p, u64p, ctypes.c_int64, ctypes.c_int64,
        i32p, i64p, i8p, ctypes.c_int64,
    ]

    lib.impg_gfa_parse.restype = ctypes.c_void_p
    lib.impg_gfa_parse.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    if hasattr(lib, "impg_gfa_parse_mt"):
        lib.impg_gfa_parse_mt.restype = ctypes.c_void_p
        lib.impg_gfa_parse_mt.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int32,
        ]
    lib.impg_gfa_error.restype = ctypes.c_char_p
    lib.impg_gfa_error.argtypes = [ctypes.c_void_p]
    lib.impg_gfa_header.restype = ctypes.c_char_p
    lib.impg_gfa_header.argtypes = [ctypes.c_void_p]
    for name in (
        "impg_gfa_n_names", "impg_gfa_names_size", "impg_gfa_n_segs",
        "impg_gfa_seq_size", "impg_gfa_n_links", "impg_gfa_n_paths",
        "impg_gfa_path_names_size", "impg_gfa_n_steps",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    for name, restype in {
        "impg_gfa_name_offsets": ctypes.POINTER(ctypes.c_int64),
        "impg_gfa_seg_name_idx": ctypes.POINTER(ctypes.c_int32),
        "impg_gfa_seq_offsets": ctypes.POINTER(ctypes.c_int64),
        "impg_gfa_link_a": ctypes.POINTER(ctypes.c_int32),
        "impg_gfa_link_b": ctypes.POINTER(ctypes.c_int32),
        "impg_gfa_link_a_rev": ctypes.POINTER(ctypes.c_int8),
        "impg_gfa_link_b_rev": ctypes.POINTER(ctypes.c_int8),
        "impg_gfa_path_name_offsets": ctypes.POINTER(ctypes.c_int64),
        "impg_gfa_path_is_walk": ctypes.POINTER(ctypes.c_int8),
        "impg_gfa_path_off": ctypes.POINTER(ctypes.c_int64),
        "impg_gfa_step_name_idx": ctypes.POINTER(ctypes.c_int32),
        "impg_gfa_step_rev": ctypes.POINTER(ctypes.c_int8),
    }.items():
        fn = getattr(lib, name)
        fn.restype = restype
        fn.argtypes = [ctypes.c_void_p]
    for name in ("impg_gfa_names_buf", "impg_gfa_seq_buf",
                 "impg_gfa_path_names_buf"):
        fn = getattr(lib, name)
        fn.restype = ctypes.POINTER(ctypes.c_char)
        fn.argtypes = [ctypes.c_void_p]
    lib.impg_gfa_free.restype = None
    lib.impg_gfa_free.argtypes = [ctypes.c_void_p]

    lib.sx_extract.restype = ctypes.c_void_p
    lib.sx_extract.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint32, ctypes.c_int32,
    ]
    lib.sx_count.restype = ctypes.c_int64
    lib.sx_count.argtypes = [ctypes.c_void_p]
    lib.sx_pos.restype = ctypes.POINTER(ctypes.c_int64)
    lib.sx_pos.argtypes = [ctypes.c_void_p]
    lib.sx_ids.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.sx_ids.argtypes = [ctypes.c_void_p]
    lib.sx_fwd.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.sx_fwd.argtypes = [ctypes.c_void_p]
    lib.sx_free.restype = None
    lib.sx_free.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "sx_extract_batch"):
        lib.sx_extract_batch.restype = ctypes.c_void_p
        lib.sx_extract_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_uint32,
            ctypes.c_int32,
        ]
        for nm, rt in (
            ("sxb_count", ctypes.c_int64),
            ("sxb_pos", ctypes.POINTER(ctypes.c_int64)),
            ("sxb_ids", ctypes.POINTER(ctypes.c_uint64)),
            ("sxb_fwd", ctypes.POINTER(ctypes.c_uint8)),
            ("sxb_seq_counts", ctypes.POINTER(ctypes.c_int64)),
            ("sxb_free", None),
        ):
            fn = getattr(lib, nm)
            fn.restype = rt
            fn.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "sx_radix_argsort_u64"):
        lib.sx_radix_argsort_u64.restype = None
        lib.sx_radix_argsort_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]

    if hasattr(lib, "impg_concat_tokens"):
        lib.impg_concat_tokens.restype = None
        lib.impg_concat_tokens.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),  # tok_start
            ctypes.POINTER(ctypes.c_int64),  # tok_len
            ctypes.POINTER(ctypes.c_int64),  # rows
            ctypes.c_int64,                  # n_rows
            ctypes.POINTER(ctypes.c_int64),  # out_off
            ctypes.POINTER(ctypes.c_uint8),  # out
        ]
    if hasattr(lib, "impg_concat_tokens_offsets"):
        lib.impg_concat_tokens_offsets.restype = ctypes.c_int64
        lib.impg_concat_tokens_offsets.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # tok_len
            ctypes.POINTER(ctypes.c_int64),  # rows
            ctypes.c_int64,                  # n_rows
            ctypes.POINTER(ctypes.c_int64),  # out_off
        ]
        lib.impg_concat_tokens_mt.restype = None
        lib.impg_concat_tokens_mt.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int32,
        ]
    if hasattr(lib, "impg_topo_priority"):
        lib.impg_topo_priority.restype = None
        lib.impg_topo_priority.argtypes = [
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),  # edge_a
            ctypes.POINTER(ctypes.c_int32),  # edge_b
            ctypes.c_int64,                  # n_edges
            ctypes.POINTER(ctypes.c_int32),  # prio
            ctypes.POINTER(ctypes.c_int32),  # order out
        ]
    if hasattr(lib, "impg_spell_steps"):
        lib.impg_spell_steps.restype = None
        lib.impg_spell_steps.argtypes = [
            ctypes.c_char_p,                      # seq blob
            ctypes.POINTER(ctypes.c_int64),       # seg offsets [n_segs+1]
            ctypes.POINTER(ctypes.c_int32),       # step rows
            ctypes.POINTER(ctypes.c_uint8),       # step rev
            ctypes.c_int64,                       # n_steps
            ctypes.POINTER(ctypes.c_int64),       # out offsets [n_steps+1]
            ctypes.POINTER(ctypes.c_uint8),       # out
            ctypes.c_int32,                       # n_threads
        ]

    _lib = lib
    return _lib


_spell_scratch = np.zeros(0, np.uint8)  # grow-only (page faults are
# expensive on this kernel; a fresh 400 MB output per call costs ~1.2 s
# of first-touch alone)


def concat_tokens(blob: bytes, tok_start, tok_len, rows):
    """Native token-stream concatenation; (out, out_off) or None."""
    lib = load()
    if lib is None or not hasattr(lib, "impg_concat_tokens"):
        return None
    tok_start = np.ascontiguousarray(tok_start, np.int64)
    tok_len = np.ascontiguousarray(tok_len, np.int64)
    rows = np.ascontiguousarray(rows, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    out_off = np.empty(rows.size + 1, np.int64)
    if hasattr(lib, "impg_concat_tokens_offsets"):
        lib.impg_concat_tokens_offsets(
            tok_len.ctypes.data_as(i64p),
            rows.ctypes.data_as(i64p),
            rows.size,
            out_off.ctypes.data_as(i64p),
        )
    else:
        out_off[0] = 0
        np.cumsum(tok_len[rows], out=out_off[1:])
    out = np.empty(int(out_off[-1]), np.uint8)
    if rows.size:
        copy = getattr(lib, "impg_concat_tokens_mt", None)
        if copy is not None:
            copy(
                blob,
                tok_start.ctypes.data_as(i64p),
                tok_len.ctypes.data_as(i64p),
                rows.ctypes.data_as(i64p),
                ctypes.c_int64(rows.size),
                out_off.ctypes.data_as(i64p),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                0,
            )
        else:
            lib.impg_concat_tokens(
                blob,
                tok_start.ctypes.data_as(i64p),
                tok_len.ctypes.data_as(i64p),
                rows.ctypes.data_as(i64p),
                ctypes.c_int64(rows.size),
                out_off.ctypes.data_as(i64p),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
    return out, out_off


def topo_priority(n: int, edge_a, edge_b, prio):
    """Native priority topological sort; None when unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "impg_topo_priority"):
        return None
    edge_a = np.ascontiguousarray(edge_a, np.int32)
    edge_b = np.ascontiguousarray(edge_b, np.int32)
    prio = np.ascontiguousarray(prio, np.int32)
    order = np.empty(n, np.int32)
    if n:
        lib.impg_topo_priority(
            ctypes.c_int32(n),
            edge_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            edge_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(edge_a.size),
            prio.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
    return order


def spell_steps(blob: bytes, seg_off, step_row, step_rev, out_off,
                threads: int = 0, reuse: bool = True):
    """Native single-pass path spelling; None when unavailable.

    With `reuse` (default) the returned array is a view into a grow-only
    module scratch buffer: it is INVALIDATED by the next call — copy
    (`.tobytes()`) anything you keep."""
    global _spell_scratch
    lib = load()
    if lib is None or not hasattr(lib, "impg_spell_steps"):
        return None
    import os as _os

    seg_off = np.ascontiguousarray(seg_off, np.int64)
    step_row = np.ascontiguousarray(step_row, np.int32)
    step_rev = np.ascontiguousarray(step_rev, np.uint8)
    out_off = np.ascontiguousarray(out_off, np.int64)
    total = int(out_off[-1]) if out_off.size else 0
    if not reuse:
        out = np.empty(total, np.uint8)
    else:
        if _spell_scratch.size < total:
            _spell_scratch = np.empty(
                max(total, _spell_scratch.size * 2), np.uint8
            )
        out = _spell_scratch[:total]
    if step_row.size:
        lib.impg_spell_steps(
            blob,
            seg_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            step_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            step_rev.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64(step_row.size),
            out_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(threads or _os.cpu_count() or 1),
        )
    return out


def _as_array(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


class _NativeHandle:
    """Owns a native result handle; freed when the last zero-copy view
    (whose base chain references this object) is garbage-collected."""

    __slots__ = ("_free", "_h")

    def __init__(self, free_fn, h):
        self._free, self._h = free_fn, h

    def __del__(self):
        if self._h:
            self._free(self._h)
            self._h = None


def _view_array(ptr, n, dtype, owner):
    """Zero-copy numpy view over a native buffer.  The view's base chain
    (ndarray -> ctypes buffer -> ._owner) keeps `owner` — and therefore
    the native allocation — alive for the array's whole lifetime."""
    if n == 0:
        return np.zeros(0, dtype)
    addr = ctypes.cast(ptr, ctypes.c_void_p).value
    nbytes = int(n) * np.dtype(dtype).itemsize
    buf = (ctypes.c_byte * nbytes).from_address(addr)
    buf._owner = owner
    return np.frombuffer(buf, dtype=dtype)


def extract_syncmers_native(
    seq: bytes, k: int, w: int, seed: int, threads: int = 1
) -> Optional[tuple]:
    """Native closed-syncmer extraction (bit-exact vs ops/syncmer.py), or
    None when the library is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "sx_extract"):
        return None
    if not isinstance(seq, bytes):
        seq = bytes(seq)  # bytearray/memoryview callers (c_char_p arg)
    h = lib.sx_extract(seq, len(seq), k, w, seed & 0xFFFFFFFF, threads)
    try:
        n = int(lib.sx_count(h))
        return (
            _as_array(lib.sx_pos(h), n, np.int64),
            _as_array(lib.sx_ids(h), n, np.uint64),
            _as_array(lib.sx_fwd(h), n, np.uint8).astype(bool),
        )
    finally:
        lib.sx_free(h)


def extract_syncmers_batch_native(
    seqs: list, k: int, w: int, seed: int, threads: int = 0
) -> Optional[tuple]:
    """Batch closed-syncmer extraction over a sequence SET, parallel
    across sequences (the index-build shape; see sx_extract_batch in
    native/syncmer.cpp).  Returns (pos, ids, fwd, per_seq_counts)
    concatenated in input order — bit-exact vs per-sequence extraction —
    or None when the library/symbol is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "sx_extract_batch"):
        return None
    blob = b"".join(bytes(s) if not isinstance(s, bytes) else s
                    for s in seqs)
    offsets = np.zeros(len(seqs) + 1, np.int64)
    np.cumsum([len(s) for s in seqs], out=offsets[1:])
    h = lib.sx_extract_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(seqs),
        k,
        w,
        seed & 0xFFFFFFFF,
        threads,
    )
    try:
        n = int(lib.sxb_count(h))
        return (
            _as_array(lib.sxb_pos(h), n, np.int64),
            _as_array(lib.sxb_ids(h), n, np.uint64),
            _as_array(lib.sxb_fwd(h), n, np.uint8).astype(bool),
            _as_array(lib.sxb_seq_counts(h), len(seqs), np.int64),
        )
    finally:
        lib.sxb_free(h)


def radix_argsort_u64(keys: "np.ndarray") -> Optional["np.ndarray"]:
    """Stable argsort of a contiguous uint64 array via native LSD radix
    (~10x numpy's stable argsort), or None when unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "sx_radix_argsort_u64"):
        return None
    keys = np.ascontiguousarray(keys, np.uint64)
    order = np.empty(keys.size, np.int64)
    lib.sx_radix_argsort_u64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        keys.size,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return order


def parse_gfa_native(
    data: bytes, threads: int = 0, copy: bool = True
) -> Optional[dict]:
    """Tokenize a GFA buffer natively into columnar arrays, or None when
    the library is unavailable.  Raises ValueError on a bad W walk.

    threads=0 lets the parser pick (all cores, >=4 MB of input per
    chunk); any thread count yields bit-identical output (ordered merge
    preserving global first-seen name order).

    copy=False returns zero-copy views over the native buffers (the big
    step columns are ~100 MB of avoidable page-faulting copies on a
    100 MiB graph); each view's base chain owns the native handle, so
    lifetime is safe even if the dict is dropped."""
    lib = load()
    if lib is None or not hasattr(lib, "impg_gfa_parse"):
        return None
    if hasattr(lib, "impg_gfa_parse_mt"):
        h = lib.impg_gfa_parse_mt(data, len(data), threads)
    else:
        h = lib.impg_gfa_parse(data, len(data))
    owner = _NativeHandle(lib.impg_gfa_free, h) if not copy else None
    try:
        err = lib.impg_gfa_error(h)
        if err:
            raise ValueError(err.decode())
        n_names = int(lib.impg_gfa_n_names(h))
        n_segs = int(lib.impg_gfa_n_segs(h))
        n_links = int(lib.impg_gfa_n_links(h))
        n_paths = int(lib.impg_gfa_n_paths(h))
        n_steps = int(lib.impg_gfa_n_steps(h))
        header = lib.impg_gfa_header(h)

        if copy:
            def arr(ptr, n, dtype):
                return _as_array(ptr, n, dtype)
        else:
            def arr(ptr, n, dtype):
                return _view_array(ptr, n, dtype, owner)

        return dict(
            header=header.decode() if header else "",
            names_blob=ctypes.string_at(
                lib.impg_gfa_names_buf(h), int(lib.impg_gfa_names_size(h))
            ),
            name_offsets=arr(
                lib.impg_gfa_name_offsets(h), n_names + 1, np.int64
            ),
            seg_name_idx=arr(
                lib.impg_gfa_seg_name_idx(h), n_segs, np.int32
            ),
            seq_blob=ctypes.string_at(
                lib.impg_gfa_seq_buf(h), int(lib.impg_gfa_seq_size(h))
            ),
            seq_offsets=arr(
                lib.impg_gfa_seq_offsets(h), n_segs + 1, np.int64
            ),
            link_a=arr(lib.impg_gfa_link_a(h), n_links, np.int32),
            link_b=arr(lib.impg_gfa_link_b(h), n_links, np.int32),
            link_a_rev=arr(lib.impg_gfa_link_a_rev(h), n_links, np.int8),
            link_b_rev=arr(lib.impg_gfa_link_b_rev(h), n_links, np.int8),
            path_names_blob=ctypes.string_at(
                lib.impg_gfa_path_names_buf(h),
                int(lib.impg_gfa_path_names_size(h)),
            ),
            path_name_offsets=arr(
                lib.impg_gfa_path_name_offsets(h), n_paths + 1, np.int64
            ),
            path_is_walk=arr(
                lib.impg_gfa_path_is_walk(h), n_paths, np.int8
            ),
            path_off=arr(lib.impg_gfa_path_off(h), n_paths + 1, np.int64),
            step_name_idx=arr(
                lib.impg_gfa_step_name_idx(h), n_steps, np.int32
            ),
            step_rev=arr(lib.impg_gfa_step_rev(h), n_steps, np.int8),
        )
    finally:
        if owner is None:
            lib.impg_gfa_free(h)


def parse_paf_bytes_native(
    data: bytes, require_cigar: bool = True, threads: int = 0
) -> Optional[dict]:
    """Parse a PAF buffer natively; returns column dict or None if the
    native library is unavailable.  Raises ValueError on malformed input.

    threads=0 lets the parser pick (all cores, >=4 MB per chunk); any
    thread count yields identical columns and error messages (ordered
    chunk merge with exact first-seen name order and rebased line
    numbers)."""
    lib = load()
    if lib is None:
        return None
    if hasattr(lib, "impg_paf_parse_mt"):
        handle = lib.impg_paf_parse_mt(
            data, len(data), 1 if require_cigar else 0, threads
        )
    else:
        handle = lib.impg_paf_parse(data, len(data), 1 if require_cigar else 0)
    try:
        err = lib.impg_paf_error(handle)
        if err:
            raise ValueError(err.decode())
        n = int(lib.impg_paf_n_records(handle))
        n_runs = int(lib.impg_paf_n_runs(handle))
        n_names = int(lib.impg_paf_n_names(handle))
        names_size = int(lib.impg_paf_names_size(handle))
        out = dict(
            query_name_idx=_as_array(lib.impg_paf_query_name_idx(handle), n, np.int32),
            target_name_idx=_as_array(lib.impg_paf_target_name_idx(handle), n, np.int32),
            q_start=_as_array(lib.impg_paf_q_start(handle), n, np.int32),
            q_end=_as_array(lib.impg_paf_q_end(handle), n, np.int32),
            t_start=_as_array(lib.impg_paf_t_start(handle), n, np.int32),
            t_end=_as_array(lib.impg_paf_t_end(handle), n, np.int32),
            strand=_as_array(lib.impg_paf_strand(handle), n, np.int8),
            runs=_as_array(lib.impg_paf_runs(handle), n_runs, np.uint32),
            run_offsets=_as_array(lib.impg_paf_run_offsets(handle), n + 1, np.int64),
            name_offsets=_as_array(lib.impg_paf_name_offsets(handle), n_names + 1, np.int64),
            name_lengths=_as_array(lib.impg_paf_name_lengths(handle), n_names, np.int64),
        )
        raw = ctypes.string_at(lib.impg_paf_names_buf(handle), names_size)
        offs = out["name_offsets"]
        out["names"] = [
            raw[offs[i] : offs[i + 1]].decode() for i in range(n_names)
        ]
        return out
    finally:
        lib.impg_paf_free(handle)
