"""Vectorized hot passes for graph transforms, on GfaColumns.

The round-1 transforms (crush/smooth/selfloops/normalize) validate path
spellings and regenerate links through the dict `Gfa` model — per-step
Python joins that cost seconds per round on 50 MiB-class graphs (measured
80 MiB / 394 Mbp: spell_all 3.2 s, link regen 2.1 s). The reference keeps
these passes in flat vectors (docs/crush-perf-report.md:82: streaming
path validation 136 ms on a 115 MiB graph). These helpers do the same on
the columnar model: one gather per base for spelling (chunked to bound
peak memory) and packed-int64 unique for link regeneration.

Measured on the same 80 MiB graph: spell_paths 0.28 s (11x),
links_from_paths 0.039 s (53x).
"""

from __future__ import annotations

import numpy as np

from impg_tpu.graph.gfa_columns import GfaColumns, _rc_lut

# Peak scratch per spelling chunk ~ 10 bytes/bp.
_CHUNK_BP = 64 << 20


def spell_paths(gc: GfaColumns) -> list[bytes]:
    """Full spelling of every path (reverse steps reverse-complemented):
    one single-pass native kernel (native/spellc.cpp, threaded) with a
    chunked numpy gather fallback."""
    out, path_bp = _spell_flat(gc)
    return [
        out[int(path_bp[p]) : int(path_bp[p + 1])].tobytes()
        for p in range(gc.n_paths)
    ]


def _spell_numpy(gc: GfaColumns, rows, lens, bp_off) -> np.ndarray:
    """Fallback: chunked vectorized gather (large fresh temporaries are
    page-fault-bound on this environment — keep chunks modest)."""
    blob = np.frombuffer(gc.seq_blob, np.uint8)
    lut = _rc_lut()
    starts = gc.seq_offsets[:-1][rows].astype(np.int64)
    total = int(bp_off[-1])
    out = np.empty(total, np.uint8)
    n_steps = rows.size
    step_at = 0
    while step_at < n_steps:
        step_end = int(
            np.searchsorted(bp_off, bp_off[step_at] + _CHUNK_BP, "left")
        )
        step_end = min(max(step_end, step_at + 1), n_steps)
        sl = slice(step_at, step_end)
        c_lens = lens[sl]
        c_total = int(c_lens.sum())
        if c_total:
            o = np.arange(c_total, dtype=np.int64) - np.repeat(
                bp_off[sl] - bp_off[step_at], c_lens
            )
            rev = np.repeat(gc.step_rev[sl], c_lens)
            base = np.repeat(starts[sl], c_lens)
            last = np.repeat(starts[sl] + c_lens - 1, c_lens)
            src = np.where(rev, last - o, base + o)
            seg = blob[src]
            if rev.any():
                seg[rev] = lut[seg[rev]]
            out[int(bp_off[step_at]) : int(bp_off[step_end])] = seg
        step_at = step_end
    return out


def path_spellings(gc: GfaColumns) -> dict[str, bytes]:
    return dict(zip(gc.path_names, spell_paths(gc)))


def _spell_flat(gc: GfaColumns):
    """(out u8 view, per-path bp offsets). `out` may alias the native
    scratch buffer — invalidated by the next spelling call."""
    rows = gc.seg_row_of_name()[gc.step_name_idx]
    if rows.size and int(rows.min()) < 0:
        bad = int(gc.step_name_idx[int(np.argmin(rows))])
        raise ValueError(
            f"path step references missing segment '{gc.names[bad]}'"
        )
    lens = gc.seg_lens()[rows].astype(np.int64)
    bp_off = np.concatenate([[0], np.cumsum(lens)])
    from impg_tpu.io import native as native_mod

    out = native_mod.spell_steps(
        gc.seq_blob, gc.seq_offsets, rows, gc.step_rev, bp_off
    )
    if out is None:
        out = _spell_numpy(gc, rows, lens, bp_off)
    return out, bp_off[gc.path_off]


def validate_spellings(gc: GfaColumns, expected: dict[str, bytes]) -> bool:
    """True when every path spells exactly its `expected` bytes —
    zero-copy comparison against the flat spelled buffer (the crush /
    selfloops / normalize per-round validation contract)."""
    if gc.n_paths != len(expected):
        return False
    out, path_bp = _spell_flat(gc)
    for p, name in enumerate(gc.path_names):
        want = expected.get(name)
        if want is None:
            return False
        lo, hi = int(path_bp[p]), int(path_bp[p + 1])
        if hi - lo != len(want):
            return False
        if not np.array_equal(
            out[lo:hi], np.frombuffer(want, np.uint8)
        ):
            return False
    return True


def path_spellings_of_text(text: str) -> dict[str, bytes] | None:
    """Columnar spellings straight from GFA text; None when the native
    tokenizer is unavailable (callers fall back to the dict model)."""
    try:
        from impg_tpu.graph.gfa_columns import parse_gfa_columns

        gc = parse_gfa_columns(text)
    except ValueError:
        raise
    except Exception:
        return None
    if gc is None:
        return None
    return path_spellings(gc)


def validate_text_spellings(text: str, expected: dict[str, bytes]):
    """Columnar spelling validation straight from GFA text; None when the
    native tokenizer is unavailable (callers fall back to dict spelling).
    """
    try:
        from impg_tpu.graph.gfa_columns import parse_gfa_columns

        gc = parse_gfa_columns(text)
    except ValueError:
        raise
    except Exception:
        return None
    if gc is None:
        return None
    return validate_spellings(gc, expected)


def links_from_paths(gc: GfaColumns) -> np.ndarray:
    """Unique (a_idx, a_rev, b_idx, b_rev) adjacencies over all path
    steps, packed per row into int64 (name idx < 2^31), sorted."""
    n_steps = gc.step_name_idx.size
    if n_steps == 0:
        return np.zeros(0, np.int64)
    keep = np.ones(n_steps, bool)
    keep[gc.path_off[1:] - 1] = False  # last step of each path
    keep[-1] = False
    a = gc.step_name_idx[:-1][keep[:-1]].astype(np.int64)
    ar = gc.step_rev[:-1][keep[:-1]].astype(np.int64)
    b = gc.step_name_idx[1:][keep[:-1]].astype(np.int64)
    br = gc.step_rev[1:][keep[:-1]].astype(np.int64)
    packed = (a << 33) | (ar << 32) | (b << 1) | br
    return np.unique(packed)


def unpack_links(gc: GfaColumns, packed: np.ndarray):
    """Packed adjacency rows -> [(name_a, rev_a, name_b, rev_b)] in the
    dict model's string/bool currency."""
    a = (packed >> 33).astype(np.int64)
    ar = ((packed >> 32) & 1).astype(bool)
    b = ((packed >> 1) & ((1 << 31) - 1)).astype(np.int64)
    br = (packed & 1).astype(bool)
    names = gc.names
    return [
        (names[int(x)], bool(xr), names[int(y)], bool(yr))
        for x, xr, y, yr in zip(a, ar, b, br)
    ]
