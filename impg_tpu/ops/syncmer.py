"""Vectorized closed-syncmer extraction.

Capability parity with the reference's seqhash syncmer iterator (C, used via
syng_ffi; params syng.rs:1464 SyncmerParams{k=8, w=55, seed=7}; total
syncmer length = w + k = 63).

A position i starts a closed syncmer iff, among the w+1 inner k-mers of the
(w+k)-length window at i, the minimal hash lies at the FIRST or LAST inner
position.  Canonical orientation: the lexicographically-smaller-hash of the
full syncmer vs its reverse complement decides the stored strand.

The whole pipeline is data-parallel (shift/compare/windowed-min) and is
written over numpy; the same formulation maps onto the VPU under jnp
(round-2 Pallas target).  Hash: 32-bit xorshift-multiply mix, seeded.

Note: the exact hash differs from the reference's C seqhash — indexes are
not interchangeable (ours are self-consistent; both build and query use
this extraction).
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 8
DEFAULT_W = 55
DEFAULT_SEED = 7

_CODE = np.full(256, 255, np.uint8)
for i, b in enumerate(b"ACGT"):
    _CODE[b] = i
    _CODE[b + 32] = i  # lowercase


def encode_bases(seq: bytes) -> np.ndarray:
    """2-bit codes; non-ACGT bases map to 255 (positions containing them
    produce no syncmers)."""
    return _CODE[np.frombuffer(seq, dtype=np.uint8)]


def _mix32(x: np.ndarray, seed: int) -> np.ndarray:
    """xorshift-multiply mixer (uint32)."""
    x = x.astype(np.uint32) ^ np.uint32(seed * 0x9E3779B9 & 0xFFFFFFFF)
    x ^= x >> np.uint32(16)
    x = (x * np.uint32(0x7FEB352D)) & np.uint32(0xFFFFFFFF)
    x ^= x >> np.uint32(15)
    x = (x * np.uint32(0x846CA68B)) & np.uint32(0xFFFFFFFF)
    x ^= x >> np.uint32(16)
    return x


def _kmer_codes(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(packed k-mer codes [n-k+1], validity mask).  k <= 16 (2k bits)."""
    n = codes.size
    if n < k:
        return np.zeros(0, np.uint32), np.zeros(0, bool)
    m = n - k + 1
    out = np.zeros(m, np.uint32)
    valid = np.ones(m, bool)
    for j in range(k):
        c = codes[j : j + m]
        valid &= c != 255
        out = (out << np.uint32(2)) | np.where(c == 255, 0, c).astype(np.uint32)
    return out, valid


def _windowed_argmin_at_ends(values: np.ndarray, w1: int) -> np.ndarray:
    """For each window of length w1, True iff min over the window equals the
    value at the first or last position (closed-syncmer test)."""
    m = values.size
    if m < w1:
        return np.zeros(0, bool)
    n_win = m - w1 + 1
    # Sliding window minimum via stride tricks (windows are short: w+1).
    win = np.lib.stride_tricks.sliding_window_view(values, w1)
    mins = win.min(axis=1)
    return (win[:, 0] == mins) | (win[:, -1] == mins)


def revcomp_code(code: np.ndarray, length: int) -> np.ndarray:
    """Reverse complement of packed 2-bit codes (uint64 capable length<=31)."""
    code = code.astype(np.uint64)
    out = np.zeros_like(code)
    for _ in range(length):
        out = (out << np.uint64(2)) | ((code ^ np.uint64(3)) & np.uint64(3))
        code = code >> np.uint64(2)
    return out


def extract_syncmers(
    seq: bytes,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    seed: int = DEFAULT_SEED,
):
    """Positions + canonical ids of closed syncmers in `seq`.

    Returns (positions int64 [m], ids uint64 [m], fwd bool [m]) where `ids`
    identifies the canonical (w+k)-syncmer (via paired hashes of the two
    outermost k-mers — collision-safe enough for anchoring) and `fwd` is True
    when the forward orientation is canonical.
    """
    codes = encode_bases(seq)
    kcodes, kvalid = _kmer_codes(codes, k)
    if kcodes.size < w + 1:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, bool)
    # Hash CANONICAL inner k-mers so selection is strand-symmetric (a window
    # and its reverse complement select together).
    rc_k = revcomp_code(kcodes, k).astype(np.uint32)
    canon_k = np.minimum(kcodes, rc_k)
    hashes = _mix32(canon_k, seed)
    hashes = np.where(kvalid, hashes, np.uint32(0xFFFFFFFF))
    # Window of w+1 inner k-mers per syncmer start.
    sel = _windowed_argmin_at_ends(hashes, w + 1)
    # All bases in the syncmer must be valid ACGT.
    valid_kmer_win = np.lib.stride_tricks.sliding_window_view(kvalid, w + 1)
    sel &= valid_kmer_win.all(axis=1)
    positions = np.nonzero(sel)[0].astype(np.int64)
    if positions.size == 0:
        return positions, np.zeros(0, np.uint64), np.zeros(0, bool)

    # Canonical id: combine hashes of the first and last inner k-mers in
    # forward and reverse-complement orientation; pick the smaller pair.
    first_k = kcodes[positions]
    last_k = kcodes[positions + w]
    rc_first = revcomp_code(last_k, k).astype(np.uint32)  # RC of the 63-mer
    rc_last = revcomp_code(first_k, k).astype(np.uint32)
    h_fwd = (
        _mix32(first_k, seed).astype(np.uint64) << np.uint64(32)
    ) | _mix32(last_k, seed + 1).astype(np.uint64)
    h_rev = (
        _mix32(rc_first, seed).astype(np.uint64) << np.uint64(32)
    ) | _mix32(rc_last, seed + 1).astype(np.uint64)
    fwd = h_fwd <= h_rev
    ids = np.where(fwd, h_fwd, h_rev)
    return positions, ids, fwd
