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
    """(packed k-mer codes [n-k+1], validity mask).  k <= 16 (2k bits).

    Packing by span doubling: log2(k) shift/or passes instead of k;
    validity from one prefix sum over the invalid-base mask."""
    n = codes.size
    if n < k:
        return np.zeros(0, np.uint32), np.zeros(0, bool)
    m = n - k + 1
    invalid = codes == 255
    # Counts are bounded by n: int32 until sequences reach 2^31 bases.
    cnt_dt = np.int64 if n >= 2**31 - 1 else np.int32
    cnt = np.zeros(n + 1, cnt_dt)
    np.cumsum(invalid, out=cnt[1:])
    valid = (cnt[k:] - cnt[:m]) == 0
    # Zero invalid codes, then combine spans 1,2,4,... (partial tail span
    # folds in like _sliding_min).
    out = np.where(invalid, 0, codes).astype(np.uint32)
    span = 1
    while span * 2 <= k:
        out = (out[: out.size - span] << np.uint32(2 * span)) | out[span:]
        span *= 2
    if span != k:
        rem = k - span
        out = (out[: out.size - rem] << np.uint32(2 * rem)) | (
            out[rem:] & np.uint32((1 << (2 * rem)) - 1)
        )
    return out[:m], valid


def _sliding_min(values: np.ndarray, w1: int) -> np.ndarray:
    """Minimum over each length-w1 window, O(n log w) by span doubling:
    m_k[i] = min(values[i:i+2^k]); the window min is the min of two
    (overlapping) power-of-two spans covering it.  The same formulation
    maps onto the VPU under jnp (shift + minimum passes)."""
    if w1 == 1:
        return values
    span = 1
    m = values
    while span * 2 <= w1:
        m = np.minimum(m[:-span], m[span:])
        span *= 2
    if span == w1:
        return m
    return np.minimum(m[: m.size - (w1 - span)], m[w1 - span :])


def _windowed_argmin_at_ends(values: np.ndarray, w1: int) -> np.ndarray:
    """For each window of length w1, True iff min over the window equals the
    value at the first or last position (closed-syncmer test)."""
    m = values.size
    if m < w1:
        return np.zeros(0, bool)
    mins = _sliding_min(values, w1)
    return (values[: mins.size] == mins) | (values[w1 - 1 :] == mins)


_RC_TABLES: dict[int, np.ndarray] = {}


def _rc_table(length: int) -> np.ndarray:
    """Reverse complement of all length<=8-base packed codes (pre-shifted
    so lookup is a single gather)."""
    t = _RC_TABLES.get(length)
    if t is None:
        code = np.arange(1 << (2 * length), dtype=np.uint64)
        out = np.zeros_like(code)
        for _ in range(length):
            out = (out << np.uint64(2)) | ((code ^ np.uint64(3)) & np.uint64(3))
            code >>= np.uint64(2)
        t = _RC_TABLES[length] = out.astype(np.uint16)
    return t


def revcomp_code(code: np.ndarray, length: int) -> np.ndarray:
    """Reverse complement of packed 2-bit codes (uint64 capable length<=31).

    For length <= 8 this is one table gather (returns uint16; all callers
    upcast); longer codes fall back to the shift loop (uint64)."""
    if length <= 8:
        return _rc_table(length)[code.astype(np.uint16)]
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
    threads: int = 1,
):
    """Positions + canonical ids of closed syncmers in `seq`.

    Returns (positions int64 [m], ids uint64 [m], fwd bool [m]) where `ids`
    identifies the canonical (w+k)-syncmer (via paired hashes of the two
    outermost k-mers — collision-safe enough for anchoring) and `fwd` is True
    when the forward orientation is canonical.

    Uses the native kernel (native/syncmer.cpp, bit-exact, optionally
    threaded) when available; `extract_syncmers_numpy` is the oracle and
    fallback.
    """
    if k <= 16:
        from impg_tpu.io import native as native_mod

        res = native_mod.extract_syncmers_native(seq, k, w, seed, threads)
        if res is not None:
            return res
    return extract_syncmers_numpy(seq, k, w, seed)


def extract_syncmers_numpy(
    seq: bytes,
    k: int = DEFAULT_K,
    w: int = DEFAULT_W,
    seed: int = DEFAULT_SEED,
):
    """Pure-numpy extraction (the semantics oracle for the native kernel)."""
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
    # All bases in the syncmer must be valid ACGT (windowed all == count
    # of valid k-mers in the window equals w+1, via one prefix sum).
    w1 = w + 1
    cnt_dt = np.int64 if kvalid.size >= 2**31 - 1 else np.int32
    cnt = np.zeros(kvalid.size + 1, cnt_dt)
    np.cumsum(kvalid, out=cnt[1:])
    sel &= (cnt[w1:] - cnt[: cnt.size - w1]) == w1
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
