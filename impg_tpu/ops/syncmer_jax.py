"""Device-resident syncmer extraction + pack accumulation (jit/XLA).

SURVEY §7 step 10: the syng read path on device.  The numpy pipeline in
ops/syncmer.py is the semantics oracle; this module is the same
shift/compare/windowed-min formulation traced under `jax.jit` with static
shapes, so the whole read→pack path — 2-bit k-mer packing, canonical
hashing, closed-syncmer selection, dictionary (occurrence) lookup by
binary search, and the pack segment-sum — runs as one fused XLA program
per (batch, length, universe) shape.  Reference roles: the seqhash
syncmer iterator + KmerHash lookup (syng_ffi.rs:202-240) and the pack
count accumulation (main.rs:1182-1427 emit pack).

Integer-exact parity: every op is uint32/int32 arithmetic (ids are
(hi, lo) uint32 pairs — no x64 mode needed), so device packs equal host
packs bit-for-bit (tests/test_syncmer_jax.py).

Batching: reads are padded with 255 (invalid) codes to a fixed [B, L];
windows touching padding self-exclude through the validity prefix-sum,
so padded rows contribute nothing.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from impg_tpu.ops import syncmer as sync_np


def _mix32_j(x, seed: int):
    x = x.astype(jnp.uint32) ^ jnp.uint32(seed * 0x9E3779B9 & 0xFFFFFFFF)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


def _kmer_codes_j(codes, k: int):
    """[B, L] uint8 -> ([B, m] uint32 packed, [B, m] bool valid)."""
    m = codes.shape[-1] - k + 1
    invalid = codes == 255
    cnt = jnp.cumsum(invalid.astype(jnp.int32), axis=-1)
    cnt = jnp.concatenate(
        [jnp.zeros(codes.shape[:-1] + (1,), jnp.int32), cnt], axis=-1
    )
    valid = (cnt[..., k:] - cnt[..., :m]) == 0
    out = jnp.where(invalid, 0, codes).astype(jnp.uint32)
    span = 1
    while span * 2 <= k:
        out = (out[..., : out.shape[-1] - span] << jnp.uint32(2 * span)) | (
            out[..., span:]
        )
        span *= 2
    if span != k:
        rem = k - span
        out = (out[..., : out.shape[-1] - rem] << jnp.uint32(2 * rem)) | (
            out[..., rem:] & jnp.uint32((1 << (2 * rem)) - 1)
        )
    return out[..., :m], valid


def _sliding_min_j(values, w1: int):
    if w1 == 1:
        return values
    span = 1
    m = values
    while span * 2 <= w1:
        m = jnp.minimum(m[..., :-span], m[..., span:])
        span *= 2
    if span == w1:
        return m
    rem = w1 - span
    return jnp.minimum(m[..., : m.shape[-1] - rem], m[..., rem:])


@functools.partial(jax.jit, static_argnames=("k", "w", "seed"))
def syncmer_scan(codes, k: int, w: int, seed: int):
    """Dense closed-syncmer scan over padded 2-bit codes [B, L].

    Returns (sel, id_hi, id_lo, fwd), each [B, L-k-w+1]: sel marks window
    starts that are closed syncmers with all-valid bases; (id_hi, id_lo)
    is the canonical 64-bit id split into uint32 halves; fwd is True when
    the forward orientation is canonical.  Same math as
    ops/syncmer.extract_syncmers_numpy, traced once per (B, L).
    """
    kcodes, kvalid = _kmer_codes_j(codes, k)
    rc_k = jnp.asarray(sync_np._rc_table(k))[kcodes.astype(jnp.int32)].astype(
        jnp.uint32
    )
    canon_k = jnp.minimum(kcodes, rc_k)
    hashes = _mix32_j(canon_k, seed)
    hashes = jnp.where(kvalid, hashes, jnp.uint32(0xFFFFFFFF))
    w1 = w + 1
    mins = _sliding_min_j(hashes, w1)
    m2 = mins.shape[-1]
    sel = (hashes[..., :m2] == mins) | (hashes[..., w1 - 1:] == mins)
    cnt = jnp.cumsum(kvalid.astype(jnp.int32), axis=-1)
    cnt = jnp.concatenate(
        [jnp.zeros(kvalid.shape[:-1] + (1,), jnp.int32), cnt], axis=-1
    )
    sel = sel & ((cnt[..., w1:] - cnt[..., : cnt.shape[-1] - w1]) == w1)

    first_k = kcodes[..., :m2]
    last_k = kcodes[..., w: w + m2]
    rc_first = rc_k[..., w: w + m2]  # RC(last_k)
    rc_last = rc_k[..., :m2]         # RC(first_k)
    fh_hi = _mix32_j(first_k, seed)
    fh_lo = _mix32_j(last_k, seed + 1)
    rh_hi = _mix32_j(rc_first, seed)
    rh_lo = _mix32_j(rc_last, seed + 1)
    fwd = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo <= rh_lo))
    id_hi = jnp.where(fwd, fh_hi, rh_hi)
    id_lo = jnp.where(fwd, fh_lo, rh_lo)
    return sel, id_hi, id_lo, fwd


def _lower_bound64(uni_hi, uni_lo, qh, ql, iters: int):
    """Lower-bound index of each (qh, ql) in the lexicographically sorted
    (uni_hi, uni_lo) pair array — power-of-two descent, int32 end to end
    (the windowed-stab _bisect pattern, query/device.py)."""
    u = uni_hi.shape[0]
    pos = jnp.zeros(qh.shape, jnp.int32)
    for j in range(iters - 1, -1, -1):
        nxt = pos + jnp.int32(1 << j)
        probe = jnp.minimum(nxt - 1, u - 1)
        h = uni_hi[probe]
        lo = uni_lo[probe]
        less = (h < qh) | ((h == qh) & (lo < ql))
        pos = jnp.where((nxt <= u) & less, nxt, pos)
    return pos


@functools.partial(jax.jit, static_argnames=("k", "w", "seed"))
def map_pack_step(codes, uni_hi, uni_lo, k: int, w: int, seed: int):
    """One fused read-batch → pack-counts step.

    codes: [B, L] padded 2-bit reads; (uni_hi, uni_lo): the index's sorted
    distinct syncmer ids as uint32 halves.  Returns (counts [U] int32,
    n_matched scalar int32).  Extraction, dictionary lookup (binary
    search) and the pack accumulation (segment_sum) all run in one XLA
    program — SURVEY §7 step 10's device mapping.
    """
    sel, id_hi, id_lo, _fwd = syncmer_scan(codes, k, w, seed)
    u = uni_hi.shape[0]
    iters = max(1, int(np.ceil(np.log2(u + 1)))) if u else 1
    pos = _lower_bound64(uni_hi, uni_lo, id_hi, id_lo, iters)
    probe = jnp.minimum(pos, u - 1)
    hit = sel & (pos < u) & (uni_hi[probe] == id_hi) & (
        uni_lo[probe] == id_lo
    )
    counts = jax.ops.segment_sum(
        hit.astype(jnp.int32).ravel(), probe.ravel(), num_segments=u
    )
    return counts, jnp.sum(hit.astype(jnp.int32))


# ---- host wrappers ---------------------------------------------------------


def _next_pow2(n: int, floor: int = 256) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def extract_syncmers_jax(
    seq: bytes,
    k: int = sync_np.DEFAULT_K,
    w: int = sync_np.DEFAULT_W,
    seed: int = sync_np.DEFAULT_SEED,
):
    """Single-sequence device extraction with the numpy API shape
    (positions int64, ids uint64, fwd bool) — parity oracle:
    ops/syncmer.extract_syncmers_numpy."""
    codes = sync_np.encode_bases(seq)
    if codes.size < k + w:
        return (
            np.zeros(0, np.int64), np.zeros(0, np.uint64), np.zeros(0, bool)
        )
    pad = _next_pow2(codes.size)
    buf = np.full((1, pad), 255, np.uint8)
    buf[0, : codes.size] = codes
    sel, id_hi, id_lo, fwd = (
        np.asarray(a) for a in syncmer_scan(jnp.asarray(buf), k, w, seed)
    )
    positions = np.nonzero(sel[0])[0].astype(np.int64)
    ids = (id_hi[0, positions].astype(np.uint64) << np.uint64(32)) | id_lo[
        0, positions
    ].astype(np.uint64)
    return positions, ids, fwd[0, positions]


def split_universe(universe: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted uint64 universe -> lexicographically sorted uint32 halves
    (uint64 order == (hi, lo) lexicographic order)."""
    return (
        (universe >> np.uint64(32)).astype(np.uint32),
        (universe & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )


def map_reads_batched(
    index, read_files: list[str], batch: int = 256
):
    """Device map_reads: same contract as syng/pack.map_reads (pack over
    the index universe, n_reads, n_matched), computed in fused device
    batches.  Bit-identical to the host path."""
    from impg_tpu.ops.xfer import enable_persistent_cache
    from impg_tpu.syng.pack import Pack, read_sequences, universe_from_index

    enable_persistent_cache()
    universe = universe_from_index(index)
    uh, ul = split_universe(universe)
    d_uh, d_ul = jnp.asarray(uh), jnp.asarray(ul)
    counts = np.zeros(universe.size, np.int64)
    n_reads = 0
    n_matched = 0
    if universe.size == 0:
        for path in read_files:
            for _ in read_sequences(path):
                n_reads += 1
        return Pack(feature_ids=universe, counts=counts), n_reads, 0

    pending: list[np.ndarray] = []

    def flush():
        nonlocal n_matched
        if not pending:
            return
        pad = _next_pow2(max(c.size for c in pending))
        buf = np.full((batch, pad), 255, np.uint8)
        for i, c in enumerate(pending):
            buf[i, : c.size] = c
        c_dev, m_dev = map_pack_step(
            jnp.asarray(buf), d_uh, d_ul, index.k, index.w, index.seed
        )
        counts[:] += np.asarray(c_dev)
        n_matched += int(m_dev)
        pending.clear()

    for path in read_files:
        for _name, seq in read_sequences(path):
            n_reads += 1
            pending.append(sync_np.encode_bases(seq))
            if len(pending) == batch:
                flush()
    flush()
    return Pack(feature_ids=universe, counts=counts), n_reads, n_matched
