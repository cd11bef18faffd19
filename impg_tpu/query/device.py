"""Device-resident batched query execution (the TPU hot path).

The reference answers each query by stabbing a per-target interval tree and
walking CIGARs one alignment at a time (impg.rs:1852-1928).  Here the whole
index lives on device as flat tensors and a BATCH of B ranges is answered in
one jitted step:

  1. Windowed stab: records are sorted by (target_id, t_start), so the
     candidates for a query are the contiguous window between
       lo = first record whose running max t_end reaches the range start
            (prefix-max pruning — everything before it ends too early), and
       cut = first record with t_start beyond the range end.
     Both bounds come from vectorized per-segment binary searches; there is
     no scatter and no scan, just two log-depth searches per query.
  2. The B x K candidate grid (K = power-of-two window capacity) is projected
     densely with the closed-form projection (ops/projection.py); non-hit
     grid cells are masked.  Dense masked work beats compaction on TPU:
     everything is gathers + elementwise ops, no serialization.
  3. The [B*K] result (intervals + run-slice descriptors + identity stats)
     returns to the host, which materializes CIGAR text or applies exact-f64
     identity filtering only on the few surviving rows.

Window overflow (a query whose candidate window exceeds K) is detected on
host via `k_needed` and retried with a doubled K — one recompile per
power-of-two bucket.

Note on dtypes: x64 is left disabled — coordinates, run counts and arena
offsets all fit int32 (enforced at upload).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.ops import projection
from impg_tpu.ops.projection import _bisect


def _iters_for(n: int) -> int:
    return max(1, int(np.ceil(np.log2(n + 1))))


@dataclass
class DeviceIndex:
    """Index tensors resident on a device (or replicated across a mesh)."""

    target_id: Any  # int32 [N]
    t_start: Any  # int32 [N]
    t_end: Any  # int32 [N]
    cummax_te: Any  # int32 [N] — prefix max of t_end within target segment
    strand: Any  # int32 [N]
    query_id: Any  # int32 [N]
    op_off: Any  # int32 [N]
    op_cnt: Any  # int32 [N]
    tgt_offsets: Any  # int32 [n_seqs + 1]
    arena: dict  # arena arrays (int32/uint32)
    n_records: int
    search_iters: int  # 2**iters > max op_cnt
    window_iters: int  # 2**iters > max records per target
    tp: dict | None = None  # tracepoint arrays for device approximate mode
    tp_spacing: int = 0

    PROJECTION_CORE = ("runs", "cum_t", "cum_q", "irun_before", "irun_after")
    STATS_KEYS = (
        "cum_match", "cum_mm", "cum_icnt", "cum_dcnt", "cum_ibp", "cum_dbp",
    )

    @classmethod
    def build(
        cls, index: ImpgIndex, with_tracepoints: bool = False,
        stats: bool = True,
    ) -> "DeviceIndex":
        """`stats=False` uploads only the five projection-core arena arrays
        (runs/cum_t/cum_q/irun_*) — the identity-statistics prefix arrays
        ship on demand via `ensure_stats` (they are 6/11 of the arena
        bytes, dead weight for the lean BFS transfer path)."""
        if index.arena.n_ops >= 2**31:
            raise ValueError("arena too large for int32 offsets")
        n = len(index.records)
        max_ops = int(index.records.op_cnt.max()) if n else 1
        tree_sizes = np.diff(index.tgt_offsets)
        max_tree = int(tree_sizes.max()) if tree_sizes.size else 1

        cummax = compute_cummax_te(
            index.records.t_end, index.tgt_offsets
        )

        # Chunked puts: the relay holds ~1.4 GiB/s for <=32 MiB pieces
        # but can collapse on large single transfers (ops/xfer.py) — the
        # arena arrays are the multi-hundred-MiB payloads here.
        from impg_tpu.ops.xfer import device_put_chunked

        arena = {
            k: device_put_chunked(np.ascontiguousarray(v))
            for k, v in index.arena.projection_kwargs(with_stats=stats).items()
        }
        tp_arrays = None
        tp_spacing = 0
        if with_tracepoints:
            # Reuse the index's cached arena whatever its spacing — calling
            # ensure_tracepoints() with the default would silently REBUILD
            # a differently-spaced arena and diverge from host-side steps.
            tp = (
                index.tp
                if index.tp is not None
                else index.ensure_tracepoints()
            )
            tp_spacing = tp.spacing
            tp_arrays = dict(
                seg_off=jnp.asarray(tp.seg_off.astype(np.int32)),
                n_seg=jnp.asarray(tp.n_seg.astype(np.int32)),
                q_bound=jnp.asarray(tp.q_bound.astype(np.int32)),
                pre_diffs=jnp.asarray(tp.pre_diffs.astype(np.int32)),
                pre_aligned=jnp.asarray(tp.pre_aligned.astype(np.int32)),
                q_start=jnp.asarray(index.records.q_start.astype(np.int32)),
                q_end=jnp.asarray(index.records.q_end.astype(np.int32)),
            )
        as_i32 = lambda a: device_put_chunked(a, dtype=np.int32)
        return cls(
            target_id=as_i32(index.records.target_id),
            t_start=as_i32(index.records.t_start),
            t_end=as_i32(index.records.t_end),
            cummax_te=jnp.asarray(cummax),
            strand=as_i32(index.records.strand),
            query_id=as_i32(index.records.query_id),
            op_off=as_i32(index.records.op_off),
            op_cnt=as_i32(index.records.op_cnt),
            tgt_offsets=as_i32(index.tgt_offsets),
            arena=arena,
            n_records=n,
            search_iters=_iters_for(max_ops),
            window_iters=_iters_for(max_tree),
            tp=tp_arrays,
            tp_spacing=tp_spacing,
        )


def compute_cummax_te(t_end: np.ndarray, tgt_offsets: np.ndarray) -> np.ndarray:
    """Prefix max of t_end within each target segment (host, numpy)."""
    n = t_end.size
    out = np.zeros(n, np.int32)
    if n == 0:
        return out
    cummax = np.maximum.accumulate(t_end.astype(np.int64))
    # Reset at segment starts: subtract per-segment base via a loop-free trick:
    # recompute per segment using reduceat-style boundaries.
    for lo, hi in zip(tgt_offsets[:-1], tgt_offsets[1:]):
        if hi > lo:
            out[lo:hi] = np.maximum.accumulate(t_end[lo:hi]).astype(np.int32)
    return out


def stab_windows(
    tgt_offsets, t_start, cummax_te, q_tid, q_s, q_e, window_iters: int,
    n_records: int,
):
    """Per-query candidate windows [win_lo, win_lo + k) over sorted records.

    Candidates satisfy t_start <= q_e (closed-interval stab upper bound);
    records before win_lo have max t_end < q_s and can never overlap.
    """
    n_seq_slots = tgt_offsets.shape[0] - 1
    tid_c = jnp.clip(q_tid, 0, n_seq_slots - 1)
    seg_lo = jnp.take(tgt_offsets, tid_c)
    seg_hi = jnp.take(tgt_offsets, tid_c + 1)
    seg_n = seg_hi - seg_lo

    def gate(arr, m):
        idx = jnp.clip(seg_lo + m, 0, max(n_records - 1, 0))
        return jnp.take(arr, idx)

    cut = _bisect(jnp, seg_n, lambda m: gate(t_start, m) > q_e, window_iters)
    lo2 = _bisect(jnp, seg_n, lambda m: gate(cummax_te, m) >= q_s, window_iters)
    k = jnp.maximum(cut - lo2, 0)
    return seg_lo + lo2, k


# Output row order of the packed result matrix (one device->host fetch).
RESULT_FIELDS = (
    "pair_rec",
    "pair_q",
    "valid",
    "query_id",
    "pq_start",
    "pq_end",
    "pt_start",
    "pt_end",
    "first_run",
    "last_run",
    "first_clip",
    "last_rem",
    "matches",
    "mismatches",
    "i_count",
    "d_count",
    "i_bp",
    "d_bp",
)


def pack_result(out: dict, cap: int | None = None, fields=None,
                id_bits: int = 0):
    """One matrix [R, C + 1]: the extra last COLUMN carries the
    (k_needed, n_hits) scalars in its first two rows, so each chunk costs
    exactly ONE device->host fetch.

    The relay link is BANDWIDTH-bound (~50 MB/s), so the layout minimizes
    bytes:
      * With `cap`, results are COMPACTED on device first: a stable argsort
        moves valid hits to the front (preserving pair order) and only the
        first `cap` lanes ship — and the `valid` row is DROPPED entirely
        (the first n_hits lanes are the valid ones by construction).
        n_hits > cap signals truncation; the host refetches with a doubled
        cap (one extra compile, then cached).
      * With `id_bits` > 0, the pair_q and query_id rows fuse into ONE
        int32 row (pair_q << id_bits | query_id) — legal whenever
        log2(chunk) + id_bits <= 31; both values are non-negative.
    """
    if fields is None:
        fields = RESULT_FIELDS
    valid = out["valid"]
    compact = cap is not None and cap < valid.size
    if compact:
        order = jnp.argsort(jnp.logical_not(valid), stable=True)
        sel = order[:cap]
        get = lambda f: jnp.take(out[f].astype(jnp.int32), sel)
    else:
        get = lambda f: out[f].astype(jnp.int32)
    fuse = id_bits > 0 and "pair_q" in fields and "query_id" in fields
    rows = []
    for f in fields:
        if compact and f == "valid":
            continue
        if fuse and f == "query_id":
            continue
        if fuse and f == "pair_q":
            rows.append((get("pair_q") << id_bits) | get("query_id"))
            continue
        rows.append(get(f))
    mat = jnp.stack(rows)
    col = (
        jnp.zeros((mat.shape[0], 1), jnp.int32)
        .at[0, 0].set(out["k_needed"].astype(jnp.int32))
        .at[1, 0].set(out["n_hits"].astype(jnp.int32))
    )
    return jnp.concatenate([mat, col], axis=1)


def unpack_result(mat: np.ndarray, fields=None, id_bits: int = 0,
                  compacted: bool = False) -> dict:
    if fields is None:
        fields = RESULT_FIELDS
    k_needed = mat[0, -1]
    n_hits = mat[1, -1]
    data = mat[:, :-1]
    if compacted:
        # Valid lanes are the compacted prefix: slicing gives views, no
        # boolean-mask copies downstream.
        data = data[:, : int(n_hits)]
    fuse = id_bits > 0 and "pair_q" in fields and "query_id" in fields
    out = {}
    r = 0
    for f in fields:
        if compacted and f == "valid":
            continue
        if fuse and f == "query_id":
            continue
        if fuse and f == "pair_q":
            out["pair_q"] = data[r] >> id_bits
            out["query_id"] = data[r] & ((1 << id_bits) - 1)
            r += 1
            continue
        out[f] = data[r]
        r += 1
    if compacted:
        out["valid"] = np.ones(data.shape[1], bool)
    out["valid"] = out["valid"].astype(bool)
    out["k_needed"] = k_needed
    out["n_hits"] = n_hits
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_max", "cap", "clip_overlap", "approximate", "fields", "id_bits"
    ),
)
def query_step(
    dindex: DeviceIndex,
    q_tid,
    q_s,
    q_e,
    *,
    k_max: int,
    cap: int | None = None,
    clip_overlap: bool = False,
    approximate: bool = False,
    fields: tuple | None = None,
    id_bits: int = 0,
):
    """Batched stab + projection. Inputs int32 [B]; outputs [B * k_max]
    (or [cap] device-compacted lanes when `cap` is set)."""
    out = _query_core(
        rec=dict(
            target_id=dindex.target_id,
            t_start=dindex.t_start,
            t_end=dindex.t_end,
            cummax_te=dindex.cummax_te,
            strand=dindex.strand,
            query_id=dindex.query_id,
            op_off=dindex.op_off,
            op_cnt=dindex.op_cnt,
            tgt_offsets=dindex.tgt_offsets,
        ),
        arena=dindex.arena,
        q_tid=q_tid,
        q_s=q_s,
        q_e=q_e,
        k_max=k_max,
        clip_overlap=clip_overlap,
        search_iters=dindex.search_iters,
        window_iters=dindex.window_iters,
        n_records=dindex.n_records,
        tp=dindex.tp if approximate else None,
        tp_spacing=dindex.tp_spacing,
    )
    return pack_result(out, cap, fields, id_bits)



@functools.partial(
    jax.jit,
    static_argnames=(
        "k_slot", "cap", "clip_overlap", "approximate", "fields", "id_bits"
    ),
)
def slot_query_step(
    dindex: DeviceIndex,
    slot_lo,
    slot_k,
    q_s,
    q_e,
    *,
    k_slot: int,
    cap: int | None = None,
    clip_overlap: bool = False,
    approximate: bool = False,
    fields: tuple | None = None,
    id_bits: int = 0,
):
    """Slotted projection step: host-computed candidate slots, fixed grid.

    Inputs are [B] int32 slot columns (slot_lo = first record, slot_k =
    records in this slot, q_s/q_e = the owning query's range).  Exactly one
    executable per (B, k_slot, cap, fields) — there is no window-overflow
    ladder.  `pair_q` in the packed result is the slot row index."""
    out = _slot_core(
        rec=dict(
            target_id=dindex.target_id,
            t_start=dindex.t_start,
            t_end=dindex.t_end,
            cummax_te=dindex.cummax_te,
            strand=dindex.strand,
            query_id=dindex.query_id,
            op_off=dindex.op_off,
            op_cnt=dindex.op_cnt,
            tgt_offsets=dindex.tgt_offsets,
        ),
        arena=dindex.arena,
        slot_lo=slot_lo,
        slot_k=slot_k,
        q_s=q_s,
        q_e=q_e,
        k_slot=k_slot,
        clip_overlap=clip_overlap,
        search_iters=dindex.search_iters,
        n_records=dindex.n_records,
        tp=dindex.tp if approximate else None,
        tp_spacing=dindex.tp_spacing,
    )
    return pack_result(out, cap, fields, id_bits)


def _project_approx_device(
    tp: dict, spacing: int, cand_c, r_ts, r_te, rng_s, rng_e
):
    """Device approximate (tracepoint) projection — O(1) segment arithmetic
    per pair (host semantics: index/tracepoints.py project_batch_approx)."""
    off = jnp.take(tp["seg_off"], cand_c)
    nseg = jnp.take(tp["n_seg"], cand_c)
    q0 = jnp.take(tp["q_start"], cand_c)
    qe = jnp.take(tp["q_end"], cand_c)
    valid = (rng_s < r_te) & (rng_e > r_ts) & (rng_s < rng_e)
    rs_c = jnp.clip(rng_s, r_ts, r_te - 1)
    re_c = jnp.clip(rng_e, r_ts + 1, r_te)
    i0 = jnp.clip((rs_c - r_ts) // spacing, 0, nseg - 1)
    j1 = jnp.clip((re_c - 1 - r_ts) // spacing, 0, nseg - 1)

    def boundary(i):
        return jnp.minimum(r_ts + i * spacing, r_te)

    qb = tp["q_bound"]

    def refine(i, overlap_pos):
        seg_s = boundary(i)
        seg_e = boundary(i + 1)
        q_pos = jnp.take(qb, off + i)
        q_next = jnp.take(qb, off + i + 1)
        q_delta = q_next - q_pos
        t_delta = seg_e - seg_s
        t = jnp.maximum(t_delta, 1)
        od = overlap_pos - seg_s  # in [0, t_delta]
        # Exact integer round-half-to-even of od * q_delta / t — bit-equal
        # to the host's f64 np.round (x64 is off under jit, so f64 isn't
        # available on device; f32 rounds differently near halves).
        # Split |q_delta| = (|q_delta| // t) * t + rem so every product
        # stays below 2^31 (od, rem <= t <= spacing).
        mag = jnp.abs(q_delta)
        sign = jnp.where(q_delta < 0, -1, 1)
        base = (mag // t) * od
        rem = mag - (mag // t) * t
        p2 = rem * od
        q2 = p2 // t
        r2 = p2 - q2 * t
        floor_total = base + q2
        half = 2 * r2
        add = (half > t) | ((half == t) & ((floor_total & 1) == 1))
        advance = sign * (floor_total + add.astype(jnp.int32))
        advance = jnp.where(t_delta > 0, advance, 0)
        lo = jnp.minimum(q0, qe)
        hi = jnp.maximum(q0, qe)
        return jnp.clip(q_pos + advance, lo, hi)

    pq_start = refine(i0, jnp.maximum(boundary(i0), rs_c))
    pq_end = refine(j1, jnp.minimum(boundary(j1 + 1), re_c))
    aligned = jnp.take(tp["pre_aligned"], off + j1 + 1) - jnp.take(
        tp["pre_aligned"], off + i0
    )
    diffs = jnp.take(tp["pre_diffs"], off + j1 + 1) - jnp.take(
        tp["pre_diffs"], off + i0
    )
    matches = jnp.maximum(aligned - diffs, 0)
    return dict(
        valid=valid,
        pq_start=pq_start,
        pq_end=pq_end,
        pt_start=rng_s,
        pt_end=rng_e,
        matches=matches,
        mismatches=diffs,
    )


def _query_core(
    *, rec, arena, q_tid, q_s, q_e, k_max, clip_overlap, search_iters,
    window_iters, n_records, tp=None, tp_spacing=0,
):
    """Shared single-device kernel body (also used per-shard by shard_map)."""
    b = q_tid.shape[0]
    win_lo, k = stab_windows(
        rec["tgt_offsets"], rec["t_start"], rec["cummax_te"],
        q_tid, q_s, q_e, window_iters, n_records,
    )
    kk = jnp.arange(k_max, dtype=jnp.int32)
    cand = win_lo[:, None] + kk[None, :]
    in_win = kk[None, :] < jnp.minimum(k, k_max)[:, None]
    cand_c = jnp.clip(cand, 0, max(n_records - 1, 0)).reshape(-1)
    pair_q = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k_max)
    return _lanes_core(
        rec=rec, arena=arena, cand_c=cand_c, pair_q=pair_q,
        in_mask=in_win.reshape(-1), q_s=q_s, q_e=q_e,
        k_needed=k.max(), clip_overlap=clip_overlap,
        search_iters=search_iters, tp=tp, tp_spacing=tp_spacing,
    )


def _slot_core(
    *, rec, arena, slot_lo, slot_k, q_s, q_e, k_slot, clip_overlap,
    search_iters, n_records, tp=None, tp_spacing=0,
):
    """Slotted kernel body: candidate windows are computed ON HOST
    (vectorized searchsorted over the same sorted layout) and arrive as
    fixed-width [B] slots of `k_slot` records each; big windows span
    several consecutive slots.  No device-side stab, no k_max overflow
    ladder — ONE executable per (chunk, k_slot, fields) forever, and the
    dense grid wastes at most k_slot-1 lanes per query instead of
    (max_tree - k) per query.  `pair_q` in the result is the SLOT index;
    the host maps it back to query/frontier ids."""
    b = slot_lo.shape[0]
    kk = jnp.arange(k_slot, dtype=jnp.int32)
    cand = slot_lo[:, None] + kk[None, :]
    in_win = kk[None, :] < slot_k[:, None]
    cand_c = jnp.clip(cand, 0, max(n_records - 1, 0)).reshape(-1)
    pair_q = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k_slot)
    return _lanes_core(
        rec=rec, arena=arena, cand_c=cand_c, pair_q=pair_q,
        in_mask=in_win.reshape(-1), q_s=q_s, q_e=q_e,
        k_needed=jnp.int32(0), clip_overlap=clip_overlap,
        search_iters=search_iters, tp=tp, tp_spacing=tp_spacing,
    )


def _lanes_core(
    *, rec, arena, cand_c, pair_q, in_mask, q_s, q_e, k_needed,
    clip_overlap, search_iters, tp=None, tp_spacing=0,
):
    """Projection over a flat lane grid (candidate record x query pair)."""
    hit = in_mask & (jnp.take(rec["t_end"], cand_c) >= jnp.take(q_s, pair_q))

    r_ts = jnp.take(rec["t_start"], cand_c)
    r_te = jnp.take(rec["t_end"], cand_c)
    rng_s = jnp.take(q_s, pair_q)
    rng_e = jnp.take(q_e, pair_q)
    if clip_overlap:
        # Transitive walkers project the clipped overlap (impg.rs:2395-2400).
        rng_s = jnp.maximum(rng_s, r_ts)
        rng_e = jnp.minimum(rng_e, r_te)

    if tp is not None:
        a = _project_approx_device(
            tp, tp_spacing, cand_c, r_ts, r_te, rng_s, rng_e
        )
        valid = a["valid"] & hit
        zero = jnp.zeros_like(cand_c)
        return dict(
            k_needed=k_needed,
            n_hits=valid.sum(dtype=jnp.int32),
            pair_rec=cand_c,
            pair_q=pair_q,
            valid=valid,
            query_id=jnp.take(rec["query_id"], cand_c),
            pq_start=a["pq_start"],
            pq_end=a["pq_end"],
            pt_start=a["pt_start"],
            pt_end=a["pt_end"],
            first_run=zero,
            last_run=zero,
            first_clip=zero,
            last_rem=zero,
            matches=a["matches"],
            mismatches=a["mismatches"],
            i_count=zero,
            d_count=zero,
            i_bp=zero,
            d_bp=zero,
        )
    res = projection.project_batch(
        jnp,
        **arena,
        op_off=jnp.take(rec["op_off"], cand_c),
        op_cnt=jnp.take(rec["op_cnt"], cand_c),
        t_start=r_ts,
        t_end=r_te,
        strand=jnp.take(rec["strand"], cand_c),
        range_start=rng_s,
        range_end=rng_e,
        search_iters=search_iters,
        with_stats="cum_match" in arena,
    )
    valid = res.valid & hit & (rng_s < rng_e)
    return dict(
        k_needed=k_needed,
        n_hits=valid.sum(dtype=jnp.int32),
        pair_rec=cand_c,
        pair_q=pair_q,
        valid=valid,
        query_id=jnp.take(rec["query_id"], cand_c),
        pq_start=res.pq_start,
        pq_end=res.pq_end,
        pt_start=res.pt_start,
        pt_end=res.pt_end,
        first_run=res.first_run,
        last_run=res.last_run,
        first_clip=res.first_clip,
        last_rem=res.last_rem,
        matches=res.matches,
        mismatches=res.mismatches,
        i_count=res.i_count,
        d_count=res.d_count,
        i_bp=res.i_bp,
        d_bp=res.d_bp,
    )


jax.tree_util.register_pytree_node(
    DeviceIndex,
    lambda d: (
        (
            d.target_id,
            d.t_start,
            d.t_end,
            d.cummax_te,
            d.strand,
            d.query_id,
            d.op_off,
            d.op_cnt,
            d.tgt_offsets,
            d.arena,
            d.tp,
        ),
        (d.n_records, d.search_iters, d.window_iters, d.tp_spacing),
    ),
    lambda aux, children: DeviceIndex(
        *children[:-1],
        tp=children[-1],
        n_records=aux[0],
        search_iters=aux[1],
        window_iters=aux[2],
        tp_spacing=aux[3],
    ),
)


def _fetch_iter(mats):
    """Yield np.asarray(mat) for each mat, optionally via a fetcher thread.

    IMPG_FETCH_THREAD=1 drains the relay link from a dedicated thread so
    the caller's bookkeeping overlaps the (bandwidth-bound) transfers;
    default is in-line fetching.
    """
    import os

    if os.environ.get("IMPG_FETCH_THREAD") != "1":
        for m in mats:
            yield np.asarray(m)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        futures = [pool.submit(np.asarray, m) for m in mats]
        for fut in futures:
            yield fut.result()


class DeviceEngine:
    """Host-facing wrapper: window-capacity management + numpy in/out.

    Every batch is padded/split to one fixed chunk length so the jitted step
    compiles exactly once per (chunk, k_max) pair — compile latency through a
    remote-compile TPU link dwarfs any padding waste.  k_max is seeded from
    the largest per-target record count (windows can never exceed it), capped
    to keep the dense grid bounded.
    """

    def __init__(
        self,
        index: ImpgIndex,
        initial_capacity: int | None = None,
        chunk: int = 1024,
        with_tracepoints: bool = False,
        slotted: bool | None = None,
        k_slot: int = 128,
        slot_chunk: int = 2048,
    ):
        from impg_tpu.ops.xfer import enable_persistent_cache

        enable_persistent_cache()
        self.index = index
        self.dindex = DeviceIndex.build(index, with_tracepoints, stats=False)
        self.chunk = chunk
        if initial_capacity is None:
            tree_sizes = np.diff(index.tgt_offsets)
            max_tree = int(tree_sizes.max()) if tree_sizes.size else 1
            initial_capacity = 1 << _iters_for(min(max_tree, 128))
        self.k_max = initial_capacity
        # Device-compacted result lanes per chunk (pack_result cap): the
        # transfer scales with hits, not the B*k_max grid; grows by
        # doubling on truncation.
        self.cap = chunk * 16
        # Fused pair_q/query_id transfer row: legal while
        # log2(chunk) + id_bits <= 31 (both values non-negative).
        seq_bits = max(1, int(np.ceil(np.log2(max(len(index.seq_index), 2)))))
        self.id_bits = (
            seq_bits if _iters_for(chunk - 1) + seq_bits <= 31 else 0
        )
        # ── slotted execution (the BFS stream default) ──
        # Candidate windows are computed on host and packed into fixed
        # k_slot-wide slots: one executable forever, dense-grid waste
        # bounded by one partial slot per query (vs max_tree-k lanes per
        # query under the windowed grid).  See _slot_core.
        import os as _os

        # Execution-strategy pick by tree shape (slotted=None -> auto):
        # the slotted path bounds dense-grid waste on WIDE windows (big
        # per-target trees), but on small trees the windowed grid is
        # cheaper end to end (its k_max is tiny, compaction shrinks
        # transfers, and far fewer dispatches per depth).  Measured: the
        # 704-record mid bench runs ~3x faster windowed; the 5M-record
        # index (windows ~500-1000) needs slots.  slotted=True/False and
        # IMPG_FORCE_SLOTS/IMPG_NO_SLOTS override.
        if slotted is None:
            tree_sizes_ = np.diff(index.tgt_offsets)
            max_tree_ = int(tree_sizes_.max()) if tree_sizes_.size else 1
            slotted = (
                max_tree_ > 256
                or _os.environ.get("IMPG_FORCE_SLOTS", "") == "1"
            )
        self.slotted = slotted and _os.environ.get(
            "IMPG_NO_SLOTS", ""
        ) != "1"
        self.k_slot = k_slot
        self.slot_chunk = slot_chunk
        self.slot_cap = slot_chunk * 8
        # Pin the compaction cap (IMPG_SLOT_CAP=<int>|none) to avoid the
        # truncation-doubling ladder: every new cap value is a fresh
        # executable (~80 s through a remote-compile relay).  "none"
        # disables compaction — the right call on dense workloads where
        # most lanes hit (pack_result's sort buys nothing).
        cap_env = _os.environ.get("IMPG_SLOT_CAP", "")
        if cap_env:
            self.slot_cap = (
                None if cap_env.lower() == "none" else int(cap_env)
            )
        self.slot_id_bits = (
            seq_bits if _iters_for(slot_chunk - 1) + seq_bits <= 31 else 0
        )
        self.inflight_chunks = 24  # dispatch-wave flow control
        # Host copies for window computation (borrow the index's arrays).
        self._h_ts = index.records.t_start
        self._h_cummax = compute_cummax_te(
            index.records.t_end, index.tgt_offsets
        )
        self._h_tgt_off = index.tgt_offsets

    def _ensure_stats(self):
        """Upload the identity-statistics arena arrays on first need (the
        lean BFS path never touches them)."""
        if "cum_match" in self.dindex.arena:
            return
        from impg_tpu.ops.xfer import device_put_chunked

        full = self.index.arena.projection_kwargs()
        for key in DeviceIndex.STATS_KEYS:
            self.dindex.arena[key] = device_put_chunked(
                np.ascontiguousarray(full[key])
            )

    @staticmethod
    def _fields_need_stats(fields) -> bool:
        if fields is None:
            return True
        return any(
            f in fields
            for f in ("matches", "mismatches", "i_count", "d_count",
                      "i_bp", "d_bp")
        )

    def _host_windows(self, q_tid, q_s, q_e):
        """Per-query candidate windows (win_lo, k) — the host-side twin of
        stab_windows (same sorted layout, same closed-interval bounds),
        vectorized as two searchsorted calls per distinct target."""
        n = q_tid.size
        win_lo = np.zeros(n, np.int64)
        k = np.zeros(n, np.int64)
        if n == 0:
            return win_lo, k
        order = np.argsort(q_tid, kind="stable")
        sorted_tid = q_tid[order]
        bounds = np.nonzero(np.diff(sorted_tid))[0] + 1
        for grp in np.split(order, bounds):
            tid = int(q_tid[grp[0]])
            if tid < 0 or tid + 1 >= self._h_tgt_off.size:
                continue
            lo, hi = int(self._h_tgt_off[tid]), int(self._h_tgt_off[tid + 1])
            if lo == hi:
                continue
            lo2 = np.searchsorted(
                self._h_cummax[lo:hi], q_s[grp], side="left"
            )
            cut = np.searchsorted(self._h_ts[lo:hi], q_e[grp], side="right")
            win_lo[grp] = lo + lo2
            k[grp] = np.maximum(cut - lo2, 0)
        return win_lo, k

    def _build_slots(self, win_lo, k):
        """Split windows into k_slot-wide slots: (slot_lo, slot_k, slot_q),
        slots ordered query-major (bookkeeping order is preserved)."""
        K = self.k_slot
        per = (k + K - 1) // K
        total = int(per.sum())
        slot_q = np.repeat(
            np.arange(k.size, dtype=np.int64), per
        )
        starts = np.zeros(k.size + 1, np.int64)
        np.cumsum(per, out=starts[1:])
        j = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], per)
        slot_lo = win_lo[slot_q] + j * K
        slot_k = np.minimum(k[slot_q] - j * K, K)
        return slot_lo, slot_k, slot_q

    @property
    def supports_approximate(self) -> bool:
        return self.dindex.tp is not None

    def query_batch(
        self,
        q_tid: np.ndarray,
        q_s: np.ndarray,
        q_e: np.ndarray,
        clip_overlap: bool = False,
        approximate: bool = False,
    ) -> dict:
        """Run one batched query step; returns compact numpy arrays of hits."""
        return self.query_batches(
            [(q_tid, q_s, q_e)], clip_overlap, approximate
        )[0]

    def _chunk_batch(self, b):
        """Split a (tid, s, e) batch into fixed-size chunks, padding the tail
        with inert queries (tid=-1 windows are empty).  One chunk length =
        one compiled executable."""
        n = len(b[0])
        arrays = [np.asarray(a, np.int32) for a in b]
        chunks = []
        for off in range(0, max(n, 1), self.chunk):
            end = min(off + self.chunk, n)
            cnt = end - off
            cols = []
            for i, a in enumerate(arrays):
                pad = np.full(self.chunk, -1 if i == 0 else 0, np.int32)
                pad[:cnt] = a[off:end]
                cols.append(jnp.asarray(pad))
            chunks.append((off, cnt, tuple(cols)))
        return chunks

    def query_batch_stream(
        self,
        q_tid: np.ndarray,
        q_s: np.ndarray,
        q_e: np.ndarray,
        clip_overlap: bool = False,
        approximate: bool = False,
        fields: tuple | None = None,
    ):
        """Generator over one batch's chunks: dispatch chunks ahead of the
        fetches, yield each compacted chunk dict as its fetch lands (pair_q
        already mapped to batch query indices).  The caller's host
        bookkeeping for chunk i overlaps the device compute/transfer of
        chunks i+1..

        Default path: slotted execution (host windows + fixed k_slot grid);
        `IMPG_NO_SLOTS=1` or slotted=False falls back to the windowed grid.
        """
        if self._fields_need_stats(fields) and not approximate:
            self._ensure_stats()
        if self.slotted:
            yield from self._stream_slotted(
                q_tid, q_s, q_e, clip_overlap, approximate, fields
            )
            return
        chunks = self._chunk_batch((q_tid, q_s, q_e))

        def dispatch(cols, k_max, cap):
            # Compaction is a no-op once cap covers the whole grid; clamp
            # to ONE full-matrix executable instead of a ladder of caps.
            if cap is not None and cap >= self.chunk * k_max:
                cap = None
            return query_step(
                self.dindex, *cols,
                k_max=k_max, cap=cap, clip_overlap=clip_overlap,
                approximate=approximate, fields=fields,
                id_bits=self.id_bits,
            )

        k_max0 = self.k_max
        cap0 = self.cap
        inflight = [
            (off, cols, k_max0, cap0, dispatch(cols, k_max0, cap0))
            for off, _cnt, cols in chunks
        ]
        # Start all result transfers eagerly: the relay link moves data
        # during fetches, so without this the host bookkeeping between
        # fetches would sit on the transfer critical path.
        for *_rest, mat in inflight:
            try:
                mat.copy_to_host_async()
            except AttributeError:
                pass
        fetched = _fetch_iter(m for *_rest, m in inflight)
        for (off, cols, k_used, cap_used, mat), m_host in zip(
            inflight, fetched
        ):
            k_needed = int(m_host[0, -1])
            n_hits = int(m_host[1, -1])
            while k_needed > k_used or (
                cap_used is not None
                and cap_used < self.chunk * k_used
                and n_hits > cap_used
            ):
                while self.k_max < k_needed:
                    self.k_max *= 2
                # One aggressive jump (2x margin): at most one extra
                # compacted executable before the full-matrix clamp.
                while self.cap < 2 * n_hits:
                    self.cap *= 2
                k_used = self.k_max
                cap_used = self.cap
                m_host = np.asarray(dispatch(cols, k_used, cap_used))
                k_needed = int(m_host[0, -1])
                n_hits = int(m_host[1, -1])
            out = unpack_result(
                m_host, fields, id_bits=self.id_bits,
                compacted=(
                    cap_used is not None
                    and cap_used < self.chunk * k_used
                ),
            )
            keep = out["valid"]
            if not bool(keep.all()):
                out = {
                    k: (v[keep] if np.ndim(v) else v)
                    for k, v in out.items()
                }
            out["pair_q"] = out["pair_q"] + off
            yield out

    def _stream_slotted(
        self, q_tid, q_s, q_e, clip_overlap, approximate, fields
    ):
        """Slotted chunk stream (see slot_query_step).  Dispatches in waves
        of `inflight_chunks` so multi-million-slot depths don't enqueue an
        unbounded number of device buffers."""
        q_tid = np.ascontiguousarray(q_tid, np.int32)
        q_s_arr = np.ascontiguousarray(q_s, np.int32)
        q_e_arr = np.ascontiguousarray(q_e, np.int32)
        win_lo, k = self._host_windows(q_tid, q_s_arr, q_e_arr)
        slot_lo, slot_k, slot_q = self._build_slots(win_lo, k)
        n_slots = slot_lo.size
        if n_slots == 0:
            return
        SC = self.slot_chunk
        pad = (-n_slots) % SC
        if pad:
            z = np.zeros(pad, np.int64)
            slot_lo = np.concatenate([slot_lo, z])
            slot_k = np.concatenate([slot_k, z])
        sq_s = q_s_arr[slot_q]
        sq_e = q_e_arr[slot_q]
        if pad:
            zero32 = np.zeros(pad, np.int32)
            sq_s = np.concatenate([sq_s, zero32])
            sq_e = np.concatenate([sq_e, zero32])
        total = n_slots + pad

        def dispatch(off, cap):
            if cap is not None and cap >= SC * self.k_slot:
                cap = None
            cols = (
                jnp.asarray(slot_lo[off:off + SC].astype(np.int32)),
                jnp.asarray(slot_k[off:off + SC].astype(np.int32)),
                jnp.asarray(sq_s[off:off + SC]),
                jnp.asarray(sq_e[off:off + SC]),
            )
            return cap, slot_query_step(
                self.dindex, *cols, k_slot=self.k_slot, cap=cap,
                clip_overlap=clip_overlap, approximate=approximate,
                fields=fields, id_bits=self.slot_id_bits,
            )

        offs = list(range(0, total, SC))
        wave = self.inflight_chunks
        inflight: list = []
        next_i = 0

        def fill():
            nonlocal next_i
            while next_i < len(offs) and len(inflight) < wave:
                off = offs[next_i]
                cap, mat = dispatch(off, self.slot_cap)
                try:
                    mat.copy_to_host_async()
                except AttributeError:
                    pass
                inflight.append((off, cap, mat))
                next_i += 1

        fill()
        while inflight:
            off, cap_used, mat = inflight.pop(0)
            fill()
            m_host = np.asarray(mat)
            n_hits = int(m_host[1, -1])
            while cap_used is not None and n_hits > cap_used:
                while self.slot_cap < 2 * n_hits:
                    self.slot_cap *= 2
                cap_used, mat2 = dispatch(off, self.slot_cap)
                m_host = np.asarray(mat2)
                n_hits = int(m_host[1, -1])
            out = unpack_result(
                m_host, fields, id_bits=self.slot_id_bits,
                compacted=cap_used is not None,
            )
            keep = out["valid"]
            if not bool(keep.all()):
                out = {
                    kk: (v[keep] if np.ndim(v) else v)
                    for kk, v in out.items()
                }
            # Map slot rows back to batch query indices.
            out["pair_q"] = slot_q[
                np.minimum(out["pair_q"].astype(np.int64) + off,
                           n_slots - 1)
            ]
            yield out

    def stab_counts(self, q_tid, q_s, q_e) -> np.ndarray:
        """Per-region overlapping directed-record counts (closed-interval
        stab, coitrees semantics) via the tiled pallas kernel
        (ops/pallas_stab.py) — the statistics primitive behind
        `stats -r/-b` region depth.  Counts raw directed records before
        projection/filters, so it matches the reference's per-tree
        interval accounting (main.rs:13194 print_stats), not query hit
        rows.  Pallas runs natively on TPU; on CPU backends the kernel
        executes in interpret mode (correctness-tested either way)."""
        from impg_tpu.ops import pallas_stab as ps

        if not hasattr(self, "_stab_recs"):
            r = self.index.records
            self._stab_recs = tuple(
                jnp.asarray(a) for a in ps.pad_records(
                    r.target_id.astype(np.int32),
                    r.t_start.astype(np.int32),
                    r.t_end.astype(np.int32),
                )
            )
        interpret = jax.devices()[0].platform == "cpu"
        out = ps.stab_counts(
            *self._stab_recs,
            jnp.asarray(np.asarray(q_tid, np.int32)),
            jnp.asarray(np.asarray(q_s, np.int32)),
            jnp.asarray(np.asarray(q_e, np.int32)),
            interpret=interpret,
        )
        return np.asarray(out)

    def query_batches(
        self, batches: list, clip_overlap: bool = False,
        approximate: bool = False,
    ) -> list[dict]:
        """Pipelined execution of many batches: dispatch all steps, then fetch.

        Overlaps device compute/transfer latency across batches; window
        overflows are detected after the fact and those chunks re-run.
        """
        if not approximate:
            self._ensure_stats()  # full RESULT_FIELDS includes identity stats
        per_batch_chunks = [self._chunk_batch(b) for b in batches]
        flat = [
            (bi, off, cnt, cols)
            for bi, chunks in enumerate(per_batch_chunks)
            for off, cnt, cols in chunks
        ]
        outputs: dict = {}
        pending = list(range(len(flat)))
        while pending:
            k_max = self.k_max
            cap = self.cap
            if cap is not None and cap >= self.chunk * k_max:
                cap = None
            inflight = [
                (
                    fi,
                    query_step(
                        self.dindex,
                        *flat[fi][3],
                        k_max=k_max,
                        cap=cap,
                        clip_overlap=clip_overlap,
                        approximate=approximate,
                        id_bits=self.id_bits,
                    ),
                )
                for fi in pending
            ]
            for _fi, mat in inflight:
                try:
                    mat.copy_to_host_async()
                except AttributeError:
                    pass
            retry = []
            for fi, mat in inflight:
                m_host = np.asarray(mat)
                k_needed = int(m_host[0, -1])
                n_hits = int(m_host[1, -1])
                if k_needed > k_max or (cap is not None and n_hits > cap):
                    retry.append(fi)
                    while self.k_max < k_needed:
                        self.k_max *= 2
                    while self.cap < 2 * n_hits:
                        self.cap *= 2
                    continue
                out = unpack_result(
                    m_host, id_bits=self.id_bits,
                    compacted=cap is not None,
                )
                keep = out["valid"]
                if bool(keep.all()):
                    outputs[fi] = out
                else:
                    outputs[fi] = {
                        k: (v[keep] if np.ndim(v) else v)
                        for k, v in out.items()
                    }
            pending = retry

        results = []
        for bi, chunks in enumerate(per_batch_chunks):
            parts = [
                outputs[fi]
                for fi, (fbi, off, cnt, _) in enumerate(flat)
                if fbi == bi
            ]
            offs = [off for fbi, off, cnt, _ in flat if fbi == bi]
            merged: dict = {}
            for key in parts[0]:
                if np.ndim(parts[0][key]) == 0:
                    merged[key] = parts[0][key]
                    continue
                cols = []
                for p, off in zip(parts, offs):
                    col = p[key]
                    if key == "pair_q":
                        col = col + off
                    cols.append(col)
                merged[key] = np.concatenate(cols)
            merged["n_hits"] = np.int32(
                sum(int(p["n_hits"]) for p in parts)
            )
            results.append(merged)
        return results
