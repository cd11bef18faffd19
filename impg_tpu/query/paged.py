"""Out-of-core device execution: target-sharded arena paging with LRU.

The resident `DeviceIndex` uploads the whole run arena to HBM and errors
past 2^31 runs; real hundreds-of-genomes indexes exceed both.  The
reference handles this with a lazily-loaded per-target tree cache
(impg.rs:1770-1784).  This module is the TPU equivalent:

  * Records (sorted by target) are partitioned into contiguous PAGES whose
    gathered arena slice fits a fixed budget share; a page's record
    columns + arena slice upload together, with page-relative int32 run
    offsets — so the GLOBAL arena may exceed 2^31 runs (host offsets stay
    int64) and HBM only ever holds `hbm_budget_bytes` worth of pages
    (LRU-evicted).
  * Every page pads to one fixed (P_REC, P_RUNS) shape, so the jitted
    slot step compiles ONCE and serves every page — no per-page
    recompiles through the (slow) remote-compile link.
  * Queries flow through the same host-side window/slot machinery as the
    resident slotted engine (device.py); slots are split at page
    boundaries, grouped by page for execution, and the depth's hits are
    re-emitted in global slot order so transitive bookkeeping sees the
    exact host-engine order (results stay row-for-row identical).

Approximate (tracepoint) mode intentionally stays on the resident engine:
its arena is an order of magnitude smaller than the CIGAR arena, so the
workloads that need paging do not need it paged.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import numpy as np

import jax
import jax.numpy as jnp

from impg_tpu.query import device as dev_mod
from impg_tpu.query.device import (
    _iters_for,
    _slot_core,
    compute_cummax_te,
    pack_result,
    unpack_result,
)

PAGE_ARRAYS_LEAN = 5  # runs, cum_t, cum_q, irun_before, irun_after
PAGE_ARRAYS_STATS = 11
REC_COLS = 6  # t_start, t_end, strand, query_id, op_off, op_cnt


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_records", "search_iters", "k_slot", "cap", "clip_overlap",
        "fields", "id_bits",
    ),
)
def page_slot_step(
    page: dict,
    slot_lo,
    slot_k,
    q_s,
    q_e,
    *,
    n_records: int,
    search_iters: int,
    k_slot: int,
    cap: int | None,
    clip_overlap: bool,
    fields: tuple | None,
    id_bits: int,
):
    """slot_query_step against one uploaded page (slim rec dict — no
    stab arrays: windows come from the host).  `n_records` is the FIXED
    padded page record count, so one executable serves every page."""
    rec = dict(
        t_start=page["t_start"],
        t_end=page["t_end"],
        strand=page["strand"],
        query_id=page["query_id"],
        op_off=page["op_off"],
        op_cnt=page["op_cnt"],
    )
    arena = {
        k: v
        for k, v in page.items()
        if k
        in (
            "runs", "cum_t", "cum_q", "irun_before", "irun_after",
            "cum_match", "cum_mm", "cum_icnt", "cum_dcnt", "cum_ibp",
            "cum_dbp",
        )
    }
    out = _slot_core(
        rec=rec,
        arena=arena,
        slot_lo=slot_lo,
        slot_k=slot_k,
        q_s=q_s,
        q_e=q_e,
        k_slot=k_slot,
        clip_overlap=clip_overlap,
        search_iters=search_iters,
        n_records=n_records,
        tp=None,
        tp_spacing=0,
    )
    return pack_result(out, cap, fields, id_bits)


class PagedDeviceEngine:
    """DeviceEngine-compatible stream engine for indexes beyond HBM.

    `hbm_budget_bytes` caps resident page bytes (default: a conservative
    share of one v5e's 16 GiB).  Page capacity is budget/4 so several
    pages stay resident; eviction is LRU.
    """

    supports_approximate = False

    def __init__(
        self,
        index,
        hbm_budget_bytes: int = 12 << 30,
        k_slot: int = 128,
        slot_chunk: int = 2048,
        with_stats: bool = False,
    ):
        self.index = index
        self.budget = int(hbm_budget_bytes)
        self.k_slot = k_slot
        self.slot_chunk = slot_chunk
        self.with_stats = with_stats
        self.inflight_chunks = 24
        seq_bits = max(
            1, int(np.ceil(np.log2(max(len(index.seq_index), 2))))
        )
        self.id_bits = (
            seq_bits if _iters_for(slot_chunk - 1) + seq_bits <= 31 else 0
        )
        self.slot_cap = slot_chunk * 8

        r = index.records
        self.search_iters = (
            _iters_for(int(r.op_cnt.max())) if len(r) else 1
        )
        self._h_ts = r.t_start
        self._h_cummax = compute_cummax_te(r.t_end, index.tgt_offsets)
        self._h_tgt_off = index.tgt_offsets

        # ── page plan ──
        # Greedy contiguous record ranges: a page closes when its gathered
        # run count would exceed the per-page run capacity.  Pages may
        # split inside a target segment — slots are page-clipped later.
        n_arrays = PAGE_ARRAYS_STATS if with_stats else PAGE_ARRAYS_LEAN
        bytes_per_run = 4 * n_arrays
        bytes_per_rec = 4 * REC_COLS
        page_bytes = max(self.budget // 4, 1 << 14)
        cnt = r.op_cnt.astype(np.int64)
        run_cum = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=run_cum[1:])
        # Amortize the record-column bytes into the per-run budget share.
        mean_runs = max(float(cnt.mean()) if cnt.size else 1.0, 1.0)
        cap_runs = max(
            int(page_bytes // (bytes_per_run + bytes_per_rec / mean_runs)),
            256,
        )
        # Record edges where cumulative runs cross multiples of cap_runs.
        edges = [0]
        target = cap_runs
        for i in range(cnt.size):
            if run_cum[i + 1] > target and edges[-1] != i:
                edges.append(i)
                target = run_cum[i] + cap_runs
        edges.append(cnt.size)
        self.page_edges = np.asarray(edges, np.int64)
        self.n_pages = len(edges) - 1
        # Fixed padded page shape (one executable for all pages).
        self.p_runs = 1
        self.p_rec = 1
        for p in range(self.n_pages):
            lo, hi = edges[p], edges[p + 1]
            self.p_runs = max(self.p_runs, int(run_cum[hi] - run_cum[lo]))
            self.p_rec = max(self.p_rec, int(hi - lo))
        self.page_bytes_each = (
            self.p_runs * bytes_per_run + self.p_rec * bytes_per_rec
        )
        self._pages: OrderedDict[int, dict] = OrderedDict()
        self.uploads = 0
        self.evictions = 0

    # ── paging ──
    def _build_page(self, p: int) -> dict:
        idx = self.index
        r = idx.records
        a = idx.arena
        lo, hi = int(self.page_edges[p]), int(self.page_edges[p + 1])
        cnt = r.op_cnt[lo:hi].astype(np.int64)
        total = int(cnt.sum())
        # Gathered arena slice (repeat/arange trick, O(total)).
        page_off = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=page_off[1:])
        gather = (
            np.arange(total, dtype=np.int64)
            - np.repeat(page_off[:-1], cnt)
            + np.repeat(r.op_off[lo:hi], cnt)
        )

        def pad_runs(arr, fill=0):
            out = np.full(self.p_runs, fill, arr.dtype)
            out[:total] = arr[gather]
            return jnp.asarray(out)

        def pad_rec(arr, fill=0):
            out = np.full(self.p_rec, fill, np.int32)
            out[: hi - lo] = arr[lo:hi].astype(np.int32)
            return jnp.asarray(out)

        page = dict(
            t_start=pad_rec(r.t_start),
            t_end=pad_rec(r.t_end, fill=-1),
            strand=pad_rec(r.strand),
            query_id=pad_rec(r.query_id),
            op_cnt=pad_rec(r.op_cnt),
            runs=pad_runs(a.runs),
            cum_t=pad_runs(a.cum_t),
            cum_q=pad_runs(a.cum_q),
            irun_before=pad_runs(a.irun_before),
            irun_after=pad_runs(a.irun_after),
        )
        off32 = np.zeros(self.p_rec, np.int32)
        off32[: hi - lo] = page_off[:-1].astype(np.int32)
        page["op_off"] = jnp.asarray(off32)
        if self.with_stats:
            # NOTE: with arena v3 this materializes the WHOLE lazy stats
            # block host-side on first touch (24 B/run).  The paged
            # engine exists for indexes whose lean arena exceeds HBM, so
            # stats pages on such indexes are a deliberate host-RAM
            # trade; the default (with_stats=False) never pays it.
            for key in (
                "cum_match", "cum_mm", "cum_icnt", "cum_dcnt", "cum_ibp",
                "cum_dbp",
            ):
                page[key] = pad_runs(getattr(a, key))
        return page

    def _get_page(self, p: int) -> dict:
        page = self._pages.get(p)
        if page is not None:
            self._pages.move_to_end(p)
            return page
        while (
            self._pages
            and (len(self._pages) + 1) * self.page_bytes_each > self.budget
        ):
            self._pages.popitem(last=False)
            self.evictions += 1
        page = self._build_page(p)
        self._pages[p] = page
        self.uploads += 1
        return page

    # ── windows & slots (page-clipped) ──
    def _host_windows(self, q_tid, q_s, q_e):
        eng = dev_mod.DeviceEngine
        return eng._host_windows(self, q_tid, q_s, q_e)  # same layout

    def _build_slots(self, win_lo, k):
        """Like DeviceEngine._build_slots, but windows first split at page
        edges so every slot lives in exactly one page."""
        K = self.k_slot
        edges = self.page_edges
        # Split windows at page boundaries (a window spans <= a few pages;
        # typically one).  Output: per sub-window (lo, k, query).
        sub_lo, sub_k, sub_q = [], [], []
        win_hi = win_lo + k
        p_lo = np.searchsorted(edges, win_lo, side="right") - 1
        p_hi = np.searchsorted(edges, np.maximum(win_hi - 1, win_lo),
                               side="right") - 1
        same = p_lo == p_hi
        if np.any(same):
            iw = np.nonzero(same & (k > 0))[0]
            sub_lo.append(win_lo[iw])
            sub_k.append(k[iw])
            sub_q.append(iw)
        for i in np.nonzero(~same & (k > 0))[0]:
            lo, hi = int(win_lo[i]), int(win_hi[i])
            for p in range(int(p_lo[i]), int(p_hi[i]) + 1):
                s = max(lo, int(edges[p]))
                e = min(hi, int(edges[p + 1]))
                if s < e:
                    sub_lo.append(np.asarray([s], np.int64))
                    sub_k.append(np.asarray([e - s], np.int64))
                    sub_q.append(np.asarray([i], np.int64))
        if not sub_lo:
            z = np.zeros(0, np.int64)
            return z, z, z
        sub_lo = np.concatenate(sub_lo)
        sub_k = np.concatenate(sub_k)
        sub_q = np.concatenate(sub_q).astype(np.int64)
        # Keep global slot order query-major: order sub-windows by
        # (query, lo) so emission order matches the resident engine.
        order = np.lexsort((sub_lo, sub_q))
        sub_lo, sub_k, sub_q = sub_lo[order], sub_k[order], sub_q[order]
        per = (sub_k + K - 1) // K
        total = int(per.sum())
        src = np.repeat(np.arange(sub_k.size, dtype=np.int64), per)
        starts = np.zeros(sub_k.size + 1, np.int64)
        np.cumsum(per, out=starts[1:])
        j = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], per)
        slot_lo = sub_lo[src] + j * K
        slot_k = np.minimum(sub_k[src] - j * K, K)
        return slot_lo, slot_k, sub_q[src]

    # ── the stream ──
    def query_batch_stream(
        self,
        q_tid,
        q_s,
        q_e,
        clip_overlap: bool = False,
        approximate: bool = False,
        fields: tuple | None = None,
    ):
        """One depth's hits, yielded in global slot (frontier) order.

        Execution groups slots by page to bound HBM, buffers the depth's
        hits, and re-sorts by slot before yielding — transitive
        bookkeeping sees the exact resident-engine order."""
        if approximate:
            raise NotImplementedError(
                "paged engine does not serve approximate mode"
            )
        if dev_mod.DeviceEngine._fields_need_stats(fields) and not (
            self.with_stats
        ):
            raise ValueError(
                "paged engine built without stats arrays; pass "
                "with_stats=True for identity-statistics fields"
            )
        q_tid = np.ascontiguousarray(q_tid, np.int32)
        q_s_arr = np.ascontiguousarray(q_s, np.int32)
        q_e_arr = np.ascontiguousarray(q_e, np.int32)
        win_lo, k = self._host_windows(q_tid, q_s_arr, q_e_arr)
        slot_lo, slot_k, slot_q = self._build_slots(win_lo, k)
        n_slots = slot_lo.size
        if n_slots == 0:
            return
        slot_page = (
            np.searchsorted(self.page_edges, slot_lo, side="right") - 1
        )
        SC, K = self.slot_chunk, self.k_slot

        parts: list[tuple[np.ndarray, dict]] = []
        for p in np.unique(slot_page):
            page = self._get_page(int(p))
            rec_base = int(self.page_edges[p])
            sel = np.nonzero(slot_page == p)[0]
            p_lo = (slot_lo[sel] - rec_base).astype(np.int32)
            p_k = slot_k[sel].astype(np.int32)
            p_qs = q_s_arr[slot_q[sel]]
            p_qe = q_e_arr[slot_q[sel]]
            for off in range(0, sel.size, SC):
                cnt = min(SC, sel.size - off)
                cols = []
                for src in (p_lo, p_k, p_qs, p_qe):
                    buf = np.zeros(SC, np.int32)
                    buf[:cnt] = src[off:off + cnt]
                    cols.append(jnp.asarray(buf))
                cap = self.slot_cap
                while True:
                    use_cap = None if cap >= SC * K else cap
                    mat = page_slot_step(
                        page, *cols, n_records=self.p_rec,
                        search_iters=self.search_iters, k_slot=K,
                        cap=use_cap, clip_overlap=clip_overlap,
                        fields=fields, id_bits=self.id_bits,
                    )
                    m_host = np.asarray(mat)
                    n_hits = int(m_host[1, -1])
                    if use_cap is None or n_hits <= use_cap:
                        break
                    while self.slot_cap < 2 * n_hits:
                        self.slot_cap *= 2
                    cap = self.slot_cap
                out = unpack_result(
                    m_host, fields, id_bits=self.id_bits,
                    compacted=use_cap is not None,
                )
                keep = out["valid"]
                if not bool(keep.all()):
                    out = {
                        kk: (v[keep] if np.ndim(v) else v)
                        for kk, v in out.items()
                    }
                hit_slot = sel[
                    np.minimum(out["pair_q"].astype(np.int64) + off,
                               sel.size - 1)
                ]
                if "pair_rec" in out:
                    out["pair_rec"] = out["pair_rec"] + rec_base
                parts.append((hit_slot, out))

        if not parts:
            return
        hit_slot = np.concatenate([p[0] for p in parts])
        order = np.argsort(hit_slot, kind="stable")
        merged: dict = {}
        for key in parts[0][1]:
            if np.ndim(parts[0][1][key]) == 0:
                continue
            merged[key] = np.concatenate([p[1][key] for p in parts])[order]
        merged["pair_q"] = slot_q[hit_slot[order]]
        yield merged
