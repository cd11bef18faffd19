"""Multi-chip execution: the index sharded across a device mesh.

The reference is a single-node shared-memory program (SURVEY.md §2); the
multi-chip story here is new design, per the north star (BASELINE.json):

  - The directed-record table (and each record's arena slice) is split into
    contiguous blocks along the (target_id, t_start)-sorted order, so a shard
    holds whole target-sequence ranges — stabbing locality is preserved and a
    query touches few shards, but every shard can evaluate every query.
  - A query batch is REPLICATED across the mesh; each device stabs + projects
    against its local block with the same windowed dense-grid kernel as
    single-chip (query/device.py), using shard-local target offsets and
    prefix-max pruning, and the per-shard [B*K] results are combined with
    `all_gather` over the ICI mesh axis.
  - The host concatenates the per-shard hit lists; ordering metadata
    (pair_q, global record ids) makes the merged result identical to
    single-chip.

Built on `shard_map` so the per-device code is the plain local kernel and the
only collective is the final all_gather (hits are tiny next to the index).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.query import device as device_mod


@dataclass
class ShardedIndex:
    """Index tensors stacked along a leading shard axis [n_shards, ...]."""

    rec: dict  # each [n_shards, R] (+ tgt_offsets [n_shards, n_seqs+1])
    arena: dict  # each [n_shards, A]
    n_shards: int
    search_iters: int
    window_iters: int
    rec_base: np.ndarray  # int64 [n_shards] — global record offset per shard
    r_pad: int
    tp: dict | None = None  # per-shard tracepoint arrays (approximate mode)
    tp_spacing: int = 0

    @classmethod
    def build(
        cls, index: ImpgIndex, n_shards: int, with_tracepoints: bool = False
    ) -> "ShardedIndex":
        if index.arena.n_ops >= 2**31:
            # Same contract as DeviceIndex.build: the shard-local op_off
            # columns are int32, so a >=2^31-op arena would wrap negative
            # and gather garbage instead of failing loudly.
            raise ValueError("arena too large for int32 offsets")
        n = len(index.records)
        n_seqs = len(index.seq_index)
        max_ops = int(index.records.op_cnt.max()) if n else 1

        bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
        r_max = max(1, int((bounds[1:] - bounds[:-1]).max()))
        r_pad = r_max

        rec_cols = {
            "target_id": (index.records.target_id, -1),
            "t_start": (index.records.t_start, 2**31 - 1),
            "t_end": (index.records.t_end, -(2**31)),
            "strand": (index.records.strand, 0),
            "query_id": (index.records.query_id, -1),
            "op_cnt": (index.records.op_cnt, 0),
        }
        arena_arrays = index.arena.projection_kwargs()
        shard_rec = {k: [] for k in rec_cols}
        shard_rec.update(op_off=[], cummax_te=[], tgt_offsets=[])
        shard_arena = {k: [] for k in arena_arrays}
        arena_parts = []
        max_tree = 1

        for s in range(n_shards):
            lo, hi = int(bounds[s]), int(bounds[s + 1])
            cnt = hi - lo
            op_off = index.records.op_off[lo:hi]
            op_cnt = index.records.op_cnt[lo:hi].astype(np.int64)
            local_off = np.concatenate([np.zeros(1, np.int64), np.cumsum(op_cnt)])
            gather = np.concatenate(
                [np.arange(o, o + c, dtype=np.int64) for o, c in zip(op_off, op_cnt)]
                or [np.zeros(0, np.int64)]
            )
            arena_parts.append(gather)
            for k, (arr, fill) in rec_cols.items():
                col = np.full(r_pad, fill, np.int32)
                col[:cnt] = arr[lo:hi].astype(np.int32)
                shard_rec[k].append(col)
            off_col = np.zeros(r_pad, np.int32)
            off_col[:cnt] = local_off[:-1].astype(np.int32)
            shard_rec["op_off"].append(off_col)

            # Shard-local target offsets + prefix-max pruning column.
            local_tids = index.records.target_id[lo:hi]
            local_tgt_off = np.searchsorted(
                local_tids, np.arange(n_seqs + 1), side="left"
            ).astype(np.int32)
            shard_rec["tgt_offsets"].append(local_tgt_off)
            tree_sizes = np.diff(local_tgt_off)
            if tree_sizes.size:
                max_tree = max(max_tree, int(tree_sizes.max()))
            cummax = np.zeros(r_pad, np.int32)
            cummax[:cnt] = device_mod.compute_cummax_te(
                index.records.t_end[lo:hi], local_tgt_off.astype(np.int64)
            )
            shard_rec["cummax_te"].append(cummax)

        a_pad = max(1, max(g.size for g in arena_parts))
        for s, gather in enumerate(arena_parts):
            for k, arr in arena_arrays.items():
                part = arr[gather]
                padded = np.zeros(a_pad, part.dtype)
                padded[: part.size] = part
                shard_arena[k].append(padded)

        tp_dict = None
        tp_spacing = 0
        if with_tracepoints:
            # Shard the tracepoint arena exactly like the run arena:
            # per-record boundary slices gathered contiguously with
            # shard-local seg offsets (query/device.py DeviceIndex tp).
            # Reuse the index's cached arena whatever its spacing —
            # ensure_tracepoints() with the default would silently REBUILD
            # a differently-spaced arena (e.g. a .1aln's native spacing)
            # and diverge from host/DeviceEngine steps.
            tpa = index.tp if index.tp is not None else (
                index.ensure_tracepoints()
            )
            tp_spacing = tpa.spacing
            tp_cols = {
                k: [] for k in (
                    "seg_off", "n_seg", "q_bound", "pre_diffs",
                    "pre_aligned", "q_start", "q_end",
                )
            }
            bound_parts = []
            for sh in range(n_shards):
                lo, hi = int(bounds[sh]), int(bounds[sh + 1])
                cnt = hi - lo
                n_seg = tpa.n_seg[lo:hi].astype(np.int64)
                n_bound = n_seg + 1
                local_off = np.concatenate(
                    [np.zeros(1, np.int64), np.cumsum(n_bound)]
                )
                gather = np.concatenate(
                    [
                        np.arange(o, o + c, dtype=np.int64)
                        for o, c in zip(tpa.seg_off[lo:hi], n_bound)
                    ]
                    or [np.zeros(0, np.int64)]
                )
                bound_parts.append(gather)
                col = np.zeros(r_pad, np.int32)
                col[:cnt] = local_off[:-1].astype(np.int32)
                tp_cols["seg_off"].append(col)
                col = np.zeros(r_pad, np.int32)
                col[:cnt] = n_seg.astype(np.int32)
                tp_cols["n_seg"].append(col)
                for key, arr in (
                    ("q_start", index.records.q_start),
                    ("q_end", index.records.q_end),
                ):
                    col = np.zeros(r_pad, np.int32)
                    col[:cnt] = arr[lo:hi].astype(np.int32)
                    tp_cols[key].append(col)
            b_pad = max(1, max(g.size for g in bound_parts))
            for gather in bound_parts:
                for key, arr in (
                    ("q_bound", tpa.q_bound),
                    ("pre_diffs", tpa.pre_diffs),
                    ("pre_aligned", tpa.pre_aligned),
                ):
                    part = arr[gather].astype(np.int32)
                    padded = np.zeros(b_pad, np.int32)
                    padded[: part.size] = part
                    tp_cols[key].append(padded)
            tp_dict = {k: np.stack(v) for k, v in tp_cols.items()}

        return cls(
            rec={k: np.stack(v) for k, v in shard_rec.items()},
            arena={k: np.stack(v) for k, v in shard_arena.items()},
            n_shards=n_shards,
            search_iters=device_mod._iters_for(max_ops),
            window_iters=device_mod._iters_for(max_tree),
            rec_base=bounds[:-1],
            r_pad=r_pad,
            tp=tp_dict,
            tp_spacing=tp_spacing,
        )


def make_sharded_query_step(mesh: Mesh, axis: str = "shard"):
    """Build a jitted sharded query step over `mesh`.

    fn(rec, arena, q_tid, q_s, q_e, k_max=..., ...) with rec/arena stacked
    ShardedIndex dicts (sharded on axis 0) and queries replicated.  Output
    arrays carry a leading shard axis (all-gathered, replicated).
    """

    def step(rec, arena, tp, q_tid, q_s, q_e, *, k_max, clip_overlap,
             search_iters, window_iters, r_pad, tp_spacing):
        def local(rec_l, arena_l, tp_l, q_tid_l, q_s_l, q_e_l):
            rec_l = {k: v[0] for k, v in rec_l.items()}
            arena_l = {k: v[0] for k, v in arena_l.items()}
            tp_local = (
                {k: v[0] for k, v in tp_l.items()} if tp_l else None
            )
            tgt_offsets = rec_l.pop("tgt_offsets")
            out = device_mod._query_core(
                rec=dict(rec_l, tgt_offsets=tgt_offsets),
                arena=arena_l,
                q_tid=q_tid_l,
                q_s=q_s_l,
                q_e=q_e_l,
                k_max=k_max,
                clip_overlap=clip_overlap,
                search_iters=search_iters,
                window_iters=window_iters,
                n_records=r_pad,
                tp=tp_local,
                tp_spacing=tp_spacing,
            )
            mat = device_mod.pack_result(out)
            return jax.lax.all_gather(mat, axis)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(rec, arena, tp, q_tid, q_s, q_e)

    return jax.jit(
        step,
        static_argnames=(
            "k_max", "clip_overlap", "search_iters", "window_iters",
            "r_pad", "tp_spacing",
        ),
    )


class ShardedEngine:
    """Host-facing wrapper running a query batch over a device mesh."""

    def __init__(
        self,
        index: ImpgIndex,
        mesh: Mesh | None = None,
        initial_capacity: int = 32,
        with_tracepoints: bool = False,
    ):
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("shard",))
        if len(mesh.devices.shape) != 1:
            # P(axis) below shards along the first mesh axis only, while
            # the index is split into prod(shape) shards — a multi-dim
            # mesh would place shards inconsistently.
            raise ValueError(
                "ShardedEngine requires a 1-D mesh; got shape "
                f"{mesh.devices.shape}"
            )
        self.mesh = mesh
        self.index = index
        n_shards = int(np.prod(mesh.devices.shape))
        self.sharded = ShardedIndex.build(
            index, n_shards, with_tracepoints=with_tracepoints
        )
        self.k_max = initial_capacity
        # Honor the caller's axis name (a mesh named ('data',) must not
        # trace shard_map over a nonexistent 'shard' axis).
        self._step = make_sharded_query_step(mesh, mesh.axis_names[0])
        axis = mesh.axis_names[0]
        shard0 = NamedSharding(mesh, P(axis))
        self._repl_sharding = NamedSharding(mesh, P())
        self.rec = {
            k: self._put_sharded(v, shard0)
            for k, v in self.sharded.rec.items()
        }
        self.arena = {
            k: self._put_sharded(v, shard0)
            for k, v in self.sharded.arena.items()
        }
        self.tp = (
            {
                k: self._put_sharded(v, shard0)
                for k, v in self.sharded.tp.items()
            }
            if self.sharded.tp is not None
            else None
        )
        # The stacked host copies exist only to feed placement; queries
        # read just the scalars (rec_base/r_pad/iters/tp_spacing). Drop
        # the arrays, which would otherwise keep a second full padded
        # index in host RAM next to self.index + the device copies.
        self.sharded.rec = {}
        self.sharded.arena = {}
        if self.sharded.tp is not None:
            self.sharded.tp = {}

    # Placement hooks — DistributedEngine overrides these so each process
    # materializes only its addressable shards of the global arrays.
    def _put_sharded(self, arr, sharding):
        return jax.device_put(arr, sharding)

    def _replicate(self, arr):
        return jnp.asarray(arr)

    @property
    def supports_approximate(self) -> bool:
        return self.tp is not None

    def query_batch_stream(
        self,
        q_tid,
        q_s,
        q_e,
        clip_overlap: bool = False,
        approximate: bool = False,
        chunk: int = 1024,
        fields: tuple | None = None,
    ):
        # `fields` is accepted for engine-API parity; the mesh kernel
        # always ships the full field set (its transfer is a gathered
        # all-device matrix either way).
        del fields
        """Fixed-chunk streaming API matching DeviceEngine's, so the
        transitive BFS walkers (`query_transitive_bfs_many`) run their
        per-depth batched step over the device MESH.  Queries pad/split to
        `chunk` (one compiled executable per shape); `pair_q` is offset
        into the full batch.  Approximate (tracepoint) mode is
        single-chip-only for now."""
        if approximate and self.tp is None:
            raise ValueError(
                "approximate mode needs ShardedEngine(with_tracepoints=True)"
            )
        q_tid = np.asarray(q_tid, np.int32)
        q_s = np.asarray(q_s, np.int32)
        q_e = np.asarray(q_e, np.int32)
        n = q_tid.size
        for off in range(0, max(n, 1), chunk):
            end = min(off + chunk, n)
            cnt = end - off
            pad_t = np.full(chunk, -1, np.int32)
            pad_s = np.zeros(chunk, np.int32)
            pad_e = np.zeros(chunk, np.int32)
            pad_t[:cnt] = q_tid[off:end]
            pad_s[:cnt] = q_s[off:end]
            pad_e[:cnt] = q_e[off:end]
            out = self.query_batch(
                pad_t, pad_s, pad_e, clip_overlap, approximate
            )
            out["pair_q"] = out["pair_q"] + off
            yield out

    def query_batch(
        self, q_tid, q_s, q_e, clip_overlap: bool = False,
        approximate: bool = False,
    ) -> dict:
        if approximate and self.tp is None:
            raise ValueError(
                "approximate mode needs ShardedEngine(with_tracepoints=True)"
            )
        q_tid = self._replicate(np.asarray(q_tid, np.int32))
        q_s = self._replicate(np.asarray(q_s, np.int32))
        q_e = self._replicate(np.asarray(q_e, np.int32))
        while True:
            mat = self._step(
                self.rec, self.arena,
                (self.tp if approximate else {}),
                q_tid, q_s, q_e,
                k_max=self.k_max,
                clip_overlap=clip_overlap,
                search_iters=self.sharded.search_iters,
                window_iters=self.sharded.window_iters,
                r_pad=self.sharded.r_pad,
                tp_spacing=self.sharded.tp_spacing,
            )
            mat_host = np.asarray(mat)  # [n_shards, n_fields, B*K + 1]
            k_needed = int(mat_host[:, 0, -1].max())
            if k_needed <= self.k_max:
                break
            while self.k_max < k_needed:
                self.k_max *= 2
        n_sh = self.sharded.n_shards
        out_flat: dict = {}
        shards = [
            device_mod.unpack_result(mat_host[s]) for s in range(n_sh)
        ]
        for k in device_mod.RESULT_FIELDS:
            parts = []
            for s, shard in enumerate(shards):
                col = shard[k][shard["valid"]]
                if k == "pair_rec":
                    col = col + self.sharded.rec_base[s]
                parts.append(col)
            out_flat[k] = np.concatenate(parts)
        # Canonical single-chip hit order — (query, global record) — so the
        # order-sensitive visited bookkeeping of the transitive walkers sees
        # exactly the same sequence as DeviceEngine/host.
        order = np.lexsort((out_flat["pair_rec"], out_flat["pair_q"]))
        return {k: v[order] for k, v in out_flat.items()}
