"""Pallas TPU kernel: tiled batched interval-stab counting.

The BITS-style counting core of interval stabbing (BASELINE.json: "coitrees'
cache-oblivious interval-tree stabbing becomes vectorized sorted-array
interval intersection in a Pallas kernel"): for a batch of B queries
(target, start, end) against N directed records, count the overlapping
records per query.

Kernel layout: the grid walks record tiles; each tile of record coordinates
is DMA'd into VMEM once and tested against ALL B queries (queries stay
VMEM-resident across the whole grid), accumulating per-query counts — the
high work-per-HBM-byte schedule that makes batched stabbing bandwidth-
efficient on TPU.  Production consumer: `DeviceEngine.stab_counts`
(query/device.py), which backs the `stats -r/-b` region-depth CLI; it is
NOT on the query hot path — there the measured XLA gather/binary-search
stab wins (see ROADMAP "Pallas fused stab+project kernel": the windowed
gather touches ~2*log(L) values per pair vs whole-span DMA).  Correctness
is tested against numpy, the windowed stab, and host-vs-device CLI output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # records per tile (int32 x 3 arrays -> 12 KB VMEM per tile)


def _stab_count_kernel(tid_ref, ts_ref, te_ref, qtid_ref, qs_ref, qe_ref,
                       out_ref):
    """Grid dim 0 walks record tiles; out accumulates per-query counts."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Record tile: [TILE, 1]; queries: [1, B] — broadcast to [TILE, B].
    tid = tid_ref[:]
    ts = ts_ref[:]
    te = te_ref[:]
    qtid = qtid_ref[:]
    qs = qs_ref[:]
    qe = qe_ref[:]
    hit = (
        (tid == qtid)
        & (ts <= qe)
        & (te >= qs)
    )
    out_ref[:] = out_ref[:] + jnp.sum(
        hit.astype(jnp.int32), axis=0, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def stab_counts(rec_tid, rec_ts, rec_te, q_tid, q_s, q_e, interpret=False):
    """Per-query overlap counts (closed-interval stab, coitrees semantics).

    Records must be padded to a multiple of TILE with tid=-1 sentinels.
    """
    n = rec_tid.shape[0]
    b = q_tid.shape[0]
    grid = n // TILE

    out = pl.pallas_call(
        _stab_count_kernel,
        out_shape=jax.ShapeDtypeStruct((1, b), jnp.int32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        rec_tid.reshape(n, 1),
        rec_ts.reshape(n, 1),
        rec_te.reshape(n, 1),
        q_tid.reshape(1, b),
        q_s.reshape(1, b),
        q_e.reshape(1, b),
    )
    return out.reshape(b)


def stab_counts_host(rec_tid, rec_ts, rec_te, q_tid, q_s, q_e):
    """numpy oracle for the kernel."""
    import numpy as np

    out = np.zeros(q_tid.shape[0], np.int32)
    for i in range(q_tid.shape[0]):
        out[i] = int(
            np.sum(
                (rec_tid == q_tid[i])
                & (rec_ts <= q_e[i])
                & (rec_te >= q_s[i])
            )
        )
    return out


def pad_records(rec_tid, rec_ts, rec_te):
    """Pad record arrays to a TILE multiple with non-matching sentinels."""
    import numpy as np

    n = rec_tid.shape[0]
    n_pad = max(TILE, ((n + TILE - 1) // TILE) * TILE)
    tid = np.full(n_pad, -1, np.int32)
    ts = np.full(n_pad, 2**31 - 1, np.int32)
    te = np.full(n_pad, -(2**31), np.int32)
    tid[:n] = rec_tid
    ts[:n] = rec_ts
    te[:n] = rec_te
    return tid, ts, te
