"""Cross-host execution: `jax.distributed` + the sharded mesh engine.

The reference is single-node shared-memory (SURVEY.md §2 "Parallelism &
distributed inventory"); the cross-host story is new TPU-native design per
the north star: shard the interval index by record blocks across every
process's devices, replicate the query batches, run the same local
stab+project kernel per shard, and merge per-shard hit sets with one
`all_gather` collective — over ICI within a host, DCN between hosts; the
host-side gather produces the exact single-chip row order so text output
is bit-identical regardless of topology.

How it composes with `parallel/sharding.py`:

  * the Mesh simply spans ALL processes' devices (`jax.devices()` is the
    global list after `initialize()`), so the shard_map step and its
    all_gather are reused unchanged — XLA routes the collective across
    process boundaries;
  * each process holds the full host-RAM index (the "disk tier") but
    materializes ONLY its addressable device shards, via
    `jax.make_array_from_callback`;
  * query inputs are replicated global arrays built from identical
    host-local batches (every process must walk the same BED batch — the
    transitive frontier evolves deterministically from gathered results,
    so processes stay in lockstep without further communication);
  * results are fully-replicated arrays: every process reads the same
    merged hit matrix; `is_primary()` gates which one writes output.

Verified end-to-end with multi-process CPU meshes (Gloo collectives) in
tests/test_distributed.py; the same code path drives multi-host TPU pods
where `jax.distributed.initialize()` picks up the TPU coordinator
automatically.
"""

from __future__ import annotations

import os

import numpy as np

import jax

from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.parallel.sharding import Mesh, ShardedEngine


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-process runtime.

    Arguments fall back to IMPG_COORDINATOR / IMPG_NUM_PROCESSES /
    IMPG_PROCESS_ID, then to JAX's own autodetection (TPU pods need no
    arguments at all).  Safe to call once per process, before any other
    JAX API touches the backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "IMPG_COORDINATOR"
    )
    if num_processes is None and "IMPG_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["IMPG_NUM_PROCESSES"])
    if process_id is None and "IMPG_PROCESS_ID" in os.environ:
        process_id = int(os.environ["IMPG_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write user-facing output."""
    return jax.process_index() == 0


class DistributedEngine(ShardedEngine):
    """ShardedEngine over the GLOBAL device mesh of a multi-process run.

    Exposes the same `query_batch_stream` step API, so the transitive
    walkers (`query.engine.query_transitive_bfs_many`) run unmodified:
    each depth's batched stab+projection executes across every chip of
    every host, and the all_gather'd hits land identically on all
    processes.
    """

    def __init__(
        self,
        index: ImpgIndex,
        initial_capacity: int = 32,
        with_tracepoints: bool = False,
    ):
        mesh = Mesh(np.array(jax.devices()), ("shard",))
        super().__init__(
            index,
            mesh,
            initial_capacity=initial_capacity,
            with_tracepoints=with_tracepoints,
        )

    def _put_sharded(self, arr, sharding):
        # Only addressable shards are materialized on this process's
        # devices; the callback slices the host-RAM copy per device.
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def _replicate(self, arr):
        a = np.asarray(arr)
        return jax.make_array_from_callback(
            a.shape, self._repl_sharding, lambda idx: a[idx]
        )
