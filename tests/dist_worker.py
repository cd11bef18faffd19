"""Worker for tests/test_distributed.py: one process of a multi-process
CPU mesh running transitive BFS over the DistributedEngine.

Usage: python dist_worker.py <process_id> <num_processes> <port> <paf> <out>
"""

import json
import sys

import jax

# Force CPU before backend init (the axon sitecustomize pins
# jax_platforms to the TPU relay otherwise).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    pid, nproc, port, paf, out_path = sys.argv[1:6]
    from impg_tpu.parallel import distributed

    distributed.initialize(f"127.0.0.1:{port}", int(nproc), int(pid))
    assert jax.process_count() == int(nproc)

    from impg_tpu.index.impg_index import ImpgIndex
    from impg_tpu.query import engine

    index = ImpgIndex.from_paf_files([paf])
    # Deterministic walk set — every process derives the same batch.
    qrng = np.random.default_rng(9)
    names = [
        index.seq_index.get_name(i) for i in range(len(index.seq_index))
    ]
    targets = []
    for _ in range(12):
        tid = int(qrng.integers(len(names)))
        L = index.seq_index.get_len_from_id(tid)
        s = int(qrng.integers(0, max(1, L - 3000)))
        targets.append((tid, s, min(s + 3000, L)))

    eng = distributed.DistributedEngine(index, initial_capacity=64)
    blocks = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, device_engine=eng, columnar=True
    )
    rows = [
        sorted(
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in b.to_rows()
        )
        for b in blocks
    ]
    payload = {
        "process_index": jax.process_index(),
        "n_devices": len(jax.devices()),
        "local_devices": jax.local_device_count(),
        "primary": distributed.is_primary(),
        "rows": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
