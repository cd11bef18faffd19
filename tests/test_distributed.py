"""Cross-host engine: multi-process CPU mesh (Gloo collectives) running
the sharded transitive BFS — results must be identical on every process
and equal to the single-process host engine (parallel/distributed.py)."""

import json
import os
import random
import socket
import subprocess
import sys

from tests import datagen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_host(tmp_path):
    rng = random.Random(71)
    text, seqs, alns = datagen.pangenome_paf(rng, n_seqs=6, seq_len=15_000)
    paf = str(tmp_path / "d.paf")
    with open(paf, "w") as fh:
        fh.write(text)

    port = _free_port()
    n_proc = 2
    procs = []
    outs = []
    for pid in range(n_proc):
        out = str(tmp_path / f"out{pid}.json")
        outs.append(out)
        from tests.envutil import cpu_env

        env = cpu_env(XLA_FLAGS="--xla_force_host_platform_device_count=2")
        env.pop("JAX_PLATFORMS", None)  # dist_worker.py sets cpu via jax.config
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(REPO, "tests", "dist_worker.py"),
                    str(pid), str(n_proc), str(port), paf, out,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    stderrs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        stderrs.append(err)
    for p, err in zip(procs, stderrs):
        assert p.returncode == 0, err[-3000:]

    payloads = [json.load(open(o)) for o in outs]
    # 2 processes x 2 virtual devices = a 4-shard global mesh.
    assert all(pl["n_devices"] == 4 for pl in payloads)
    assert all(pl["local_devices"] == 2 for pl in payloads)
    assert [pl["primary"] for pl in sorted(
        payloads, key=lambda pl: pl["process_index"]
    )] == [True, False]
    # Bit-identical result rows on every process.
    assert payloads[0]["rows"] == payloads[1]["rows"]

    # And equal to the single-process host engine on the same walks.
    from impg_tpu.index.impg_index import ImpgIndex
    from impg_tpu.query import engine
    import numpy as np

    index = ImpgIndex.from_paf_files([paf])
    qrng = np.random.default_rng(9)
    targets = []
    for _ in range(12):
        tid = int(qrng.integers(len(index.seq_index)))
        L = index.seq_index.get_len_from_id(tid)
        s = int(qrng.integers(0, max(1, L - 3000)))
        targets.append((tid, s, min(s + 3000, L)))
    host = engine.query_transitive_bfs_many(index, targets, max_depth=2)
    want = [
        sorted(
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in rows
        )
        for rows in host
    ]
    got = [
        [tuple(r) for r in rows] for rows in payloads[0]["rows"]
    ]
    assert got == want
