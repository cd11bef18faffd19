"""Benchmark: batched range queries/sec on one chip.

Workload: a synthetic multi-genome pangenome alignment set (mutation chains +
cross alignments, ~real CIGAR op mix), indexed once; then batches of random
ranges are stabbed + projected through the device engine (the reference hot
path: main.rs:11605 perform_query -> impg.rs:1852 query).

Prints ONE JSON line:
  metric       "range_queries_per_sec_per_chip"
  value        steady-state queries/s for the batched device path
  unit         "queries/s"
  vs_baseline  speedup vs the single-threaded host (numpy) engine on the
               same workload — a stand-in for the reference Rust path, which
               cannot be built in this image (no cargo).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SEQS = 40
SEQ_LEN = 400_000
BATCH = 256
N_BATCHES_TIMED = 10
RANGE_MIN, RANGE_MAX = 10_000, 100_000


def build_workload():
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.index.impg_index import ImpgIndex
    from impg_tpu.io import paf as paf_mod
    import impg_tpu.core.arena as arena_mod
    from tests import datagen

    rng = random.Random(20260817)
    text, seqs, alns = datagen.mutate_chain_paf(
        rng, n_seqs=N_SEQS, seq_len=SEQ_LEN
    )
    seq_index = SequenceIndex()
    recs = paf_mod.parse_paf_bytes(text.encode(), seq_index)
    records, arena = arena_mod.build_directed(
        query_id=recs.query_id,
        q_start=recs.q_start,
        q_end=recs.q_end,
        target_id=recs.target_id,
        t_start=recs.t_start,
        t_end=recs.t_end,
        strand=recs.strand,
        runs=recs.runs,
        run_offsets=recs.run_offsets,
    )
    index = ImpgIndex._finalize(seq_index, records, arena, ["<synthetic>"])

    qrng = np.random.default_rng(7)
    names = list(seqs)
    batches = []
    for _ in range(N_BATCHES_TIMED + 2):
        q_tid, q_s, q_e = [], [], []
        for _ in range(BATCH):
            name = names[qrng.integers(len(names))]
            L = seqs[name]
            span = int(qrng.integers(RANGE_MIN, RANGE_MAX))
            s = int(qrng.integers(0, max(1, L - span)))
            q_tid.append(index.seq_index.get_id(name))
            q_s.append(s)
            q_e.append(min(s + span, L))
        batches.append(
            (
                np.array(q_tid, np.int32),
                np.array(q_s, np.int32),
                np.array(q_e, np.int32),
            )
        )
    return index, batches


def bench_device(index, batches):
    from impg_tpu.query.device import DeviceEngine

    dev = DeviceEngine(index)
    # Warmup (compile + capacity settle) on the spare batches.
    dev.query_batches(batches[:2])
    t0 = time.perf_counter()
    outs = dev.query_batches(batches[2:])
    dt = time.perf_counter() - t0
    hits = sum(o["pair_q"].size for o in outs)
    n_queries = sum(b[0].size for b in batches[2:])
    return n_queries / dt, hits, dt


def bench_host(index, batches, budget_s: float = 60.0):
    from impg_tpu.query import engine

    t0 = time.perf_counter()
    done = 0
    for b in batches[2:]:
        for tid, s, e in zip(*b):
            engine.query(index, int(tid), int(s), int(e))
            done += 1
            if time.perf_counter() - t0 > budget_s:
                return done / (time.perf_counter() - t0)
    return done / (time.perf_counter() - t0)


def main():
    index, batches = build_workload()
    qps_device, hits, dt = bench_device(index, batches)
    qps_host = bench_host(index, batches)
    result = {
        "metric": "range_queries_per_sec_per_chip",
        "value": round(qps_device, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps_device / qps_host, 2),
        "detail": {
            "directed_records": len(index.records),
            "arena_runs": int(index.arena.n_ops),
            "batch": BATCH,
            "batches_timed": N_BATCHES_TIMED,
            "projected_intervals": int(hits),
            "projected_intervals_per_sec": round(hits / dt, 2),
            "host_engine_qps": round(qps_host, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
