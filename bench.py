"""Benchmark: depth-2 transitive range queries/sec on one chip.

Workload: a synthetic multi-genome pangenome alignment set (mutation chains,
~real CIGAR op mix), indexed once; batches of random ranges are lifted
transitively (depth 2, BFS) — the reference's headline path
(main.rs:11605 perform_query -> impg.rs:2311 query_transitive_bfs) and the
BASELINE.json metric ("cerevisiae PAF, depth-2 transitive").

The device path batches every walk's per-depth stab+projection into one
jitted TPU step (engine.query_transitive_bfs_many); visited-range
bookkeeping stays on host, as in the reference.

Prints ONE JSON line:
  metric       "transitive_queries_per_sec_per_chip"
  value        steady-state depth-2 transitive queries/s (batched device)
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
CROSS_LINKS = 8  # denser interval fan-out (closer to an all-vs-all pangenome PAF)
BATCH = 1024
N_BATCHES_TIMED = 5
RANGE_MIN, RANGE_MAX = 10_000, 100_000
MAX_DEPTH = 2


def build_workload():
    from impg_tpu.index.impg_index import ImpgIndex, load_or_build
    from tests import datagen

    # Cache the synthetic PAF so repeated bench runs measure the engine,
    # not Python data generation.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"pangenome_{N_SEQS}x{SEQ_LEN}x{CROSS_LINKS}"
    paf_path = os.path.join(cache_dir, tag + ".paf")
    if not os.path.exists(paf_path):
        rng = random.Random(20260817)
        text, seqs, alns = datagen.pangenome_paf(
            rng, n_seqs=N_SEQS, seq_len=SEQ_LEN, cross_links=CROSS_LINKS
        )
        with open(paf_path, "w") as fh:
            fh.write(text)
    index = load_or_build([paf_path])
    seqs = {
        index.seq_index.get_name(i): index.seq_index.get_len_from_id(i)
        for i in range(len(index.seq_index))
    }

    qrng = np.random.default_rng(7)
    names = list(seqs)
    batches = []
    for _ in range(N_BATCHES_TIMED + 1):
        walk = []
        for _ in range(BATCH):
            name = names[qrng.integers(len(names))]
            L = seqs[name]
            span = int(qrng.integers(RANGE_MIN, RANGE_MAX))
            s = int(qrng.integers(0, max(1, L - span)))
            walk.append(
                (index.seq_index.get_id(name), s, min(s + span, L))
            )
        batches.append(walk)
    return index, batches


def bench_device(index, batches, approximate=False):
    from impg_tpu.query import engine
    from impg_tpu.query.device import DeviceEngine

    dev = DeviceEngine(index, with_tracepoints=approximate)
    # All timed walks go through ONE multi-walk call — the `-b BED -x`
    # batch path: every depth's stab+projection for all walks is pipelined
    # chunk dispatches with a single sync per depth.  Warm up with the same
    # shape so compile + window-capacity settle are excluded (steady state).
    walks = [q for walk in batches[1:] for q in walk]
    engine.query_transitive_bfs_many(
        index, batches[0], max_depth=MAX_DEPTH, device_engine=dev,
        approximate=approximate, columnar=True,
    )
    engine.query_transitive_bfs_many(
        index, walks, max_depth=MAX_DEPTH, device_engine=dev,
        approximate=approximate, columnar=True,
    )
    t0 = time.perf_counter()
    # Columnar result blocks: rows stay flat arrays (the engine's native
    # currency); Row objects only materialize in writers that need them.
    res = engine.query_transitive_bfs_many(
        index, walks, max_depth=MAX_DEPTH, device_engine=dev,
        approximate=approximate, columnar=True,
    )
    rows = sum(len(r) for r in res)
    dt = time.perf_counter() - t0
    return len(walks) / dt, rows, dt


def bench_host(index, batches, budget_s: float = 60.0):
    from impg_tpu.query import engine

    t0 = time.perf_counter()
    done = 0
    for walk in batches[1:]:
        for tid, s, e in walk:
            engine.query_transitive_bfs(index, tid, s, e, max_depth=MAX_DEPTH)
            done += 1
            if time.perf_counter() - t0 > budget_s:
                return done / (time.perf_counter() - t0)
    return done / (time.perf_counter() - t0)


def bench_headlines():
    """Reference-headline side metrics: C4-scale syng build (README.md:315
    ~80 ms @ 4 threads) and native GFA tokenize rate (crush parse,
    docs/crush-perf-report.md ~115 MiB in 50 ms)."""
    import numpy as np_

    rng = random.Random(5)
    base = "".join(rng.choice("ACGT") for _ in range(77_000))
    seqs = []
    for i in range(90):
        b = list(base)
        for _ in range(300):
            p = rng.randrange(len(b))
            b[p] = rng.choice("ACGT")
        seqs.append((f"hap{i}#1#chr1", "".join(b).encode()))
    from impg_tpu.syng.index import SyngIndex

    SyngIndex.build(seqs[:4], threads=4)  # warm (native lib load)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        SyngIndex.build(seqs, threads=4)
        ts.append(time.perf_counter() - t0)
    syng_ms = min(ts) * 1e3

    lines = ["H\tVN:Z:1.0"]
    n_nodes = 120_000
    g2 = np_.random.default_rng(1)
    for i in range(1, n_nodes + 1):
        lines.append(f"S\t{i}\t" + "A" * int(g2.integers(8, 128)))
    for i in range(1, n_nodes):
        lines.append(f"L\t{i}\t+\t{i+1}\t+\t0M")
    ids = np_.arange(1, n_nodes + 1)
    for p in range(20):
        steps = ",".join(f"{i}+" for i in ids[p::7][:15_000])
        lines.append(f"P\tpath{p}\t{steps}\t*")
    raw = ("\n".join(lines) + "\n").encode()
    from impg_tpu.io import native as native_mod

    lib = native_mod.load()
    gfa_mibs = None
    if lib is not None and hasattr(lib, "impg_gfa_parse"):
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            h = lib.impg_gfa_parse(raw, len(raw))
            dt2 = time.perf_counter() - t0
            lib.impg_gfa_free(h)
            best = dt2 if best is None else min(best, dt2)
        gfa_mibs = len(raw) / 2**20 / best
    return round(syng_ms, 1), (
        round(gfa_mibs, 1) if gfa_mibs is not None else None
    )


def main():
    index, batches = build_workload()
    qps_device, rows, dt = bench_device(index, batches)
    index.ensure_tracepoints(100)
    qps_approx, _, _ = bench_device(index, batches, approximate=True)
    qps_host = bench_host(index, batches)
    syng_build_ms, gfa_parse_mibs = bench_headlines()
    result = {
        "metric": "transitive_queries_per_sec_per_chip",
        "value": round(qps_device, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps_device / qps_host, 2),
        "detail": {
            "directed_records": len(index.records),
            "arena_runs": int(index.arena.n_ops),
            "batch": BATCH,
            "batches_timed": N_BATCHES_TIMED,
            "max_depth": MAX_DEPTH,
            "result_rows": int(rows),
            "result_rows_per_sec": round(rows / dt, 2),
            "host_engine_qps": round(qps_host, 2),
            "approximate_mode_qps": round(qps_approx, 2),
            "syng_build_ms_c4_scale_4t": syng_build_ms,
            "gfa_native_tokenize_mib_s": gfa_parse_mibs,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
