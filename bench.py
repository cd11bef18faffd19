"""Benchmark: depth-2 transitive range queries/sec on one chip.

Workload: a synthetic multi-genome pangenome alignment set (mutation chains,
~real CIGAR op mix), indexed once; batches of random ranges are lifted
transitively (depth 2, BFS) — the reference's headline path
(main.rs:11605 perform_query -> impg.rs:2311 query_transitive_bfs) and the
BASELINE.json metric ("cerevisiae PAF, depth-2 transitive").

The device path batches every walk's per-depth stab+projection into one
jitted TPU step (engine.query_transitive_bfs_many); visited-range
bookkeeping stays on host, as in the reference.

Hardening (round 2):
  * The TPU backend is probed in a SUBPROCESS with retry + backoff before
    the main process ever touches jax — one flaky relay moment no longer
    erases the round's evidence, and a hard failure emits structured JSON
    (`"tpu_unavailable": true`, `"error": ...`) instead of a traceback.
  * The device measurement is best-of-N in-process reps with a reported
    relative spread (the shared chip varies 2-3x between runs).
  * The baseline is HONEST: the reference engine is multithreaded (rayon
    over trees/records, impg.rs:1553-1633), so we report the speedup vs
    both the single-threaded host engine (`vs_baseline_1t`) and a fork-pool
    all-cores host run of the same semantics (`vs_baseline`, the headline).

Prints ONE JSON line:
  metric       "transitive_queries_per_sec_per_chip"
  value        steady-state depth-2 transitive queries/s (batched device;
               best of N reps)
  unit         "queries/s"
  vs_baseline  speedup vs the strongest CPU run of the same semantics
               (all-cores fork-pool host engine) — the closest available
               stand-in for the rayon-parallel Rust reference, which cannot
               be built in this image (no cargo).
"""

from __future__ import annotations

import json
import multiprocessing
import os
import random
import subprocess
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_SEQS = 40
SEQ_LEN = 400_000
CROSS_LINKS = 8  # denser interval fan-out (closer to an all-vs-all pangenome PAF)
BATCH = 1024
N_BATCHES_TIMED = 5
RANGE_MIN, RANGE_MAX = 10_000, 100_000
MAX_DEPTH = 2
DEVICE_REPS = 4  # best-of-N (shared axon chip: throughput varies 2-3x)
HOST_1T_BUDGET_S = 45.0
HOST_MT_BUDGET_S = 60.0
PROBE_BACKOFFS_S = (0.0, 20.0, 45.0, 90.0)  # retry schedule for relay init
PROBE_TIMEOUT_S = 300.0  # per attempt (cold axon init can take minutes)


def build_workload():
    from impg_tpu.index.impg_index import load_or_build
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


# ── TPU probe ────────────────────────────────────────────────────────────

_PROBE_SRC = """
import sys, time
t0 = time.time()
import jax, jax.numpy as jnp
devs = jax.devices()
plat = devs[0].platform
y = (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
print("PROBE_OK platform=%s n=%d init_s=%.1f" % (plat, len(devs), time.time() - t0))
sys.exit(0 if plat not in ("cpu",) else 3)
"""


def probe_tpu():
    """Probe TPU init in a subprocess with retry + backoff.

    A failed jax backend init is cached process-wide, so probing in the
    main process would poison the real run; a subprocess probe is free to
    fail and retry. Returns (ok, diagnostics-dict).
    """
    attempts = []
    for i, backoff in enumerate(PROBE_BACKOFFS_S):
        if backoff:
            time.sleep(backoff)
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            )
            out = (proc.stdout + proc.stderr).strip().splitlines()
            tail = out[-1][:300] if out else ""
            attempts.append({
                "rc": proc.returncode, "seconds": round(time.time() - t0, 1),
                "tail": tail,
            })
            if proc.returncode == 0 and "PROBE_OK" in proc.stdout:
                return True, {"attempts": attempts}
        except subprocess.TimeoutExpired:
            attempts.append({
                "rc": None, "seconds": round(time.time() - t0, 1),
                "tail": "probe timeout after %.0fs" % PROBE_TIMEOUT_S,
            })
    return False, {"attempts": attempts}


# ── Host baselines ───────────────────────────────────────────────────────

def bench_host_1t(index, batches, budget_s: float = HOST_1T_BUDGET_S):
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


_MT_INDEX = None  # set in the parent pre-fork; inherited by workers (COW)


def _mt_worker(chunk):
    from impg_tpu.query import engine

    for tid, s, e in chunk:
        engine.query_transitive_bfs(_MT_INDEX, tid, s, e, max_depth=MAX_DEPTH)
    return len(chunk)


def bench_host_mt(index, batches, qps_1t: float,
                  budget_s: float = HOST_MT_BUDGET_S):
    """All-cores host run: fork-pool over walks, same engine semantics.

    Models the reference's rayon parallelism (impg.rs:1553-1633: data-
    parallel iterators over trees/records). Fork inherits the built index
    with no pickling; must run BEFORE any jax backend init in this process.
    """
    global _MT_INDEX
    nproc = os.cpu_count() or 1
    queries = [q for walk in batches[1:] for q in walk]
    # Size the run to the budget from the measured 1t rate (perfect-scaling
    # upper bound estimate), so a slow box doesn't blow the bench budget.
    want = int(max(nproc * 4, qps_1t * nproc * budget_s * 0.8))
    queries = queries[:max(nproc, min(len(queries), want))]
    n_chunks = nproc * 4  # oversplit for load balance, rayon-style
    chunks = [queries[i::n_chunks] for i in range(n_chunks)]
    chunks = [c for c in chunks if c]
    _MT_INDEX = index
    ctx = multiprocessing.get_context("fork")
    t0 = time.perf_counter()
    with ctx.Pool(nproc) as pool:
        done = sum(pool.map(_mt_worker, chunks))
    dt = time.perf_counter() - t0
    _MT_INDEX = None
    return done / dt, nproc


# ── Device benches ───────────────────────────────────────────────────────

def bench_device(index, batches, approximate=False, reps=DEVICE_REPS):
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
    rep_qps, rows, best_dt = [], 0, None
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        # Columnar result blocks: rows stay flat arrays (the engine's native
        # currency); Row objects only materialize in writers that need them.
        res = engine.query_transitive_bfs_many(
            index, walks, max_depth=MAX_DEPTH, device_engine=dev,
            approximate=approximate, columnar=True,
        )
        dt = time.perf_counter() - t0
        rows = sum(len(r) for r in res)
        rep_qps.append(len(walks) / dt)
        best_dt = dt if best_dt is None else min(best_dt, dt)
    return rep_qps, rows, best_dt


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

    # Columnar transform passes on the same graph (reference anchors:
    # docs/crush-perf-report.md — parse 50 ms / validate 136 ms / render
    # 317 ms on a 115 MiB graph): spelling validation (the crush round's
    # hot pass) and the full columnar gs sort pipeline.
    validate_ms = sort_ms = None
    try:
        from impg_tpu.graph import columnar_ops as co
        from impg_tpu.graph import sortgfa
        from impg_tpu.graph.gfa_columns import parse_gfa_columns

        text = raw.decode()
        gc = parse_gfa_columns(text)
        if gc is not None:
            expected = co.path_spellings(gc)
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                co.validate_text_spellings(text, expected)
                dt2 = time.perf_counter() - t0
                best = dt2 if best is None else min(best, dt2)
            validate_ms = best * 1e3
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                sortgfa.sort_pipeline(text, "gs")
                dt2 = time.perf_counter() - t0
                best = dt2 if best is None else min(best, dt2)
            sort_ms = best * 1e3
    except Exception:
        pass
    return (
        round(syng_ms, 1),
        round(gfa_mibs, 1) if gfa_mibs is not None else None,
        round(validate_ms, 1) if validate_ms is not None else None,
        round(sort_ms, 1) if sort_ms is not None else None,
        round(len(raw) / 2**20, 1),
    )


def main():
    index, batches = build_workload()

    # Host baselines FIRST (fork-safe: no jax backend in this process yet).
    qps_1t = bench_host_1t(index, batches)
    qps_mt, nproc = bench_host_mt(index, batches, qps_1t)

    (syng_build_ms, gfa_parse_mibs, gfa_validate_ms, gfa_sort_ms,
     gfa_size_mib) = bench_headlines()

    detail = {
        "directed_records": len(index.records),
        "arena_runs": int(index.arena.n_ops),
        "batch": BATCH,
        "batches_timed": N_BATCHES_TIMED,
        "max_depth": MAX_DEPTH,
        "host_engine_qps_1t": round(qps_1t, 2),
        "host_engine_qps_mt": round(qps_mt, 2),
        "host_threads": nproc,
        "baseline_note": (
            "vs_baseline = device qps / all-cores fork-pool host engine "
            "(same semantics; stand-in for the rayon-parallel Rust "
            "reference, which cannot be built in this image)"
        ),
        "syng_build_ms_c4_scale_4t": syng_build_ms,
        "gfa_native_tokenize_mib_s": gfa_parse_mibs,
        "gfa_bench_graph_mib": gfa_size_mib,
        "gfa_columnar_validate_ms": gfa_validate_ms,
        "gfa_columnar_sort_gs_ms": gfa_sort_ms,
    }

    ok, probe = probe_tpu()
    detail["tpu_probe"] = probe
    if not ok:
        # Structured degradation: headline falls back to the strongest CPU
        # number with an explicit unavailability flag — never a traceback.
        result = {
            "metric": "transitive_queries_per_sec_per_chip",
            "value": round(qps_mt, 2),
            "unit": "queries/s",
            "vs_baseline": 1.0,
            "tpu_unavailable": True,
            "error": "axon TPU backend failed to initialize after "
                     f"{len(PROBE_BACKOFFS_S)} probe attempts",
            "detail": detail,
        }
        print(json.dumps(result))
        return

    index.ensure_tracepoints(100)
    rep_qps, rows, best_dt = bench_device(index, batches)
    approx_reps, _, _ = bench_device(index, batches, approximate=True, reps=2)
    qps_device = max(rep_qps)

    detail.update({
        "result_rows": int(rows),
        "result_rows_per_sec": round(rows / best_dt, 2),
        "device_reps_qps": [round(q, 2) for q in rep_qps],
        "device_qps_spread": round(max(rep_qps) / max(min(rep_qps), 1e-9), 2),
        "approximate_mode_qps": round(max(approx_reps), 2),
        "vs_baseline_1t": round(qps_device / qps_1t, 2),
    })
    result = {
        "metric": "transitive_queries_per_sec_per_chip",
        "value": round(qps_device, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps_device / qps_mt, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never a bare traceback on the record
        print(json.dumps({
            "metric": "transitive_queries_per_sec_per_chip",
            "value": 0,
            "unit": "queries/s",
            "vs_baseline": 0,
            "error": f"{type(exc).__name__}: {exc}",
            "trace_tail": traceback.format_exc()[-1500:],
        }))
        sys.exit(0)
