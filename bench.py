"""Benchmark: depth-2 transitive range queries/sec, with an executor survey.

Workloads (both synthetic multi-genome pangenome alignment sets with
~real CIGAR op mixes, indexed once and cached under .bench_cache/):

  * mid   — 40 seqs x 400 kb, 704 directed records / 847k arena runs
            (rounds 1-2 continuity workload).
  * scale — THE HEADLINE TIER: 2,000 seqs x 150 kb, 5.0M directed
            records / ~2.6B arena runs with the yeast-fitted realistic
            CIGAR mixture (~520 runs/record mean, 18.4 runs/kb aligned,
            bimodal alignment lengths — fitted from the reference's own
            yeast chrV all-vs-all PAF): the "hundreds of genomes" regime
            the reference headlines (README.md:13-14), with real
            per-projection CIGAR work.
  * scale_short — rounds 3-4 diagnostic: same 5M records with ~21-run
            CIGARs (stab/visited stress, no CIGAR amortization — the
            shape where closed-form projection cannot win big).

The measured question is the reference's headline path
(main.rs:11605 perform_query -> impg.rs:2311 query_transitive_bfs):
batches of random gene-scale ranges lifted transitively (depth 2, BFS).

Executor survey (same semantics, bit-identical rows, tests/test_host_native.py):

  * python host engine, 1 thread + all-cores fork pool (rounds 1-2 baseline)
  * native C++ PAF engine (native/host_engine.cpp mode=paf): the
    Rust-proxy baseline of record — the reference's DEFAULT-path cost
    model: per projection, re-parse the record's whole ASCII cg:Z:
    CIGAR (the reference preads + byte-scans it on every get_cigar_ops,
    impg.rs:495-530, :2935 parse_cigar_to_delta), then walk linearly;
    kept generous (ASCII resident in RAM — no pread syscall, no Vec
    alloc).  Data-parallel across threads like rayon
    (impg.rs:1553-1633).  Rust itself cannot be built in this image.
  * native C++ WALK engine (mode=walk): the reference design UPGRADED
    with our resident-arena layout — interval stab + linear per-op run
    walk over pre-parsed runs (impg.rs:2760-2898, minus the re-parse).
    walk/paf isolates the resident-arena design win.
  * native C++ CLOSED engine (mode=closed): our own algorithm on CPU —
    interval stab + closed-form two-binary-search projection.
    closed/walk isolates the algorithm win.
  * TPU device engine (query/device.py slotted execution), exact +
    approximate, through the axon relay; plus compute-only roofline
    decomposition (see below).

Workloads: mid (continuity), scale (record count), deep (realistic
long-CIGAR alignment shape — hundreds of genomes, 30-120 kb alignments,
~2,500-run CIGARs, where per-projection CIGAR handling dominates).

`value`/`vs_baseline` = the framework's throughput under its DEFAULT
executor (`--compute-engine auto` routes default-filter transitive
queries to the C++ closed engine — cli.py:_resolve_compute_engine),
WITH result-row materialization, versus the PAF engine on all cores
(counts only — generous) on the SCALE workload (5M records, realistic
CIGARs, 2,048 queries).  Per-tier vs_paf_mt / vs_walk_mt ratios are
reported in detail.

Device decomposition & roofline (detail.device_scale / detail.roofline):
the transitive query is pointer-chasing (binary searches over run
arenas) plus result materialization.  The bench reports measured
device-step lanes/s, the derived random-access bytes/s against the
chip's HBM bandwidth, the host<->device link rate, and an MXU sidecar
(the genotype Gram-scoring matmul, genotype/core.py
diploid_cosine_matrix_device) with achieved TFLOP/s and MFU — so "where
does the gap live" is quantified rather than asserted.

Prints ONE compact JSON line (the driver parses the last stdout line and
truncates long output — round 3's full-detail line exceeded that and was
recorded as unparsed, so the survey now goes to bench_detail.json):
  metric       "transitive_queries_per_sec"
  value        scale-workload (5M records, realistic CIGARs) queries/s
               under the framework's default (auto) executor
  unit         "queries/s"
  vs_baseline  value / C++ PAF-engine all-cores run (Rust-proxy cost model)
  summary      one small dict of per-tier key numbers
  detail_file  "bench_detail.json" (full executor survey + roofline +
               gap analysis, written next to this script)
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

# ── mid workload (rounds 1-2 continuity) ─────────────────────────────────
N_SEQS = 40
SEQ_LEN = 400_000
CROSS_LINKS = 8
BATCH = 1024
N_BATCHES_TIMED = 5
RANGE_MIN, RANGE_MAX = 10_000, 100_000
MAX_DEPTH = 2
DEVICE_REPS = 4  # best-of-N (shared axon chip: throughput varies 2-3x)
HOST_1T_BUDGET_S = 30.0
HOST_MT_BUDGET_S = 45.0
PROBE_BACKOFFS_S = (0.0, 20.0, 45.0, 90.0)
PROBE_TIMEOUT_S = 300.0

# ── scale workload (the headline tier): >=5M records, realistic CIGARs ──
# Yeast-fitted CIGAR-shape mixture (tests/datagen.realistic_directed_index;
# 18.4 runs/kb aligned + bimodal alignment lengths measured from the
# reference's own yeast chrV all-vs-all PAF) — ~520 runs/record mean, the
# shape of real pangenome PAFs.  VERDICT r4 #1: the headline value and
# vs_baseline come from THIS tier.
SCALE_N_SEQS = 2000
SCALE_SEQ_LEN = 150_000
SCALE_N_ALN = 2_500_000   # -> 5.0M directed records, ~2.6B arena runs
SCALE_QUERIES = 2048      # gene-ish 10-50 kb ranges (VERDICT r4: >=2048)
SCALE_DEVICE_QUERIES = 256

# ── scale-short diagnostic (rounds 3-4 "scale" tier): 5M records with
# ~21-run CIGARs — stab/visited stress with almost no per-projection
# CIGAR work.  Kept on the record because it is the shape where the
# closed-form projection has nothing to amortize (r4: 0.92x vs paf).
SHORT_N_SEQS = 2000
SHORT_SEQ_LEN = 150_000
SHORT_N_ALN = 2_500_000
SHORT_QUERIES = 512

# ── deep workload (realistic alignment SHAPE) ────────────────────────────
# Hundreds of genomes x 30-120 kb alignments with 800-3200-run CIGARs —
# the shape of the reference's headline inputs (wfmash/FastGA pangenome
# PAFs; README.md:13 "hundreds of genomes").  The scale tier above has
# only ~21 runs/record, which understates per-projection CIGAR work;
# this tier is where the projection algorithm itself is measured.
DEEP_N_SEQS = 500
DEEP_SEQ_LEN = 500_000
DEEP_N_ALN = 125_000     # -> 250k directed records, ~250M runs
DEEP_QUERIES = 96
V5E_HBM_GBPS = 819.0     # v5e HBM bandwidth
V5E_BF16_TFLOPS = 197.0  # v5e MXU peak, bf16

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_cache")


def build_mid_workload():
    from impg_tpu.index.impg_index import load_or_build
    from tests import datagen

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = f"pangenome_{N_SEQS}x{SEQ_LEN}x{CROSS_LINKS}"
    paf_path = os.path.join(CACHE_DIR, tag + ".paf")
    if not os.path.exists(paf_path):
        rng = random.Random(20260817)
        text, _seqs, _alns = datagen.pangenome_paf(
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


def load_scale_index():
    """Load (or regenerate) the realistic 5M-record / ~2.6B-run index.

    Regeneration is deterministic (tests/datagen.realistic_directed_index)
    but takes ~15-25 min and ~60 GiB RAM; the ~50 GiB .impgt artifact is
    cached across bench runs."""
    from impg_tpu.index.impg_index import ImpgIndex

    path = os.path.join(CACHE_DIR, "big_real.impgt")
    if not os.path.exists(path):
        from tests.datagen import realistic_directed_index

        idx = realistic_directed_index(
            n_seqs=SCALE_N_SEQS, seq_len=SCALE_SEQ_LEN, n_aln=SCALE_N_ALN
        )
        idx.save(path)
        return idx
    return ImpgIndex.load(path)


def load_short_index():
    """Load (or regenerate) the short-CIGAR 5M-record diagnostic index."""
    from impg_tpu.index.impg_index import ImpgIndex

    path = os.path.join(CACHE_DIR, "big_5m.impgt")
    if not os.path.exists(path):
        from tests.datagen import big_directed_index

        idx = big_directed_index(
            n_seqs=SHORT_N_SEQS, seq_len=SHORT_SEQ_LEN, n_aln=SHORT_N_ALN
        )
        idx.save(path)
        return idx
    return ImpgIndex.load(path)


def scale_queries(index, n, seq_len=SCALE_SEQ_LEN):
    qr = np.random.default_rng(7)
    S = len(index.seq_index)
    targets = []
    for _ in range(n):
        tid = int(qr.integers(S))
        span = int(qr.integers(10_000, 50_000))
        s = int(qr.integers(0, seq_len - span))
        targets.append((tid, s, s + span))
    return targets


def load_deep_index():
    """Load (or regenerate) the deep-CIGAR index (cached .impgt)."""
    from impg_tpu.index.impg_index import ImpgIndex

    path = os.path.join(CACHE_DIR, "deep_250k.impgt")
    if not os.path.exists(path):
        from tests.datagen import big_directed_index

        idx = big_directed_index(
            seed=2, n_seqs=DEEP_N_SEQS, seq_len=DEEP_SEQ_LEN,
            n_aln=DEEP_N_ALN, edits_lo=400, edits_hi=1600,
        )
        idx.save(path)
        return idx
    return ImpgIndex.load(path)


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
    for backoff in PROBE_BACKOFFS_S:
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
    """All-cores python host run: fork-pool over walks, same semantics.

    Rounds 1-2 used this as the headline denominator; it is kept for
    continuity but superseded by the C++ walk engine (a ~50x stronger
    Rust proxy).  Fork inherits the built index with no pickling; must
    run BEFORE any jax backend init in this process.
    """
    global _MT_INDEX
    nproc = os.cpu_count() or 1
    queries = [q for walk in batches[1:] for q in walk]
    want = int(max(nproc * 4, qps_1t * nproc * budget_s * 0.8))
    queries = queries[:max(nproc, min(len(queries), want))]
    n_chunks = nproc * 4
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


def bench_native(index, targets, reps: int = 3,
                 mode_budget_s: float = 45.0, targets_1t=None):
    """C++ engine survey on one workload: paf/walk/closed x 1t/all-cores.

    paf = the reference's default-path cost model (full ASCII CIGAR
    re-parse per projection, impg.rs:495-530 + :2935) — the vs_baseline
    denominator.  walk = the reference design upgraded with our resident
    run arena (no re-parse).  closed = our closed-form algorithm.

    Returns ({mode_tag: qps}, rows, engine) — rows is the exact result
    row count over `targets` (identical across all executors).  A
    (mode, threads) cell whose first rep exceeds `mode_budget_s` reports
    that single rep.  `targets_1t`, when given, is an iid subset used for
    the single-thread cells (the big tiers would otherwise spend minutes
    per 1t mode; qps extrapolates since queries are iid draws)."""
    from impg_tpu.query.host_native import NativeHostEngine

    try:
        ne = NativeHostEngine(index)
    except Exception:
        return {}, 0, None
    ne.ensure_paf_baseline()  # resident cg:Z: blob, built outside timing
    nproc = os.cpu_count() or 1
    out, rows = {}, 0
    for mode in ("paf", "walk", "closed"):
        for th in (1, nproc):
            tset = targets if (th != 1 or targets_1t is None) else targets_1t
            best = None
            for r in range(reps):
                t0 = time.perf_counter()
                got = ne.run_counts(
                    tset, max_depth=MAX_DEPTH, mode=mode, threads=th
                )
                if tset is targets:
                    rows = got
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                if dt > mode_budget_s:
                    break
            tag = f"{mode}_{'1t' if th == 1 else f'{th}t'}"
            out[tag] = round(len(tset) / best, 2)
    return out, rows, ne


def bench_auto(index, targets, reps: int = 3, chunk: int = 0):
    """The framework's default executor, through the product dispatch
    (engine.query_transitive_bfs_many with the auto-resolved engine).

    `chunk` > 0 runs the batch in independent chunks and frees each
    chunk's rows before the next — the realistic scale tier emits
    ~650k rows/query, so a monolithic 2048-query materialization would
    hold ~60 GiB of row buffers next to the 52 GiB arena."""
    from impg_tpu.query import engine

    try:
        from impg_tpu.query.host_native import NativeHostEngine

        eng = NativeHostEngine(index)  # what `auto` resolves to (cli.py)
    except Exception:
        eng = None  # native lib missing: auto falls back to python host
    best, rows = None, 0
    step = chunk if chunk > 0 else len(targets)
    for _ in range(reps):
        t0 = time.perf_counter()
        total_rows = 0
        for off in range(0, len(targets), step):
            res = engine.query_transitive_bfs_many(
                index, targets[off:off + step], max_depth=MAX_DEPTH,
                device_engine=eng, columnar=True,
            )
            total_rows += sum(len(r) for r in res)
            del res
        dt = time.perf_counter() - t0
        rows = total_rows
        best = dt if best is None else min(best, dt)
    return len(targets) / best, rows, best


# ── Device benches ───────────────────────────────────────────────────────

def bench_device(index, batches, approximate=False, reps=DEVICE_REPS):
    from impg_tpu.query import engine
    from impg_tpu.query.device import DeviceEngine

    dev = DeviceEngine(index, with_tracepoints=approximate)
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
        res = engine.query_transitive_bfs_many(
            index, walks, max_depth=MAX_DEPTH, device_engine=dev,
            approximate=approximate, columnar=True,
        )
        dt = time.perf_counter() - t0
        rows = sum(len(r) for r in res)
        rep_qps.append(len(walks) / dt)
        best_dt = dt if best_dt is None else min(best_dt, dt)
    return rep_qps, rows, best_dt


def bench_device_scale(index):
    """At-scale device evidence: end-to-end engine q/s + the roofline
    decomposition (step lanes/s, derived random-access GB/s vs HBM,
    host<->device link MB/s)."""
    import jax
    import jax.numpy as jnp

    from impg_tpu.query import engine
    from impg_tpu.query.device import DeviceEngine, slot_query_step
    from impg_tpu.query.engine import LEAN_FIELDS

    # Dense workload: ~90% of lanes hit, so compaction's sort buys
    # nothing and the truncation-doubling ladder would cost one ~80s
    # remote compile per cap step.  Pin it off (single executable).
    os.environ["IMPG_SLOT_CAP"] = "none"
    d = {}
    t0 = time.perf_counter()
    dev = DeviceEngine(index)
    for v in dev.dindex.arena.values():
        v.block_until_ready()
    float(dev.dindex.t_end[0])  # scalar fetch = reliable fence
    d["arena_resident_gib"] = round(
        sum(int(v.size) * 4 for v in dev.dindex.arena.values()) / 2**30, 2
    )
    d["upload_s"] = round(time.perf_counter() - t0, 1)

    # Roofline: one slot-step executable, timed hot.
    targets = scale_queries(index, 2048)
    q_tid = np.asarray([t[0] for t in targets], np.int32)
    q_s = np.asarray([t[1] for t in targets], np.int32)
    q_e = np.asarray([t[2] for t in targets], np.int32)
    win_lo, k = dev._host_windows(q_tid, q_s, q_e)
    slot_lo, slot_k, slot_q = dev._build_slots(win_lo, k)
    SC, K = dev.slot_chunk, dev.k_slot
    n = min(SC, slot_lo.size)
    cols = (
        jnp.asarray(np.resize(slot_lo[:n].astype(np.int32), SC)),
        jnp.asarray(np.resize(slot_k[:n].astype(np.int32), SC)),
        jnp.asarray(np.resize(q_s[slot_q[:n]], SC)),
        jnp.asarray(np.resize(q_e[slot_q[:n]], SC)),
    )

    def step():
        return slot_query_step(
            dev.dindex, *cols, k_slot=K, cap=None, clip_overlap=True,
            id_bits=dev.slot_id_bits, fields=LEAN_FIELDS,
        )

    def fence(m):
        # block_until_ready through the axon relay can return before the
        # kernel finishes; fetching one scalar cannot.
        return float(m[1, -1])

    t0 = time.perf_counter()
    fence(step())
    d["step_compile_s"] = round(time.perf_counter() - t0, 1)
    fence(step())  # warm
    reps = 4
    t0 = time.perf_counter()
    mats = [step() for _ in range(reps)]
    fence(mats[-1])  # device streams execute in order: last fences all
    best = (time.perf_counter() - t0) / reps
    lanes = SC * K
    d["step_ms"] = round(best * 1e3, 1)
    d["step_mlanes_per_s"] = round(lanes / best / 1e6, 2)
    # Bytes-touched model per lane: the closed-form projection does two
    # binary searches over the record's run span (~2*log2(runs/record)
    # random 4B reads) plus ~10 record-field reads; the stab reads the
    # slot window's t_start/cummax lanes (2 x 4B, near-sequential).
    runs_per_rec = max(2.0, index.arena.n_ops / max(1, len(index.records)))
    bytes_per_lane = 4 * (2 * np.ceil(np.log2(runs_per_rec)) + 12)
    eff_gbps = lanes / best * bytes_per_lane / 1e9
    d["bytes_per_lane_model"] = int(bytes_per_lane)
    d["effective_random_access_gb_s"] = round(eff_gbps, 2)
    d["hbm_fraction"] = round(eff_gbps / V5E_HBM_GBPS, 4)

    # Link rate: one un-prefetched matrix fetch of known size.
    mat = step()
    fence(mat)
    t0 = time.perf_counter()
    h = np.asarray(mat)
    dt = time.perf_counter() - t0
    d["fetch_mib"] = round(h.nbytes / 2**20, 1)
    d["link_mib_s"] = round(h.nbytes / 2**20 / dt, 1)

    # End-to-end engine run (the product path, one warm + one timed).
    sub = scale_queries(index, SCALE_DEVICE_QUERIES)
    engine.query_transitive_bfs_many(
        index, sub[:16], max_depth=MAX_DEPTH, device_engine=dev,
        columnar=True,
    )
    t0 = time.perf_counter()
    res = engine.query_transitive_bfs_many(
        index, sub, max_depth=MAX_DEPTH, device_engine=dev, columnar=True,
    )
    dt = time.perf_counter() - t0
    rows = sum(len(r) for r in res)
    d["e2e_queries"] = len(sub)
    d["e2e_qps"] = round(len(sub) / dt, 1)
    d["e2e_rows"] = int(rows)
    d["e2e_rows_per_s"] = round(rows / dt, 1)
    # Modeled co-located split: with the arena resident and a PCIe-class
    # host link (~8 GB/s) instead of the relay, the fetch term vanishes;
    # compute alone bounds q/s.
    lanes_needed = rows / 0.89  # measured hit density ~89%
    compute_s = lanes_needed / (d["step_mlanes_per_s"] * 1e6)
    d["modeled_colocated_qps"] = round(len(sub) / max(compute_s, 1e-9), 1)
    del dev
    os.environ.pop("IMPG_SLOT_CAP", None)
    return d


def bench_genotype_e2e(n_cand: int = 4096, n_feat: int = 131072,
                       top_n: int = 10):
    """End-to-end host-vs-device walltime for the genotype cos scoring
    stage at production scale (VERDICT r4 #2: a product command where
    the TPU beats the host e2e, on the record).

    Both sides run the SAME product code path
    (genotype/core.run_diploid_topk): float64 BLAS Gram + argpartition
    on host vs float32 MXU Gram + on-device top-k, including the
    chunked candidate upload and the ~4*top_n-row fetch.  device_first_s
    is the one-shot CLI cost (backend + compile-cache load + upload);
    device_steady_s is the amortized per-call cost.  The auto router
    (core.auto_device_for_dense) picks the device exactly when this
    measurement says it wins."""
    from impg_tpu.genotype import core as gt_core

    rng = np.random.default_rng(11)
    # Integer counts like real traversal-count vectors; ~35% sparsity.
    cands = rng.integers(0, 4, (n_cand, n_feat)).astype(np.float64)
    truth = (cands[7] + cands[1234 % n_cand])
    sample = truth + rng.integers(0, 2, n_feat).astype(np.float64)

    host_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        host_res = gt_core.run_diploid_topk(
            cands, sample, top_n, device=False
        )
        dt = time.perf_counter() - t0
        host_best = dt if host_best is None else min(host_best, dt)

    t0 = time.perf_counter()
    dev_res = gt_core.run_diploid_topk(cands, sample, top_n, device=True)
    device_first = time.perf_counter() - t0
    dev_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        dev_res = gt_core.run_diploid_topk(
            cands, sample, top_n, device=True
        )
        dt = time.perf_counter() - t0
        dev_best = dt if dev_best is None else min(dev_best, dt)

    # Panel pattern: one upload, many samples (core.DiploidPanel — the
    # cohort/serving use of cosigt).  Per-sample device time excludes
    # the amortized upload; the host comparator is the same per-sample
    # BLAS scoring.
    t0 = time.perf_counter()
    panel = gt_core.DiploidPanel(cands)
    panel_upload = time.perf_counter() - t0
    rng2 = np.random.default_rng(17)
    panel_best = None
    for i in range(3):
        samp = truth + rng2.integers(0, 2, n_feat).astype(np.float64)
        t0 = time.perf_counter()
        pres = panel.top_k(samp, top_n)
        dt = time.perf_counter() - t0
        panel_best = dt if panel_best is None else min(panel_best, dt)
    panel_agree = [a.combination for a in pres[:3]]

    agree = [a.combination for a in host_res[:5]] == [
        b.combination for b in dev_res[:5]
    ]
    return {
        "n_candidates": n_cand,
        "n_features": n_feat,
        "gram_gflop": round(2.0 * n_cand * n_cand * n_feat / 1e9, 1),
        "host_best_s": round(host_best, 3),
        "device_first_s": round(device_first, 3),
        "device_steady_s": round(dev_best, 3),
        "device_win_one_shot": round(host_best / device_first, 2),
        "device_win_steady": round(host_best / dev_best, 2),
        "panel_upload_s": round(panel_upload, 3),
        "panel_per_sample_s": round(panel_best, 3),
        "device_win_panel": round(host_best / panel_best, 2),
        "panel_top3": panel_agree,
        "top5_agree": bool(agree),
        "auto_routes_device": bool(
            gt_core.auto_device_for_dense(n_cand, n_feat)
        ),
        "routing_note": (
            "steady = in-process product path (narrow-dtype chunked "
            "upload per call + jitted Gram/top-k) — the many-scorings "
            "pattern; first = one-shot incl. jax init/compile-cache "
            "load, which through this image's relay carries a 24-190 s "
            "variable tax (genotype/core.auto_device_for_dense), so "
            "auto routes one-shot CLI runs to host here and to the "
            "device above ~1.2 TFLOP on co-located runtimes"
        ),
    }


def scaling_model(scale_detail: dict, nproc: int) -> dict:
    """Projected 2-host scaling efficiency from measured quantities
    (VERDICT r4 #6 — multi-host hardware does not exist here, so the
    bound is modeled and every assumption is stated in the output).

    Deployment modeled: the index sharded by target sequence across 2
    hosts (SURVEY §2 mapping table), each host running the measured C++
    closed engine on its half; per-depth BFS exchange over DCN =
    (a) broadcast of newly-discovered frontier ranges (16 B/range) and
    (b) the final per-host result-row merge (24 B/row).  Compute halves
    (records split evenly; the stab tree's log factor only shrinks);
    communication uses measured row/frontier counts from the scale tier
    at two DCN rates: 12.5 GB/s (100 Gbps NIC) and a conservative
    3.125 GB/s (25 Gbps)."""
    q = scale_detail.get("queries")
    rows = scale_detail.get("result_rows")
    auto = scale_detail.get("auto_engine_qps")
    if not (q and rows and auto):
        return {"error": "scale tier numbers unavailable"}
    t1 = q / auto
    # Frontier ranges are bounded by result rows (every frontier range
    # yields >=1 row); take frontier bytes = rows * 16 as an upper bound.
    comm_bytes = rows * 24 + rows * 16
    out = {
        "assumptions": (
            "index sharded by target across 2 hosts; C++ closed engine "
            "per host (measured auto qps); comm = result-row merge "
            "(24 B/row) + per-depth frontier broadcast (<=16 B/row, "
            "upper bound); compute halves; DCN latency ignored "
            "(batched depths, 2048-query batches)"
        ),
        "measured_t1_s": round(t1, 3),
        "comm_bytes_per_batch": int(comm_bytes),
    }
    for tag, bw in (("dcn_100gbps", 12.5e9), ("dcn_25gbps", 3.125e9)):
        t_comm = comm_bytes / bw
        t2 = t1 / 2 + t_comm
        out[tag] = {
            "t2_s": round(t2, 3),
            "efficiency": round(t1 / (2 * t2), 3),
        }
    out["meets_0.8_target"] = bool(
        out["dcn_25gbps"]["efficiency"] >= 0.8
    )
    return out


def bench_map_e2e(n_reads: int = 100_000, read_len: int = 150):
    """Host-vs-device e2e for `map -o pack` (the second MXU/VPU-shaped
    command of VERDICT r4 #2).  Same product code both ways:
    syng/pack.map_reads (native thread-batched extraction) vs
    ops/syncmer_jax.map_reads_batched (fused device read->pack).
    `auto` routes wherever this measures faster."""
    import tempfile

    from impg_tpu.ops.syncmer_jax import map_reads_batched
    from impg_tpu.syng.index import SyngIndex
    from impg_tpu.syng.pack import map_reads

    rng = np.random.default_rng(13)
    table = np.frombuffer(b"ACGT", np.uint8)
    genome = table[rng.integers(0, 4, 2_000_000)].tobytes()
    idx = SyngIndex.build([("g1", genome)])
    starts = rng.integers(0, len(genome) - read_len, n_reads)
    with tempfile.TemporaryDirectory() as td:
        fq = os.path.join(td, "reads.fasta")
        with open(fq, "w") as fh:
            for i, s in enumerate(starts):
                fh.write(
                    f">r{i}\n{genome[s:s + read_len].decode()}\n"
                )
        t0 = time.perf_counter()
        hp, hn, hm = map_reads(idx, [fq])
        host_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dp, dn, dm = map_reads_batched(idx, [fq])
        device_first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        dp, dn, dm = map_reads_batched(idx, [fq])
        device_steady_s = time.perf_counter() - t0
    agree = bool(
        np.array_equal(hp.counts, dp.counts) and hm == dm
    )
    return {
        "n_reads": n_reads,
        "read_len": read_len,
        "host_s": round(host_s, 3),
        "device_first_s": round(device_first_s, 3),
        "device_steady_s": round(device_steady_s, 3),
        "packs_identical": agree,
        "auto_routes": "host" if host_s <= device_steady_s else "device",
    }


def bench_mxu():
    """MXU sidecar: the genotype Gram-scoring path (genotype/core.py
    diploid_cosine_matrix_device — candidates x candidates Gram + cosine
    search, a matmul) and a raw bf16 matmul MFU sanity line."""
    import jax
    import jax.numpy as jnp

    from impg_tpu.genotype.core import diploid_step_device

    d = {}
    N, D = 2048, 16384
    rng = np.random.default_rng(0)
    cand = jnp.asarray(rng.random((N, D), np.float32))
    samp = jnp.asarray(rng.random(D, np.float32))
    # Through the axon relay block_until_ready can return before the
    # computation finishes; fetching ONE element is the reliable fence
    # (it cannot materialize before the kernel completes).
    float(diploid_step_device(cand, samp)[0][0, 0])  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sim, dot, cn = diploid_step_device(cand, samp)
        float(sim[0, 0])
        ts.append(time.perf_counter() - t0)
    flops = 2.0 * N * N * D  # the C@C.T Gram dominates
    d["gram_n"], d["gram_d"] = N, D
    d["gram_tflops_f32"] = round(flops / min(ts) / 1e12, 2)
    d["gram_device_s"] = round(min(ts), 3)

    # Same subsystem on the host (numpy BLAS, all cores) — the
    # device-vs-host "TPU earns its keep" row for the one genuinely
    # MXU-shaped stage.  Candidate matrices are index-side artifacts
    # reused across samples, so the upload amortizes; compute-vs-compute
    # is the honest comparison.
    from impg_tpu.genotype.core import diploid_cosine_matrix

    cand_h = np.asarray(cand)
    samp_h = np.asarray(samp)
    diploid_cosine_matrix(cand_h[:64], samp_h)  # warm BLAS
    t0 = time.perf_counter()
    diploid_cosine_matrix(cand_h, samp_h)
    host_s = time.perf_counter() - t0
    d["gram_host_s"] = round(host_s, 3)
    d["gram_device_speedup"] = round(host_s / min(ts), 1)

    M, CHAIN = 8192, 8
    a = jnp.asarray(rng.random((M, M), np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.random((M, M), np.float32), jnp.bfloat16)

    @jax.jit
    def f(x, y):
        # Chained dependent matmuls: one dispatch through the relay
        # amortizes its ~10-20 ms latency over CHAIN MXU passes.
        for _ in range(CHAIN):
            x = (x @ y) * jnp.bfloat16(1e-2)  # keep magnitudes finite
        return x

    float(f(a, b)[0, 0])  # compile + warm (scalar fetch = real fence)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(a, b)[0, 0])
        ts.append(time.perf_counter() - t0)
    tf = CHAIN * 2.0 * M**3 / min(ts) / 1e12
    d["matmul_bf16_tflops"] = round(tf, 1)
    d["matmul_bf16_mfu"] = round(tf / V5E_BF16_TFLOPS, 3)
    return d


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
        mt = getattr(lib, "impg_gfa_parse_mt", None)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            h = mt(raw, len(raw), 0) if mt else lib.impg_gfa_parse(
                raw, len(raw)
            )
            dt2 = time.perf_counter() - t0
            lib.impg_gfa_free(h)
            best = dt2 if best is None else min(best, dt2)
        gfa_mibs = len(raw) / 2**20 / best

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


def emit(result):
    """Persist the full survey to bench_detail.json; print a COMPACT line.

    The driver parses the last stdout line and stores only a 2000-char
    tail; round 3's full-detail line blew past that and the headline was
    recorded as unparsed.  The compact line stays well under the limit.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "bench_detail.json"), "w") as fh:
            json.dump(result, fh, indent=2)
            fh.write("\n")
    except Exception:
        pass
    detail = result.get("detail", {})
    mid = detail.get("mid", {})
    deep = detail.get("deep", {})
    scale = detail.get("scale", {})
    short = detail.get("scale_short", {})
    ds = detail.get("device_scale", {})
    mxu = detail.get("mxu", {})
    summary = {
        "scale_records_m": round(
            scale.get("directed_records", 0) / 1e6, 2
        ) or None,
        "scale_runs_b": round(
            scale.get("arena_runs", 0) / 1e9, 2
        ) or None,
        "scale_vs_paf_mt": scale.get("vs_paf_mt"),
        "scale_vs_walk_mt": scale.get("vs_walk_mt"),
        "scale_short_vs_paf_mt": short.get("vs_paf_mt"),
        "mid_auto_qps": mid.get("auto_engine_qps"),
        "mid_vs_paf_mt": mid.get("vs_paf_mt"),
        "mid_device_qps": mid.get("device_qps"),
        "deep_vs_paf_mt": deep.get("vs_paf_mt"),
        "device_scale_e2e_qps": ds.get("e2e_qps"),
        "genotype_device_win_panel": detail.get(
            "genotype_e2e", {}
        ).get("device_win_panel"),
        "genotype_device_win_one_shot": detail.get(
            "genotype_e2e", {}
        ).get("device_win_one_shot"),
        "mxu_bf16_mfu": mxu.get("matmul_bf16_mfu"),
        "syng_build_ms_c4_4t": detail.get("syng_build_ms_c4_scale_4t"),
        "gfa_tokenize_mib_s": detail.get("gfa_native_tokenize_mib_s"),
    }
    compact = {
        "metric": result.get("metric"),
        "value": result.get("value"),
        "unit": result.get("unit"),
        "vs_baseline": result.get("vs_baseline"),
        "summary": {k: v for k, v in summary.items() if v is not None},
        "detail_file": "bench_detail.json",
    }
    for key in ("tpu_unavailable",):
        if result.get(key):
            compact[key] = True
    if "error" in result:
        compact["error"] = str(result["error"])[:300]
    line = json.dumps(compact)
    if len(line) > 1800:  # absolute guard against driver-tail truncation
        compact.pop("summary", None)
        line = json.dumps(compact)
    print(line)


def main():
    try:
        from impg_tpu.ops.xfer import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass
    index, batches = build_mid_workload()
    mid_targets = [q for walk in batches[1:] for q in walk]

    # Python baselines FIRST (fork-safe: no jax backend in this process
    # yet), kept for round-over-round continuity.
    qps_1t = bench_host_1t(index, batches)
    qps_mt, nproc = bench_host_mt(index, batches, qps_1t)

    # C++ executor survey, mid workload.
    native_mid, mid_rows, _ne = bench_native(index, mid_targets)
    auto_qps, auto_rows, auto_dt = bench_auto(index, mid_targets)

    (syng_build_ms, gfa_parse_mibs, gfa_validate_ms, gfa_sort_ms,
     gfa_size_mib) = bench_headlines()

    detail = {
        "mid": {
            "directed_records": len(index.records),
            "arena_runs": int(index.arena.n_ops),
            "queries": len(mid_targets),
            "max_depth": MAX_DEPTH,
            "result_rows": int(mid_rows),
            "python_host_qps_1t": round(qps_1t, 2),
            "python_host_qps_mt": round(qps_mt, 2),
            "native_qps": native_mid,
            "auto_engine_qps": round(auto_qps, 2),
            "auto_engine_rows_per_s": round(auto_rows / auto_dt, 2),
        },
        "host_threads": nproc,
        "baseline_note": (
            "vs_baseline = framework default (auto -> C++ closed engine, "
            "all cores, WITH result-row materialization) / C++ PAF engine "
            "all cores (counts only, no materialization — generous). The "
            "paf engine is the reference's default-path cost model: per "
            "projection it re-parses the record's whole ASCII cg:Z: CIGAR "
            "(impg.rs:495-530 pread + :2935 parse_cigar_to_delta byte "
            "scan) then walks linearly; kept generous by holding the "
            "ASCII resident (no pread syscall, no Vec alloc). "
            "Attribution: resident-arena redesign alone = walk/paf; "
            "closed-form projection algorithm = closed/walk; both sides "
            "use identical stab/visited machinery and all cores "
            "(rayon-style, impg.rs:1553-1633)."
        ),
        "syng_build_ms_c4_scale_4t": syng_build_ms,
        "gfa_native_tokenize_mib_s": gfa_parse_mibs,
        "gfa_bench_graph_mib": gfa_size_mib,
        "gfa_columnar_validate_ms": gfa_validate_ms,
        "gfa_columnar_sort_gs_ms": gfa_sort_ms,
    }

    # Scale workload (THE HEADLINE TIER): 5M directed records with the
    # yeast-fitted realistic CIGAR mixture (~520 runs/record mean).
    # C++ survey + the framework default executor; value/vs_baseline of
    # the whole bench come from here.
    scale_auto_qps = None
    try:
        import gc

        sidx = load_scale_index()
        stargets = scale_queries(sidx, SCALE_QUERIES)
        # Per-mode iid query subsets: at ~650k result rows/query the
        # C++ engine retains chunk rows natively, and the paf cost model
        # runs ~8x slower than the framework — full-2048 cells would
        # cost ~45 min and ~60 GiB.  qps extrapolates (iid draws); the
        # headline auto number runs the FULL 2048 queries, chunked.
        from impg_tpu.query.host_native import NativeHostEngine

        ne_s = NativeHostEngine(sidx)
        native_scale = {}
        survey = [
            ("closed_1t", "closed", 1, 64, 2),
            (f"closed_{nproc}t", "closed", nproc, 512, 2),
            ("walk_1t", "walk", 1, 64, 1),
            (f"walk_{nproc}t", "walk", nproc, 256, 2),
            ("paf_1t", "paf", 1, 32, 1),
            (f"paf_{nproc}t", "paf", nproc, 128, 2),
        ]
        ne_s.ensure_paf_baseline()
        survey_queries = {}
        for tag, mode, th, nq, reps in survey:
            tset = stargets[:nq]
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                ne_s.run_counts(
                    tset, max_depth=MAX_DEPTH, mode=mode, threads=th
                )
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                if dt > 180.0:
                    break
            native_scale[tag] = round(nq / best, 2)
            survey_queries[tag] = nq
        del ne_s
        gc.collect()
        auto_s_qps, auto_s_rows, auto_s_dt = bench_auto(
            sidx, stargets, reps=2, chunk=512
        )
        scale_rows = auto_s_rows
        rpr = np.diff(np.sort(sidx.records.op_off.astype(np.int64)))
        detail["scale"] = {
            "directed_records": len(sidx.records),
            "arena_runs": int(sidx.arena.n_ops),
            "runs_per_record_mean": round(
                sidx.arena.n_ops / max(1, len(sidx.records)), 1
            ),
            "runs_per_record_p50": int(np.percentile(rpr, 50)),
            "runs_per_record_p90": int(np.percentile(rpr, 90)),
            "shape_note": (
                "yeast-fitted mixture: 18.4 runs/kb aligned + bimodal "
                "alignment lengths (median ~1.3 kb scaled, ~20% "
                "near-full-length), measured from the reference's own "
                "7-strain yeast chrV all-vs-all PAF "
                "(tests/datagen.realistic_directed_index)"
            ),
            "queries": len(stargets),
            "survey_query_subsets": survey_queries,
            "result_rows": int(scale_rows),
            "native_qps": native_scale,
            "auto_engine_qps": round(auto_s_qps, 2),
            "auto_engine_rows_per_s": round(auto_s_rows / auto_s_dt, 2),
            "vs_paf_mt": round(
                auto_s_qps / max(
                    native_scale.get(f"paf_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
            "vs_walk_mt": round(
                auto_s_qps / max(
                    native_scale.get(f"walk_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
        }
        scale_auto_qps = auto_s_qps
        del rpr
        del sidx
        gc.collect()
    except Exception as exc:  # scale tier must never sink the bench
        detail["scale"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Scale-short diagnostic (rounds 3-4 "scale"): same record count,
    # ~21-run CIGARs — the no-amortization shape where closed-form
    # projection cannot win big.  Kept honest on the record; also serves
    # as the device_scale substrate (its lean arena fits HBM).
    sidx_short = None
    try:
        sidx_short = load_short_index()
        sh_targets = scale_queries(sidx_short, SHORT_QUERIES)
        native_short, short_rows, _ = bench_native(
            sidx_short, sh_targets, reps=2
        )
        auto_sh_qps, auto_sh_rows, auto_sh_dt = bench_auto(
            sidx_short, sh_targets, reps=2
        )
        detail["scale_short"] = {
            "directed_records": len(sidx_short.records),
            "arena_runs": int(sidx_short.arena.n_ops),
            "queries": len(sh_targets),
            "result_rows": int(short_rows),
            "native_qps": native_short,
            "auto_engine_qps": round(auto_sh_qps, 2),
            "auto_engine_rows_per_s": round(
                auto_sh_rows / auto_sh_dt, 2
            ),
            "vs_paf_mt": round(
                auto_sh_qps / max(
                    native_short.get(f"paf_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
            "vs_walk_mt": round(
                auto_sh_qps / max(
                    native_short.get(f"walk_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
        }
    except Exception as exc:  # diagnostic must never sink the bench
        detail["scale_short"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Deep workload: the realistic alignment shape (long CIGARs) where
    # per-projection CIGAR handling dominates — the projection
    # algorithm's own tier.
    try:
        didx = load_deep_index()
        dtargets = scale_queries(didx, DEEP_QUERIES, seq_len=DEEP_SEQ_LEN)
        native_deep, deep_rows, _ = bench_native(didx, dtargets, reps=2)
        auto_d_qps, auto_d_rows, auto_d_dt = bench_auto(
            didx, dtargets, reps=2
        )
        detail["deep"] = {
            "directed_records": len(didx.records),
            "arena_runs": int(didx.arena.n_ops),
            "runs_per_record": round(
                didx.arena.n_ops / max(1, len(didx.records)), 1
            ),
            "queries": len(dtargets),
            "result_rows": int(deep_rows),
            "native_qps": native_deep,
            "auto_engine_qps": round(auto_d_qps, 2),
            "auto_engine_rows_per_s": round(auto_d_rows / auto_d_dt, 2),
            "vs_paf_mt": round(
                auto_d_qps / max(
                    native_deep.get(f"paf_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
            "vs_walk_mt": round(
                auto_d_qps / max(
                    native_deep.get(f"walk_{nproc}t", 1e-9), 1e-9
                ), 2
            ),
        }
        del didx
    except Exception as exc:  # deep tier must never sink the bench
        detail["deep"] = {"error": f"{type(exc).__name__}: {exc}"}

    if "vs_paf_mt" in detail.get("scale", {}):
        detail["scaling_model_2host"] = scaling_model(
            detail["scale"], nproc
        )

    ok, probe = probe_tpu()
    detail["tpu_probe"] = probe

    paf_mt = (
        native_mid.get(f"paf_{nproc}t")
        or native_mid.get(f"walk_{nproc}t")
        or qps_mt
    )
    detail["mid"]["vs_paf_mt"] = round(auto_qps / paf_mt, 2)
    walk_mt_q = native_mid.get(f"walk_{nproc}t")
    if walk_mt_q:
        detail["mid"]["vs_walk_mt"] = round(auto_qps / walk_mt_q, 2)
    # Headline = the realistic at-scale tier (5M records, yeast-fitted
    # CIGARs); mid tier is the fallback only if the scale tier errored.
    if scale_auto_qps is not None and "vs_paf_mt" in detail["scale"]:
        head_value = round(scale_auto_qps, 2)
        head_vs = detail["scale"]["vs_paf_mt"]
    else:
        head_value = round(auto_qps, 2)
        head_vs = round(auto_qps / paf_mt, 2)
    result = {
        "metric": "transitive_queries_per_sec",
        "value": head_value,
        "unit": "queries/s",
        "vs_baseline": head_vs,
        "detail": detail,
    }

    if not ok:
        result["tpu_unavailable"] = True
        result["error"] = (
            "axon TPU backend failed to initialize after "
            f"{len(PROBE_BACKOFFS_S)} probe attempts"
        )
        emit(result)
        return

    # Device tier, mid workload (exact + approximate) — the rounds 1-2
    # headline path, now a survey row rather than the headline.
    try:
        index.ensure_tracepoints(100)
        rep_qps, rows, best_dt = bench_device(index, batches)
        approx_reps, _, _ = bench_device(
            index, batches, approximate=True, reps=2
        )
        detail["mid"].update({
            "device_qps": round(max(rep_qps), 2),
            "device_reps_qps": [round(q, 2) for q in rep_qps],
            "device_qps_spread": round(
                max(rep_qps) / max(min(rep_qps), 1e-9), 2
            ),
            "device_rows_per_sec": round(rows / best_dt, 2),
            "device_approx_qps": round(max(approx_reps), 2),
        })
    except Exception as exc:
        detail["mid"]["device_error"] = f"{type(exc).__name__}: {exc}"

    # Device tier, at-scale workload + roofline decomposition (on the
    # short-CIGAR 5M-record index: its lean arena fits HBM; the
    # realistic tier's ~31 GiB arena is the paged/sharded engines' job).
    if sidx_short is not None:
        try:
            detail["device_scale"] = bench_device_scale(sidx_short)
        except Exception as exc:
            detail["device_scale"] = {
                "error": f"{type(exc).__name__}: {exc}"
            }

    try:
        detail["mxu"] = bench_mxu()
    except Exception as exc:
        detail["mxu"] = {"error": f"{type(exc).__name__}: {exc}"}

    # Genotype scoring e2e: the product command where the TPU must beat
    # the host end-to-end (VERDICT r4 #2).
    try:
        detail["genotype_e2e"] = bench_genotype_e2e()
    except Exception as exc:
        detail["genotype_e2e"] = {"error": f"{type(exc).__name__}: {exc}"}

    try:
        detail["map_e2e"] = bench_map_e2e()
    except Exception as exc:
        detail["map_e2e"] = {"error": f"{type(exc).__name__}: {exc}"}

    ds = detail.get("device_scale", {})
    sc = detail.get("scale", {})
    detail["gap_analysis"] = (
        "CPU attribution (scale tier: 5M records, yeast-fitted "
        "~520-run-mean CIGARs): the reference's default path re-parses "
        "the ASCII CIGAR per projection (paf mode); holding pre-parsed "
        "runs resident (our arena design) is walk/paf = {wp}x, and the "
        "closed-form two-binary-search projection over the same arena "
        "is another closed/walk = {cw}x — multiplied, the framework "
        "default beats the reference cost model {vp}x on the headline "
        "tier ({vm}x on mid). "
        "Device: the transitive query is pointer-chasing + result "
        "materialization: each result lane costs ~2*log2(runs/record) "
        "random 4B arena reads (binary-search projection). Measured on "
        "the 5M-record index: device step {ml} Mlanes/s = {gb} GB/s "
        "effective random access ({hf}% of v5e HBM), because XLA gathers "
        "serialize on TPU while a CPU runs the same searches out of "
        "L2-resident arenas; and every row must return to the host for "
        "visited-set bookkeeping (reference semantics) across a "
        "{lk} MiB/s relay link — co-located PCIe would lift e2e from "
        "{eq} to ~{mq} q/s, still short of the C++ engine on all cores. "
        "The TPU earns its keep on the MXU-shaped subsystems (genotype "
        "Gram scoring at {gt} TFLOP/s f32, raw bf16 matmul at {mfu} MFU) "
        "and on mesh-sharded indexes exceeding one host's RAM; the "
        "framework's auto executor therefore routes interval BFS to the "
        "C++ engine and keeps the accelerator for compute-dense stages."
    ).format(
        wp=round(
            sc.get("native_qps", {}).get(f"walk_{nproc}t", 0)
            / max(sc.get("native_qps", {}).get(f"paf_{nproc}t", 1e-9),
                  1e-9), 1,
        ),
        cw=round(
            sc.get("native_qps", {}).get(f"closed_{nproc}t", 0)
            / max(sc.get("native_qps", {}).get(f"walk_{nproc}t", 1e-9),
                  1e-9), 1,
        ),
        vp=sc.get("vs_paf_mt", "?"),
        vm=detail["mid"].get("vs_paf_mt", "?"),
        ml=ds.get("step_mlanes_per_s", "?"),
        gb=ds.get("effective_random_access_gb_s", "?"),
        hf=round(100 * ds.get("hbm_fraction", 0), 2),
        lk=ds.get("link_mib_s", "?"),
        eq=ds.get("e2e_qps", "?"),
        mq=ds.get("modeled_colocated_qps", "?"),
        gt=detail.get("mxu", {}).get("gram_tflops_f32", "?"),
        mfu=detail.get("mxu", {}).get("matmul_bf16_mfu", "?"),
    )

    emit(result)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # never a bare traceback on the record
        emit({
            "metric": "transitive_queries_per_sec",
            "value": 0,
            "unit": "queries/s",
            "vs_baseline": 0,
            "error": f"{type(exc).__name__}: {exc}",
            "detail": {"trace_tail": traceback.format_exc()[-1500:]},
        })
        sys.exit(0)
