"""Native C++ host engine (query/host_native.py): exact row parity with
the Python/numpy engine on transitive BFS walks, in both cost models."""

import random

import numpy as np
import pytest

from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.io import paf as paf_mod
from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.query import engine
from impg_tpu.query.host_native import NativeHostEngine, _lib
from tests import datagen


pytestmark = pytest.mark.skipif(_lib() is None, reason="native lib missing")


def _index(seed=11, n_seqs=14, seq_len=60_000, cross_links=5):
    rng = random.Random(seed)
    text, _seqs, _alns = datagen.pangenome_paf(
        rng, n_seqs=n_seqs, seq_len=seq_len, cross_links=cross_links
    )
    seq_index = SequenceIndex()
    parsed = paf_mod.parse_paf_bytes(text.encode(), seq_index)
    recs, arena = __import__(
        "impg_tpu.core.arena", fromlist=["build_directed"]
    ).build_directed(
        query_id=parsed.query_id, q_start=parsed.q_start,
        q_end=parsed.q_end, target_id=parsed.target_id,
        t_start=parsed.t_start, t_end=parsed.t_end, strand=parsed.strand,
        runs=parsed.runs, run_offsets=parsed.run_offsets,
    )
    return ImpgIndex._finalize(seq_index, recs, arena, [])


@pytest.fixture(scope="module")
def setup():
    index = _index()
    qrng = np.random.default_rng(3)
    targets = []
    for _ in range(60):
        tid = int(qrng.integers(0, len(index.seq_index)))
        L = index.seq_index.get_len_from_id(tid)
        span = int(qrng.integers(2_000, 20_000))
        s = int(qrng.integers(0, max(1, L - span)))
        targets.append((tid, s, min(s + span, L)))
    return index, targets


def _assert_blocks_equal(got, want, label):
    assert len(got) == len(want)
    for w, (g, h) in enumerate(zip(got, want)):
        for col in ("q_id", "q_first", "q_last", "t_id", "t_first",
                    "t_last"):
            assert np.array_equal(
                getattr(g, col), getattr(h, col)
            ), f"{label}: walk {w} col {col}"


@pytest.mark.parametrize("mode", ["closed", "walk", "paf"])
@pytest.mark.parametrize("max_depth", [1, 2, 0])
def test_native_engine_matches_python(setup, mode, max_depth):
    index, targets = setup
    oracle = engine.query_transitive_bfs_many(
        index, targets, max_depth=max_depth, columnar=True
    )
    ne = NativeHostEngine(index)
    got = ne.run(targets, max_depth=max_depth, mode=mode, threads=1)
    _assert_blocks_equal(got, oracle, f"mode={mode} depth={max_depth}")
    ne.close()


def test_native_engine_threaded_matches_serial(setup):
    index, targets = setup
    ne = NativeHostEngine(index)
    serial = ne.run(targets, mode="walk", threads=1)
    threaded = ne.run(targets, mode="walk", threads=4)
    _assert_blocks_equal(threaded, serial, "threads")
    n = ne.run_counts(targets, mode="closed", threads=4)
    assert n == sum(len(b) for b in serial)
    ne.close()


def test_native_engine_nonstandard_params(setup):
    """min_transitive_len / min_distance knobs flow through identically."""
    index, targets = setup
    oracle = engine.query_transitive_bfs_many(
        index, targets[:20], max_depth=2, min_transitive_len=500,
        min_distance_between_ranges=50, columnar=True,
    )
    ne = NativeHostEngine(index)
    got = ne.run(
        targets[:20], max_depth=2, min_transitive_len=500,
        min_distance_between_ranges=50, mode="walk",
    )
    _assert_blocks_equal(got, oracle, "params")
    ne.close()


def test_native_masked_walks_match_python(setup):
    """Masked-region preload (partition's pre-visited bookkeeping):
    native walks equal the python engine with the same mask dict."""
    from impg_tpu.core.intervals import SortedRanges

    index, targets = setup

    def masks():
        m = {}
        # Mask a band on a few sequences, plus one EMPTY entry whose
        # sequence_length must still govern later inserts.
        for sid in range(0, min(6, len(index.seq_index))):
            L = index.seq_index.get_len_from_id(sid) or 0
            sr = SortedRanges(L, 0)
            if sid % 3 != 2:
                sr.insert((L // 4, L // 2))
            m[sid] = sr
        return m

    ne = NativeHostEngine(index)
    got = ne.run(targets[:25], max_depth=2, masked_regions=masks())
    want = [
        engine.query_transitive_bfs(
            index, t, s, e, masked_regions=masks(), max_depth=2
        )
        for t, s, e in targets[:25]
    ]
    assert len(got) == len(want)
    for w, (g, rows) in enumerate(zip(got, want)):
        tup_g = list(zip(g.q_id.tolist(), g.q_first.tolist(),
                         g.q_last.tolist(), g.t_id.tolist(),
                         g.t_first.tolist(), g.t_last.tolist()))
        tup_w = [(r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
                 for r in rows]
        assert tup_g == tup_w, f"walk {w}"


def test_native_min_identity_matches_python(setup):
    """Gap-compressed identity gate: native rows equal the python engine
    for several thresholds (both cost models)."""
    index, targets = setup
    for thr in (0.5, 0.9, 0.97, 1.0):
        for mode in ("closed", "walk"):
            ne = NativeHostEngine(index, mode=mode)
            got = ne.run(targets[:20], max_depth=2, min_identity=thr)
            want = [
                engine.query_transitive_bfs(
                    index, t, s, e, max_depth=2, min_identity=thr
                )
                for t, s, e in targets[:20]
            ]
            for w, (g, rows) in enumerate(zip(got, want)):
                tup_g = list(zip(g.q_id.tolist(), g.q_first.tolist(),
                                 g.q_last.tolist(), g.t_id.tolist(),
                                 g.t_first.tolist(), g.t_last.tolist()))
                tup_w = [
                    (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first,
                     r.t_last) for r in rows
                ]
                assert tup_g == tup_w, (thr, mode, w)


def test_native_subset_and_min_output_length_match_python(setup):
    """Subset gate (drops result+frontier on non-subset sequences except
    the walk's own target) and min-output-length (results only) — exact
    parity via the product dispatch."""
    index, targets = setup
    # Subset: even-id sequence names pass.
    names_ok = {
        index.seq_index.get_name(sid)
        for sid in range(0, len(index.seq_index), 2)
    }

    def subset_match(name):
        return name in names_ok

    subset_ok = np.zeros(len(index.seq_index), np.uint8)
    for sid in range(len(index.seq_index)):
        nm = index.seq_index.get_name(sid)
        subset_ok[sid] = 1 if nm in names_ok else 0

    ne = NativeHostEngine(index)
    for kw_native, kw_py in (
        (dict(subset_seq_ok=subset_ok), dict(subset_match=subset_match)),
        (dict(min_output_length=3000), dict(min_output_length=3000)),
        (dict(subset_seq_ok=subset_ok, min_output_length=2500,
              min_identity=0.9),
         dict(subset_match=subset_match, min_output_length=2500,
              min_identity=0.9)),
    ):
        got = ne.run(targets[:20], max_depth=2, **kw_native)
        want = [
            engine.query_transitive_bfs(index, t, s, e, max_depth=2,
                                        **kw_py)
            for t, s, e in targets[:20]
        ]
        for w, (g, rows) in enumerate(zip(got, want)):
            tup_g = list(zip(g.q_id.tolist(), g.q_first.tolist(),
                             g.q_last.tolist(), g.t_id.tolist(),
                             g.t_first.tolist(), g.t_last.tolist()))
            tup_w = [(r.q_id, r.q_first, r.q_last, r.t_id, r.t_first,
                      r.t_last) for r in rows]
            assert tup_g == tup_w, (kw_py, w)


def test_native_dispatch_full_filter_surface(setup):
    """query_transitive_bfs_many with a native engine + subset +
    min_output_length + min_identity returns the python engine's rows."""
    index, targets = setup
    keep = {index.seq_index.get_name(sid)
            for sid in range(0, len(index.seq_index), 2)}
    sm = lambda name: name in keep  # noqa: E731
    ne = NativeHostEngine(index)
    got = engine.query_transitive_bfs_many(
        index, targets[:15], max_depth=2, min_identity=0.85,
        subset_match=sm, min_output_length=1500, device_engine=ne,
        columnar=True,
    )
    want = engine.query_transitive_bfs_many(
        index, targets[:15], max_depth=2, min_identity=0.85,
        subset_match=sm, min_output_length=1500,
    )
    for g, rows in zip(got, want):
        tup_g = list(zip(g.q_id.tolist(), g.q_first.tolist(),
                         g.q_last.tolist(), g.t_id.tolist(),
                         g.t_first.tolist(), g.t_last.tolist()))
        tup_w = [(r.q_id, r.q_first, r.q_last, r.t_id, r.t_first,
                  r.t_last) for r in rows]
        assert tup_g == tup_w


def test_native_approximate_matches_python(setup):
    """Tracepoint approximate mode: native walks equal the python engine
    (same derived tracepoint arena, round-half-even interpolation)."""
    index, targets = setup
    index.ensure_tracepoints(100)
    ne = NativeHostEngine(index)
    for thr in (None, 0.9):
        got = ne.run(targets[:25], max_depth=2, approximate=True,
                     min_identity=thr)
        want = [
            engine.query_transitive_bfs(
                index, t, s, e, max_depth=2, approximate=True,
                min_identity=thr,
            )
            for t, s, e in targets[:25]
        ]
        for w, (g, rows) in enumerate(zip(got, want)):
            tup_g = list(zip(g.q_id.tolist(), g.q_first.tolist(),
                             g.q_last.tolist(), g.t_id.tolist(),
                             g.t_first.tolist(), g.t_last.tolist()))
            tup_w = [(r.q_id, r.q_first, r.q_last, r.t_id, r.t_first,
                      r.t_last) for r in rows]
            assert tup_g == tup_w, (thr, w)


def test_native_batched_closed_long_records():
    """The lockstep-batched closed projection (project_closed_batch,
    host_engine.cpp) must stay bit-identical to the scalar spec on
    records well past the n<=64 linear-scan cutoff — i.e. the wave
    binary searches themselves.  realistic_directed_index gives
    ~520-run-mean records; walk mode (independent linear-scan spec,
    same finish math) and the Python engine are the oracles."""
    idx = datagen.realistic_directed_index(
        seed=5, n_seqs=12, seq_len=60_000, n_aln=600, chunks=2
    )
    n = int(np.max(np.diff(np.sort(idx.records.op_off))))
    assert n > 64, "fixture must exercise the wave path"
    qrng = np.random.default_rng(9)
    targets = []
    for _ in range(40):
        tid = int(qrng.integers(0, 12))
        span = int(qrng.integers(2_000, 30_000))
        s = int(qrng.integers(0, 60_000 - span))
        targets.append((tid, s, s + span))
    ne = NativeHostEngine(idx)
    closed = ne.run(targets, max_depth=2, mode="closed")
    walk = ne.run(targets, max_depth=2, mode="walk")
    _assert_blocks_equal(closed, walk, "closed-vs-walk long records")
    py = engine.query_transitive_bfs_many(
        idx, targets, max_depth=2, columnar=True
    )
    _assert_blocks_equal(closed, py, "closed-vs-python long records")
