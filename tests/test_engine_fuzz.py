"""Randomized cross-engine exactness: host vs device(CPU-forced) vs
columnar vs native-bookkeeping paths agree row-for-row across ingest
formats (the BASELINE 'exact BED/BEDPE equality' contract, checked
against our own engine matrix since the Rust binary cannot build here)."""

import os
import random
import tempfile

import numpy as np
import pytest

from impg_tpu.index.impg_index import ImpgIndex, load_or_build
from impg_tpu.io import onealn, tpa
from impg_tpu.query import engine
from tests import datagen


def _rows_key(index, rows):
    return sorted(
        (
            index.seq_index.get_name(r.q_id), r.q_first, r.q_last,
            index.seq_index.get_name(r.t_id), r.t_first, r.t_last,
        )
        for r in rows
    )


def test_host_native_filter_sweep(tmp_path):
    """Wide-seed host-vs-native sweep over random workload shapes and
    filter combinations (depth 0-3, min-identity, min-output-length) —
    the round-4 80/200-seed ad-hoc sweeps promoted to CI scale (runs in
    a few seconds; the engines share no bookkeeping code)."""
    from impg_tpu.query.host_native import NativeHostEngine

    def norm(index, rows):
        return sorted(
            (index.seq_index.get_name(r.q_id), r.q_first, r.q_last,
             index.seq_index.get_name(r.t_id), r.t_first, r.t_last)
            for r in rows
        )

    for seed in range(1300, 1330):
        rng = random.Random(seed)
        text, seqs, _ = datagen.pangenome_paf(
            rng, n_seqs=rng.randint(3, 10), seq_len=rng.randint(5000, 30000),
            cross_links=rng.randint(1, 5),
        )
        paf = str(tmp_path / f"s{seed}.paf")
        with open(paf, "w") as fh:
            fh.write(text)
        index = load_or_build([paf])
        try:
            ne = NativeHostEngine(index)
        except RuntimeError:
            pytest.skip("native library unavailable")
        qrng = random.Random(seed * 13)
        names = list(seqs)
        targets = []
        for _ in range(8):
            nm = names[qrng.randrange(len(names))]
            L = seqs[nm]
            s = qrng.randrange(0, max(1, L - 2000))
            targets.append(
                (index.seq_index.get_id(nm), s,
                 min(L, s + qrng.randint(300, 4000)))
            )
        depth = qrng.choice([0, 1, 2, 3])
        mi = qrng.choice([None, None, 0.9])
        mol = qrng.choice([None, 200])
        host = engine.query_transitive_bfs_many(
            index, targets, max_depth=depth, min_identity=mi,
            min_output_length=mol,
        )
        nat = engine.query_transitive_bfs_many(
            index, targets, max_depth=depth, min_identity=mi,
            min_output_length=mol, device_engine=ne,
        )
        for w, (h, n2) in enumerate(zip(host, nat)):
            assert norm(index, h) == norm(index, n2), (seed, w, depth, mi, mol)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_cross_engine_exactness(seed, tmp_path):
    rng = random.Random(seed)
    text, seqs, alns = datagen.pangenome_paf(
        rng, n_seqs=7, seq_len=40_000, cross_links=3
    )
    paf = str(tmp_path / "f.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])

    qrng = random.Random(seed + 1)
    names = list(seqs)
    targets = []
    for _ in range(30):
        nm = names[qrng.randrange(len(names))]
        L = seqs[nm]
        s = qrng.randrange(0, max(1, L - 6000))
        targets.append((index.seq_index.get_id(nm), s, s + 6000))

    # 1. Host Python bookkeeping (fallback oracle).
    real_vb = engine._vb_lib
    try:
        engine._vb_lib = lambda: None
        oracle = [
            _rows_key(index, rows)
            for rows in engine.query_transitive_bfs_many(
                index, targets, max_depth=2
            )
        ]
    finally:
        engine._vb_lib = real_vb

    # 2. Native bookkeeping, Row mode.
    native = engine.query_transitive_bfs_many(index, targets, max_depth=2)
    assert [_rows_key(index, r) for r in native] == oracle

    # 3. Columnar mode.
    blocks = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, columnar=True
    )
    assert [_rows_key(index, b.to_rows()) for b in blocks] == oracle

    # 4. Device engine (CPU-forced by conftest), columnar, lean fields.
    from impg_tpu.query.device import DeviceEngine

    dev = DeviceEngine(index, chunk=64)
    dev_blocks = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, device_engine=dev, columnar=True
    )
    assert [_rows_key(index, b.to_rows()) for b in dev_blocks] == oracle

    # 5. Full-native C++ engine (auto's default executor), both cost
    # models, dispatched through the product entry point.
    try:
        from impg_tpu.query.host_native import NativeHostEngine

        for mode in ("closed", "walk"):
            ne = NativeHostEngine(index, mode=mode)
            nat_blocks = engine.query_transitive_bfs_many(
                index, targets, max_depth=2, device_engine=ne,
                columnar=True,
            )
            assert [
                _rows_key(index, b.to_rows()) for b in nat_blocks
            ] == oracle, mode
    except RuntimeError:
        pass  # native lib unavailable

    # 6. Approximate mode is self-consistent across host and device.
    index.ensure_tracepoints(100)
    host_ap = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, approximate=True
    )
    dev_ap = engine.query_transitive_bfs_many(
        index, targets, max_depth=2,
        device_engine=DeviceEngine(index, chunk=64, with_tracepoints=True),
        approximate=True, columnar=True,
    )
    assert [
        _rows_key(index, b.to_rows()) for b in dev_ap
    ] == [_rows_key(index, r) for r in host_ap]


@pytest.mark.parametrize("fmt", ["1aln", "tpa"])
def test_container_ingest_exactness(fmt, tmp_path):
    """Container round-trips keep transitive BED results exact (interval
    endpoints are exact in approximate reconstruction by contract)."""
    rng = random.Random(77)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=8000, return_sequences=True
    )
    paf = str(tmp_path / "c.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    tp = index.ensure_tracepoints(100)
    out = str(tmp_path / ("c." + fmt))
    if fmt == "1aln":
        onealn.write_1aln(out, index.seq_index, index.records, index.arena, tp)
    else:
        tpa.write_tpa(out, index.seq_index, index.records, index.arena, tp)
    idx2 = ImpgIndex.from_paf_files([out])
    for nm, L in seqs.items():
        t1 = index.seq_index.get_id(nm)
        t2 = idx2.seq_index.get_id(nm)
        a = [
            _rows_key(index, r)
            for r in engine.query_transitive_bfs_many(
                index, [(t1, 0, L)], max_depth=2
            )
        ]
        b = [
            _rows_key(idx2, r)
            for r in engine.query_transitive_bfs_many(
                idx2, [(t2, 0, L)], max_depth=2
            )
        ]
        assert a == b, nm


def test_device_reuses_cached_tracepoint_spacing(tmp_path):
    """DeviceEngine must reuse the index's cached tracepoint arena —
    rebuilding at the default spacing silently diverged device
    approximate results from host steps built at a custom spacing."""
    rng = random.Random(1001)
    text, seqs, alns = datagen.pangenome_paf(
        rng, n_seqs=2, seq_len=3000, cross_links=0
    )
    paf = str(tmp_path / "sp.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    index.ensure_tracepoints(50)
    from impg_tpu.query.device import DeviceEngine

    dev = DeviceEngine(index, chunk=16, with_tracepoints=True)
    assert dev.dindex.tp_spacing == 50
    targets = [
        (index.seq_index.get_id(nm), 70, min(1200, L))
        for nm, L in seqs.items()
    ]
    host = engine.query_transitive_bfs_many(
        index, targets, max_depth=1, approximate=True
    )
    devr = engine.query_transitive_bfs_many(
        index, targets, max_depth=1, approximate=True,
        device_engine=dev, columnar=True,
    )
    assert [
        _rows_key(index, b.to_rows()) for b in devr
    ] == [_rows_key(index, r) for r in host]


def test_single_walk_matches_legacy_oracle(tmp_path):
    """query_transitive_bfs (now routed through the many-walk engine)
    matches the retired standalone implementation, masked regions
    included."""
    from impg_tpu.core.intervals import SortedRanges

    rng = random.Random(55)
    text, seqs, alns = datagen.pangenome_paf(
        rng, n_seqs=6, seq_len=20_000, cross_links=2
    )
    paf = str(tmp_path / "s.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    names = list(seqs)
    qrng = random.Random(9)
    for trial in range(8):
        nm = names[qrng.randrange(len(names))]
        L = seqs[nm]
        s = qrng.randrange(0, max(1, L - 4000))
        tid = index.seq_index.get_id(nm)
        masked = None
        if trial % 2:
            sr = SortedRanges(L, 0)
            sr.insert((s + 500, s + 1500))
            masked = {tid: sr}
        a = engine.query_transitive_bfs(
            index, tid, s, s + 4000, masked_regions=masked, max_depth=2
        )
        b = engine._query_transitive_bfs_legacy(
            index, tid, s, s + 4000, masked_regions=masked, max_depth=2
        )
        assert _rows_key(index, a) == _rows_key(index, b), trial
