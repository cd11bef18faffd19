"""Out-of-core paged device engine (query/paged.py): row parity with the
host engine under a budget forcing many pages and LRU eviction — the
index is several times larger than the configured 'HBM'."""

import random

import numpy as np
import pytest

from impg_tpu.core import arena as arena_mod
from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.io import paf as paf_mod
from impg_tpu.query import engine
from impg_tpu.query.paged import PagedDeviceEngine
from tests import datagen


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(17)
    text, _seqs, _alns = datagen.pangenome_paf(
        rng, n_seqs=14, seq_len=60_000, cross_links=5
    )
    seq_index = SequenceIndex()
    parsed = paf_mod.parse_paf_bytes(text.encode(), seq_index)
    recs, arena = arena_mod.build_directed(
        query_id=parsed.query_id, q_start=parsed.q_start,
        q_end=parsed.q_end, target_id=parsed.target_id,
        t_start=parsed.t_start, t_end=parsed.t_end, strand=parsed.strand,
        runs=parsed.runs, run_offsets=parsed.run_offsets,
    )
    index = ImpgIndex._finalize(seq_index, recs, arena, [])
    qr = np.random.default_rng(9)
    targets = []
    for _ in range(24):
        tid = int(qr.integers(0, len(seq_index)))
        span = int(qr.integers(2_000, 25_000))
        s = int(qr.integers(0, 60_000 - span))
        targets.append((tid, s, min(s + span, 60_000)))
    return index, targets


def _small_budget(index) -> int:
    # Index bytes >= 2x 'HBM': budget = half the lean page payload.
    total = index.arena.n_ops * 20 + len(index.records) * 24
    return max(total // 2, 1 << 16)


def test_paged_bfs_at_scale_many_pages():
    """Out-of-core parity at growth-policy scale: a 1.7k-record index
    under a budget one third of its lean payload (many pages + LRU
    evictions + cap growth in one run) stays row-exact vs the host
    engine — the 'index >= 2x HBM' contract at the same workload scale
    as test_device's at-scale case."""
    from tests.test_query import index_from_text

    rng = random.Random(11)
    text, seqs, _ = datagen.pangenome_paf(
        rng, n_seqs=80, seq_len=60_000, cross_links=10
    )
    index = index_from_text(text)
    total = index.arena.n_ops * 20 + len(index.records) * 24
    pe = PagedDeviceEngine(index, hbm_budget_bytes=total // 3)
    r2 = random.Random(3)
    names = list(seqs)
    targets = []
    for _ in range(6):
        n = r2.choice(names)
        L = seqs[n]
        a = r2.randint(0, L // 2)
        targets.append(
            (index.seq_index.get_id(n), a,
             r2.randint(a + 2000, min(L, a + 20000)))
        )
    host = engine.query_transitive_bfs_many(index, targets, max_depth=3)
    dev = engine.query_transitive_bfs_many(
        index, targets, max_depth=3, device_engine=pe
    )
    total_rows = 0
    for hw, dw in zip(host, dev):
        assert len(hw) == len(dw)
        total_rows += len(hw)
        for a, b in zip(hw, dw):
            assert (
                a.q_id, a.q_first, a.q_last, a.t_id, a.t_first, a.t_last
            ) == (b.q_id, b.q_first, b.q_last, b.t_id, b.t_first, b.t_last)
    assert total_rows > 10_000


def test_paged_bfs_matches_host(setup):
    index, targets = setup
    host = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, columnar=True
    )
    eng = PagedDeviceEngine(
        index, hbm_budget_bytes=_small_budget(index), k_slot=16,
        slot_chunk=64,
    )
    assert eng.n_pages >= 4, "budget should force several pages"
    got = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, columnar=True, device_engine=eng
    )
    for w, (g, h) in enumerate(zip(got, host)):
        for col in ("q_id", "q_first", "q_last", "t_id", "t_first",
                    "t_last"):
            assert np.array_equal(
                getattr(g, col), getattr(h, col)
            ), f"walk {w} col {col}"
    assert eng.evictions > 0, "LRU should have evicted under this budget"
    assert eng.uploads > eng.n_pages or eng.evictions > 0


def test_paged_respects_budget(setup):
    index, targets = setup
    budget = _small_budget(index)
    eng = PagedDeviceEngine(
        index, hbm_budget_bytes=budget, k_slot=16, slot_chunk=64
    )
    list(engine.query_transitive_bfs_many(
        index, targets[:6], max_depth=2, columnar=True, device_engine=eng
    ))
    assert len(eng._pages) * eng.page_bytes_each <= budget


def test_paged_single_hop_rows(setup):
    """Depth-1 stream parity on a fresh engine (no warm pages)."""
    index, targets = setup
    eng = PagedDeviceEngine(
        index, hbm_budget_bytes=_small_budget(index), k_slot=8,
        slot_chunk=32,
    )
    host = engine.query_transitive_bfs_many(
        index, targets, max_depth=1, columnar=True
    )
    got = engine.query_transitive_bfs_many(
        index, targets, max_depth=1, columnar=True, device_engine=eng
    )
    for g, h in zip(got, host):
        assert np.array_equal(g.q_id, h.q_id)
        assert np.array_equal(g.q_first, h.q_first)


def test_paged_stats_fields_guard(setup):
    index, targets = setup
    eng = PagedDeviceEngine(index, hbm_budget_bytes=_small_budget(index))
    with pytest.raises(ValueError):
        list(eng.query_batch_stream(
            np.asarray([0], np.int32), np.asarray([0], np.int32),
            np.asarray([100], np.int32), fields=engine.LEAN_STATS_FIELDS,
        ))
    # with_stats=True serves identity-statistics fields (min_identity).
    eng2 = PagedDeviceEngine(
        index, hbm_budget_bytes=2 * _small_budget(index), with_stats=True,
        k_slot=16, slot_chunk=64,
    )
    host = engine.query_transitive_bfs_many(
        index, targets[:8], max_depth=2, min_identity=0.9, columnar=True
    )
    got = engine.query_transitive_bfs_many(
        index, targets[:8], max_depth=2, min_identity=0.9, columnar=True,
        device_engine=eng2,
    )
    for g, h in zip(got, host):
        assert np.array_equal(g.q_id, h.q_id)
        assert np.array_equal(g.q_first, h.q_first)


def test_cli_paged_engine_budget_env(setup, tmp_path, monkeypatch):
    """--compute-engine device with a tiny IMPG_HBM_BUDGET_BYTES routes
    through the paged engine and matches the host BED output."""
    import subprocess
    import sys
    import os

    rng = random.Random(23)
    text, seqs, _alns = datagen.pangenome_paf(
        rng, n_seqs=8, seq_len=40_000, cross_links=3
    )
    paf = tmp_path / "x.paf"
    paf.write_text(text)
    from tests.envutil import cpu_env

    env = cpu_env()
    base = [sys.executable, "-m", "impg_tpu.cli", "query", "-a", str(paf),
            "-r", f"{list(seqs)[0]}:5000-20000", "-x", "-o", "bed",
            "-d", "100"]
    host = subprocess.run(
        base + ["--compute-engine", "host"], capture_output=True,
        text=True, env=env,
    )
    env_paged = dict(env, IMPG_HBM_BUDGET_BYTES="65536")
    paged = subprocess.run(
        base + ["--compute-engine", "device"], capture_output=True,
        text=True, env=env_paged,
    )
    assert host.returncode == 0, host.stderr
    assert paged.returncode == 0, paged.stderr
    assert host.stdout == paged.stdout
    assert len(host.stdout.splitlines()) > 2
