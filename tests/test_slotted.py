"""Slotted device execution (query/device.py _stream_slotted): parity with
the windowed grid path on every fields variant, with slot splitting and
cap-growth retries forced by tiny slot parameters."""

import random

import numpy as np
import pytest

from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.core import arena as arena_mod
from impg_tpu.io import paf as paf_mod
from impg_tpu.query import engine
from impg_tpu.query.device import DeviceEngine
from tests import datagen


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(5)
    text, _seqs, _alns = datagen.pangenome_paf(
        rng, n_seqs=12, seq_len=50_000, cross_links=4
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
    index.ensure_tracepoints(100)
    qr = np.random.default_rng(2)
    n = 40
    tids = qr.integers(0, len(seq_index), n).astype(np.int32)
    spans = qr.integers(1_000, 20_000, n)
    starts = qr.integers(0, 30_000, n)
    q_s = starts.astype(np.int32)
    q_e = np.minimum(starts + spans, 50_000).astype(np.int32)
    return index, tids, q_s, q_e


def _collect(stream):
    rows = []
    for out in stream:
        cols = sorted(k for k in out if np.ndim(out[k]) == 1)
        for i in range(out["pair_q"].size):
            rows.append(tuple(int(out[c][i]) for c in cols))
    return rows


# Explicit combo list: (approximate=True, fields=None) is not a valid
# configuration — the approximate path always streams lean stats — so it is
# excluded rather than skipped at runtime (keeps the suite at zero skips).
@pytest.mark.parametrize("fields,approximate", [
    (None, False),
    (engine.LEAN_FIELDS, False),
    (engine.LEAN_STATS_FIELDS, False),
    (engine.LEAN_FIELDS, True),
    (engine.LEAN_STATS_FIELDS, True),
])
def test_slotted_equals_windowed(setup, fields, approximate):
    index, tids, q_s, q_e = setup
    slotted = DeviceEngine(
        index, with_tracepoints=True, k_slot=8, slot_chunk=32,
        slotted=True,
    )
    slotted.slot_cap = 64  # force cap-growth retries
    windowed = DeviceEngine(index, with_tracepoints=True, slotted=False)
    a = _collect(slotted.query_batch_stream(
        tids, q_s, q_e, clip_overlap=True, approximate=approximate,
        fields=fields,
    ))
    b = _collect(windowed.query_batch_stream(
        tids, q_s, q_e, clip_overlap=True, approximate=approximate,
        fields=fields,
    ))
    assert a == b
    assert len(a) > 0


def test_slotted_bfs_matches_host(setup):
    """Full transitive BFS through the slotted engine equals the host
    engine row for row."""
    index, tids, q_s, q_e = setup
    targets = [
        (int(t), int(s), int(e))
        for t, s, e in zip(tids[:16], q_s[:16], q_e[:16])
    ]
    host = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, columnar=True
    )
    dev = DeviceEngine(index, k_slot=16, slot_chunk=64, slotted=True)
    got = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, columnar=True, device_engine=dev
    )
    for w, (g, h) in enumerate(zip(got, host)):
        for col in ("q_id", "q_first", "q_last", "t_id", "t_first",
                    "t_last"):
            assert np.array_equal(
                getattr(g, col), getattr(h, col)
            ), f"walk {w} col {col}"


def test_host_windows_match_device_stab(setup):
    """_host_windows agrees with the jitted stab_windows bounds."""
    import jax.numpy as jnp

    from impg_tpu.query.device import stab_windows

    index, tids, q_s, q_e = setup
    eng = DeviceEngine(index)
    win_lo, k = eng._host_windows(tids, q_s, q_e)
    d_lo, d_k = stab_windows(
        eng.dindex.tgt_offsets, eng.dindex.t_start, eng.dindex.cummax_te,
        jnp.asarray(tids), jnp.asarray(q_s), jnp.asarray(q_e),
        eng.dindex.window_iters, eng.dindex.n_records,
    )
    assert np.array_equal(win_lo, np.asarray(d_lo))
    assert np.array_equal(k, np.asarray(d_k))


def test_lean_engine_skips_stats_upload(setup):
    """A lean-fields stream never uploads the stats arena arrays; a full
    stream adds them on demand."""
    index, tids, q_s, q_e = setup
    eng = DeviceEngine(index)
    assert "cum_match" not in eng.dindex.arena
    list(eng.query_batch_stream(
        tids[:4], q_s[:4], q_e[:4], clip_overlap=True,
        fields=engine.LEAN_FIELDS,
    ))
    assert "cum_match" not in eng.dindex.arena
    list(eng.query_batch_stream(
        tids[:4], q_s[:4], q_e[:4], clip_overlap=True, fields=None,
    ))
    assert "cum_match" in eng.dindex.arena
