"""Tracepoint derivation + approximate mode (reference: impg.rs:1317,
notes/FAST_MODE_IMPLEMENTATION.md)."""

import random

import numpy as np
import pytest

from impg_tpu.index import tracepoints as tp_mod
from impg_tpu.query import engine
from tests import datagen
from tests.test_cli import run_cli
from tests.test_query import index_from_text


@pytest.fixture(scope="module")
def chain_index():
    rng = random.Random(77)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=4, seq_len=6000)
    return index_from_text(text), seqs, alns


def test_tracepoint_boundaries_consistent(chain_index):
    index, seqs, alns = chain_index
    tp = index.ensure_tracepoints(spacing=100)
    # Per directed record, the boundary query positions must start/end at the
    # record's directed query walk endpoints.
    for r in range(len(index.records)):
        off = int(tp.seg_off[r])
        n = int(tp.n_seg[r])
        strand = int(index.records.strand[r])
        q0 = int(index.records.q_start[r])
        qe = int(index.records.q_end[r])
        first_q = int(tp.q_bound[off])
        last_q = int(tp.q_bound[off + n])
        if strand == 0:
            assert first_q == q0 and last_q == qe, r
        else:
            assert first_q == qe, r
            # Trailing insertions may leave the final boundary a few bp short
            # of the walk end; it must lie within the span.
            assert q0 <= last_q <= qe, r
        # Diff prefix non-decreasing, aligned prefix non-decreasing.
        assert np.all(np.diff(tp.pre_diffs[off : off + n + 1]) >= 0)
        assert np.all(np.diff(tp.pre_aligned[off : off + n + 1]) >= 0)


def test_approximate_close_to_exact(chain_index):
    index, seqs, alns = chain_index
    index.ensure_tracepoints(spacing=100)
    rng = random.Random(3)
    rid = index.seq_index.get_id("ref")
    checked = 0
    for _ in range(30):
        a = rng.randint(0, 5000)
        b = a + rng.randint(300, 1000)
        exact = engine.query(index, rid, a, b)
        approx = engine.query(index, rid, a, b, approximate=True)
        ex = {
            (r.q_id, min(r.q_first, r.q_last), max(r.q_first, r.q_last))
            for r in exact[1:]
        }
        ap = {
            (r.q_id, min(r.q_first, r.q_last), max(r.q_first, r.q_last))
            for r in approx[1:]
        }
        # Same hit set of query sequences.
        assert {x[0] for x in ex} == {x[0] for x in ap}
        # Interval boundaries within one tracepoint spacing + indel slop.
        ex_by_id = {x[0]: x for x in ex}
        for qid, s, e in ap:
            es = ex_by_id[qid]
            assert abs(s - es[1]) <= 150, (qid, s, es)
            assert abs(e - es[2]) <= 150, (qid, e, es)
            checked += 1
    assert checked > 20


def test_approximate_transitive_coverage(chain_index):
    index, seqs, alns = chain_index
    rid = index.seq_index.get_id("ref")
    exact = engine.query_transitive_bfs(index, rid, 500, 4000, max_depth=3)
    approx = engine.query_transitive_bfs(
        index, rid, 500, 4000, max_depth=3, approximate=True
    )
    names_e = {r.q_id for r in exact}
    names_a = {r.q_id for r in approx}
    assert names_e == names_a


def test_approximate_identity_filter(chain_index):
    index, seqs, alns = chain_index
    rid = index.seq_index.get_id("ref")
    all_rows = engine.query(index, rid, 0, 6000, approximate=True)
    strict = engine.query(
        index, rid, 0, 6000, approximate=True, min_identity=0.999999
    )
    assert len(strict) <= len(all_rows)


def test_cli_approximate(tmp_path, chain_index):
    index, seqs, alns = chain_index
    rng = random.Random(77)
    text, _, _ = datagen.mutate_chain_paf(rng, n_seqs=4, seq_len=6000)
    paf = tmp_path / "c.paf"
    paf.write_text(text)
    r = run_cli(
        "query", "-a", str(paf), "-r", "ref:500-4000", "-d", "100", "-x",
        "--approximate", "-o", "bed",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()
    r_exact = run_cli(
        "query", "-a", str(paf), "-r", "ref:500-4000", "-d", "100", "-x",
        "-o", "bed",
    )
    names_a = {l.split("\t")[0] for l in r.stdout.splitlines()}
    names_e = {l.split("\t")[0] for l in r_exact.stdout.splitlines()}
    assert names_a == names_e
    # Rejected for PAF output.
    r = run_cli(
        "query", "-a", str(paf), "-r", "ref:500-4000", "-d", "100",
        "--approximate", "-o", "paf",
    )
    assert r.returncode == 2
    assert "approximate" in r.stderr


def test_device_approximate_matches_host(chain_index):
    from impg_tpu.query.device import DeviceEngine

    index, seqs, alns = chain_index
    index.ensure_tracepoints(100)
    dev = DeviceEngine(index, with_tracepoints=True)
    rid = index.seq_index.get_id("ref")
    host = engine.query_transitive_bfs(
        index, rid, 500, 4000, max_depth=3, approximate=True
    )
    devr = engine.query_transitive_bfs(
        index, rid, 500, 4000, max_depth=3, approximate=True,
        device_engine=dev,
    )
    assert len(host) == len(devr)
    for a, b in zip(host, devr):
        assert (a.q_id, a.t_id, a.t_first, a.t_last) == (
            b.q_id, b.t_id, b.t_first, b.t_last
        )
        # f32-vs-f64 rounding in boundary refinement may differ by 1 bp.
        assert abs(a.q_first - b.q_first) <= 1
        assert abs(a.q_last - b.q_last) <= 1
