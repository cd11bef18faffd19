"""Randomized + edge-case validation of the closed-form projection against
the serial-walk oracle (semantics of impg.rs:2760-2898)."""

import random

import numpy as np

from impg_tpu.core import arena as arena_mod
from impg_tpu.core import cigar
from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.io import paf as paf_mod
from impg_tpu.ops import projection
from tests import datagen, pyref


def build_from_paf_text(text: str, bidirectional=True):
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
        bidirectional=bidirectional,
    )
    return seq_index, recs, records, arena


def oracle_for_directed(records, arena, alns, k, rng_start, rng_end):
    """Run the serial oracle for directed record k."""
    a = alns[int(records.rec_id[k])]
    strand = a["strand"]
    if records.is_reversed[k]:
        ops = pyref.invert_ops(a["ops"], strand)
        rec = (a["qstart"], a["qend"], a["tstart"], a["tend"], strand)
    else:
        ops = a["ops"]
        rec = (a["tstart"], a["tend"], a["qstart"], a["qend"], strand)
    return pyref.project((rng_start, rng_end), rec, ops)


def project_one(records, arena, k, rng_start, rng_end):
    sel = np.array([k])
    return projection.project_batch(
        np,
        **arena.projection_kwargs(),
        op_off=records.op_off[sel],
        op_cnt=records.op_cnt[sel],
        t_start=records.t_start[sel],
        t_end=records.t_end[sel],
        strand=records.strand[sel],
        range_start=np.array([rng_start], np.int32),
        range_end=np.array([rng_end], np.int32),
    )


def clipped_ops_of(records, arena, k, res):
    row = dict(
        first_run=res.first_run[0],
        last_run=res.last_run[0],
        first_clip=res.first_clip[0],
        last_rem=res.last_rem[0],
    )
    runs = projection.clipped_runs(arena.runs, int(records.op_off[k]), row)
    return [(int(r & cigar.LEN_MASK), "=XIDM"[int(r >> 29)]) for r in runs]


def check_one(records, arena, alns, k, rng_start, rng_end):
    res = project_one(records, arena, k, rng_start, rng_end)
    expected = oracle_for_directed(records, arena, alns, k, rng_start, rng_end)
    if expected is None:
        assert not bool(res.valid[0]), (
            f"rec {k} range {rng_start}-{rng_end}: expected invalid, got "
            f"{res.pq_start[0]}-{res.pq_end[0]}"
        )
        return
    pq_s, pq_e, clipped, pt_s, pt_e = expected
    assert bool(res.valid[0]), f"rec {k} range {rng_start}-{rng_end}: expected valid"
    assert int(res.pq_start[0]) == pq_s
    assert int(res.pq_end[0]) == pq_e
    assert int(res.pt_start[0]) == pt_s
    assert int(res.pt_end[0]) == pt_e
    got_ops = clipped_ops_of(records, arena, k, res)
    assert got_ops == clipped, f"rec {k} range {rng_start}-{rng_end}"
    # Identity stats of the clipped slice match the oracle's.
    m, mm, icnt, ibp, dcnt, dbp, _ = pyref.identity_stats(clipped)
    assert int(res.matches[0]) == m
    assert int(res.mismatches[0]) == mm
    assert int(res.i_count[0]) == icnt
    assert int(res.d_count[0]) == dcnt
    assert int(res.i_bp[0]) == ibp
    assert int(res.d_bp[0]) == dbp


def test_projection_randomized_vs_oracle():
    rng = random.Random(7)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=5, n_alns=60, n_ops=15)
    seq_index, recs, records, arena = build_from_paf_text(text)
    n_checks = 0
    for k in range(len(records)):
        t0 = int(records.t_start[k])
        te = int(records.t_end[k])
        for _ in range(12):
            a = rng.randint(max(0, t0 - 30), te + 30)
            b = rng.randint(max(0, t0 - 30), te + 30)
            if a == b:
                b = a + 1
            rng_start, rng_end = min(a, b), max(a, b)
            check_one(records, arena, alns, k, rng_start, rng_end)
            n_checks += 1
    assert n_checks > 500


def test_projection_edge_cases():
    # Hand-built CIGAR with boundary insertions and deletions:
    #   target: 0..30, query: 0..32 on '+'
    ops = "5=3I10D2X4I10=3D"  # t: 5+10+2+10+3=30, q: 5+3+2+4+10=24
    line = datagen.make_paf_line(
        "q", 100, 10, 34, "+", "t", 100, 20, 50, pyref.parse_cigar(ops)
    )
    seq_index, recs, records, arena = build_from_paf_text(line + "\n")
    alns = [
        dict(
            qname="q", qstart=10, qend=34, strand="+", tname="t",
            tstart=20, tend=50, ops=pyref.parse_cigar(ops),
        )
    ]
    for k in range(len(records)):
        t0 = int(records.t_start[k])
        te = int(records.t_end[k])
        for rng_start in range(max(0, t0 - 2), te + 2):
            for rng_end in range(rng_start + 1, te + 3):
                check_one(records, arena, alns, k, rng_start, rng_end)


def test_projection_reverse_strand_exhaustive():
    ops = "4=2I3D5X1I6M"
    line = datagen.make_paf_line(
        "q", 60, 5, 23, "-", "t", 60, 7, 25, pyref.parse_cigar(ops)
    )
    seq_index, recs, records, arena = build_from_paf_text(line + "\n")
    alns = [
        dict(
            qname="q", qstart=5, qend=23, strand="-", tname="t",
            tstart=7, tend=25, ops=pyref.parse_cigar(ops),
        )
    ]
    for k in range(len(records)):
        t0 = int(records.t_start[k])
        te = int(records.t_end[k])
        for rng_start in range(max(0, t0 - 2), te + 2):
            for rng_end in range(rng_start + 1, te + 3):
                check_one(records, arena, alns, k, rng_start, rng_end)


def test_projection_batch_matches_loop():
    rng = random.Random(3)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=4, n_alns=25, n_ops=10)
    seq_index, recs, records, arena = build_from_paf_text(text)
    ks, starts, ends = [], [], []
    for k in range(len(records)):
        t0, te = int(records.t_start[k]), int(records.t_end[k])
        ks.append(k)
        starts.append(max(0, t0 - 5))
        ends.append(te + 5)
    sel = np.array(ks)
    res = projection.project_batch(
        np,
        **arena.projection_kwargs(),
        op_off=records.op_off[sel],
        op_cnt=records.op_cnt[sel],
        t_start=records.t_start[sel],
        t_end=records.t_end[sel],
        strand=records.strand[sel],
        range_start=np.array(starts, np.int32),
        range_end=np.array(ends, np.int32),
    )
    for i, k in enumerate(ks):
        single = project_one(records, arena, k, starts[i], ends[i])
        for field in res._fields:
            assert np.array_equal(
                getattr(res, field)[i : i + 1], getattr(single, field)
            ), field
