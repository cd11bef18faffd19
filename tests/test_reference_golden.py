"""Literal golden vectors transcribed from the reference's own unit tests.

Source: /root/reference/src/impg.rs:2975-3265 (`mod tests`). Every case here
carries the reference's literal inputs and expected outputs, so the oracle is
independent of SURVEY.md's prose AND of tests/pyref.py (a shared misreading
of the projection semantics would fail here).

Each projection vector is checked against BOTH:
  * tests/pyref.py `project` (the serial oracle used by the fuzz suite), and
  * the production closed-form batched path (`ops/projection.project_batch`
    over a single-record arena built through the real PAF parser).
"""

from __future__ import annotations

import numpy as np
import pytest

from impg_tpu.core import arena as arena_mod
from impg_tpu.core import cigar
from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.io import paf as paf_mod
from impg_tpu.ops import projection
from tests import pyref

# ── projection vectors ───────────────────────────────────────────────────
# (name, target_range, record=(t0, te, q0, qe, strand), ops,
#  expected=(pq_start, pq_end, clipped_ops, pt_start, pt_end))
# impg.rs line numbers note the source test.

PROJECTION_VECTORS = [
    # impg.rs:2982 test_project_target_range_through_alignment_forward
    ("forward", (100, 200), (100, 200, 0, 100, "+"), [(100, "=")],
     (0, 100, [(100, "=")], 100, 200)),
    # impg.rs:2993 test_project_target_range_through_alignment_reverse
    ("reverse", (100, 200), (100, 200, 0, 100, "-"), [(100, "=")],
     (100, 0, [(100, "=")], 100, 200)),
    # impg.rs:3004 test_project_target_range_through_alignment (six cases)
    ("mixed_full", (0, 100), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (50, 200,
      [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
      0, 100)),
    ("mixed_50_55", (50, 55), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (100, 105, [(5, "=")], 50, 55)),
    ("mixed_50_64", (50, 64), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (100, 114, [(14, "=")], 50, 64)),
    ("mixed_50_65", (50, 65), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (100, 165, [(15, "="), (50, "I")], 50, 65)),
    ("mixed_50_66", (50, 66), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (100, 166, [(15, "="), (50, "I"), (1, "=")], 50, 66)),
    ("mixed_70_95", (70, 95), (0, 100, 50, 200, "+"),
     [(10, "="), (5, "I"), (5, "D"), (50, "="), (50, "I"), (35, "=")],
     (170, 195, [(25, "=")], 70, 95)),
    # impg.rs:3059 test_forward_projection_simple
    ("fwd_simple", (100, 200), (100, 200, 100, 200, "+"), [(100, "=")],
     (100, 200, [(100, "=")], 100, 200)),
    # impg.rs:3073 test_reverse_projection_simple
    ("rev_simple", (100, 200), (100, 200, 100, 200, "-"), [(100, "=")],
     (200, 100, [(100, "=")], 100, 200)),
    # impg.rs:3088 test_forward_projection_with_insertions
    ("fwd_ins", (50, 150), (50, 150, 50, 160, "+"),
     [(50, "="), (10, "I"), (50, "=")],
     (50, 160, [(50, "="), (10, "I"), (50, "=")], 50, 150)),
    # impg.rs:3104 test_forward_projection_with_deletions
    ("fwd_del", (50, 150), (50, 150, 50, 140, "+"),
     [(50, "="), (10, "D"), (40, "=")],
     (50, 140, [(50, "="), (10, "D"), (40, "=")], 50, 150)),
    # impg.rs:3120 test_reverse_projection_with_mixed_operations
    # (reference asserts only (start, end, cigar); target span derived)
    ("rev_mixed", (150, 250), (100, 200, 200, 300, "-"),
     [(50, "="), (10, "D"), (10, "I"), (40, "=")],
     (250, 200, [(10, "D"), (10, "I"), (40, "=")], 150, 200)),
    # impg.rs:3141 test_edge_case_projection
    ("edge", (0, 10), (0, 50, 0, 40, "+"),
     [(10, "="), (20, "D"), (8, "="), (1, "X"), (1, "="), (10, "I"),
      (10, "=")],
     (0, 10, [(10, "=")], 0, 10)),
]


def _ops_str(ops):
    return "".join(f"{l}{o}" for l, o in ops)


def _directed_from_record(record, ops):
    """Build a single-record directed arena via the real PAF parser.

    The PAF line carries the alignment query=[q0,qe) target=[t0,te) with the
    given strand and CIGAR; bidirectional=False yields exactly the
    target→query directed record `project_target_range_through_alignment`
    consumes (impg.rs:2760).
    """
    t0, te, q0, qe, strand = record
    line = (
        f"seqQ\t10000\t{q0}\t{qe}\t{strand}\tseqT\t10000\t{t0}\t{te}"
        f"\t0\t0\t255\tcg:Z:{_ops_str(ops)}\n"
    )
    seq_index = SequenceIndex()
    recs = paf_mod.parse_paf_bytes(line.encode(), seq_index)
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
        bidirectional=False,
    )
    assert len(records.t_start) == 1
    return records, arena


def _project_production(record, ops, rng):
    records, arena = _directed_from_record(record, ops)
    res = projection.project_batch(
        np,
        **arena.projection_kwargs(),
        op_off=records.op_off[:1],
        op_cnt=records.op_cnt[:1],
        t_start=records.t_start[:1],
        t_end=records.t_end[:1],
        strand=records.strand[:1],
        range_start=np.array([rng[0]], np.int32),
        range_end=np.array([rng[1]], np.int32),
    )
    if not bool(res.valid[0]):
        return None
    row = dict(
        first_run=res.first_run[0],
        last_run=res.last_run[0],
        first_clip=res.first_clip[0],
        last_rem=res.last_rem[0],
    )
    runs = projection.clipped_runs(arena.runs, int(records.op_off[0]), row)
    clipped = [
        (int(r & cigar.LEN_MASK), "=XIDM"[int(r >> 29)]) for r in runs
    ]
    return (
        int(res.pq_start[0]), int(res.pq_end[0]), clipped,
        int(res.pt_start[0]), int(res.pt_end[0]),
    )


@pytest.mark.parametrize(
    "name,rng,record,ops,expected",
    PROJECTION_VECTORS,
    ids=[v[0] for v in PROJECTION_VECTORS],
)
def test_projection_reference_golden(name, rng, record, ops, expected):
    # oracle (tests/pyref.py) must reproduce the reference's literal output
    got_oracle = pyref.project(rng, record, ops)
    assert got_oracle == expected, f"pyref oracle diverges on {name}"
    # production closed-form path must too
    got_prod = _project_production(record, ops, rng)
    assert got_prod == expected, f"production projection diverges on {name}"


# ── invert_cigar_ops vectors (impg.rs:3216-3274) ─────────────────────────

INVERT_VECTORS = [
    # impg.rs:3217 test_invert_cigar_forward_strand: I<->D swap only
    ("fwd", [(10, "="), (5, "I"), (3, "D"), (7, "X")], "+",
     [(10, "="), (5, "D"), (3, "I"), (7, "X")]),
    # impg.rs:3238 test_invert_cigar_reverse_strand: swap AND reversal
    ("rev", [(10, "="), (5, "I"), (3, "D")], "-",
     [(3, "I"), (5, "D"), (10, "=")]),
    # impg.rs:3256 test_invert_cigar_empty
    ("empty_fwd", [], "+", []),
    ("empty_rev", [], "-", []),
    # impg.rs:3266 test_invert_cigar_matches_only
    ("matches_fwd", [(100, "="), (50, "X")], "+", [(100, "="), (50, "X")]),
    ("matches_rev", [(100, "="), (50, "X")], "-", [(50, "X"), (100, "=")]),
]


@pytest.mark.parametrize(
    "name,ops,strand,expected", INVERT_VECTORS, ids=[v[0] for v in INVERT_VECTORS]
)
def test_invert_cigar_reference_golden(name, ops, strand, expected):
    assert pyref.invert_ops(ops, strand) == expected
    # production packed-run inversion (core/cigar.py invert_runs)
    lens = np.array([l for l, _ in ops], np.int64)
    codes = np.array(["=XIDM".index(o) for _, o in ops], np.uint32)
    runs = cigar.pack(lens, codes)
    inv = cigar.invert_runs(runs, strand == "-")
    got = [(int(r & cigar.LEN_MASK), "=XIDM"[int(r >> 29)]) for r in inv]
    assert got == expected


# ── parse_cigar_to_delta (impg.rs:3180) ──────────────────────────────────

def test_parse_cigar_to_delta_basic_golden():
    assert pyref.parse_cigar("10=5I5D") == [(10, "="), (5, "I"), (5, "D")]
    runs = cigar.parse_one("10=5I5D")
    got = [(int(r & cigar.LEN_MASK), "=XIDM"[int(r >> 29)]) for r in runs]
    assert got == [(10, "="), (5, "I"), (5, "D")]


# ── parse_paf (impg.rs:3194 test_parse_paf_valid) ────────────────────────

def test_parse_paf_valid_golden():
    paf_data = b"seq1\t100\t10\t20\t+\tt1\t200\t30\t40\t10\t20\t255\tcg:Z:10M\n"
    seq_index = SequenceIndex()
    recs = paf_mod.parse_paf_bytes(paf_data, seq_index)
    assert len(recs.q_start) == 1
    assert seq_index.get_name(int(recs.query_id[0])) == "seq1"
    assert seq_index.get_name(int(recs.target_id[0])) == "t1"
    assert seq_index.get_len_from_id(int(recs.query_id[0])) == 100
    assert seq_index.get_len_from_id(int(recs.target_id[0])) == 200
    assert (int(recs.q_start[0]), int(recs.q_end[0])) == (10, 20)
    assert (int(recs.t_start[0]), int(recs.t_end[0])) == (30, 40)
    assert int(recs.strand[0]) == 0  # forward
    off, cnt = int(recs.run_offsets[0]), int(recs.run_offsets[1])
    runs = recs.runs[off:cnt]
    got = [(int(r & cigar.LEN_MASK), "=XIDM"[int(r >> 29)]) for r in runs]
    assert got == [(10, "M")]
