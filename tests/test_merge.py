"""Merge pipeline semantics (reference: main.rs:12474-13180)."""

import numpy as np

from impg_tpu.core import cigar
from impg_tpu.query.engine import Row
from impg_tpu.query.merge import (
    merge_adjusted_intervals,
    merge_adjusted_intervals_gap_2d,
    merge_consecutive_runs,
    merge_query_adjusted_intervals,
)


def row(q_id, qf, ql, cg, t_id, tf, tl):
    runs = cigar.parse_one(cg) if isinstance(cg, str) else cg
    return Row(q_id, qf, ql, runs, t_id, tf, tl)


def test_merge_consecutive_runs():
    runs = cigar.parse_one("5=5=3X3X2I")
    assert cigar.format_runs(merge_consecutive_runs(runs)) == "10=6X2I"


def test_query_merge_within_distance():
    rows = [
        row(1, 0, 100, None, 0, 0, 100),
        row(1, 150, 250, None, 0, 200, 300),
        row(2, 0, 50, None, 0, 0, 50),
    ]
    merge_query_adjusted_intervals(rows, 100, True)
    assert [(r.q_id, r.q_first, r.q_last) for r in rows] == [
        (1, 0, 250),
        (2, 0, 50),
    ]


def test_query_merge_distance_exceeded():
    rows = [
        row(1, 0, 100, None, 0, 0, 100),
        row(1, 250, 350, None, 0, 200, 300),
    ]
    merge_query_adjusted_intervals(rows, 100, True)
    assert [(r.q_first, r.q_last) for r in rows] == [(0, 100), (250, 350)]


def test_query_merge_strand_policy():
    rows = [
        row(1, 0, 100, None, 0, 0, 100),
        row(1, 250, 110, None, 0, 200, 300),  # reverse strand, adjacent
    ]
    # merge_strands=False: kept separate.
    r2 = [Row(r.q_id, r.q_first, r.q_last, r.cigar, r.t_id, r.t_first, r.t_last) for r in rows]
    merge_query_adjusted_intervals(r2, 100, False)
    assert len(r2) == 2
    # merge_strands=True: merged; orientation of the larger span (reverse, 140).
    merge_query_adjusted_intervals(rows, 100, True)
    assert len(rows) == 1
    assert (rows[0].q_first, rows[0].q_last) == (250, 0)


def test_adjusted_merge_contiguous_concatenates_cigars():
    rows = [
        row(1, 0, 100, "100=", 2, 0, 100),
        row(1, 100, 200, "100=", 2, 100, 200),
    ]
    merge_adjusted_intervals(rows, 0)
    assert len(rows) == 1
    assert (rows[0].q_first, rows[0].q_last) == (0, 200)
    assert (rows[0].t_first, rows[0].t_last) == (0, 200)
    assert cigar.format_runs(rows[0].cigar) == "200="


def test_adjusted_merge_gap_fill():
    rows = [
        row(1, 0, 100, "100=", 2, 0, 100),
        row(1, 110, 200, "90=", 2, 105, 195),
    ]
    merge_adjusted_intervals(rows, 20)
    assert len(rows) == 1
    # query gap 10 -> 10I, target gap 5 -> 5D
    assert cigar.format_runs(rows[0].cigar) == "100=10I5D90="
    assert (rows[0].q_first, rows[0].q_last) == (0, 200)
    assert (rows[0].t_first, rows[0].t_last) == (0, 195)


def test_adjusted_merge_reverse_orientation():
    # Reverse rows: q_first > q_last. Contiguity: curr.q_first == next.q_last.
    rows = [
        row(1, 200, 100, "100=", 2, 0, 100),
        row(1, 100, 0, "100=", 2, 100, 200),
    ]
    merge_adjusted_intervals(rows, 0)
    assert len(rows) == 1
    assert (rows[0].q_first, rows[0].q_last) == (200, 0)
    assert (rows[0].t_first, rows[0].t_last) == (0, 200)
    assert cigar.format_runs(rows[0].cigar) == "200="


def test_adjusted_merge_different_targets_kept():
    rows = [
        row(1, 0, 100, "100=", 2, 0, 100),
        row(1, 100, 200, "100=", 3, 100, 200),
    ]
    merge_adjusted_intervals(rows, 10)
    assert len(rows) == 2


def test_gap_2d_merges_fragmented_chain():
    rows = [
        row(1, 0, 100, None, 2, 0, 100),
        row(1, 120, 220, None, 2, 130, 230),
        row(1, 500, 600, None, 2, 510, 610),
    ]
    merge_adjusted_intervals_gap_2d(rows, 50)
    spans = sorted((r.q_first, r.q_last, r.t_first, r.t_last) for r in rows)
    assert spans == [(0, 220, 0, 230), (500, 600, 510, 610)]


def test_gap_2d_respects_strand_groups():
    rows = [
        row(1, 0, 100, None, 2, 0, 100),
        row(1, 220, 120, None, 2, 130, 230),  # reverse strand
    ]
    merge_adjusted_intervals_gap_2d(rows, 1000)
    assert len(rows) == 2
