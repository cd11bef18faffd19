"""Transitive closure semantics (reference: test_transitive_integrity.rs)."""

import random

from impg_tpu.query import engine
from impg_tpu.query.merge import merge_query_adjusted_intervals
from tests import datagen, pyref
from tests.test_query import index_from_text


def covered(results, index, name):
    """Union of covered positions on sequence `name` across result rows."""
    sid = index.seq_index.get_id(name)
    out = set()
    for r in results:
        if r.q_id == sid:
            lo, hi = sorted((r.q_first, r.q_last))
            out.update(range(lo, hi))
    return out


def test_chain_transitive_reaches_depth():
    """ref <- s0 <- s1 <- s2: depth-limited BFS reaches exactly d hops."""
    rng = random.Random(42)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=4, seq_len=3000)
    index = index_from_text(text)
    rid = index.seq_index.get_id("ref")

    res_d1 = engine.query_transitive_bfs(index, rid, 500, 1500, max_depth=1)
    names_d1 = {index.seq_index.get_name(r.q_id) for r in res_d1}
    assert "s0" in names_d1
    assert "s1" not in names_d1  # two hops away

    res_d3 = engine.query_transitive_bfs(index, rid, 500, 1500, max_depth=3)
    names_d3 = {index.seq_index.get_name(r.q_id) for r in res_d3}
    assert {"ref", "s0", "s1", "s2"} <= names_d3


def test_bfs_dfs_same_coverage():
    """BFS and DFS orders differ but merged coverage must match."""
    rng = random.Random(17)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=5, seq_len=2000)
    index = index_from_text(text)
    rid = index.seq_index.get_id("ref")
    bfs = engine.query_transitive_bfs(index, rid, 200, 1800, max_depth=0)
    dfs = engine.query_transitive_dfs(index, rid, 200, 1800, max_depth=0)
    for name in seqs:
        cov_b = covered(bfs, index, name)
        cov_d = covered(dfs, index, name)
        # Identical coverage sets up to per-walk range-splitting slop at
        # boundaries: require symmetric difference to be tiny.
        assert len(cov_b ^ cov_d) <= 64, name


def test_nonoverlapping_regions_stay_separate():
    """Two disjoint alignments must not bleed into each other transitively."""
    lines = [
        datagen.make_paf_line("a", 1000, 0, 400, "+", "ref", 1000, 0, 400,
                              pyref.parse_cigar("400=")),
        datagen.make_paf_line("b", 1000, 600, 1000, "+", "ref", 1000, 600, 1000,
                              pyref.parse_cigar("400=")),
    ]
    index = index_from_text("\n".join(lines) + "\n")
    rid = index.seq_index.get_id("ref")
    res = engine.query_transitive_bfs(index, rid, 0, 400, max_depth=0)
    names = {index.seq_index.get_name(r.q_id) for r in res}
    assert names == {"ref", "a"}
    # 'b' aligns to ref:600-1000, disjoint from the 0-400 query.
    assert "b" not in names


def test_bidirectional_reachability():
    """A->B alignment must make B queryable toward A (reversed entries)."""
    lines = [
        datagen.make_paf_line("A", 500, 100, 300, "+", "B", 500, 200, 400,
                              pyref.parse_cigar("200=")),
    ]
    index = index_from_text("\n".join(lines) + "\n")
    # Query on A (which is only a PAF query, never a PAF target).
    aid = index.seq_index.get_id("A")
    res = engine.query(index, aid, 100, 300)
    by_name = {
        index.seq_index.get_name(r.q_id): (r.q_first, r.q_last)
        for r in res
        if r.q_id != aid
    }
    assert by_name == {"B": (200, 400)}


def test_bidirectional_reverse_strand_roundtrip():
    """Reverse-strand swapped entries project consistently both ways."""
    ops = pyref.parse_cigar("100=10I90=5D50=")
    t_span = 100 + 90 + 5 + 50  # 245
    q_span = 100 + 10 + 90 + 50  # 250
    lines = [
        datagen.make_paf_line("A", 400, 50, 50 + q_span, "-", "B", 400, 80,
                              80 + t_span, ops),
    ]
    index = index_from_text("\n".join(lines) + "\n")
    aid = index.seq_index.get_id("A")
    bid = index.seq_index.get_id("B")
    res_a = engine.query(index, aid, 50, 50 + q_span)
    b_hits = [r for r in res_a if r.q_id == bid]
    assert len(b_hits) == 1
    lo, hi = sorted((b_hits[0].q_first, b_hits[0].q_last))
    assert (lo, hi) == (80, 80 + t_span)
    # And back.
    res_b = engine.query(index, bid, 80, 80 + t_span)
    a_hits = [r for r in res_b if r.q_id == aid]
    assert len(a_hits) == 1
    lo, hi = sorted((a_hits[0].q_first, a_hits[0].q_last))
    assert (lo, hi) == (50, 50 + q_span)


def test_min_transitive_len_blocks_small_seeds():
    rng = random.Random(3)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=3, seq_len=2000)
    index = index_from_text(text)
    rid = index.seq_index.get_id("ref")
    # Range shorter than min_transitive_len: seeds no expansion at all.
    res = engine.query_transitive_bfs(
        index, rid, 1000, 1050, max_depth=3, min_transitive_len=101
    )
    # Only depth-0 self rows plus nothing (frontier never seeded).
    assert all(r.q_id == rid for r in res)


def test_masked_regions_suppress_results():
    from impg_tpu.core.intervals import SortedRanges

    rng = random.Random(8)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=3, seq_len=2000)
    index = index_from_text(text)
    rid = index.seq_index.get_id("ref")
    s0 = index.seq_index.get_id("s0")
    mask = {}
    sr = SortedRanges(0, 0)
    sr.insert((0, seqs["s0"]))
    mask[s0] = sr
    res = engine.query_transitive_bfs(
        index, rid, 200, 1800, masked_regions=mask, max_depth=0
    )
    # s0 fully masked: it may appear in output rows (projection still emits)
    # but must never seed deeper exploration -> s1 unreachable.
    names = {index.seq_index.get_name(r.q_id) for r in res}
    assert "s1" not in names


def test_bfs_many_native_bookkeeping_parity(monkeypatch):
    """The native visited-book path (native/visited.cpp) returns exactly
    the Python SortedRanges rows, frontier merges included."""
    import random

    from impg_tpu.index.impg_index import load_or_build
    from impg_tpu.query import engine
    from tests import datagen

    rng = random.Random(17)
    text, seqs, alns = datagen.pangenome_paf(rng, n_seqs=8, seq_len=30_000)
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        paf = os.path.join(td, "p.paf")
        with open(paf, "w") as fh:
            fh.write(text)
        index = load_or_build([paf])
        names = list(seqs)
        qrng = random.Random(5)
        targets = []
        for _ in range(40):
            nm = names[qrng.randrange(len(names))]
            L = seqs[nm]
            s = qrng.randrange(0, max(1, L - 5000))
            targets.append((index.seq_index.get_id(nm), s, s + 5000))

        def rows_key(res):
            return [
                sorted(
                    (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
                    for r in rows
                )
                for rows in res
            ]

        for kwargs in (
            dict(),
            dict(min_output_length=300),
            dict(store_cigar=True),
            dict(max_depth=3, min_distance_between_ranges=50),
        ):
            native = engine.query_transitive_bfs_many(
                index, targets, **kwargs
            )
            monkeypatch.setattr(engine, "_vb_lib", lambda: None)
            python = engine.query_transitive_bfs_many(
                index, targets, **kwargs
            )
            monkeypatch.undo()
            assert rows_key(native) == rows_key(python), kwargs
            if kwargs.get("store_cigar"):
                for rn, rp in zip(native, python):
                    for a, b in zip(rn, rp):
                        if a.cigar is None:
                            assert b.cigar is None
                        else:
                            import numpy as np

                            assert np.array_equal(a.cigar, b.cigar)


def test_bfs_many_columnar_parity():
    """Columnar RowBlocks carry exactly the same rows as the Row lists."""
    import os
    import random
    import tempfile

    from impg_tpu.index.impg_index import load_or_build
    from impg_tpu.query import engine
    from tests import datagen

    rng = random.Random(23)
    text, seqs, alns = datagen.pangenome_paf(rng, n_seqs=6, seq_len=25_000)
    with tempfile.TemporaryDirectory() as td:
        paf = os.path.join(td, "p.paf")
        with open(paf, "w") as fh:
            fh.write(text)
        index = load_or_build([paf])
        names = list(seqs)
        qrng = random.Random(3)
        targets = []
        for _ in range(25):
            nm = names[qrng.randrange(len(names))]
            L = seqs[nm]
            s = qrng.randrange(0, max(1, L - 4000))
            targets.append((index.seq_index.get_id(nm), s, s + 4000))
        for kwargs in (dict(), dict(min_output_length=250)):
            rows = engine.query_transitive_bfs_many(index, targets, **kwargs)
            blocks = engine.query_transitive_bfs_many(
                index, targets, columnar=True, **kwargs
            )
            assert [len(b) for b in blocks] == [len(r) for r in rows]
            for rlist, block in zip(rows, blocks):
                got = [
                    (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
                    for r in block.to_rows()
                ]
                want = [
                    (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
                    for r in rlist
                ]
                assert got == want
