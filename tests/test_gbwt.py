"""Syng GBWT-lite: walk MEM matching + locate (reference: syng.rs:4022
gbwt_mems_for_walk, syng.rs:2598 dual-orientation path insertion)."""

import random

import numpy as np
import pytest

from impg_tpu.io.fasta import reverse_complement
from impg_tpu.syng.gbwt import SyngGbwt, gbwt_for_index
from impg_tpu.syng.index import SyngIndex
from tests import datagen


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n)).encode()


@pytest.fixture(scope="module")
def gbwt_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gbwt")
    rng = random.Random(11)
    a = _rand_seq(rng, 6000)
    shared = a[2000:4000]
    b = _rand_seq(rng, 1500) + shared + _rand_seq(rng, 1500)
    c = _rand_seq(rng, 1000) + reverse_complement(shared) + _rand_seq(rng, 1000)
    fa = str(tmp / "g.fa")
    datagen.write_fasta(
        fa, {"A": a.decode(), "B": b.decode(), "C": c.decode()}
    )
    idx = SyngIndex.build_from_fasta([fa])
    return idx, SyngGbwt(idx), a, b, c


def test_exact_walk_matches_everywhere(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    # The walk of A itself must match as ONE maximal run with >= 1 occurrence
    # at every step (A is indexed).
    nodes, bpos = gbwt.walk_from_sequence(a)
    assert nodes.size > 50
    assert np.all(nodes != 0)  # every syncmer of an indexed path is present
    mems = gbwt.mems_for_walk(nodes, bpos)
    assert len(mems) >= 1
    # One MEM must span the full walk (occurrences >= 1: path A).
    full = [m for m in mems if m.step_start == 0 and m.step_end == len(nodes)]
    assert full and full[0].occurrences >= 1


def test_shared_segment_occurrence_counts(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    # A read from inside the region shared by A (fwd), B (fwd), C (rc).
    read = a[2300:3700]
    nodes, bpos, used_rc = gbwt.best_orientation_walk(read)
    assert nodes.size > 10
    mems = gbwt.mems_for_walk(nodes, bpos)
    best = max(mems, key=lambda m: m.anchors)
    # The interior of the shared segment occurs on all three paths.
    assert best.occurrences == 3
    assert best.anchors > 10


def test_rc_read_matches_and_flips(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    read = reverse_complement(a[2300:3700])
    nodes, bpos, used_rc = gbwt.best_orientation_walk(read)
    mems = gbwt.mems_for_walk(nodes, bpos)
    best = max(mems, key=lambda m: m.anchors)
    assert best.occurrences == 3
    # Query coordinates stay in the read's own frame.
    assert 0 <= best.query_start < best.query_end <= len(read)


def test_junction_read_yields_two_mems(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    # A chimeric read: A[500:1500] + A[4500:5500] — two loci far apart, so
    # the walk cannot match through the junction; expect >= 2 MEMs covering
    # the two halves (the suffix-restart path of the matcher).
    read = a[500:1500] + a[4500:5500]
    nodes, bpos, _ = gbwt.best_orientation_walk(read)
    mems = gbwt.mems_for_walk(nodes, bpos)
    assert len(mems) >= 2
    covered = sum(m.anchors for m in mems)
    assert covered >= nodes.size - 2  # junction may eat a step or two


def test_offsets_gate_matching(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    nodes, bpos = gbwt.walk_from_sequence(a[1000:2000])
    assert nodes.size > 5
    whole = gbwt.mems_for_walk(nodes, bpos)
    assert max(m.anchors for m in whole) == nodes.size
    # Perturb one interior bp offset: the (node, offset) edge keying must
    # split the match (reference test_gbwt_mems_for_walk_uses_syncmer_offsets).
    mid = nodes.size // 2
    bent = bpos.copy()
    bent[mid:] += np.uint64(3)
    bent_mems = gbwt.mems_for_walk(nodes, bent)
    assert max(m.anchors for m in bent_mems) < nodes.size
    assert len(bent_mems) >= 2


def test_locate_segment_positions(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    read = a[2300:3700]
    nodes, bpos, _ = gbwt.best_orientation_walk(read)
    mems = gbwt.mems_for_walk(nodes, bpos)
    best = max(mems, key=lambda m: m.anchors)
    hits = gbwt.locate_segment(nodes, bpos, best.step_start, best.step_end)
    assert len(hits) == best.occurrences
    names = {h.path for h in hits}
    assert names == {"A", "B", "C"}
    for h in hits:
        if h.path == "A":
            assert h.forward
            # bp of the final matched step must sit inside [2300, 3700).
            assert 2300 <= h.bp < 3700
        if h.path == "C":
            assert not h.forward  # C carries the segment reverse-complemented


def test_node_count_both_orientations(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    nodes, bpos = gbwt.walk_from_sequence(a[2500:3500])
    inner = nodes[nodes != 0]
    # Shared-region nodes occur on three paths; counts are symmetric under
    # negation (the dual-orientation insertion contract).
    counts = [gbwt.node_count(int(n)) for n in inner[:10]]
    neg_counts = [gbwt.node_count(-int(n)) for n in inner[:10]]
    assert counts == neg_counts
    assert max(counts) >= 3


def test_gbwt_cached_on_index(gbwt_fixture):
    idx, gbwt, a, b, c = gbwt_fixture
    g1 = gbwt_for_index(idx)
    g2 = gbwt_for_index(idx)
    assert g1 is g2


def test_query_o_gbwt_regional_index(tmp_path):
    """query -o gbwt writes a regional syng index over fetched intervals
    (reference main.rs:7188 + syng.rs:5263 build_region_gbwt)."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(77)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=9000, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    paf = tmp_path / "p.paf"
    paf.write_text(text)

    # PAF-backed index route.
    prefix = str(tmp_path / "region")
    r = run_cli(
        "query", "-a", str(paf), "-r", "ref:1000-5000", "-d", "100",
        "-o", "gbwt", "--sequence-files", fa, "-O", prefix,
    )
    assert r.returncode == 0, r.stderr
    regional = SyngIndex.load(prefix)
    names = list(regional.seq_index.names())
    assert any(n.startswith("ref:") for n in names)
    assert len(names) >= 2  # homologs fetched too
    # Regional walks are queryable through the GBWT-lite.
    g = SyngGbwt(regional)
    src = seq_data["ref"][1500:3000].encode()
    nodes, bpos, _ = g.best_orientation_walk(src)
    mems = g.mems_for_walk(nodes, bpos)
    # The ref interval itself matches end-to-end; mutated homologs break
    # long MEMs, so a single full-span occurrence is the exact answer.
    assert mems and max(m.anchors for m in mems) == nodes.size

    # Syng-backend route keeps the parent's syncmer parameters.
    sprefix = str(tmp_path / "pan")
    r = run_cli("syng", "-f", fa, "-o", sprefix)
    assert r.returncode == 0, r.stderr
    rprefix = str(tmp_path / "region2")
    r = run_cli(
        "query", "-a", sprefix + ".syngt", "-r", "ref:1000-5000",
        "-d", "100", "-o", "gbwt", "--sequence-files", fa, "-O", rprefix,
    )
    assert r.returncode == 0, r.stderr
    regional2 = SyngIndex.load(rprefix)
    parent = SyngIndex.load(sprefix)
    assert (regional2.k, regional2.w, regional2.seed) == (
        parent.k, parent.w, parent.seed,
    )
    assert any(n.startswith("ref:") for n in regional2.seq_index.names())
