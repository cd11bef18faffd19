"""Syng chained transitive queries (reference: syng_transitive.rs —
anchor chaining + multihop walk with visited bookkeeping)."""

import random

import pytest

from impg_tpu.syng.index import SyngIndex
from impg_tpu.syng.transitive import chain_region, query_transitive
from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("syngtrans")
    rng = random.Random(77)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=15_000, return_sequences=True
    )
    fa = str(tmp / "panel.fa")
    datagen.write_fasta(fa, seq_data)
    idx = SyngIndex.build_from_fasta([fa])
    return tmp, fa, idx, seq_data


def test_chain_region_finds_homologs(panel):
    tmp, fa, idx, seq_data = panel
    L = len(seq_data["ref"])
    chains = chain_region(idx, "ref", 2_000, 10_000)
    assert chains
    genomes = {c.genome for c in chains}
    assert genomes & {"s0", "s1", "s2"}, genomes
    for c in chains:
        assert c.n_anchors >= 3
        assert 0 <= c.t_start < c.t_end
        assert c.q_start < c.q_end
        # Query span stays within (padded) region bounds.
        assert c.q_start >= 1_000 and c.q_end <= 11_000
        assert c.strand in "+-"
    # Chains are big: the chain-mutated homolog should cover most of the
    # queried span on at least one target.
    best = max(chains, key=lambda c: c.t_end - c.t_start)
    assert best.t_end - best.t_start > 4_000


def test_chain_region_reverse_strand(panel, tmp_path):
    """An RC'd copy must chain on the '-' strand with mirrored target span."""
    from impg_tpu.io.fasta import reverse_complement

    tmp, fa, idx, seq_data = panel
    rc = reverse_complement(seq_data["ref"].encode()).decode()
    fa2 = str(tmp_path / "rc.fa")
    datagen.write_fasta(fa2, {"fwd": seq_data["ref"], "rev": rc})
    idx2 = SyngIndex.build_from_fasta([fa2])
    chains = [
        c for c in chain_region(idx2, "fwd", 1_000, 6_000)
        if c.genome == "rev"
    ]
    assert chains
    assert all(c.strand == "-" for c in chains)
    L = len(seq_data["ref"])
    best = max(chains, key=lambda c: c.n_anchors)
    # Mirrored coordinates: target span ~ L - query span.
    assert abs((L - best.t_end) - best.q_start) < 1_200
    assert abs((L - best.t_start) - best.q_end) < 1_200


def test_query_transitive_walk(panel):
    tmp, fa, idx, seq_data = panel
    rows = query_transitive(idx, "ref", 2_000, 10_000, max_depth=2)
    assert rows[0].q_id == rows[0].t_id == idx.seq_index.get_id("ref")
    hit_names = {
        idx.seq_index.get_name(r.q_id) for r in rows[1:]
    }
    assert hit_names & {"s0", "s1", "s2"}
    # Visited bookkeeping: no two result rows cover the identical span on
    # the same sequence twice from hop frontiers (seed row excluded).
    seen = set()
    for r in rows[1:]:
        key = (r.q_id, min(r.q_first, r.q_last), max(r.q_first, r.q_last))
        seen.add(key)
    assert len(seen) > 0
    # Depth 0 = direct only; depth 2 must find at least as much.
    rows_d1 = query_transitive(idx, "ref", 2_000, 10_000, max_depth=1)
    assert len(rows) >= len(rows_d1)


def test_cli_syng_transitive(panel, tmp_path):
    tmp, fa, idx, seq_data = panel
    prefix = str(tmp_path / "p")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "query", "-a", prefix + ".syngt", "-r", "ref:2000-10000",
        "-d", "100", "-x",
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l]
    assert lines
    names = {l.split("\t")[0] for l in lines}
    assert "ref" in names and names & {"s0", "s1", "s2"}, names
    # bedpe too.
    r = run_cli(
        "query", "-a", prefix + ".syngt", "-r", "ref:2000-10000",
        "-d", "100", "-x", "-o", "bedpe",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()
