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


def test_refine_chain_ends_recovers_exact_boundaries(tmp_path):
    """Ends-only boundary refinement (syng_transitive.rs:485): with
    sequences, chain target bounds snap to the true homology boundaries
    instead of padded linear guesses."""
    import random

    from impg_tpu.io.fasta import UnifiedSequenceIndex, reverse_complement
    from impg_tpu.syng.transitive import chain_region, refine_chain_ends

    rng = random.Random(33)
    core = "".join(rng.choice("ACGT") for _ in range(4000))
    # B carries core exactly, embedded at a known offset.
    b_pre = "".join(rng.choice("ACGT") for _ in range(1500))
    b = b_pre + core + "".join(rng.choice("ACGT") for _ in range(1500))
    # C carries the RC of core.
    c_pre = "".join(rng.choice("ACGT") for _ in range(800))
    c = (
        c_pre
        + reverse_complement(core.encode()).decode()
        + "".join(rng.choice("ACGT") for _ in range(800))
    )
    a = "".join(rng.choice("ACGT") for _ in range(500)) + core + "".join(
        rng.choice("ACGT") for _ in range(500)
    )
    fa = str(tmp_path / "r.fa")
    datagen.write_fasta(fa, {"A": a, "B": b, "C": c})
    syng = SyngIndex.build_from_fasta([fa])
    seq_idx = UnifiedSequenceIndex.from_files([fa])

    # Query the exact core interval on A.
    start, end = 500, 500 + len(core)
    chains = chain_region(syng, "A", start, end)
    by_genome = {c2.genome: c2 for c2 in chains if c2.genome != "A"}
    assert "B" in by_genome and "C" in by_genome
    refine_chain_ends(syng, chains, seq_idx, "A", start, end)
    bch = by_genome["B"]
    # Exact homology: refined bounds within a few bp of the true interval.
    assert abs(bch.t_start - 1500) <= 2, bch
    assert abs(bch.t_end - (1500 + len(core))) <= 2, bch
    cch = by_genome["C"]
    assert cch.strand == "-"
    assert abs(cch.t_start - 800) <= 2, cch
    assert abs(cch.t_end - (800 + len(core))) <= 2, cch


def test_cli_syng_transitive_with_refinement(tmp_path):
    import random

    from tests.test_cli import run_cli

    rng = random.Random(34)
    core = "".join(rng.choice("ACGT") for _ in range(3000))
    a = "".join(rng.choice("ACGT") for _ in range(400)) + core
    b = "".join(rng.choice("ACGT") for _ in range(900)) + core
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, {"A": a, "B": b})
    prefix = str(tmp_path / "p")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "query", "-a", prefix + ".syngt", "-r", "A:400-3400", "-d", "100",
        "-x", "-o", "bed", "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in r.stdout.splitlines()]
    b_rows = [f for f in rows if f[0] == "B"]
    assert b_rows
    # Refined projection lands on B's true core interval.
    s, e = int(b_rows[0][1]), int(b_rows[0][2])
    assert abs(s - 900) <= 5 and abs(e - 3900) <= 5, (s, e)


def test_sweep_chaining_reports_duplicated_copies(tmp_path):
    """Segmental duplication: BOTH copies on the same target chain
    (sweepga scaffold chaining role; single-LIS kept only one)."""
    import random

    rng = random.Random(91)
    core = "".join(rng.choice("ACGT") for _ in range(2500))
    # B carries TWO copies of core at different loci.
    b = (
        "".join(rng.choice("ACGT") for _ in range(1000))
        + core
        + "".join(rng.choice("ACGT") for _ in range(2000))
        + core
        + "".join(rng.choice("ACGT") for _ in range(1000))
    )
    a = "".join(rng.choice("ACGT") for _ in range(600)) + core + "".join(
        rng.choice("ACGT") for _ in range(600)
    )
    fa = str(tmp_path / "dup.fa")
    datagen.write_fasta(fa, {"A": a, "B": b})
    syng = SyngIndex.build_from_fasta([fa])
    chains = chain_region(syng, "A", 600, 600 + len(core))
    b_chains = [c for c in chains if c.genome == "B"]
    assert len(b_chains) >= 2, b_chains
    starts = sorted(c.t_start for c in b_chains)
    # One chain near each copy locus (1000 and 1000+2500+2000=5500).
    assert abs(starts[0] - 1000) < 1200
    assert abs(starts[-1] - 5500) < 1200


def test_refine_survives_large_end_gap(tmp_path):
    """A chain whose first anchor sits far past the region start must not
    overflow the native aligner (the query gap is bounded to the end
    window now), and refined query/target spans stay consistent."""
    import random

    import numpy as np

    from impg_tpu.io.fasta import UnifiedSequenceIndex
    from impg_tpu.syng.index import SyngIndex
    from impg_tpu.syng import transitive as tr

    rng = random.Random(9)
    prefix = "".join(rng.choice("ACGT") for _ in range(150_000))
    shared = "".join(rng.choice("ACGT") for _ in range(3000))
    other_pad = "".join(rng.choice("ACGT") for _ in range(2000))
    seqs = {
        "big": (prefix + shared).encode(),
        "small": (other_pad + shared).encode(),
    }
    fa = str(tmp_path / "g.fa")
    with open(fa, "w") as fh:
        for nm, sq in seqs.items():
            fh.write(f">{nm}\n{sq.decode()}\n")
    syng = SyngIndex.build(list(seqs.items()))
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    rows = tr.query_transitive(
        syng, "big", 0, len(seqs["big"]), max_depth=1, seq_idx=seq_idx
    )
    homologs = [r for r in rows if r.q_id == syng.seq_index.get_id("small")]
    assert homologs, "shared block not found"
    for r in homologs:
        q_span = abs(r.q_last - r.q_first)
        t_span = abs(r.t_last - r.t_first)
        # Spans describe the same correspondence: neither side may claim
        # multiples of the other (was up to gap - extend_budget off).
        assert q_span <= 2 * t_span + 100 and t_span <= 2 * q_span + 100, (
            q_span, t_span
        )
