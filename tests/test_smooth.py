"""Flubble-aware smoothing block source (reference: smooth.rs POVU-flubble
block source — block boundaries never split a variation site)."""

from impg_tpu.graph.gfa import Gfa, topological_sort
from impg_tpu.graph.smooth import _node_sites, smooth_gfa
from impg_tpu.io.fasta import reverse_complement

BUBBLE_GFA = (
    "H\tVN:Z:1.0\n"
    "S\tm\tACGTACGTAC\nS\tu\tGTT\nS\tv\tTAA\nS\tz\tCCGGCCGGCC\n"
    "L\tm\t+\tu\t+\t0M\nL\tm\t+\tv\t+\t0M\n"
    "L\tu\t+\tz\t+\t0M\nL\tv\t+\tz\t+\t0M\n"
    "P\tp1\tm+,u+,z+\t*\nP\tp2\tm+,v+,z+\t*\n"
)


def _spell(g: Gfa) -> dict:
    from impg_tpu.graph.lace import split_path_name

    out = {}
    for name, steps in g.paths:
        parsed = split_path_name(name)
        key = parsed[0] if parsed else name
        s = b""
        for sid, rev in steps:
            t = g.segments[sid].encode()
            s += reverse_complement(t) if rev else t
        out[key] = s
    return out


def test_flubble_block_source_keeps_sites_whole():
    """With block_source='flubble' a tiny block_len cannot split a bubble:
    the bubble's nodes land in one site; spellings stay exact either way."""
    g = topological_sort(Gfa.parse(BUBBLE_GFA))
    sites = _node_sites(g, g.write())
    # The bubble site m..z covers all four nodes (site sets: boundary
    # anchors may belong to two adjacent sites; here there is one site).
    assert {frozenset(v) for v in sites.values()} == {frozenset({0})}
    assert len(sites) == 4

    for source in ("fixed", "flubble"):
        out = smooth_gfa(BUBBLE_GFA, block_len=8, block_source=source)
        assert _spell(Gfa.parse(out)) == _spell(Gfa.parse(BUBBLE_GFA)), source


def test_cli_smooth_flubble_source(tmp_path):
    from tests.test_cli import run_cli

    p = tmp_path / "g.gfa"
    p.write_text(BUBBLE_GFA)
    r = run_cli(
        "smooth", str(p), "--block-source", "flubble", "--block-len", "8"
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("H\t")
    assert _spell(Gfa.parse(r.stdout)) == _spell(Gfa.parse(BUBBLE_GFA))


def test_chop_preserves_spelling():
    from impg_tpu.graph.gfa import chop_gfa

    g = Gfa.parse(BUBBLE_GFA)
    chopped = chop_gfa(g, 3)
    assert max(len(x) for x in chopped.segments.values()) <= 3
    assert _spell(chopped) == _spell(g)


def _variation_gfa(rng, n_paths=4, length=3000):
    """A linear backbone with per-path SNP bubbles, as one GFA."""
    import io as _io

    from impg_tpu.graph import seqwish
    from impg_tpu.commands import align as align_mod
    from impg_tpu.syng.index import SyngIndex

    base = "".join(rng.choice("ACGT") for _ in range(length))
    seqs = {}
    for p in range(n_paths):
        s = list(base)
        for _ in range(10):
            i = rng.randint(0, length - 1)
            s[i] = rng.choice("ACGT")
        seqs[f"hap{p}"] = "".join(s)
    bseqs = {k: v.encode() for k, v in seqs.items()}
    syng = SyngIndex.build(list(bseqs.items()))
    rows = []
    names = list(bseqs)
    for q in names:
        for t in names:
            if q != t:
                rows.extend(align_mod.align_sequence_pair(syng, bseqs, q, t))
    return seqwish.induce_graph(bseqs, rows)


def test_multi_pass_weighted_smoothing():
    """n_haps-weighted multi-pass smoothing preserves every path\'s
    spelling (smooth.rs:305 max_block_weight; -G 700,1100 passes)."""
    import random

    from impg_tpu.graph import smooth as smooth_mod

    gfa_text = _variation_gfa(random.Random(8), n_paths=5, length=4000)
    out = smooth_mod.smooth_gfa_passes(
        gfa_text, (700, 1100), n_haps=5, max_node_length=100
    )
    assert _spell(Gfa.parse(out)) == _spell(Gfa.parse(gfa_text))


def test_cli_smooth_passes(tmp_path):
    import random

    from tests.test_cli import run_cli

    gfa_text = _variation_gfa(random.Random(12), n_paths=4, length=3000)
    p = tmp_path / "g.gfa"
    p.write_text(gfa_text)
    r = run_cli(
        "smooth", str(p), "-G", "700,1100", "--n-haps", "4",
        "--max-node-length", "100",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("H\t")
    assert _spell(Gfa.parse(r.stdout)) == _spell(Gfa.parse(gfa_text))
