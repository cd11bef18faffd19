"""GFA sort pipeline: path-SGD 1D layout + groom + topological sort
(reference: graph.rs:893 sort_gfa, gfasort 'Ygs')."""

import random

import numpy as np

from impg_tpu.graph.gfa import Gfa
from impg_tpu.graph.sortgfa import groom, path_sgd_order, sort_pipeline
from impg_tpu.io.fasta import reverse_complement
from tests.test_cli import run_cli


def _spell(g: Gfa) -> dict:
    out = {}
    for name, steps in g.paths:
        s = b""
        for sid, rev in steps:
            t = g.segments[sid].encode()
            s += reverse_complement(t) if rev else t
        out[name] = s
    return out


def _chain_gfa(n=60, seed=4):
    rng = random.Random(seed)
    ids = [f"x{i}" for i in range(n)]
    shuffled = ids[:]
    rng.shuffle(shuffled)
    lines = ["H\tVN:Z:1.0"]
    for sid in shuffled:
        lines.append(f"S\t{sid}\t{'ACGT' * 3}")
    for i in range(n - 1):
        lines.append(f"L\t{ids[i]}\t+\t{ids[i + 1]}\t+\t0M")
    lines.append("P\tp\t" + ",".join(s + "+" for s in ids) + "\t*")
    return "\n".join(lines) + "\n", ids


def test_path_sgd_recovers_linear_order():
    text, ids = _chain_gfa()
    order = path_sgd_order(Gfa.parse(text))
    true_rank = {s: i for i, s in enumerate(ids)}
    got = [true_rank[s] for s in order]
    rho = np.corrcoef(got, range(len(ids)))[0, 1]
    assert rho > 0.99, rho


def test_path_sgd_jax_backend_recovers_linear_order():
    """The jitted device epoch loop converges to the same layout class
    (own RNG stream; layout quality, not bit equality, is the contract)."""
    text, ids = _chain_gfa()
    order = path_sgd_order(Gfa.parse(text), backend="jax")
    true_rank = {s: i for i, s in enumerate(ids)}
    got = [true_rank[s] for s in order]
    rho = np.corrcoef(got, range(len(ids)))[0, 1]
    assert rho > 0.99, rho


def test_groom_flips_reverse_majority_preserving_spelling():
    g = Gfa.parse(
        "H\tVN:Z:1.0\nS\ta\tACGT\nS\tb\tGG\n"
        "L\ta\t+\tb\t-\t0M\nP\tp\ta+,b-\t*\n"
    )
    before = _spell(g)
    g2 = groom(g)
    assert _spell(g2) == before
    assert g2.paths[0][1] == [("a", False), ("b", False)]
    assert g2.segments["b"] == "CC"
    assert ("a", False, "b", False) in g2.links


def test_sort_pipeline_renumbers_in_path_order():
    text, ids = _chain_gfa()
    out = sort_pipeline(text)
    g = Gfa.parse(out)
    assert list(g.segments) == [str(i + 1) for i in range(len(ids))]
    assert [s for s, _ in g.paths[0][1]] == list(g.segments)
    assert _spell(g)["p"] == _spell(Gfa.parse(text))["p"]


def test_sort_pipeline_with_bubble_preserves_spellings():
    gfa = (
        "H\tVN:Z:1.0\nS\tm\tAC\nS\tu\tG\nS\tv\tT\nS\tz\tCC\n"
        "L\tm\t+\tu\t+\t0M\nL\tm\t+\tv\t+\t0M\n"
        "L\tu\t+\tz\t+\t0M\nL\tv\t+\tz\t+\t0M\n"
        "P\tp1\tm+,u+,z+\t*\nP\tp2\tm+,v+,z+\t*\n"
    )
    out = sort_pipeline(gfa)
    assert _spell(Gfa.parse(out)) == _spell(Gfa.parse(gfa))


def test_cli_sort(tmp_path):
    text, ids = _chain_gfa(n=20, seed=9)
    p = tmp_path / "g.gfa"
    p.write_text(text)
    r = run_cli("sort", str(p))
    assert r.returncode == 0, r.stderr
    g = Gfa.parse(r.stdout)
    assert list(g.segments) == [str(i + 1) for i in range(20)]
    r = run_cli("sort", str(p), "--pipeline", "Q")
    assert r.returncode == 2
    assert "unsupported sort pipeline step" in r.stderr
