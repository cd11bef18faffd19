"""`graph` command: flat whole-FASTA builds (reference: Args::Graph
main.rs:5427, engine dispatch main.rs:8683-8800)."""

import random

import pytest

from tests.test_cli import run_cli


def _spell(gfa_text: str) -> dict[str, str]:
    """path name -> spelled sequence from S/P lines."""
    segs = {}
    paths = {}
    for line in gfa_text.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "P":
            paths[f[1]] = f[2]
    comp = str.maketrans("ACGT", "TGCA")
    out = {}
    for name, walk in paths.items():
        s = []
        for step in walk.split(","):
            seg, o = step[:-1], step[-1]
            s.append(
                segs[seg] if o == "+" else segs[seg].translate(comp)[::-1]
            )
        out[name] = "".join(s)
    return out


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("graphcmd")
    rng = random.Random(7)
    base = "".join(rng.choice("ACGT") for _ in range(1500))
    seqs = {
        "ref": base,
        "a": base[:500] + "TTTTGGGGCCCC" + base[520:],
        "b": base[:900] + base[950:],
    }
    fa = str(tmp / "g.fa")
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    return fa, seqs


def test_graph_seqwish_spells_sources(fasta, tmp_path):
    fa, seqs = fasta
    out = str(tmp_path / "g.gfa")
    r = run_cli("graph", "-f", fa, "--gfa-engine", "seqwish", "-o", out)
    assert r.returncode == 0, r.stderr
    text = open(out).read()
    spelled = _spell(text)
    assert set(spelled) == set(seqs)
    for n in seqs:
        assert spelled[n] == seqs[n], n
    # shared sequence collapses: fewer graph bases than total input bases
    seg_bases = sum(
        len(l.split("\t")[2])
        for l in text.splitlines()
        if l.startswith("S\t")
    )
    assert seg_bases < sum(len(s) for s in seqs.values()) // 2


def test_graph_poa_engine(fasta, tmp_path):
    fa, seqs = fasta
    r = run_cli("graph", "-f", fa, "--gfa-engine", "poa")
    assert r.returncode == 0, r.stderr
    spelled = _spell(r.stdout)
    for n in seqs:
        assert spelled[n] == seqs[n], n


def test_graph_pggb_engine(fasta, tmp_path):
    fa, seqs = fasta
    r = run_cli("graph", "-f", fa, "--gfa-engine", "pggb")
    assert r.returncode == 0, r.stderr
    spelled = _spell(r.stdout)
    for n in seqs:
        assert spelled[n] == seqs[n], n


def test_graph_given_paf_skips_alignment(fasta, tmp_path):
    fa, seqs = fasta
    paf = str(tmp_path / "g.paf")
    r = run_cli("align", "-f", fa, "-o", paf)
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "g.gfa")
    r = run_cli("graph", "-f", fa, "-a", paf, "-o", out)
    assert r.returncode == 0, r.stderr
    spelled = _spell(open(out).read())
    for n in seqs:
        assert spelled[n] == seqs[n], n


def test_graph_partitioned_mode(fasta, tmp_path):
    fa, seqs = fasta
    out = str(tmp_path / "gp.gfa")
    r = run_cli(
        "graph", "-f", fa, "--partition-size", "800", "-d", "100",
        "-o", out,
    )
    assert r.returncode == 0, r.stderr
    spelled = _spell(open(out).read())
    # laced paths carry NAME:START-END range names covering each source
    by_src = {}
    for name, s in spelled.items():
        src = name.rsplit(":", 1)[0] if ":" in name else name
        by_src.setdefault(src, []).append((name, s))
    assert set(by_src) == set(seqs)


def test_graph_rejects_syng_engines(fasta):
    fa, _ = fasta
    r = run_cli("graph", "-f", fa, "--gfa-engine", "syng-native")
    assert r.returncode != 0
    assert "query" in r.stderr and "partition" in r.stderr


def test_graph_pggb_runs_full_auto_chain(fasta, tmp_path):
    """pggb = seqwish -> line-sort -> Ygs -> smooth -> gfaffix normalize ->
    sort (lib.rs:1015-1064), not seqwish+sort: spellings preserved, path
    names unsuffixed, and the normalize stage leaves no shared-affix
    sibling pairs under any parent."""
    fa, seqs = fasta
    r = run_cli("graph", "-f", fa, "--gfa-engine", "pggb")
    assert r.returncode == 0, r.stderr
    spelled = _spell(r.stdout)
    assert set(spelled) == set(seqs)
    for n in seqs:
        assert spelled[n] == seqs[n], n
    # The chain did more than seqwish+sort: the smoothed/normalized graph
    # differs from the bare seqwish engine's.
    r2 = run_cli("graph", "-f", fa, "--gfa-engine", "seqwish")
    assert r2.returncode == 0, r2.stderr
    assert set(r.stdout.splitlines()) != set(r2.stdout.splitlines())
    # Ygs sort renumbered segments densely from 1
    ids = sorted(
        int(l.split("\t")[1])
        for l in r.stdout.splitlines()
        if l.startswith("S\t")
    )
    assert ids == list(range(1, len(ids) + 1))
