"""One end-to-end workflow across the whole stack, all through the CLI:
FASTA -> align -> query/partition -> graph build -> lace -> sort ->
crush -> normalize -> vcf -> report.  Every artifact feeds the next
stage; final calls are validated against the injected variants."""

import random

from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import reverse_complement
from tests import datagen
from tests.test_cli import run_cli


def _spell(gfa_text: str) -> dict:
    from impg_tpu.graph.lace import split_path_name

    g = Gfa.parse(gfa_text)
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


def test_full_stack_pipeline(tmp_path):
    rng = random.Random(73)
    ref = "".join(rng.choice("ACGT") for _ in range(5000))
    # One SNP + one 9bp deletion in alt.
    alt = list(ref)
    orig = alt[2000]
    alt[2000] = {"A": "C", "C": "A", "G": "T", "T": "G"}[orig]
    alt_seq = "".join(alt[:3500]) + "".join(alt[3509:])
    third = list(ref)
    third[900] = {"A": "G", "C": "T", "G": "A", "T": "C"}[third[900]]
    seq_data = {"ref": ref, "alt": alt_seq, "s2": "".join(third)}
    fa = str(tmp_path / "genomes.fa")
    datagen.write_fasta(fa, seq_data)

    # 1. Native aligner: FASTA -> PAF.
    paf = str(tmp_path / "aln.paf")
    r = run_cli("align", "-f", fa, "-o", paf)
    assert r.returncode == 0, r.stderr

    # 2. Index + transitive query -> BED covers all three genomes.
    r = run_cli("query", "-a", paf, "-r", "ref:0-5000", "-d", "100", "-x")
    assert r.returncode == 0, r.stderr
    assert {l.split("\t")[0] for l in r.stdout.splitlines() if l} == {
        "ref", "alt", "s2"
    }

    # 3. Region graph via the seqwish engine.
    gfa_path = str(tmp_path / "region.gfa")
    r = run_cli(
        "query", "-a", paf, "-r", "ref:0-5000", "-d", "100", "-x",
        "--sequence-files", fa, "-o", "gfa", "--gfa-engine", "seqwish",
        "--output", gfa_path,
    )
    assert r.returncode == 0, r.stderr
    gfa_text = open(gfa_path).read()
    spelled = _spell(gfa_text)
    assert spelled["ref"] == ref.encode()

    # 4. sort -> crush -> normalize, spelling-preserving at every stage.
    before = _spell(gfa_text)
    cur = gfa_path
    for stage in ("sort", "crush", "normalize"):
        nxt = str(tmp_path / f"{stage}.gfa")
        r = run_cli(stage, cur, "--output", nxt) if stage != "normalize" \
            else run_cli(stage, cur)
        assert r.returncode == 0, (stage, r.stderr)
        if stage == "normalize":
            open(nxt, "w").write(r.stdout)
        assert _spell(open(nxt).read()) == before, stage
        cur = nxt

    # 5. VCF from the final graph: injected SNPs recovered at their
    # positions.
    r = run_cli("gfa2vcf", cur, "--reference", "ref")
    assert r.returncode == 0, r.stderr
    rows = [
        l.split("\t") for l in r.stdout.splitlines() if not l.startswith("#")
    ]
    positions = {int(x[1]) for x in rows}
    assert 2001 in positions, sorted(positions)
    assert 901 in positions, sorted(positions)
    # The 9bp deletion appears as an indel record near 3500.
    assert any(
        len(x[3]) - len(x[4]) == 9 and abs(int(x[1]) - 3500) < 12
        for x in rows
    ), rows

    # 6. Graph report with flubbles runs on the final artifact.
    r = run_cli("graph-report", cur, "--flubbles", "--reference", "ref")
    assert r.returncode == 0, r.stderr
    assert "Flubble decomposition" in r.stdout
