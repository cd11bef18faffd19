"""GFA -> VCF bubble calling (reference: lib.rs:930 POVU role)."""

import random

import pytest

from impg_tpu.graph import seqwish
from impg_tpu.graph.vcf import gfa_to_vcf
from impg_tpu.commands import align as align_mod
from impg_tpu.syng.index import SyngIndex
from tests import datagen
from tests.test_cli import run_cli
from tests.test_fasta import make_fasta


def build_gfa_for(seq_data: dict[str, str]):
    seqs = {n: s.encode() for n, s in seq_data.items()}
    index = SyngIndex.build(list(seqs.items()))
    rows = []
    names = list(seqs)
    for q in names:
        for t in names:
            if q != t:
                rows.extend(align_mod.align_sequence_pair(index, seqs, q, t))
    return seqwish.induce_graph(seqs, rows)


def test_snp_and_insertion_called():
    rng = random.Random(15)
    ref = "".join(rng.choice("ACGT") for _ in range(4000))
    # One SNP at 1500, one 12bp insertion after 2500.
    alt = list(ref)
    orig = alt[1500]
    alt[1500] = {"A": "C", "C": "A", "G": "T", "T": "G"}[orig]
    snp_base = alt[1500]
    ins = "".join(rng.choice("ACGT") for _ in range(12))
    alt_seq = "".join(alt[:2500]) + ins + "".join(alt[2500:])
    gfa = build_gfa_for({"ref": ref, "alt": alt_seq})
    vcf = gfa_to_vcf(gfa, "ref")
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    assert rows, vcf
    by_pos = {int(r[1]): r for r in rows}
    # SNP at 1-based 1501.
    assert 1501 in by_pos, sorted(by_pos)
    snp = by_pos[1501]
    assert snp[3] == orig and snp[4] == snp_base
    # Insertion anchored at 2500 (1-based): ALT longer than REF by 12.
    ins_rows = [r for r in rows if len(r[4]) - len(r[3]) == 12]
    assert ins_rows
    assert abs(int(ins_rows[0][1]) - 2500) <= 1
    # REF alleles match the reference sequence.
    for r in rows:
        pos = int(r[1]) - 1
        assert ref[pos : pos + len(r[3])] == r[3], r


def test_deletion_called():
    rng = random.Random(25)
    ref = "".join(rng.choice("ACGT") for _ in range(3000))
    alt_seq = ref[:1200] + ref[1230:]  # 30bp deletion
    gfa = build_gfa_for({"ref": ref, "alt": alt_seq})
    vcf = gfa_to_vcf(gfa, "ref")
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    del_rows = [r for r in rows if len(r[3]) - len(r[4]) == 30]
    assert del_rows, vcf
    assert abs(int(del_rows[0][1]) - 1200) <= 1


def test_genotype_columns():
    rng = random.Random(35)
    ref = "".join(rng.choice("ACGT") for _ in range(3000))
    alt = list(ref)
    alt[800] = {"A": "C"}.get(alt[800], "A")
    a_seq = "".join(alt)
    gfa = build_gfa_for({"ref": ref, "a": a_seq, "b": ref[:]})
    # 'b' is identical to ref -> carries nothing; 'a' carries the SNP.
    vcf = gfa_to_vcf(gfa, "ref")
    header = [l for l in vcf.splitlines() if l.startswith("#CHROM")][0]
    cols = header.split("\t")
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    assert rows
    ai = next(i for i, c in enumerate(cols) if c.split(":")[0] == "a")
    bi = next(i for i, c in enumerate(cols) if c.split(":")[0] == "b")
    for r in rows:
        assert r[ai] == "1"
        assert r[bi] == "0"


def test_cli_query_vcf(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path, seed=51)
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-1200", "-d", "100", "-x",
        "-o", "vcf", "--gfa-engine", "seqwish", "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    rows = [l.split("\t") for l in lines if not l.startswith("#")]
    assert rows
    # CHROM is the bare sequence name; positions inside the region; REF
    # alleles match the source genome.
    for row in rows:
        assert row[0] == "ref"
        pos = int(row[1]) - 1
        assert 100 <= pos <= 1250
        assert seq_data["ref"][pos : pos + len(row[3])] == row[3], row


def test_cli_gfa2vcf(tmp_path):
    rng = random.Random(45)
    ref = "".join(rng.choice("ACGT") for _ in range(2000))
    alt = ref[:900] + "T" + ref[901:]
    if alt == ref:
        alt = ref[:900] + "A" + ref[901:]
    gfa = build_gfa_for({"ref": ref, "alt": alt})
    p = tmp_path / "g.gfa"
    p.write_text(gfa)
    r = run_cli("gfa2vcf", str(p), "--reference", "ref")
    assert r.returncode == 0, r.stderr
    assert "##fileformat=VCFv4.2" in r.stdout


def test_flubble_sites_multiallelic():
    """Flubble-site calling emits ONE multi-allelic record where two alts
    differ at the same site, with per-path GT allele indexes
    (gfa_to_vcf_flubbles; reference POVU-site records)."""
    from impg_tpu.graph.vcf import gfa_to_vcf_flubbles

    gfa = (
        "H\tVN:Z:1.0\n"
        "S\tm\tACGTACGTAC\nS\tra\tG\nS\tx1\tT\nS\tx2\tC\nS\tz\tCCGGCCGG\n"
        "L\tm\t+\tra\t+\t0M\nL\tm\t+\tx1\t+\t0M\nL\tm\t+\tx2\t+\t0M\n"
        "L\tra\t+\tz\t+\t0M\nL\tx1\t+\tz\t+\t0M\nL\tx2\t+\tz\t+\t0M\n"
        "P\tref\tm+,ra+,z+\t*\n"
        "P\ts1\tm+,x1+,z+\t*\n"
        "P\ts2\tm+,x2+,z+\t*\n"
        "P\ts3\tm+,x1+,z+\t*\n"
    )
    vcf = gfa_to_vcf_flubbles(gfa, "ref")
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    assert len(rows) == 1, vcf
    r = rows[0]
    assert int(r[1]) == 11  # SNP right after the 10bp anchor
    assert r[3] == "G" and set(r[4].split(",")) == {"T", "C"}
    # GT columns: s1/s3 share one alt, s2 the other.
    header = [
        l for l in vcf.splitlines() if l.startswith("#CHROM")
    ][0].split("\t")
    samples = header[9:]
    gts = dict(zip(samples, r[9:]))
    assert gts["s1"] == gts["s3"] != gts["s2"]
    assert {gts["s1"], gts["s2"]} == {"1", "2"}
    assert r[7].startswith("AC=") and "AN=3" in r[7]


def test_flubble_sites_on_aligned_sequences():
    """On a seqwish graph from real mutated sequences, flubble-site REF
    alleles must match the reference sequence at their positions."""
    from impg_tpu.graph.vcf import gfa_to_vcf_flubbles

    rng = random.Random(19)
    ref = "".join(rng.choice("ACGT") for _ in range(3000))
    alt = list(ref)
    alt[900] = {"A": "C", "C": "A", "G": "T", "T": "G"}[alt[900]]
    gfa = build_gfa_for({"ref": ref, "alt": "".join(alt)})
    vcf = gfa_to_vcf_flubbles(gfa, "ref")
    rows = [l.split("\t") for l in vcf.splitlines() if not l.startswith("#")]
    assert rows
    assert any(int(r[1]) == 901 for r in rows), [r[1] for r in rows]
    for r in rows:
        pos = int(r[1]) - 1
        assert ref[pos : pos + len(r[3])] == r[3], r


def test_cli_gfa2vcf_flubble_sites(tmp_path):
    from impg_tpu.graph.vcf import gfa_to_vcf_flubbles  # noqa: F401

    gfa = (
        "H\tVN:Z:1.0\n"
        "S\tm\tACGTACGTAC\nS\tra\tG\nS\tx1\tT\nS\tz\tCCGGCCGG\n"
        "L\tm\t+\tra\t+\t0M\nL\tm\t+\tx1\t+\t0M\n"
        "L\tra\t+\tz\t+\t0M\nL\tx1\t+\tz\t+\t0M\n"
        "P\tref\tm+,ra+,z+\t*\nP\ts1\tm+,x1+,z+\t*\n"
    )
    p = tmp_path / "g.gfa"
    p.write_text(gfa)
    r = run_cli("gfa2vcf", str(p), "--reference", "ref",
                "--sites", "flubbles")
    assert r.returncode == 0, r.stderr
    assert "\t11\t" in r.stdout


def test_cli_gfa2vcf_multiple_references(tmp_path):
    """Repeatable -r calls against each reference path (main.rs:5811)."""
    from tests.test_cli import run_cli

    gfa = (
        "H\tVN:Z:1.0\n"
        "S\t1\tACGTACGTAC\nS\t2\tGTT\nS\t3\tTAA\nS\t4\tCCGGCCGGCC\n"
        "L\t1\t+\t2\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        "P\tp1\t1+,2+,4+\t*\nP\tp2\t1+,3+,4+\t*\n"
    )
    p = tmp_path / "g.gfa"
    p.write_text(gfa)
    r = run_cli("gfa2vcf", str(p), "-r", "p1", "-r", "p2")
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("##fileformat")
    # Exactly one header block; records for both reference frames.
    assert sum(1 for l in lines if l.startswith("##fileformat")) == 1
    chroms = {l.split("\t")[0] for l in lines if l and not l.startswith("#")}
    assert chroms == {"p1", "p2"}


def test_reference_selection_exact_beats_prefix_shadow():
    """Round-2 review fix: 'chr1' must not select 'chr10:...' (bare-prefix
    shadowing); unknown references raise instead of silently using the
    first path."""
    import pytest

    from impg_tpu.graph.vcf import gfa_to_vcf

    gfa = (
        "H\tVN:Z:1.0\n"
        "S\t1\tACGTACGTAC\nS\t2\tG\nS\t3\tT\nS\t4\tCCGGCCGGCC\n"
        "L\t1\t+\t2\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        "P\tchr10:0-100\t1+,2+,4+\t*\n"
        "P\tchr1:0-100\t1+,3+,4+\t*\n"
    )
    out = gfa_to_vcf(gfa, reference_path="chr1")
    assert "##reference=chr1:0-100" in out
    recs = [l for l in out.splitlines() if l and not l.startswith("#")]
    assert recs and all(l.split("\t")[0] == "chr1" for l in recs)
    with pytest.raises(ValueError, match="not found"):
        gfa_to_vcf(gfa, reference_path="chr2")


def test_non_covering_paths_genotyped_missing_outside_span():
    """Round-2 review fix: a path whose anchor chain covers only part of
    the reference must genotype '.', not '0', at sites outside its span
    (matching the flubble emitter's non-traversing contract)."""
    from impg_tpu.graph.vcf import gfa_to_vcf

    # ref = A,B1,C,B2,E ; pvar differs at B1 (early) and B2 (late);
    # pleft anchors only A..C (covers the early site, not the late one).
    gfa = (
        "H\tVN:Z:1.0\n"
        "S\tA\tACGTACGTAC\nS\tB1\tG\nS\tX1\tT\nS\tC\tCCGGCCGGCC\n"
        "S\tB2\tA\nS\tX2\tC\nS\tE\tGGTTGGTTGG\n"
        "P\tref\tA+,B1+,C+,B2+,E+\t*\n"
        "P\tpvar\tA+,X1+,C+,X2+,E+\t*\n"
        "P\tpleft\tA+,B1+,C+\t*\n"
    )
    out = gfa_to_vcf(gfa, reference_path="ref")
    recs = [
        l.split("\t") for l in out.splitlines()
        if l and not l.startswith("#")
    ]
    assert len(recs) == 2
    header = [
        l for l in out.splitlines() if l.startswith("#CHROM")
    ][0].split("\t")
    i_pvar = header.index("pvar")
    i_pleft = header.index("pleft")
    early, late = sorted(recs, key=lambda r: int(r[1]))
    # early site: pleft covers it and agrees with ref -> '0'
    assert early[i_pvar] == "1" and early[i_pleft] == "0"
    # late site: pleft's chain ends at C -> '.', and AN counts only
    # samples with evidence there
    assert late[i_pvar] == "1" and late[i_pleft] == "."
    assert "AN=1" in late[7] and "AN=2" in early[7]
