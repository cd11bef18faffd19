"""Read mapping (pack) + cosine genotyping end-to-end
(reference: test_syng_integration heterozygote scenarios)."""

import gzip
import random

import numpy as np
import pytest

from impg_tpu.commands import genotype as gt_mod
from impg_tpu.syng.index import SyngIndex
from impg_tpu.syng.pack import Pack, map_reads, read_sequences
from tests import datagen
from tests.test_cli import run_cli


def simulate_reads(rng, seq: str, n: int, length: int = 150):
    reads = []
    for i in range(n):
        if len(seq) <= length:
            reads.append((f"r{i}", seq))
            continue
        s = rng.randint(0, len(seq) - length)
        reads.append((f"r{i}", seq[s : s + length]))
    return reads


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    """A 4-haplotype panel with a diploid sample = hap ref + hap s1."""
    tmp = tmp_path_factory.mktemp("gt")
    rng = random.Random(123)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=12_000, return_sequences=True
    )
    fa = str(tmp / "panel.fa")
    datagen.write_fasta(fa, seq_data)
    idx = SyngIndex.build_from_fasta([fa])
    reads = simulate_reads(rng, seq_data["ref"], 400) + simulate_reads(
        rng, seq_data["s1"], 400
    )
    fastq = str(tmp / "reads.fastq")
    with open(fastq, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return tmp, fa, idx, seq_data, fastq


def test_read_sequences_formats(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_text(">a desc\nACGT\nACGT\n>b\nTTTT\n")
    assert list(read_sequences(str(fa))) == [("a", b"ACGTACGT"), ("b", b"TTTT")]
    fq = tmp_path / "x.fastq"
    fq.write_text("@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nIIII\n")
    assert list(read_sequences(str(fq))) == [("r1", b"ACGT"), ("r2", b"GGGG")]
    gz = tmp_path / "x.fa.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write(">z\nAC\n")
    assert list(read_sequences(str(gz))) == [("z", b"AC")]


def test_map_reads_produces_counts(panel):
    tmp, fa, idx, seq_data, fastq = panel
    pack, n_reads, n_matched = map_reads(idx, [fastq])
    assert n_reads == 800
    assert n_matched > 0
    assert pack.counts.sum() == n_matched
    # Save/load roundtrip.
    p = str(tmp / "sample.packt")
    pack.save(p)
    pack2 = Pack.load(p)
    assert np.array_equal(pack.counts, pack2.counts)
    assert np.array_equal(pack.feature_ids, pack2.feature_ids)


def test_genotype_recovers_diploid_truth(panel):
    tmp, fa, idx, seq_data, fastq = panel
    pack, _, _ = map_reads(idx, [fastq])
    L = len(seq_data["ref"])
    candidates, results = gt_mod.genotype_cos(
        idx, pack, "ref", 0, L, ploidy=2
    )
    names = {c.genome for c in candidates}
    assert {"ref", "s0", "s1", "s2"} <= names
    top = results[0]
    top_genomes = sorted(candidates[i].genome for i in top.combination)
    assert top_genomes == ["ref", "s1"], [
        (sorted(candidates[i].genome for i in r.combination),
         round(r.similarity, 4))
        for r in results[:4]
    ]
    assert top.similarity > 0.8


def test_genotype_homozygous(panel):
    tmp, fa, idx, seq_data, fastq = panel
    rng = random.Random(5)
    reads = simulate_reads(rng, seq_data["s2"], 600)
    fq = str(tmp / "homo.fastq")
    with open(fq, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    pack, _, _ = map_reads(idx, [fq])
    L = len(seq_data["ref"])
    candidates, results = gt_mod.genotype_cos(idx, pack, "ref", 0, L, ploidy=2)
    top = results[0]
    top_genomes = sorted(candidates[i].genome for i in top.combination)
    assert top_genomes == ["s2", "s2"]


def test_cli_map_and_genotype(panel):
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp / "cli_pan")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    pack_path = str(tmp / "cli_sample.packt")
    r = run_cli(
        "map", "-a", prefix + ".syngt", "-q", fastq, "-O", pack_path
    )
    assert r.returncode == 0, r.stderr
    L = len(seq_data["ref"])
    r = run_cli(
        "genotype", "cos", "-a", prefix + ".syngt", "-p", pack_path,
        "-r", f"ref:0-{L}",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#sample")
    top = lines[1].split("\t")
    assert top[2] == "1"
    combo = top[3]
    assert "ref:" in combo and "s1:" in combo
    # TSV pack output too.
    r = run_cli(
        "map", "-a", prefix + ".syngt", "-q", fastq, "-o", "pack-tsv",
        "-O", str(tmp / "sample.tsv"),
    )
    assert r.returncode == 0, r.stderr
    tsv = (tmp / "sample.tsv").read_text().splitlines()
    assert tsv[0] == "feature.id\tcount"
    assert len(tsv) > 10
