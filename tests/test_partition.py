"""Partition command semantics (reference: commands/partition.rs)."""

import random

import pytest

from impg_tpu.commands import partition as part
from impg_tpu.core.intervals import SortedRanges
from impg_tpu.query.engine import Row
from tests import datagen
from tests.test_query import index_from_text


@pytest.fixture(scope="module")
def chain_index():
    rng = random.Random(12)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=5, seq_len=5000)
    return index_from_text(text), seqs


def coverage_per_seq(collected, index):
    cov = {}
    for pnum, intervals in collected:
        for iv in intervals:
            s, e = iv.span()
            cov.setdefault(iv.seq_id, set()).update(range(s, e))
    return cov


def partitions_disjoint(collected):
    seen = {}
    for pnum, intervals in collected:
        for iv in intervals:
            s, e = iv.span()
            for pos in range(s, e):
                key = (iv.seq_id, pos)
                if key in seen:
                    return False
                seen[key] = pnum
    return True


def test_partition_covers_everything(chain_index, tmp_path):
    index, seqs = chain_index
    collected = part.partition_alignments(
        index,
        2000,
        merge_distance=100,
        min_missing_size=200,
        min_boundary_distance=200,
        output_folder=str(tmp_path),
    )
    assert collected
    cov = coverage_per_seq(collected, index)
    for name, L in seqs.items():
        sid = index.seq_index.get_id(name)
        covered = cov.get(sid, set())
        # Full coverage of every sequence.
        assert len(covered) == L, f"{name}: {len(covered)}/{L}"
    assert partitions_disjoint(collected)
    # Single-file output exists with partition column.
    lines = (tmp_path / "partitions.bed").read_text().splitlines()
    assert lines and all(len(l.split("\t")) == 4 for l in lines)


def test_partition_separate_files(chain_index, tmp_path):
    index, seqs = chain_index
    part.partition_alignments(
        index,
        2500,
        merge_distance=100,
        min_missing_size=200,
        min_boundary_distance=200,
        separate_files=True,
        output_folder=str(tmp_path),
    )
    beds = list(tmp_path.glob("partition*.bed"))
    assert beds
    for bed in beds:
        for line in bed.read_text().splitlines():
            assert len(line.split("\t")) == 3


def test_partition_deterministic(chain_index, tmp_path):
    index, seqs = chain_index
    runs = []
    for _ in range(2):
        collected = part.partition_alignments(
            index, 1500, merge_distance=50, min_missing_size=100,
            min_boundary_distance=100,
        )
        runs.append(
            [
                (p, [(iv.seq_id, iv.first, iv.last) for iv in ivs])
                for p, ivs in collected
            ]
        )
    assert runs[0] == runs[1]


def test_partition_device_matches_host(chain_index):
    from impg_tpu.query.device import DeviceEngine

    index, seqs = chain_index
    host = part.partition_alignments(
        index, 2000, merge_distance=100, min_missing_size=200,
        min_boundary_distance=200,
    )
    dev = part.partition_alignments(
        index, 2000, merge_distance=100, min_missing_size=200,
        min_boundary_distance=200, device_engine=DeviceEngine(index),
    )
    as_tuples = lambda c: [
        (p, [(iv.seq_id, iv.first, iv.last) for iv in ivs]) for p, ivs in c
    ]
    assert as_tuples(host) == as_tuples(dev)


def test_partition_starting_sequences(chain_index, tmp_path):
    index, seqs = chain_index
    start_file = tmp_path / "start.txt"
    start_file.write_text("ref\n")
    collected = part.partition_alignments(
        index, 2000, merge_distance=100, min_missing_size=200,
        min_boundary_distance=200,
        starting_sequences_file=str(start_file),
    )
    # First partitions must be seeded from ref windows.
    rid = index.seq_index.get_id("ref")
    first_ids = {iv.seq_id for iv in collected[0][1]}
    assert rid in first_ids


def test_partition_selection_modes(chain_index):
    index, seqs = chain_index
    for mode in ("longest", "total", "sample", "haplotype"):
        collected = part.partition_alignments(
            index, 2500, merge_distance=100, min_missing_size=200,
            min_boundary_distance=200, selection_mode=mode,
        )
        assert collected, mode
    import pytest as _pytest

    with _pytest.raises(ValueError):
        part.partition_alignments(
            index, 2500, merge_distance=100, selection_mode="bogus"
        )


def test_rehome_singleton_slivers():
    P = part.PartitionInterval
    collected = [
        (0, [P(1, 0, 100), P(2, 0, 100)]),
        (1, [P(1, 100, 110)]),  # singleton adjacent to partition 0 and 2
        (2, [P(1, 110, 300), P(2, 100, 300)]),
    ]
    part.rehome_singleton_slivers(collected)
    sizes = {p: len(ivs) for p, ivs in collected}
    assert 1 not in sizes  # singleton absorbed
    assert sum(sizes.values()) == 5


def test_partition_vcf_output(tmp_path):
    """Per-partition VCF (partition.rs:1573 write_partition_vcf role)."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(13)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    paf = tmp_path / "p.paf"
    paf.write_text(text)
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    out = tmp_path / "parts"
    r = run_cli(
        "partition", "-a", str(paf), "-w", "3k", "-d", "100",
        "-o", "vcf", "--separate-files", "--sequence-files", fa,
        "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    vcfs = sorted(out.glob("partition*.vcf"))
    assert vcfs
    head = vcfs[0].read_text()
    assert head.startswith("##fileformat=VCF")


def test_partition_combined_vcf(tmp_path):
    """Single-file partitions.vcf from the laced whole (partition.rs:670)."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(14)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    paf = tmp_path / "p.paf"
    paf.write_text(text)
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    out = tmp_path / "parts"
    r = run_cli(
        "partition", "-a", str(paf), "-w", "3k", "-d", "100",
        "-o", "vcf", "--sequence-files", fa, "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    assert (out / "partitions.vcf").read_text().startswith("##fileformat")


def test_partition_paf_output(chain_index, tmp_path):
    """`partition -o paf` (extension: the reference's writer match,
    partition.rs:1428-1505, has no PAF arm) — interval-level PAF rows, one
    file per partition, query intervals identical to the BED partition."""
    index, seqs = chain_index
    part.partition_alignments(
        index,
        2500,
        merge_distance=100,
        min_missing_size=200,
        min_boundary_distance=200,
        separate_files=True,
        output_format="paf",
        output_folder=str(tmp_path / "paf"),
    )
    part.partition_alignments(
        index,
        2500,
        merge_distance=100,
        min_missing_size=200,
        min_boundary_distance=200,
        separate_files=True,
        output_format="bed",
        output_folder=str(tmp_path / "bed"),
    )
    pafs = sorted((tmp_path / "paf").glob("partition*.paf"))
    beds = sorted((tmp_path / "bed").glob("partition*.bed"))
    assert pafs and len(pafs) == len(beds)
    for paf_f, bed_f in zip(pafs, beds):
        paf_rows = [ln.split("\t") for ln in paf_f.read_text().splitlines()]
        bed_rows = [ln.split("\t") for ln in bed_f.read_text().splitlines()]
        assert len(paf_rows) == len(bed_rows)
        for pr, br in zip(paf_rows, bed_rows):
            assert len(pr) >= 12
            # Query columns mirror the BED interval.
            assert pr[0] == br[0] and pr[2] == br[1] and pr[3] == br[2]
            q_len, qs, qe = int(pr[1]), int(pr[2]), int(pr[3])
            ts, te = int(pr[7]), int(pr[8])
            assert 0 <= qs <= qe <= q_len
            assert 0 <= ts <= te <= int(pr[6])
            assert pr[4] in "+-"
            matches, block = int(pr[9]), int(pr[10])
            assert matches == min(qe - qs, te - ts)
            assert block == max(qe - qs, te - ts)


def test_partition_paf_single_file(chain_index, tmp_path):
    """Collected-mode partitions.paf with pn:i tags matches partitions.bed."""
    index, seqs = chain_index
    part.partition_alignments(
        index, 2500, merge_distance=100, min_missing_size=200,
        min_boundary_distance=200, output_format="paf",
        output_folder=str(tmp_path / "paf"),
    )
    part.partition_alignments(
        index, 2500, merge_distance=100, min_missing_size=200,
        min_boundary_distance=200, output_format="bed",
        output_folder=str(tmp_path / "bed"),
    )
    paf_rows = [
        ln.split("\t")
        for ln in (tmp_path / "paf" / "partitions.paf").read_text().splitlines()
    ]
    bed_rows = [
        ln.split("\t")
        for ln in (tmp_path / "bed" / "partitions.bed").read_text().splitlines()
    ]
    assert paf_rows and len(paf_rows) == len(bed_rows)
    for pr, br in zip(paf_rows, bed_rows):
        assert pr[0] == br[0] and pr[2] == br[1] and pr[3] == br[2]
        assert pr[12] == f"pn:i:{br[3]}"


def test_partition_single_file_fasta_maf(tmp_path):
    """Collected-mode partitions.fasta / partitions.maf (extension: the
    reference rejects non-BED single-file output, main.rs:6368)."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(15)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    paf = tmp_path / "p.paf"
    paf.write_text(text)
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    out = tmp_path / "parts"
    r = run_cli(
        "partition", "-a", str(paf), "-w", "3k", "-d", "100",
        "-o", "fasta", "--sequence-files", fa, "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    fasta_text = (out / "partitions.fasta").read_text()
    assert fasta_text.startswith(">")
    assert " pn:" in fasta_text
    r = run_cli(
        "partition", "-a", str(paf), "-w", "3k", "-d", "100",
        "-o", "maf", "--sequence-files", fa, "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    maf_text = (out / "partitions.maf").read_text()
    assert maf_text.startswith("##maf")
    assert maf_text.count("##maf") == 1
    assert maf_text.count("\na ") >= 1
