"""AGC-role .agz archives (reference: agc_index.rs AgcIndex addressing +
range fetch; sequence_index.rs:56 mixed-type rejection)."""

import random

import pytest

from impg_tpu.io.agz import AgzArchive, create_agz
from impg_tpu.io.fasta import UnifiedSequenceIndex
from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("agz")
    rng = random.Random(41)
    seqs_a = {
        "chr1": "".join(rng.choice("ACGT") for _ in range(700_000)),
        "chr2": "".join(rng.choice("ACGT") for _ in range(1234)),
    }
    seqs_b = {"chr1": "".join(rng.choice("ACGT") for _ in range(5000))}
    fa_a = str(tmp / "sampleA.fa")
    fa_b = str(tmp / "sampleB.fa")
    datagen.write_fasta(fa_a, seqs_a)
    datagen.write_fasta(fa_b, seqs_b)
    out = str(tmp / "panel.agz")
    stats = create_agz(out, [fa_a, fa_b])
    assert stats == {"samples": 2, "contigs": 3}
    return out, seqs_a, seqs_b


def test_listing_and_lengths(archive):
    out, seqs_a, seqs_b = archive
    arc = AgzArchive(out)
    assert arc.list_samples() == ["sampleA", "sampleB"]
    assert arc.list_contigs("sampleA") == ["chr1", "chr2"]
    assert arc.get_sequence_length("chr1@sampleA") == 700_000
    assert arc.get_sequence_length("chr1@sampleB") == 5000
    # Bare contig resolves to the first sample carrying it; chr2 is unique.
    assert arc.get_sequence_length("chr2") == 1234


def test_range_fetch_crosses_blocks(archive):
    out, seqs_a, seqs_b = archive
    arc = AgzArchive(out)
    seq = seqs_a["chr1"].encode()
    # Spans inside one block, crossing a block boundary, and whole-contig.
    for s, e in ((10, 500), (262_000, 263_000), (0, 700_000), (699_990, 700_000)):
        assert arc.fetch_sequence("chr1@sampleA", s, e) == seq[s:e], (s, e)
    assert arc.fetch_sequence("chr1@sampleB", 100, 200) == (
        seqs_b["chr1"].encode()[100:200]
    )
    # Out-of-range clamps like AGC.
    assert arc.fetch_sequence("chr2@sampleA", 1000, 99999) == (
        seqs_a["chr2"].encode()[1000:]
    )


def test_unified_index_backend(archive):
    out, seqs_a, seqs_b = archive
    idx = UnifiedSequenceIndex.from_files([out])
    assert idx.get_sequence_length("chr2@sampleA") == 1234
    assert idx.fetch_sequence("chr1@sampleB", 0, 10) == (
        seqs_b["chr1"].encode()[:10]
    )
    names = list(idx.sequence_names())
    assert "chr1@sampleA" in names and "chr1@sampleB" in names
    with pytest.raises(ValueError, match="Mixed file types"):
        UnifiedSequenceIndex.from_files([out, "x.fa"])
    with pytest.raises(ValueError, match="ragc"):
        UnifiedSequenceIndex.from_files(["x.agc"])


def test_cli_agz_and_query_sequences(archive, tmp_path):
    out, seqs_a, seqs_b = archive
    r = run_cli("agz", "list", out)
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in r.stdout.splitlines()]
    assert ["sampleA", "chr1", "700000"] in rows

    # An .agz archive works as --sequence-files for query -o fasta.
    rng = random.Random(52)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    agz = str(tmp_path / "p.agz")
    r = run_cli("agz", "create", fa, "-o", agz)
    assert r.returncode == 0, r.stderr
    paf = tmp_path / "p.paf"
    paf.write_text(text)
    r = run_cli(
        "query", "-a", str(paf), "-r", "ref:1000-3000", "-d", "100",
        "-o", "fasta", "--sequence-files", agz,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith(">")


def test_upstream_agc_fixture_rejected_with_conversion_path():
    """The reference's real test.agc (ragc toolchain) must be detected —
    by extension AND by content — and rejected with the documented
    conversion path (VERDICT round-1 interop contract)."""
    import os
    import shutil

    import pytest

    from impg_tpu.io.fasta import UnifiedSequenceIndex

    fixture = "/root/reference/tests/test_data/test.agc"
    if not os.path.exists(fixture):
        pytest.skip("reference fixture not mounted")
    with pytest.raises(ValueError, match="agc getcol"):
        UnifiedSequenceIndex.from_files([fixture])
    # Content sniff: the same bytes renamed .agz must also be rejected.
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        renamed = os.path.join(td, "sneaky.agz")
        shutil.copy(fixture, renamed)
        with pytest.raises(ValueError, match="AGC archive"):
            UnifiedSequenceIndex.from_files([renamed])
