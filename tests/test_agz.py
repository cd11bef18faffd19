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
    # Bare contig resolution requires uniqueness; chr2 is unique.
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
    with pytest.raises(FileNotFoundError):
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


REF_AGC = "/root/reference/tests/test_data/test.agc"

# Ground truth for the reference's test.agc, from the sibling FASTAs
# (ref/a/b/c.fa) the archive was created from.
_AGC_TRUTH = {
    "ref": {
        "chr1": "AGCTAGCTAGCTAGCT",
        "chr2": "TAAAAAAAAAAATTT",
        "chr3": "TGGGGGGGGGGTTT",
        "seq": "TGTGTGTGTG",
    },
    "a": {"chr1a": "CTGAGCTGACTGA", "chr3a": "AGTTTAGCT"},
    "b": {
        "chr1": "AAAAAAAAA",
        "g h i 21": "GGGAGGG",
        "c": "CCCCCCCCC",
        "t": "TTTTTTT",
    },
    "c": {"1": "TGTGTGTGTGTG", "2": "ACACACACA", "3": "TTTTCCCGGGAAAAAA"},
}


def _need_ref_agc():
    import os

    if not os.path.exists(REF_AGC):
        pytest.skip("reference fixture not mounted")


def test_real_agc_v3_reads_reference_fixture():
    """Byte-level interop: the reference's own test.agc (written by AGC
    v3.2.1 / consumed via ragc in agc_index.rs) decodes to exactly the
    ground-truth FASTAs it was created from."""
    _need_ref_agc()
    from impg_tpu.io.agc import AgcArchive

    a = AgcArchive(REF_AGC)
    assert a.list_samples() == ["ref", "a", "b", "c"]
    assert (a.kmer_length, a.segment_size) == (31, 60000)
    for sample, contigs in _AGC_TRUTH.items():
        assert a.list_contigs(sample) == list(contigs)
        for contig, seq in contigs.items():
            name = f"{contig}@{sample}"
            assert a.get_sequence_length(name) == len(seq)
            got = a.fetch_sequence(name, 0, len(seq))
            assert got.decode() == seq, name
    # range fetch + short-name addressing (agc_index.rs:142 parse_query)
    assert a.fetch_sequence("chr1@ref", 4, 9) == b"AGCTA"
    assert a.fetch_sequence("g@b", 0, 7) == b"GGGAGGG"
    assert a.fetch_sequence("chr1a", 0, 3) == b"CTG"  # bare unique contig
    # clamping
    assert a.fetch_sequence("seq@ref", 5, 99) == b"GTGTG"


def test_real_agc_through_unified_sequence_index():
    """UnifiedSequenceIndex routes .agc (by extension and by content
    sniff) to the real reader."""
    _need_ref_agc()
    import shutil
    import tempfile

    idx = UnifiedSequenceIndex.from_files([REF_AGC])
    assert idx.fetch_sequence("chr3@ref", 0, 14) == b"TGGGGGGGGGGTTT"
    assert idx.get_sequence_length("2@c") == 9
    # Content sniff: same bytes under a neutral extension still route to
    # the AGC reader.
    with tempfile.TemporaryDirectory() as td:
        import os

        renamed = os.path.join(td, "sneaky.bin")
        shutil.copy(REF_AGC, renamed)
        idx2 = UnifiedSequenceIndex.from_files([renamed])
        assert idx2.fetch_sequence("t@b", 0, 7) == b"TTTTTTT"


def test_agc_outside_envelope_raises_conversion_path():
    """Outside the verified v3 envelope the reader must fail with the
    documented conversion hint, never guess (VERDICT interop contract)."""
    _need_ref_agc()
    import os
    import tempfile

    from impg_tpu.io.agc import AgcArchive, AgcFormatError

    raw = open(REF_AGC, "rb").read()
    # Flip the recorded file_version_major "3" -> "2".
    patched = raw.replace(b"file_version_major\x003\x00",
                          b"file_version_major\x002\x00")
    assert patched != raw
    with tempfile.TemporaryDirectory() as td:
        p2 = os.path.join(td, "v2.agc")
        open(p2, "wb").write(patched)
        with pytest.raises(AgcFormatError, match="agc getcol"):
            AgcArchive(p2)
        trunc = os.path.join(td, "trunc.agc")
        open(trunc, "wb").write(raw[: len(raw) // 2])
        with pytest.raises(ValueError, match="unsupported AGC archive"):
            AgcArchive(trunc)


def test_agz_duplicate_contigs_and_bare_ambiguity(tmp_path):
    """Round-2 review fixes: duplicate contig names within one sample
    refuse at create (the second used to orphan the first's blocks);
    ambiguous bare contig lookups raise instead of silently picking the
    first sample; sample_names length mismatches refuse."""
    fa1 = tmp_path / "s1.fa"
    fa1.write_text(">chr1\nACGT\n>chr2\nGGTT\n")
    fa2 = tmp_path / "s2.fa"
    fa2.write_text(">chr1\nTTTT\n")
    out = str(tmp_path / "p.agz")
    create_agz(out, [str(fa1), str(fa2)], sample_names=["s1", "s2"])
    a = AgzArchive(out)
    assert a.fetch_sequence("chr1@s1", 0, 4) == b"ACGT"
    assert a.fetch_sequence("chr1@s2", 0, 4) == b"TTTT"
    assert a.fetch_sequence("chr2", 0, 4) == b"GGTT"  # unique bare is fine
    with pytest.raises(KeyError, match="ambiguous"):
        a.fetch_sequence("chr1", 0, 4)

    dup = tmp_path / "dup.fa"
    dup.write_text(">chr1 foo\nAAAA\n>chr1 bar\nCCCC\n")
    with pytest.raises(ValueError, match="duplicate contig"):
        create_agz(str(tmp_path / "d.agz"), [str(dup)])

    with pytest.raises(ValueError, match="sample_names"):
        create_agz(
            str(tmp_path / "m.agz"), [str(fa1), str(fa2)],
            sample_names=["only-one"],
        )


# ---- synthetic AGC v3 archives (tests/agcgen.py writer) -------------------


def _mk_seq(n, seed=7):
    out = bytearray()
    state = seed
    for _ in range(n):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(b"ACGT"[state & 3])
    return bytes(out)


def test_agc_multi_segment_round_trip(tmp_path):
    """Multi-segment contigs (every real chromosome) stitch with the AGC
    overlap rule: consecutive segments share the k-long splitter
    (agc_index.rs:157 fetch_sequence serves these via ragc)."""
    from tests.agcgen import write_agc_v3, segment_boundaries
    from impg_tpu.io.agc import AgcArchive

    k, seg = 11, 60
    long1 = _mk_seq(500, seed=3)
    long2 = _mk_seq(233, seed=9)
    short = _mk_seq(40, seed=5)
    samples = {
        "s1": {"chrA": long1, "tiny": short},
        "s2": {"chrA": long2},
    }
    spans = segment_boundaries(len(long1), seg, k)
    assert len(spans) > 5  # genuinely multi-segment
    p = str(tmp_path / "multi.agc")
    write_agc_v3(p, samples, kmer_length=k, segment_size=seg)

    a = AgcArchive(p)
    assert a.list_samples() == ["s1", "s2"]
    assert a.get_sequence_length("chrA@s1") == 500
    assert a.fetch_sequence("chrA@s1", 0, 500) == long1
    assert a.fetch_sequence("chrA@s2", 0, 233) == long2
    assert a.fetch_sequence("tiny@s1", 0, 40) == short
    # range fetch crossing segment boundaries
    assert a.fetch_sequence("chrA@s1", 55, 130) == long1[55:130]
    # bare name: unique -> resolves; duplicated across samples -> raises
    assert a.fetch_sequence("tiny", 0, 4) == short[:4]
    with pytest.raises(KeyError, match="ambiguous"):
        a.fetch_sequence("chrA", 0, 4)


def test_agc_multi_segment_rc_orientation(tmp_path):
    """Per-segment orientation bytes: segments stored reverse-complemented
    decode back to the forward contig before stitching."""
    from tests.agcgen import write_agc_v3
    from impg_tpu.io.agc import AgcArchive

    seq = _mk_seq(300, seed=11)
    p = str(tmp_path / "rc.agc")
    write_agc_v3(p, {"s": {"c": seq}}, kmer_length=9, segment_size=50,
                 rc_orient_stride=2)
    a = AgcArchive(p)
    assert a.fetch_sequence("c@s", 0, 300) == seq


def test_agc_stitch_mismatch_fails_loudly(tmp_path):
    """A broken splitter overlap must raise the conversion-path error,
    never emit silently-wrong bases (unverified-stitch safety contract)."""
    import tests.agcgen as agcgen
    from impg_tpu.io.agc import AgcArchive, AgcFormatError

    seq = _mk_seq(200, seed=13)
    p = str(tmp_path / "bad.agc")
    orig = agcgen.segment_boundaries

    def no_overlap(n, segment_size, k):
        spans = orig(n, segment_size, k)
        # shift every span start forward so the k-overlap invariant breaks
        return [spans[0]] + [(a + 1, b) for a, b in spans[1:]]

    agcgen.segment_boundaries = no_overlap
    try:
        agcgen.write_agc_v3(p, {"s": {"c": seq}}, kmer_length=9,
                            segment_size=50)
    finally:
        agcgen.segment_boundaries = orig
    a = AgcArchive(p)
    with pytest.raises(AgcFormatError, match="overlap"):
        a.fetch_sequence("c@s", 0, 10)


def test_agc_short_at_sample_collision_raises(tmp_path):
    """Two contigs in one sample sharing a whitespace-truncated short name
    make 'short@sample' ambiguous -> KeyError, not first-wins (round-3
    advisor fix; full names keep working)."""
    from tests.agcgen import write_agc_v3
    from impg_tpu.io.agc import AgcArchive

    sa = _mk_seq(30, seed=1)
    sb = _mk_seq(30, seed=2)
    p = str(tmp_path / "amb.agc")
    write_agc_v3(p, {"s": {"chr1 a": sa, "chr1 b": sb}}, kmer_length=9,
                 segment_size=100)
    a = AgcArchive(p)
    assert a.fetch_sequence("chr1 a@s", 0, 30) == sa
    assert a.fetch_sequence("chr1 b@s", 0, 30) == sb
    with pytest.raises(KeyError, match="ambiguous"):
        a.fetch_sequence("chr1@s", 0, 30)
    with pytest.raises(KeyError, match="ambiguous"):
        a.fetch_sequence("chr1", 0, 30)


def test_agc_synthetic_through_unified_index(tmp_path):
    """Synthetic archives route through UnifiedSequenceIndex like real
    ones (extension + content sniff)."""
    from tests.agcgen import write_agc_v3

    seq = _mk_seq(150, seed=21)
    p = str(tmp_path / "u.agc")
    write_agc_v3(p, {"s": {"c1": seq}}, kmer_length=9, segment_size=64)
    idx = UnifiedSequenceIndex.from_files([p])
    assert idx.fetch_sequence("c1@s", 10, 20) == seq[10:20]
    assert idx.get_sequence_length("c1@s") == 150
