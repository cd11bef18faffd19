"""Lace: combining per-window GFAs (reference: commands/lace.rs)."""

import random

import pytest

from impg_tpu.graph import lace
from impg_tpu.graph.region import generate_gfa
from impg_tpu.io.fasta import UnifiedSequenceIndex, reverse_complement
from impg_tpu.query import engine
from impg_tpu.query.merge import merge_query_adjusted_intervals
from tests import datagen
from tests.test_cli import run_cli
from tests.test_fasta import make_fasta
from tests.test_query import index_from_text


def path_seqs(gfa_text: str) -> dict[str, str]:
    segs, out = {}, {}
    for line in gfa_text.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "P":
            seq = ""
            for step in f[2].split(","):
                piece = segs[step[:-1]]
                if step.endswith("-"):
                    piece = reverse_complement(piece.encode()).decode()
                seq += piece
            out[f[1]] = seq
    return out


def test_split_path_name():
    assert lace.split_path_name("chr1:100-200") == ("chr1", 100, 200)
    assert lace.split_path_name("HG#1#chr1:0-5") == ("HG#1#chr1", 0, 5)
    assert lace.split_path_name("plain") is None


def test_sort_and_filter_ranges():
    mk = lambda s, e: lace.RangeInfo(s, e, 0, [(0, False)])
    ranges = [mk(100, 200), mk(0, 50), mk(100, 200), mk(120, 180), mk(150, 300)]
    lace.sort_and_filter_ranges(ranges)
    assert [(r.start, r.end) for r in ranges] == [(0, 50), (100, 200), (150, 300)]


def region_gfa(index, seq_idx, tid, start, end):
    rows = engine.query_transitive_bfs(index, tid, start, end, max_depth=3)
    merge_query_adjusted_intervals(rows, 100, True)
    return generate_gfa(index, rows, seq_idx)


@pytest.fixture(scope="module")
def windows(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lace")
    fa, paf, seqs, seq_data = make_fasta(tmp, seed=23)
    index = index_from_text(open(paf).read())
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    rid = index.seq_index.get_id("ref")
    g1 = region_gfa(index, seq_idx, rid, 0, 700)
    g2 = region_gfa(index, seq_idx, rid, 600, 1500)  # overlaps g1 by 100 on ref
    return g1, g2, seqs, seq_data, fa


def test_lace_overlapping_windows(windows):
    g1, g2, seqs, seq_data, fa = windows
    laced = lace.lace_gfas([g1, g2])
    merged = path_seqs(laced)
    assert merged
    # Laced paths must spell the source sequence over their merged span.
    for name, seq in merged.items():
        parsed = lace.split_path_name(name)
        assert parsed is not None, name
        key, start, end = parsed
        expected = seq_data[key][start:end]
        assert seq in (
            expected,
            reverse_complement(expected.encode()).decode(),
        ), f"{name}: laced path does not spell source"
    # ref's windows are contiguous after trim -> single merged ref path.
    ref_paths = [n for n in merged if n.startswith("ref:")]
    assert ref_paths == ["ref:0-1500"]


def test_lace_disjoint_windows_stay_separate(windows):
    g1, g2, seqs, seq_data, fa = windows
    # Shift the second window so a gap remains -> two ref paths.
    laced = lace.lace_gfas([g1])
    merged = path_seqs(laced)
    assert any(n.startswith("ref:") for n in merged)


def test_lace_gap_fill(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path, seed=29)
    index = index_from_text(open(paf).read())
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    rid = index.seq_index.get_id("ref")
    g1 = region_gfa(index, seq_idx, rid, 0, 500)
    g2 = region_gfa(index, seq_idx, rid, 900, 1400)  # 400bp gap on ref
    laced = lace.lace_gfas([g1, g2], fill_gaps=True, sequence_index=seq_idx)
    merged = path_seqs(laced)
    ref_paths = [n for n in merged if n.startswith("ref:")]
    assert ref_paths == ["ref:0-1400"]
    assert merged["ref:0-1400"] == seq_data["ref"][0:1400]


def test_cli_lace(tmp_path, windows):
    g1, g2, seqs, seq_data, fa = windows
    p1, p2 = tmp_path / "w1.gfa", tmp_path / "w2.gfa"
    p1.write_text(g1)
    p2.write_text(g2)
    out = tmp_path / "laced.gfa"
    r = run_cli(
        "lace", "--gfa-files", f"{p1},{p2}", "--output", str(out)
    )
    assert r.returncode == 0, r.stderr
    merged = path_seqs(out.read_text())
    assert any(n == "ref:0-1500" for n in merged)


def test_partition_gfa_then_lace(tmp_path):
    """Full pipeline: partition -> per-partition GFAs -> lace."""
    fa, paf, seqs, seq_data = make_fasta(tmp_path, seed=31)
    out = tmp_path / "parts"
    r = run_cli(
        "partition", "-a", paf, "-w", "800", "-d", "100",
        "--min-missing-size", "100", "--min-boundary-distance", "100",
        "--separate-files", "-o", "gfa", "--sequence-files", fa,
        "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    gfas = sorted(out.glob("partition*.gfa"))
    assert gfas
    laced_out = tmp_path / "combined.gfa"
    r = run_cli(
        "lace", "--gfa-files", ",".join(str(g) for g in gfas),
        "--output", str(laced_out),
    )
    assert r.returncode == 0, r.stderr
    merged = path_seqs(laced_out.read_text())
    # Every laced path spells its source slice.
    for name, seq in merged.items():
        key, start, end = lace.split_path_name(name)
        expected = seq_data[key][start:end]
        assert seq in (
            expected, reverse_complement(expected.encode()).decode()
        ), name


def test_partition_single_file_gfa(tmp_path):
    """Partitioned single-file pipeline: partition -> POA graphs -> lace."""
    fa, paf, seqs, seq_data = make_fasta(tmp_path, seed=37)
    out = tmp_path / "one"
    r = run_cli(
        "partition", "-a", paf, "-w", "800", "-d", "100",
        "--min-missing-size", "100", "--min-boundary-distance", "100",
        "-o", "gfa", "--sequence-files", fa, "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    laced = (out / "partitions.gfa").read_text()
    merged = path_seqs(laced)
    assert merged
    for name, seq in merged.items():
        key, start, end = lace.split_path_name(name)
        expected = seq_data[key][start:end]
        assert seq in (
            expected, reverse_complement(expected.encode()).decode()
        ), name
    # With gap filling the pipeline should reassemble near-full genomes.
    covered = {}
    for name in merged:
        key, start, end = lace.split_path_name(name)
        covered[key] = covered.get(key, 0) + (end - start)
    for name, L in seqs.items():
        assert covered.get(name, 0) >= 0.9 * L, (name, covered.get(name), L)


def test_lace_three_way_overlap_preserves_spelling():
    """Trimming runs against the RUNNING coverage: a range overlapped by
    two earlier ranges must neither duplicate covered bases nor drop the
    tail of its split step (lace.rs trims only pairwise and does both)."""
    import random

    from impg_tpu.graph.lace import lace_gfas

    rng = random.Random(8)
    src = "".join(rng.choice("ACGT") for _ in range(120))

    def window(lo, hi, node_len):
        lines = ["H\tVN:Z:1.0"]
        ids = []
        pos = lo
        n = 1
        while pos < hi:
            end = min(pos + node_len, hi)
            lines.append(f"S\t{n}\t{src[pos:end]}")
            ids.append(n)
            n += 1
            pos = end
        for a, b in zip(ids, ids[1:]):
            lines.append(f"L\t{a}\t+\t{b}\t+\t0M")
        lines.append(
            f"P\tk:{lo}-{hi}\t" + ",".join(f"{i}+" for i in ids) + "\t*"
        )
        return "\n".join(lines) + "\n"

    # r1=[0,100], r2=[50,110], r3=[60,120] with a 20bp node grid: r3 has
    # a step [95,115) crossing both earlier ends.
    out = lace_gfas([window(0, 100, 25), window(50, 110, 20),
                     window(60, 120, 35)])
    segs = {}
    spelled = {}
    for line in out.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "P":
            from impg_tpu.io.fasta import reverse_complement

            s = ""
            for st in f[2].split(","):
                sid, rev = st[:-1], st.endswith("-")
                t = segs[sid]
                if rev:
                    t = reverse_complement(t.encode()).decode()
                s += t
            key, _, rng_part = f[1].rpartition(":")
            a, _, b = rng_part.partition("-")
            spelled[(key, int(a), int(b))] = s
    # One merged path covering [0,120) spelling the source exactly.
    assert ("k", 0, 120) in spelled, sorted(spelled)
    assert spelled[("k", 0, 120)] == src


def test_lace_splits_reverse_orientation_steps():
    """A reverse step crossing the trim cut splits on its oriented
    sequence (the reference's handle-aware get_sequence, lace.rs:181)
    instead of raising."""
    from impg_tpu.graph.lace import lace_gfas
    from impg_tpu.io.fasta import reverse_complement

    src = "ACGTACGTACGTACGTACGT"  # 20 bp
    w1 = (
        "H\tVN:Z:1.0\n"
        f"S\t1\t{src[:12]}\n"
        "P\tk:0-12\t1+\t*\n"
    )
    # Second window [8,20) spelled by ONE reverse step.
    rc = reverse_complement(src[8:20].encode()).decode()
    w2 = (
        "H\tVN:Z:1.0\n"
        f"S\t1\t{rc}\n"
        "P\tk:8-20\t1-\t*\n"
    )
    out = lace_gfas([w1, w2])
    segs = {}
    path = None
    for line in out.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "P" and f[1] == "k:0-20":
            path = f[2]
    assert path is not None, out
    s = ""
    for st in path.split(","):
        sid, rev = st[:-1], st.endswith("-")
        t = segs[sid]
        if rev:
            t = reverse_complement(t.encode()).decode()
        s += t
    assert s == src


# ---- VCF lacing (lace.rs:1404 run_vcf_lace) --------------------------------


def _window_vcf(path, chrom_windows, samples, records, meta=()):
    """records: list of (chrom_window, pos, ref, alt, gts)."""
    lines = ["##fileformat=VCFv4.2", *meta]
    lines.append("\t".join(["#CHROM", "POS", "ID", "REF", "ALT", "QUAL",
                            "FILTER", "INFO", "FORMAT", *samples]))
    for chrom, pos, ref, alt, gts in records:
        lines.append("\t".join(
            [chrom, str(pos), ".", ref, alt, ".", ".", ".", "GT", *gts]))
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_vcf_lace_merges_windows(tmp_path):
    """Records lift to the base frame (POS += window start), samples union
    sorted with ./. fill, ##contig regenerated from max window end, files
    ordered by (chr, start) regardless of argument order."""
    from impg_tpu.graph.vcf_lace import lace_vcfs

    v1 = str(tmp_path / "w1.vcf")
    v2 = str(tmp_path / "w2.vcf")
    _window_vcf(v1, None, ["sampleA"],
                [("ref#1#chr2:1000-2000", 5, "A", "T", ["1"])],
                meta=("##source=impg-tpu-test",))
    _window_vcf(v2, None, ["sampleB", "sampleA"],
                [("ref#1#chr2:0-1000", 10, "G", "C", ["0", "1"]),
                 ("ref#1#chr1:500-900", 3, "T", "G", ["1", "0"])])
    # pass in "wrong" order; chr1 window (v2) sorts first
    text = lace_vcfs([v1, v2])
    lines = text.strip().splitlines()
    assert lines[0] == "##fileformat=VCFv4.2"
    contigs = [l for l in lines if l.startswith("##contig")]
    assert contigs == [
        "##contig=<ID=ref#1#chr1,length=900>",
        "##contig=<ID=ref#1#chr2,length=2000>",
    ]
    header = [l for l in lines if l.startswith("#CHROM")][0]
    assert header.endswith("FORMAT\tsampleA\tsampleB")
    recs = [l.split("\t") for l in lines if not l.startswith("#")]
    # v2 provides the meta-source file? No: v2 sorts first (chr1), so the
    # ##source line from v1 is NOT copied (first sorted file's meta wins).
    assert not any(l.startswith("##source") for l in lines)
    # v2 (smallest key: chr1) writes first, keeping ITS record order —
    # the reference sorts files, not records (lace.rs:1504, :1744).
    assert recs[0][:2] == ["ref#1#chr2", "10"]
    assert recs[0][9:] == ["1", "0"]          # (sampleA, sampleB)
    assert recs[1][:2] == ["ref#1#chr1", "503"]
    assert recs[1][9:] == ["0", "1"]
    assert recs[2][:2] == ["ref#1#chr2", "1005"]
    assert recs[2][9:] == ["1", "./."]        # sampleB missing in v1


def test_vcf_lace_reference_lengths_and_gzip(tmp_path):
    """--sequence-files overrides estimated contig lengths; gzip inputs
    read transparently (lace.rs:1727, :1603)."""
    import gzip

    from impg_tpu.graph.vcf_lace import lace_vcfs

    v1 = str(tmp_path / "w1.vcf")
    _window_vcf(v1, None, ["s"], [("ctg:100-200", 7, "A", "G", ["1"])])
    gz = str(tmp_path / "w1.vcf.gz")
    with open(v1, "rb") as fh, gzip.open(gz, "wb") as out:
        out.write(fh.read())

    class FakeRef:
        def get_sequence_length(self, name):
            assert name == "ctg"
            return 5000

    text = lace_vcfs([gz], FakeRef())
    assert "##contig=<ID=ctg,length=5000>" in text
    assert "ctg\t107\t" in text


def test_cli_lace_vcf_auto(tmp_path):
    """CLI: lace --files *.vcf auto-routes to VCF lacing."""
    from tests.test_cli import run_cli

    v1 = tmp_path / "a.vcf"
    _window_vcf(str(v1), None, ["s"],
                [("chrX:50-80", 2, "C", "A", ["1"])])
    out = tmp_path / "merged.vcf"
    r = run_cli("lace", "--files", str(v1), "--output", str(out))
    assert r.returncode == 0, r.stderr
    body = out.read_text()
    assert "chrX\t52\t" in body
    assert "##contig=<ID=chrX,length=80>" in body


def test_cli_partition_accepts_paf_extension(tmp_path):
    """The reference validates partition output to bed/gfa/vcf/maf/fasta
    ONLY (partition.rs:1428-1505 has no PAF arm).  Since round 5 we accept
    `-o paf` as a documented extension (interval-level PAF rows); pin that
    the CLI takes it and writes partitions.paf."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(7)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=3, seq_len=2000)
    paf = tmp_path / "p.paf"
    paf.write_text(text)
    r = run_cli("partition", "-a", str(paf), "-w", "1000", "-d", "100",
                "-o", "paf", cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "partitions.paf").exists()
