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
