"""syng2gfa blunt syncmer graph (reference: commands/syng2gfa.rs —
exact source-spelling paths, shared syncmer collapse, frequency
privatization)."""

import random

from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import UnifiedSequenceIndex, reverse_complement
from impg_tpu.syng.index import SyngIndex
from impg_tpu.syng.syng2gfa import syng_to_gfa
from tests import datagen
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


def _panel(tmp_path, seed=41, n_seqs=3, seq_len=5000):
    rng = random.Random(seed)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=n_seqs, seq_len=seq_len, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    syng = SyngIndex.build_from_fasta([fa])
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    return syng, seq_idx, seq_data, fa


def test_paths_spell_sources_exactly(tmp_path):
    syng, seq_idx, seq_data, fa = _panel(tmp_path)
    gfa_text = syng_to_gfa(syng, seq_idx)
    g = Gfa.parse(gfa_text)
    spelled = _spell(g)
    assert set(spelled) == set(seq_data)
    for name, seq in seq_data.items():
        assert spelled[name] == seq.encode(), name
    # Homologous genomes share syncmer nodes: the graph is much smaller
    # than the sum of its paths.
    total_path_bp = sum(len(s) for s in seq_data.values())
    graph_bp = sum(len(s) for s in g.segments.values())
    assert graph_bp < 0.8 * total_path_bp, (graph_bp, total_path_bp)
    # Shared nodes exist (depth >= 2 somewhere).
    depth: dict = {}
    for _, steps in g.paths:
        for sid, _ in steps:
            depth[sid] = depth.get(sid, 0) + 1
    assert max(depth.values()) >= 2


def test_reverse_complement_sequence_shares_nodes(tmp_path):
    rng = random.Random(5)
    fwd = "".join(rng.choice("ACGT") for _ in range(4000))
    rc = reverse_complement(fwd.encode()).decode()
    fa = str(tmp_path / "rc.fa")
    datagen.write_fasta(fa, {"fwd": fwd, "rev": rc})
    syng = SyngIndex.build_from_fasta([fa])
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    g = Gfa.parse(syng_to_gfa(syng, seq_idx))
    spelled = _spell(g)
    assert spelled["fwd"] == fwd.encode()
    assert spelled["rev"] == rc.encode()
    # The RC path traverses its syncmer nodes in '-' orientation.  (Blunt
    # cutting at syncmer starts is not strand-symmetric, so a pure-RC copy
    # spells through its own node set — the raw overlap mode of the
    # reference is the representation that shares across RC; exactness of
    # both spellings is the contract here.)
    rev_steps = dict(g.paths)["rev"]
    assert any(rev for _, rev in rev_steps)


def test_cli_syng2gfa(tmp_path):
    syng, seq_idx, seq_data, fa = _panel(tmp_path, seed=42)
    prefix = str(tmp_path / "pan")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "g.gfa")
    r = run_cli(
        "syng2gfa", "-a", prefix + ".syngt", "--sequence-files", fa,
        "-o", out,
    )
    assert r.returncode == 0, r.stderr
    g = Gfa.parse(open(out).read())
    assert _spell(g) == {n: s.encode() for n, s in seq_data.items()}


def test_raw_overlap_mode(tmp_path):
    """Raw mode: full RC-shared syncmer nodes with (k-offset)M overlap
    links; walks spell the sources after overlap trimming
    (syng2gfa.rs:171 SyngGfaMode::Raw)."""
    import random

    from impg_tpu.io.fasta import UnifiedSequenceIndex, reverse_complement
    from tests import datagen

    rng = random.Random(19)
    a = "".join(rng.choice("ACGT") for _ in range(6000))
    shared = a[2000:4000]
    b = (
        "".join(rng.choice("ACGT") for _ in range(1000))
        + reverse_complement(shared.encode()).decode()
        + "".join(rng.choice("ACGT") for _ in range(1000))
    )
    fa = str(tmp_path / "r.fa")
    datagen.write_fasta(fa, {"A": a, "B": b})
    syng = SyngIndex.build_from_fasta([fa])
    seq_idx = UnifiedSequenceIndex.from_files([fa])
    text = syng_to_gfa(syng, seq_idx, mode="raw")

    segs = {}
    links = {}
    paths = {}
    for line in text.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "L":
            ov = int(f[5][:-1])
            links[(f[1], f[2] == "-", f[3], f[4] == "-")] = ov
        elif f[0] == "P":
            paths[f[1]] = [(s[:-1], s.endswith("-")) for s in f[2].split(",")]
    # Some overlap links must exist (syncmers overlap on dense sequence).
    assert any(ov > 0 for ov in links.values())
    k = syng.syncmer_len
    # Full-length syncmer nodes (k bp) appear.
    assert any(len(s) == k for s in segs.values())

    # Spelling: concatenate oriented steps trimming each link's overlap.
    def spell(steps):
        out = b""
        prev = None
        for sid, rev in steps:
            piece = segs[sid].encode()
            if rev:
                piece = reverse_complement(piece)
            ov = links.get((prev[0], prev[1], sid, rev), 0) if prev else 0
            out += piece[ov:]
            prev = (sid, rev)
        return out

    assert spell(paths["A"]) == a.encode()
    assert spell(paths["B"]) == b.encode()

    # RC-sharing: the shared (reverse-complemented) region reuses A's
    # syncmer nodes with flipped orientation in B's walk.
    a_nodes = {sid for sid, _ in paths["A"]}
    b_rev_nodes = {sid for sid, rev in paths["B"] if rev}
    assert len(a_nodes & b_rev_nodes) > 5


def test_cli_raw_mode(tmp_path):
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(21)
    seqs = {"x": "".join(rng.choice("ACGT") for _ in range(4000))}
    fa = str(tmp_path / "x.fa")
    datagen.write_fasta(fa, seqs)
    prefix = str(tmp_path / "x")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "syng2gfa", "-a", prefix + ".syngt", "--sequence-files", fa,
        "--mode", "raw",
    )
    assert r.returncode == 0, r.stderr
    assert any(
        l.split("\t")[5] != "0M"
        for l in r.stdout.splitlines()
        if l.startswith("L\t")
    )


def test_cli_gfa_version_11(tmp_path):
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(61)
    seqs = {"hg#1#chrX": "".join(rng.choice("ACGT") for _ in range(3000))}
    fa = str(tmp_path / "w.fa")
    datagen.write_fasta(fa, seqs)
    prefix = str(tmp_path / "w")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "syng2gfa", "-a", prefix + ".syngt", "--sequence-files", fa,
        "--gfa-version", "1.1",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0] == "H\tVN:Z:1.1"
    w = [l for l in lines if l.startswith("W\t")]
    assert len(w) == 1
    f = w[0].split("\t")
    assert f[1:4] == ["hg", "1", "chrX"] and f[5] == "3000"
    assert not any(l.startswith("P\t") for l in lines)
    # The W graph parses back with the same spelling.
    from impg_tpu.graph.gfa import Gfa
    from impg_tpu.io.fasta import reverse_complement

    g = Gfa.parse(r.stdout)
    name, steps = g.paths[0]
    spelled = b"".join(
        reverse_complement(g.segments[s].encode()) if rev
        else g.segments[s].encode()
        for s, rev in steps
    )
    assert spelled == seqs["hg#1#chrX"].encode()


def test_cut_ns_splits_paths_at_n_runs(tmp_path):
    """--cut-ns: gap DNA N-runs >= min-run are dropped and paths break
    there into NAME|partN pieces (syng2gfa.rs push_gap_with_n_cutting +
    test_walked_path_segments_are_named_when_split)."""
    rng = random.Random(9)
    left = "".join(rng.choice("ACGT") for _ in range(2000))
    right = "".join(rng.choice("ACGT") for _ in range(2000))
    seq_data = {
        "s1": left + "N" * 50 + right,
        "s2": left + "N" * 50 + right[:1500],
    }
    fa = str(tmp_path / "n.fa")
    datagen.write_fasta(fa, seq_data)
    syng = SyngIndex.build_from_fasta([fa])
    seq_idx = UnifiedSequenceIndex.from_files([fa])

    plain = Gfa.parse(syng_to_gfa(syng, seq_idx))
    assert sorted(n for n, _ in plain.paths) == ["s1", "s2"]
    assert any("N" * 50 in s for s in plain.segments.values())

    cut = Gfa.parse(syng_to_gfa(syng, seq_idx, cut_n_gaps=True,
                                cut_n_min_run=10))
    names = sorted(n for n, _ in cut.paths)
    assert names == ["s1|part1", "s1|part2", "s2|part1", "s2|part2"]
    # The ambiguous run is gone; short runs would be kept.
    assert all("N" * 10 not in s for s in cut.segments.values())
    # Each part spells a contiguous slice of its source around the N-run.
    spells = _spell(cut)
    for base, full in seq_data.items():
        joined = (spells[f"{base}|part1"] + spells[f"{base}|part2"]).decode()
        assert joined == full.replace("N", "")


def test_cli_syng2gfa_cut_ns(tmp_path):
    rng = random.Random(10)
    core = "".join(rng.choice("ACGT") for _ in range(1500))
    seq_data = {"s1": core + "N" * 30 + core[::-1].replace("N", "A")}
    fa = str(tmp_path / "c.fa")
    datagen.write_fasta(fa, seq_data)
    prefix = str(tmp_path / "c")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "syng2gfa", "-a", prefix + ".syngt", "--sequence-files", fa,
        "--cut-ns", "--cut-n-min-run", "10",
    )
    assert r.returncode == 0, r.stderr
    g = Gfa.parse(r.stdout)
    assert sorted(n for n, _ in g.paths) == ["s1|part1", "s1|part2"]
