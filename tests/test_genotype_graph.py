"""GFA-segment genotyping (reference: commands/genotype.rs:1510-1657 —
candidates are graph paths, features are segments, sample vector is
per-segment read coverage)."""

import random

import pytest

from impg_tpu.genotype.graph import (
    collect_graph_candidates,
    genotype_graph,
    map_reads_to_graph,
)
from impg_tpu.graph.gfa import Gfa
from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def graph_panel(tmp_path_factory):
    """A POA graph over 3 mutated haplotypes + reads drawn from one."""
    tmp = tmp_path_factory.mktemp("gtgraph")
    rng = random.Random(31)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    fa = str(tmp / "p.fa")
    paf = str(tmp / "p.paf")
    datagen.write_fasta(fa, seq_data)
    with open(paf, "w") as fh:
        fh.write(text)
    from impg_tpu.graph import region as region_mod
    from impg_tpu.index.impg_index import load_or_build
    from impg_tpu.io.fasta import UnifiedSequenceIndex
    from impg_tpu.query import engine as engine_mod

    index = load_or_build([paf])
    useq = UnifiedSequenceIndex.from_files([fa])
    qid = index.seq_index.get_id("ref")
    rows = engine_mod.query(index, qid, 0, 6000)
    gfa_text = region_mod.generate_gfa(index, rows, useq)
    # Reads from s0 only -> homozygous s0 truth.
    reads = []
    src = seq_data["s0"]
    for i in range(500):
        s = rng.randint(0, len(src) - 150)
        reads.append((f"r{i}", src[s : s + 150]))
    fq = str(tmp / "reads.fastq")
    with open(fq, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return tmp, gfa_text, fq, seq_data


def test_collect_graph_candidates(graph_panel):
    tmp, gfa_text, fq, seq_data = graph_panel
    gfa = Gfa.parse(gfa_text)
    cands, region = collect_graph_candidates(gfa)
    assert region == "all-graph-paths"
    assert len(cands) == len(gfa.paths)
    for c in cands:
        assert c.anchors > 0 and c.features
        assert c.span_fraction == 1.0
    # Interval-bounded candidates.
    name = gfa.paths[0][0]
    cands2, region2 = collect_graph_candidates(gfa, f"{name}:0-1000")
    assert region2 == f"{name}:0-1000"
    full = next(c for c in cands if c.path_name == name)
    part = next(c for c in cands2 if c.path_name == name)
    assert part.anchors <= full.anchors
    with pytest.raises(ValueError, match="not present in graph"):
        collect_graph_candidates(gfa, "nope")


def test_map_reads_to_graph_counts(graph_panel):
    tmp, gfa_text, fq, seq_data = graph_panel
    counts, n_reads, n_matched = map_reads_to_graph(
        Gfa.parse(gfa_text), [fq]
    )
    assert n_reads == 500
    assert n_matched > 400
    assert counts and all(v > 0 for v in counts.values())


def test_genotype_graph_recovers_homozygous_truth(graph_panel):
    tmp, gfa_text, fq, seq_data = graph_panel
    candidates, results, region = genotype_graph(gfa_text, [fq], ploidy=2)
    top = results[0]
    top_paths = {candidates[i].path_name for i in top.combination}
    assert len(top_paths) == 1
    assert next(iter(top_paths)).startswith("s0:"), (
        top_paths,
        [
            (
                {candidates[i].path_name for i in r.combination},
                round(r.similarity, 4),
            )
            for r in results[:4]
        ],
    )
    assert top.similarity > 0.8


def test_cli_genotype_graph(graph_panel, tmp_path):
    tmp, gfa_text, fq, seq_data = graph_panel
    g = tmp_path / "g.gfa"
    g.write_text(gfa_text)
    r = run_cli("genotype", "cos", "--graph", str(g), "-q", fq)
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#sample")
    top = lines[1].split("\t")
    assert top[2] == "1"
    assert "s0:" in top[3]
    # Missing reads: clean error.
    r = run_cli("genotype", "cos", "--graph", str(g))
    assert r.returncode == 2
    assert "needs -q" in r.stderr


def test_map_reads_gaf(graph_panel):
    """GAF rows reference real segments in walk order with sane coords."""
    from impg_tpu.genotype.graph import map_reads_gaf

    tmp, gfa_text, fq, seq_data = graph_panel
    gfa = Gfa.parse(gfa_text)
    import re

    rows = list(map_reads_gaf(gfa, [fq]))
    assert len(rows) > 400
    path_names = {n for n, _ in gfa.paths}
    for line in rows[:50]:
        f = line.split("\t")
        assert len(f) == 12
        qlen, qs, qe = int(f[1]), int(f[2]), int(f[3])
        assert 0 <= qs < qe <= qlen == 150
        assert f[4] in "+-"
        steps = re.findall(r"[<>][^<>]+", f[5])
        assert steps
        for st in steps:
            assert st[1:] in gfa.segments, st
        plen, ps, pe = int(f[6]), int(f[7]), int(f[8])
        assert 0 <= ps < pe <= plen
        matches, block = int(f[9]), int(f[10])
        assert 0 < matches <= block == pe - ps


def test_cli_map_gaf_and_graph_pack(graph_panel, tmp_path):
    tmp, gfa_text, fq, seq_data = graph_panel
    g = tmp_path / "g.gfa"
    g.write_text(gfa_text)
    r = run_cli("map", "--graph", str(g), "-q", fq, "-o", "gaf")
    assert r.returncode == 0, r.stderr
    assert "Mapped" in r.stderr
    assert r.stdout.count("\n") > 400
    tsv = tmp_path / "cov.tsv"
    r = run_cli(
        "map", "--graph", str(g), "-q", fq, "-o", "graph-pack-tsv",
        "-O", str(tsv),
    )
    assert r.returncode == 0, r.stderr
    lines = tsv.read_text().splitlines()
    assert lines[0] == "#feature_space\tgfa-segment"
    assert len(lines) > 3
    # Missing --graph: clean error.
    r = run_cli("map", "-q", fq, "-o", "gaf")
    assert r.returncode == 2


def test_surject_gaf_to_paf(graph_panel, tmp_path):
    """PAF surjection: region-graph path names carry their source frame;
    surjected target coordinates land inside the source interval."""
    from impg_tpu.genotype.graph import map_reads_gaf, surject_gaf_to_paf
    from impg_tpu.graph.lace import split_path_name

    tmp, gfa_text, fq, seq_data = graph_panel
    gfa = Gfa.parse(gfa_text)
    sources = {}
    for name, _ in gfa.paths:
        p = split_path_name(name)
        assert p, name  # region graphs name paths src:start-end
        sources[p[0]] = (p[1], p[2])
    rows = list(surject_gaf_to_paf(gfa, map_reads_gaf(gfa, [fq])))
    assert len(rows) > 400
    for line in rows[:50]:
        f = line.split("\t")
        assert len(f) == 12
        assert f[5] in sources, f[5]
        base, end = sources[f[5]]
        ts, te = int(f[7]), int(f[8])
        assert base <= ts < te <= end + 1, (f[5], ts, te, base, end)
    g = tmp_path / "g.gfa"
    g.write_text(gfa_text)
    r = run_cli("map", "--graph", str(g), "-q", fq, "-o", "paf")
    assert r.returncode == 0, r.stderr
    assert "surjected" in r.stderr
    assert r.stdout.count("\n") > 400


def test_collect_candidates_literal_range_named_path():
    """A W-line-style path literally named 'sample#1#chr:0-N' must be
    targetable by its full name (the range parse previously shadowed it)."""
    from impg_tpu.genotype.graph import collect_graph_candidates
    from impg_tpu.graph.gfa import Gfa

    text = (
        "H\tVN:Z:1.0\n"
        "S\t1\tACGTACGT\nS\t2\tTTTT\n"
        "L\t1\t+\t2\t+\t0M\n"
        "P\ts#1#chr:0-12\t1+,2+\t*\n"
    )
    g = Gfa.parse(text)
    cands, tname = collect_graph_candidates(g, target_path="s#1#chr:0-12")
    assert tname == "s#1#chr:0-12"
    assert cands


def test_collect_candidates_rejects_inverted_interval():
    import pytest as _pytest

    from impg_tpu.genotype.graph import collect_graph_candidates
    from impg_tpu.graph.gfa import Gfa

    text = (
        "H\tVN:Z:1.0\nS\t1\tACGTACGT\nP\tchr\t1+\t*\n"
    )
    g = Gfa.parse(text)
    with _pytest.raises(ValueError, match="empty or inverted"):
        collect_graph_candidates(g, target_path="chr:6-2")


def test_surject_gaf_reverse_traversal():
    """A GAF row walking path steps in reverse ('<B<A') surjects onto the
    forward path frame with flipped strand (was silently dropped)."""
    from impg_tpu.genotype.graph import surject_gaf_to_paf
    from impg_tpu.graph.gfa import Gfa

    text = (
        "H\tVN:Z:1.0\n"
        "S\tA\tACGTACGT\nS\tB\tTTTTT\n"
        "L\tA\t+\tB\t+\t0M\n"
        "P\tchr:100-113\tA+,B+\t*\n"
    )
    g = Gfa.parse(text)
    row = "r1\t13\t0\t13\t+\t<B<A\t13\t0\t13\t13\t13\t60"
    out = list(surject_gaf_to_paf(g, [row]))
    assert len(out) == 1
    f = out[0].split("\t")
    assert f[4] == "-"
    assert f[5] == "chr"
    assert (int(f[7]), int(f[8])) == (100, 113)


def test_packbin_roundtrip():
    """IMPGPKB1 writer/reader round-trip: dense blocks, overflow table
    (counts > 255), multi-block layout, empty universe."""
    import numpy as np

    from impg_tpu.io import packbin

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.pack")
        rng = np.random.default_rng(5)
        universe = 5000
        ids = np.sort(rng.choice(np.arange(1, universe + 1), 700,
                                 replace=False))
        counts = rng.integers(1, 1000, ids.size)  # some overflow 255
        packbin.write_packbin(p, ids, counts, universe, block_size=512,
                              retained_records=42, syncmer_anchors=7)
        assert packbin.is_packbin(p)
        rid, rcnt, meta = packbin.read_packbin(p)
        assert np.array_equal(rid, ids)
        assert np.array_equal(rcnt, counts)
        assert meta["universe_nodes"] == universe
        assert meta["retained_records"] == 42
        assert meta["syncmer_anchors"] == 7
        # empty universe
        p2 = os.path.join(td, "e.pack")
        packbin.write_packbin(p2, [], [], 0)
        rid, rcnt, meta = packbin.read_packbin(p2)
        assert rid.size == 0 and meta["universe_nodes"] == 0
        # out-of-range ids rejected (pack.rs InvalidData contract)
        with pytest.raises(ValueError):
            packbin.write_packbin(p2, [0], [1], 10)


def test_cli_graph_pack_interop(graph_panel, tmp_path):
    """`map --graph -o graph-pack` emits the reference's IMPGPKB1 layout
    and `genotype cos --graph --pack` consumes it, ranking the same
    homozygous truth as read-based genotyping (pack.rs interop)."""
    tmp, gfa_text, fq, seq_data = graph_panel
    import os

    gfa_path = str(tmp_path / "g.gfa")
    open(gfa_path, "w").write(gfa_text)
    pack_path = str(tmp_path / "s.pack")
    r = run_cli("map", "--graph", gfa_path, "-q", fq, "-o", "graph-pack",
                "-O", pack_path)
    assert r.returncode == 0, r.stderr
    from impg_tpu.io import packbin

    assert packbin.is_packbin(pack_path)
    node_ids, counts, meta = packbin.read_packbin(pack_path)
    assert node_ids.size > 0 and meta["universe_nodes"] > 0
    r_pack = run_cli("genotype", "cos", "--graph", gfa_path, "--pack",
                     pack_path)
    assert r_pack.returncode == 0, r_pack.stderr
    r_reads = run_cli("genotype", "cos", "--graph", gfa_path, "-q", fq)
    assert r_reads.returncode == 0, r_reads.stderr
    top_pack = r_pack.stdout.splitlines()[1].split("\t")[3]
    top_reads = r_reads.stdout.splitlines()[1].split("\t")[3]
    assert top_pack == top_reads
    assert "s0" in top_pack  # homozygous truth


def test_cli_graph_pack_reference_tsv(graph_panel, tmp_path):
    """genotype cos --graph --pack also accepts the reference's
    '#node_id\\tcount' TSV flavor (pack.rs write_tsv/read_tsv)."""
    tmp, gfa_text, fq, seq_data = graph_panel
    gfa_path = str(tmp_path / "g.gfa")
    open(gfa_path, "w").write(gfa_text)
    pack_path = str(tmp_path / "s.pack")
    r = run_cli("map", "--graph", gfa_path, "-q", fq, "-o", "graph-pack",
                "-O", pack_path)
    assert r.returncode == 0, r.stderr
    from impg_tpu.io import packbin

    node_ids, counts, _ = packbin.read_packbin(pack_path)
    tsv_path = str(tmp_path / "s.tsv")
    with open(tsv_path, "w") as fh:
        fh.write("#node_id\tcount\n")
        for n, c in zip(node_ids.tolist(), counts.tolist()):
            fh.write(f"{n}\t{c}\n")
    r_tsv = run_cli("genotype", "cos", "--graph", gfa_path, "--pack",
                    tsv_path)
    assert r_tsv.returncode == 0, r_tsv.stderr
    r_bin = run_cli("genotype", "cos", "--graph", gfa_path, "--pack",
                    pack_path)
    assert r_tsv.stdout == r_bin.stdout


def test_packbin_validation_guards():
    """Writer mirrors pack.rs's header guards (block_size in 1..=u32::MAX,
    u32 universe); reader rejects an overflow table whose node is absent
    from the dense vector instead of silently patching a neighbor."""
    import struct
    import tempfile, os

    import numpy as np

    from impg_tpu.io import packbin

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "g.pack")
        with pytest.raises(ValueError):
            packbin.write_packbin(p, [1], [1], 10, block_size=0)
        with pytest.raises(ValueError):
            packbin.write_packbin(p, [1], [1], 10, block_size=1 << 32)
        with pytest.raises(ValueError):
            packbin.write_packbin(p, [1], [1], 1 << 32)
        # Build a valid pack with one overflow row, then corrupt the
        # overflow node id to one with a zero dense count.
        packbin.write_packbin(p, [2, 5], [300, 7], 10)
        data = bytearray(open(p, "rb").read())
        (_, _, _, _, _, _, _, _, _, _, overflow_len, _, ovf_off, _
         ) = packbin._HEADER.unpack_from(data, 0)
        assert overflow_len == 1
        struct.pack_into("<I", data, ovf_off, 9)  # node 9 has count 0
        open(p, "wb").write(bytes(data))
        with pytest.raises(ValueError, match="overflow table"):
            packbin.read_packbin(p)
