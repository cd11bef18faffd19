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


def test_infer_detects_recombinant(panel, tmp_path):
    """Sample = s0 on the left half of ref's frame, s2 on the right half:
    windowed inference should stitch a mosaic with one switch per slot."""
    tmp, fa, idx, seq_data, fastq = panel
    rng = random.Random(99)
    half = len(seq_data["s0"]) // 2
    recomb = seq_data["s0"][:half] + seq_data["s2"][len(seq_data["s2"]) // 2:]
    reads = []
    for i in range(900):
        if len(recomb) <= 150:
            break
        s = rng.randint(0, len(recomb) - 150)
        reads.append((f"m{i}", recomb[s : s + 150]))
    fq = str(tmp_path / "recomb.fastq")
    with open(fq, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    from impg_tpu.syng.pack import map_reads
    from impg_tpu.commands import infer as infer_mod

    pack, _, _ = map_reads(idx, [fq])
    L = idx.seq_index.get_len_from_id(idx.seq_index.get_id("ref"))
    windows, path, segments = infer_mod.run_infer(
        idx, pack, "ref", 0, L, window=3000, ploidy=2
    )
    assert windows and path
    # Both source haplotypes must appear somewhere in the stitched path
    # (chain members may be stored reverse-complemented, so which ref-frame
    # side each half lands on is orientation-dependent).
    all_sources = {g for combo in path for g in combo}
    assert {"s0", "s2"} <= all_sources, path
    # The mosaic detects a switch: not every window calls the same combo.
    assert len({tuple(sorted(c)) for c in path}) > 1, path
    seg_sources = {s.source for s in segments}
    assert {"s0", "s2"} <= seg_sources, segments


def test_cli_infer(panel, tmp_path):
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp / "cli_pan")  # built by test_cli_map_and_genotype? ensure
    r = run_cli("syng", "-f", fa, "-o", prefix + "2")
    assert r.returncode == 0, r.stderr
    pack_path = str(tmp_path / "p.packt")
    r = run_cli("map", "-a", prefix + "2.syngt", "-q", fastq, "-O", pack_path)
    assert r.returncode == 0, r.stderr
    L = len(seq_data["ref"])
    r = run_cli(
        "infer", "-a", prefix + "2.syngt", "-p", pack_path,
        "-r", f"ref:0-{L}", "-w", "4000",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#type")
    assert any(l.startswith("window") for l in lines)
    assert any(l.startswith("mosaic") for l in lines)
    # The diploid truth (ref + s1) should dominate the window calls.
    window_calls = [l.split("\t")[5] for l in lines if l.startswith("window")]
    hit = sum(1 for c in window_calls if "ref" in c and "s1" in c)
    assert hit >= len(window_calls) // 2, window_calls


def test_cli_proj_bundle_and_render(panel, tmp_path):
    import json

    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "pb")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    bundle = str(tmp_path / "sample.proj")
    r = run_cli(
        "map", "-a", prefix + ".syngt", "-q", fastq, "-o", "proj",
        "-O", bundle,
    )
    assert r.returncode == 0, r.stderr
    manifest = json.load(open(bundle + "/manifest.json"))
    assert manifest["format"] == "impg-tpu-projection-bundle"
    assert manifest["n_reads"] == 800
    from impg_tpu.syng.pack import Pack

    pack = Pack.load(bundle + "/sample.packt")
    assert pack.counts.sum() == manifest["n_matched_syncmers"]

    # Render bundle over the alignment index of the same panel.
    import random as _r
    from tests import datagen as _dg

    rng = _r.Random(123)
    text, seqs, alns, sd = _dg.mutate_chain_paf(
        rng, n_seqs=4, seq_len=12_000, return_sequences=True
    )
    paf = tmp_path / "panel.paf"
    paf.write_text(text)
    rb = str(tmp_path / "bundle")
    r = run_cli(
        "render", "-a", str(paf), "-r", "ref:1000-6000", "-d", "100",
        "--sequence-files", fa, "-O", rb, "-x",
    )
    assert r.returncode == 0, r.stderr
    m = json.load(open(rb + "/manifest.json"))
    assert m["format"] == "impg-tpu-render-bundle"
    assert (tmp_path / "bundle" / "render.fa").exists()
    assert (tmp_path / "bundle" / "render.gfa").exists()
    ns = (tmp_path / "bundle" / "namespace.tsv").read_text().splitlines()
    assert ns[0].startswith("path\tsource")
    assert len(ns) > 1


def test_read_syncmer_index(panel, tmp_path):
    from impg_tpu.syng.read_index import ReadSyncmerIndex
    from impg_tpu.ops import syncmer as sm

    tmp, fa, idx, seq_data, fastq = panel
    ridx = ReadSyncmerIndex.build([fastq])
    assert len(ridx.read_names) == 800
    assert ridx.ids.size > 0
    # Oracle: pick a read, its syncmers must map back to it.
    from impg_tpu.syng.pack import read_sequences

    name, seq = next(iter(read_sequences(fastq)))
    _pos, ids, _f = sm.extract_syncmers(seq)
    if ids.size:
        reads = ridx.reads_with(int(ids[0]))
        assert 0 in reads.tolist()
    # Linking reads: two syncmers from the same read co-occur.
    if ids.size >= 2:
        links = ridx.linking_reads(int(ids[0]), int(ids[1]))
        assert 0 in links.tolist()
    # Roundtrip + CLI.
    p = ridx.save(str(tmp_path / "reads"))
    r2 = ReadSyncmerIndex.load(p)
    assert np.array_equal(r2.ids, ridx.ids)
    r = run_cli("read-index", "-q", fastq, "-O", str(tmp_path / "cli_reads"))
    assert r.returncode == 0, r.stderr
    assert "800 reads" in r.stderr


def test_render_bundle_namespace_json(panel, tmp_path):
    """namespace.json carries SourceSequenceRecord-style entries with PanSN
    identities (reference: sequence_namespace.rs:21)."""
    import json
    import random as _r

    from tests import datagen as _dg

    tmp, fa, idx, seq_data, fastq = panel
    rng = _r.Random(123)
    text, seqs, alns, sd = _dg.mutate_chain_paf(
        rng, n_seqs=4, seq_len=12_000, return_sequences=True
    )
    paf = tmp_path / "panel.paf"
    paf.write_text(text)
    rb = str(tmp_path / "nsbundle")
    r = run_cli(
        "render", "-a", str(paf), "-r", "ref:1000-6000", "-d", "100",
        "--sequence-files", fa, "-O", rb, "-x",
    )
    assert r.returncode == 0, r.stderr
    ns = json.load(open(rb + "/namespace.json"))
    assert ns["sequences"] and ns["intervals"]
    by_name = {s["name"]: s for s in ns["sequences"]}
    assert "ref" in by_name
    assert by_name["ref"]["identity"]["pansn"] is None  # not PanSN-named
    assert by_name["ref"]["length"] > 0
    ids = {s["id"] for s in ns["sequences"]}
    for iv in ns["intervals"]:
        assert iv["source_sequence_id"] in ids
        assert iv["end"] >= iv["start"]
        assert iv["strand"] in "+-"
    m = json.load(open(rb + "/manifest.json"))
    assert m["files"]["namespace_json"] == "namespace.json"


def test_infer_read_link_rewards(panel, tmp_path):
    """Read-link rewards boost candidates actually supported by reads:
    with a decisive weight, the diploid truth (ref + s1) keeps winning and
    rewarded windows report finite rewards for truth candidates."""
    from impg_tpu.commands import infer as infer_mod
    from impg_tpu.syng.pack import map_reads
    from impg_tpu.syng.read_index import ReadSyncmerIndex

    tmp, fa, idx, seq_data, fastq = panel
    pack, _, _ = map_reads(idx, [fastq])
    ridx = ReadSyncmerIndex.build([fastq])
    L = len(seq_data["ref"])
    base_w, base_path, _ = infer_mod.run_infer(
        idx, pack, "ref", 0, L, window=4000, ploidy=2
    )
    rw_w, rw_path, _ = infer_mod.run_infer(
        idx, pack, "ref", 0, L, window=4000, ploidy=2,
        read_index=ridx, read_link_weight=0.5,
    )
    assert rw_w and rw_path
    # Rewards computed and positive for at least one candidate per window.
    assert all(w.rewards for w in rw_w)
    assert all(max(w.rewards.values()) > 0 for w in rw_w)
    # The truth call is stable under rewards (reads ARE from ref+s1).
    hit = sum(1 for combo in rw_path if set(combo) == {"ref", "s1"})
    assert hit >= len(rw_path) // 2, rw_path
    # CLI flags work end-to-end.
    prefix = str(tmp_path / "rl")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    pk = str(tmp_path / "rl.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq, "-O", pk)
    assert r.returncode == 0, r.stderr
    ri = str(tmp_path / "rl_reads")
    r = run_cli("read-index", "-q", fastq, "-O", ri)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "infer", "-a", prefix + ".syngt", "-p", pk, "-r", f"ref:0-{L}",
        "-w", "4000", "--read-index", ri + ".readidx",
        "--read-link-weight", "0.5",
    )
    assert r.returncode == 0, r.stderr
    assert any(l.startswith("window") for l in r.stdout.splitlines())


def test_infer_write_haplotypes(panel, tmp_path):
    """Diplotype FASTA output: each hap slot's mosaic spells sequence that
    is a real substring of its source genome."""
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "hp")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    pk = str(tmp_path / "hp.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq, "-O", pk)
    assert r.returncode == 0, r.stderr
    L = len(seq_data["ref"])
    out_prefix = str(tmp_path / "dip")
    r = run_cli(
        "infer", "-a", prefix + ".syngt", "-p", pk, "-r", f"ref:0-{L}",
        "-w", "4000", "--write-haplotypes", out_prefix,
        "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    assert "Wrote haplotype FASTAs" in r.stderr
    import os

    for slot in range(2):
        p = f"{out_prefix}_hap{slot}.fa"
        assert os.path.exists(p)
        recs = {}
        name = None
        src = None
        for line in open(p):
            if line.startswith(">"):
                name = line[1:].split()[0]
                src = line.split()[1].rsplit(":", 1)[0]
                recs[name] = [src, ""]
            else:
                recs[name][1] += line.strip()
        assert recs
        for src, seq in recs.values():
            assert seq and seq in seq_data[src]
    # Missing sequence files: clean error.
    r = run_cli(
        "infer", "-a", prefix + ".syngt", "-p", pk, "-r", f"ref:0-{L}",
        "-w", "4000", "--write-haplotypes", out_prefix,
    )
    assert r.returncode == 2


def test_cli_syng_map_gaf(panel, tmp_path):
    """map -o gaf on a syng index: syng-gaf-walk rows (main.rs:516)."""
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "pan")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    # Long reads so each carries a real walk.
    rng = random.Random(5)
    reads_fa = tmp_path / "long.fa"
    with open(reads_fa, "w") as fh:
        for i in range(20):
            s = rng.randint(0, len(seq_data["ref"]) - 800)
            fh.write(f">lr{i}\n{seq_data['ref'][s:s+800]}\n")
    gaf = tmp_path / "reads.gaf"
    r = run_cli(
        "map", "-a", prefix + ".syngt", "-q", str(reads_fa),
        "-o", "gaf", "-O", str(gaf),
    )
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in gaf.read_text().splitlines()]
    assert len(rows) >= 15
    for f in rows:
        assert f[4] == "+"
        assert f[5][0] in "><"  # signed node walk
        assert int(f[1]) == 800
        assert 0 <= int(f[2]) < int(f[3]) <= 800
        tags = {t.split(":")[0]: t for t in f[12:]}
        assert "an" in tags and "sk" in tags and "qp" in tags
        n_nodes = f[5].count(">") + f[5].count("<")
        assert int(tags["an"].split(":")[2]) == n_nodes
        # qp positions: one per walk node, increasing.
        qp = [int(x) for x in tags["qp"].split(",")[1:]]
        assert len(qp) == n_nodes
        assert qp == sorted(qp)


def test_cli_syng_map_paf(panel, tmp_path):
    """map -o paf on a syng index: chained anchor projections."""
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "pan2")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    rng = random.Random(6)
    s = rng.randint(0, len(seq_data["ref"]) - 2000)
    reads_fa = tmp_path / "frag.fa"
    reads_fa.write_text(f">frag\n{seq_data['ref'][s:s+2000]}\n")
    paf = tmp_path / "frag.paf"
    r = run_cli(
        "map", "-a", prefix + ".syngt", "-q", str(reads_fa),
        "-o", "paf", "-O", str(paf), "--min-anchors", "3",
    )
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in paf.read_text().splitlines()]
    assert rows, "expected at least one projection"
    # The top hit must be the source locus on ref.
    top = rows[0]
    assert top[0] == "frag" and top[5] == "ref"
    t0, t1 = int(top[7]), int(top[8])
    assert abs(t0 - s) < 200 and abs(t1 - (s + 2000)) < 200
    assert top[4] == "+"
    # Rows are valid PAF: query/target spans positive, anchors tagged.
    for f in rows:
        assert int(f[2]) < int(f[3]) and int(f[7]) < int(f[8])
        assert any(t.startswith("an:i:") for t in f[12:])


def test_map_rc_read_projects_reverse(panel, tmp_path):
    """An RC fragment maps to ref with '-' strand via chained anchors."""
    from impg_tpu.io.fasta import reverse_complement
    from impg_tpu.syng import map as syng_map

    tmp, fa, idx, seq_data, fastq = panel
    frag = reverse_complement(seq_data["ref"][3000:5000].encode())
    rows = syng_map.map_read(idx, "rcread", frag, min_anchors=3)
    assert rows
    top = rows[0].split("\t")
    assert top[5] == "ref" and top[4] == "-"
    assert abs(int(top[7]) - 3000) < 200 and abs(int(top[8]) - 5000) < 200


def test_infer_gaf_read_walk_rewards(panel, tmp_path):
    """--gaf read-walk evidence: GBWT MEMs reward the true sources
    (infer.rs:996 build_read_walk_evidence)."""
    from impg_tpu.commands import infer as infer_mod
    from impg_tpu.syng import map as syng_map
    from impg_tpu.syng.pack import map_reads

    tmp, fa, idx, seq_data, fastq = panel
    gaf = tmp_path / "reads.gaf"
    with open(gaf, "w") as fh:
        for row in syng_map.map_reads_gaf(idx, [fastq]):
            fh.write(row + "\n")
    assert gaf.read_text().strip()
    pack, _, _ = map_reads(idx, [fastq])
    windows, path, segments = infer_mod.run_infer(
        idx, pack, "ref", 0, 12_000, window=4000,
        read_link_weight=1.0, gaf_path=str(gaf),
        min_read_link_anchors=1,
    )
    assert windows
    rewarded = [w for w in windows if w.rewards]
    assert rewarded, "GAF evidence must produce rewards"
    # The sample is ref+s1; its sources must collect reward mass in some
    # window ahead of the unrelated haplotypes.
    total = {}
    for w in rewarded:
        for ci, r in w.rewards.items():
            total[w.candidates[ci].genome] = (
                total.get(w.candidates[ci].genome, 0.0) + r
            )
    assert total
    best = max(total, key=total.get)
    assert best in ("ref", "s1"), total


def test_cli_infer_gaf(panel, tmp_path):
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "ig")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    gaf = str(tmp_path / "r.gaf")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq,
                "-o", "gaf", "-O", gaf)
    assert r.returncode == 0, r.stderr
    packp = str(tmp_path / "s.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq,
                "-o", "pack", "-O", packp)
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "infer", "-a", prefix + ".syngt", "-p", packp,
        "-r", "ref:0-12000", "--gaf", gaf, "--read-link-weight", "0.5",
        "--min-read-link-anchors", "1",
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l.startswith("window")]
    assert lines


def test_proj_bundle_carries_gaf(panel, tmp_path):
    import json

    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "pg")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    bundle = str(tmp_path / "s.proj")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq, "-o", "proj",
                "-O", bundle)
    assert r.returncode == 0, r.stderr
    manifest = json.load(open(bundle + "/manifest.json"))
    assert manifest["read_space"] == "syng-gaf-walk"
    assert manifest["files"]["gaf"] == "sample.gaf"
    gaf_lines = open(bundle + "/sample.gaf").read().splitlines()
    assert len(gaf_lines) == manifest["n_gaf_records"] > 0


def test_render_bundle_translation_tables(panel, tmp_path):
    """Render bundles carry step-translation tables mapping graph steps
    back to source coordinates (render_bundle.rs:40)."""
    import json

    from impg_tpu.commands import render_translation as rt_mod

    tmp, fa, idx, seq_data, fastq = panel
    import random as _r

    from tests import datagen as _dg

    rng = _r.Random(123)
    text, seqs, alns, sd = _dg.mutate_chain_paf(
        rng, n_seqs=4, seq_len=12_000, return_sequences=True
    )
    paf = tmp_path / "t.paf"
    paf.write_text(text)
    rb = str(tmp_path / "tb")
    r = run_cli(
        "render", "-a", str(paf), "-r", "ref:2000-7000", "-d", "100",
        "--sequence-files", fa, "-O", rb, "-x",
    )
    assert r.returncode == 0, r.stderr
    m = json.load(open(rb + "/manifest.json"))
    assert m["files"]["translation"] == "translation.npz"
    assert m["step_samples"] > 0
    rendered, steps = rt_mod.load_translation(rb)
    assert len(rendered) == m["rendered_paths"]
    assert len(steps) == m["step_samples"]
    # Every step's source_bp must lie inside its path's source interval,
    # and per '+' path the offsets are non-decreasing.
    by_id = {rp.rendered_path_id: rp for rp in rendered}
    prev: dict[int, int] = {}
    covered = set()
    for pid, sidx, bp, fid, orient in steps:
        rp = by_id[pid]
        covered.add(pid)
        assert rp.start <= bp < max(rp.end, rp.start + 1), (bp, rp)
        if rp.strand == "+":
            assert bp >= prev.get(pid, -1)
            prev[pid] = bp
    # The ref path itself is rendered and covered end-to-end at step 0.
    ref_paths = [rp for rp in rendered if rp.source_name == "ref"]
    assert ref_paths and ref_paths[0].rendered_path_id in covered
    first_ref = [
        bp for pid, sidx, bp, _, _ in steps
        if pid == ref_paths[0].rendered_path_id and sidx == 0
    ]
    assert first_ref and first_ref[0] == ref_paths[0].start
    # TSV mirror exists with both row types.
    tsv = open(rb + "/translation.tsv").read().splitlines()
    assert any(l.startswith("path\t") for l in tsv)
    assert any(l.startswith("step\t") for l in tsv)


def test_stitch_link_rewards_steer_phasing():
    """Transition link rewards break emission ties toward linked
    candidates (infer.rs:1152 transition read-link rewards)."""
    from impg_tpu.commands.infer import WindowCall, stitch

    class Cand:
        def __init__(self, genome):
            self.genome = genome

    class Score:
        def __init__(self, combination, similarity):
            self.combination = combination
            self.similarity = similarity
            self.qv = 10.0

    cands = [Cand("A"), Cand("B")]
    # Two windows; both orders equally likely by emission.
    w0 = WindowCall("c", 0, 100, [Score((0, 1), 1.0)], cands)
    w1 = WindowCall("c", 100, 200, [Score((0, 1), 1.0), Score((1, 0), 1.0)], cands)
    # Without links: first option order wins (A,B)->(A,B).
    path, _ = stitch([w0, w1], switch_penalty=0.0)
    assert path[1] == ("A", "B")
    # Links rewarding (w0 cand0 -> w1 cand0) keep A on slot 0 regardless;
    # reward a cross pairing instead and the stitch must still align
    # slots to collect it.
    links = {((0, 0), (1, 0)): 5.0, ((0, 1), (1, 1)): 5.0}
    path, score = stitch([w0, w1], switch_penalty=0.0, link_rewards=links)
    assert path[1] == ("A", "B")
    assert score > 2.0  # collected the link rewards


def test_infer_gaf_returns_link_rewards(panel, tmp_path):
    from impg_tpu.commands import infer as infer_mod
    from impg_tpu.syng import map as syng_map
    from impg_tpu.syng.pack import map_reads

    tmp, fa, idx, seq_data, fastq = panel
    gaf = tmp_path / "lr.gaf"
    with open(gaf, "w") as fh:
        for row in syng_map.map_reads_gaf(idx, [fastq]):
            fh.write(row + "\n")
    pack, _, _ = map_reads(idx, [fastq])
    windows, path, segments = infer_mod.run_infer(
        idx, pack, "ref", 0, 12_000, window=3000,
        read_link_weight=1.0, gaf_path=str(gaf),
        min_read_link_anchors=1,
    )
    assert windows and path


def test_cli_infer_target_bed(panel, tmp_path):
    """-b BED runs one windowed inference per row into one report."""
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp_path / "tb")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    packp = str(tmp_path / "tb.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq,
                "-o", "pack", "-O", packp)
    assert r.returncode == 0, r.stderr
    bed = tmp_path / "parts.bed"
    bed.write_text("ref\t0\t6000\tp1\nref\t6000\t12000\tp2\n")
    r = run_cli(
        "infer", "-a", prefix + ".syngt", "-p", packp, "-b", str(bed),
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#type")
    assert sum(1 for l in lines if l.startswith("#type")) == 1
    win = [l.split("\t") for l in lines if l.startswith("window")]
    # Rows from both partitions.
    starts = {int(w[3]) for w in win}
    assert any(s < 6000 for s in starts) and any(s >= 6000 for s in starts)


def test_render_bundle_regional_syng(panel, tmp_path):
    """Render bundles carry a regional syng index (render_bundle.rs:24
    syng_prefix element), queryable through the GBWT-lite."""
    import json

    from impg_tpu.syng.gbwt import SyngGbwt
    from impg_tpu.syng.index import SyngIndex

    import random as _r

    from tests import datagen as _dg

    tmp, fa, idx, seq_data, fastq = panel
    rng = _r.Random(123)
    text, seqs, alns, sd = _dg.mutate_chain_paf(
        rng, n_seqs=4, seq_len=12_000, return_sequences=True
    )
    paf = tmp_path / "rs.paf"
    paf.write_text(text)
    rb = str(tmp_path / "rsb")
    r = run_cli(
        "render", "-a", str(paf), "-r", "ref:3000-8000", "-d", "100",
        "--sequence-files", fa, "-O", rb, "-x",
    )
    assert r.returncode == 0, r.stderr
    m = json.load(open(rb + "/manifest.json"))
    assert m["syng_prefix"] == "region"
    regional = SyngIndex.load(rb + "/region")
    names = list(regional.seq_index.names())
    assert any(n.startswith("ref:") for n in names)
    g = SyngGbwt(regional)
    frag = seq_data["ref"][4000:5500].encode()
    nodes, bpos, _ = g.best_orientation_walk(frag)
    mems = g.mems_for_walk(nodes, bpos)
    assert mems and max(me.anchors for me in mems) == nodes.size


def test_infer_gaf_evidence_cache_matches_path(panel, tmp_path):
    """GafEvidence (parse + GBWT MEM once, reuse across BED rows) must
    produce identical windows/rewards/path to the per-call gaf_path
    route."""
    from impg_tpu.commands import infer as infer_mod
    from impg_tpu.syng import map as syng_map
    from impg_tpu.syng.pack import map_reads

    tmp, fa, idx, seq_data, fastq = panel
    gaf = tmp_path / "reads.gaf"
    with open(gaf, "w") as fh:
        for row in syng_map.map_reads_gaf(idx, [fastq]):
            fh.write(row + "\n")
    pack, _, _ = map_reads(idx, [fastq])
    evidence = infer_mod.GafEvidence(idx, str(gaf))
    assert evidence.reads

    kwargs = dict(
        window=4000, read_link_weight=1.0, min_read_link_anchors=1,
    )
    for region in (("ref", 0, 12_000), ("ref", 2000, 10_000)):
        w_a, p_a, s_a = infer_mod.run_infer(
            idx, pack, *region, gaf_path=str(gaf), **kwargs
        )
        w_b, p_b, s_b = infer_mod.run_infer(
            idx, pack, *region, gaf_path=evidence, **kwargs
        )
        assert p_a == p_b
        assert [w.rewards for w in w_a] == [w.rewards for w in w_b]
        assert [(w.start, w.end) for w in w_a] == [
            (w.start, w.end) for w in w_b
        ]


def test_cli_genotype_cohort_packs(panel):
    """`-p a,b` cohort mode: one candidate panel, one report per sample,
    each sample's rows identical to its single-pack run (the panel is an
    extension — the reference scores one sample per run)."""
    tmp, fa, idx, seq_data, fastq = panel
    prefix = str(tmp / "cohort_pan")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    pa = str(tmp / "cohort_a.packt")
    pb = str(tmp / "cohort_b.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fastq, "-O", pa)
    assert r.returncode == 0, r.stderr
    # Second sample: reads from s2 only (different truth).
    rng = random.Random(7)
    fq2 = str(tmp / "reads2.fastq")
    with open(fq2, "w") as fh:
        for name, seq in simulate_reads(rng, seq_data["s2"], 400):
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", fq2, "-O", pb)
    assert r.returncode == 0, r.stderr
    L = len(seq_data["ref"])
    coh = run_cli(
        "genotype", "cos", "-a", prefix + ".syngt", "-p", f"{pa},{pb}",
        "-r", f"ref:0-{L}",
    )
    assert coh.returncode == 0, coh.stderr
    lines = coh.stdout.splitlines()
    assert lines[0].startswith("#sample")
    samples = {ln.split("\t")[0] for ln in lines[1:] if ln}
    assert samples == {"cohort_a", "cohort_b"}
    # Parity with single-pack runs, per sample.
    for path, name in ((pa, "cohort_a"), (pb, "cohort_b")):
        single = run_cli(
            "genotype", "cos", "-a", prefix + ".syngt", "-p", path,
            "-r", f"ref:0-{L}", "--sample-name", name,
        )
        assert single.returncode == 0, single.stderr
        want = [ln for ln in single.stdout.splitlines()[1:] if ln]
        got = [
            ln for ln in lines[1:] if ln.split("\t")[0] == name
        ]
        assert got == want
