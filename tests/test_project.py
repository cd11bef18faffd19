"""`impg project`: GAF -> GFA-segment pack projection
(reference: projection/converter.rs:532 project_gaf_to_gfa)."""

import json
import os

import pytest

from impg_tpu.commands.project import (
    feature_ids_for,
    graph_id_for,
    load_projection_bundle,
    parse_gaf_walk,
    project_gaf,
    resolve_feature_id_mode,
    run_project,
)
from impg_tpu.graph.gfa import Gfa
from tests.test_cli import run_cli

GFA = (
    "H\tVN:Z:1.0\n"
    "S\t1\tACGTACGT\n"
    "S\t2\tTTTT\n"
    "S\t3\tGGGGGGGG\n"
    "L\t1\t+\t2\t+\t0M\n"
    "L\t2\t+\t3\t+\t0M\n"
    "P\tref\t1+,2+,3+\t*\n"
)

# read over segs 1..3, walk-relative interval clipping seg 1 and seg 3
GAF_ROWS = [
    # touches all three segments (interval 2..18 of the 20bp walk)
    "r1\t16\t0\t16\t+\t>1>2>3\t20\t2\t18\t16\t16\t60",
    # second visit pattern: repeated segment in one walk
    "r2\t12\t0\t12\t+\t>2>2>2\t12\t0\t12\t12\t12\t60",
    # comma-token walk syntax, only overlaps segment 1
    "r3\t4\t0\t4\t+\t1+,2+\t12\t0\t4\t4\t4\t60",
]


def write_inputs(tmp_path):
    gfa = tmp_path / "g.gfa"
    gfa.write_text(GFA)
    gaf = tmp_path / "r.gaf"
    gaf.write_text("\n".join(GAF_ROWS) + "\n")
    return str(gfa), str(gaf)


def test_parse_gaf_walk_syntaxes():
    assert parse_gaf_walk(">a<b>c", 1) == [("a", "+"), ("b", "-"), ("c", "+")]
    assert parse_gaf_walk("a+,b-", 1) == [("a", "+"), ("b", "-")]
    assert parse_gaf_walk("x-", 1) == [("x", "-")]
    with pytest.raises(ValueError, match="does not contain a graph walk"):
        parse_gaf_walk("*", 2)
    with pytest.raises(ValueError, match="empty graph-walk step"):
        parse_gaf_walk(">a><b", 3)
    with pytest.raises(ValueError, match="not an oriented graph walk"):
        parse_gaf_walk("chr1", 4)


def test_feature_id_modes():
    assert resolve_feature_id_mode(["1", "2", "3"], "auto") == "segment-name"
    assert resolve_feature_id_mode(["s1", "s2"], "auto") == "dense"
    assert resolve_feature_id_mode(["1", "1"], "auto") == "dense"  # dup
    assert resolve_feature_id_mode(["0", "1"], "auto") == "dense"  # 0 invalid
    assert resolve_feature_id_mode(["01", "2"], "auto") == "dense"  # non-canon
    assert resolve_feature_id_mode(["1", "2"], "dense") == "dense"
    with pytest.raises(ValueError, match="unique positive u32"):
        resolve_feature_id_mode(["s1"], "segment-name")
    g = Gfa.parse(GFA)
    assert feature_ids_for(g, "segment-name") == {"1": 1, "2": 2, "3": 3}
    assert feature_ids_for(g, "dense") == {"1": 1, "2": 2, "3": 3}


def test_graph_id_stable_and_sensitive():
    g = Gfa.parse(GFA)
    fids = feature_ids_for(g, "segment-name")
    gid = graph_id_for(g, "segment-name", fids)
    assert len(gid) == 16 and gid == graph_id_for(g, "segment-name", fids)
    g2 = Gfa.parse(GFA.replace("TTTT", "TTTA"))
    assert graph_id_for(g2, "segment-name", fids) != gid


def test_project_gaf_counts_and_contributions(tmp_path):
    g = Gfa.parse(GFA)
    fids = feature_ids_for(g, "segment-name")
    lens = {n: len(s) for n, s in g.segments.items()}
    gaf = tmp_path / "r.gaf"
    gaf.write_text("\n".join(GAF_ROWS) + "\n")
    res = project_gaf(str(gaf), lens, fids)
    assert res.total_records == 3
    assert res.retained_records == 3
    # r1 counts 1,2,3 once each; r2 counts seg 2 three times; r3 seg 1 once.
    assert res.counts == {1: 2, 2: 4, 3: 1}
    assert res.contributed_steps == 7
    # Repeated visits are explained per-visit.
    r2_rows = [c for c in res.contributions if c[0] == "r2"]
    assert [c[6] for c in r2_rows] == [1, 2, 3]
    assert "repeated visit 3" in r2_rows[2][8]


def test_project_gaf_errors(tmp_path):
    g = Gfa.parse(GFA)
    fids = feature_ids_for(g, "segment-name")
    lens = {n: len(s) for n, s in g.segments.items()}

    def check(row, match):
        gaf = tmp_path / "bad.gaf"
        gaf.write_text(row + "\n")
        with pytest.raises(ValueError, match=match):
            project_gaf(str(gaf), lens, fids)

    check("r\t4\t0\t4\t+\t>1", "expected at least 12")
    check("r\t4\t0\t4\t+\t>1\t8\t5\t5\t4\t4\t60", "empty path interval")
    check("r\t4\t0\t4\t+\t>9\t8\t0\t4\t4\t4\t60", "unknown GFA segment")
    check(
        "r\t4\t0\t4\t+\t>1\t8\t0\t99\t4\t4\t60",
        "path_end 99 exceeds graph-walk length 8",
    )


def test_run_project_pack_tsv(tmp_path):
    gfa, gaf = write_inputs(tmp_path)
    out = tmp_path / "pack.tsv"
    contrib = tmp_path / "contrib.tsv"
    summary = run_project(
        gfa, gaf, str(out), output_format="pack-tsv",
        read_contributions=str(contrib),
    )
    assert summary["nonzero_features"] == 3
    lines = out.read_text().splitlines()
    assert lines[0] == "#feature_space\tgfa-segment"
    assert lines[1].startswith("#graph_id\t")
    assert "#feature_id_mode\tsegment-name" in lines
    assert "#graph_contribution_model\traw" in lines
    assert "#projection_method\tgaf-to-gfa" in lines
    assert lines[-3:] == ["1\t2", "2\t4", "3\t1"]
    ctext = contrib.read_text().splitlines()
    assert ctext[0].startswith("read_name\tread_ordinal")
    assert len(ctext) == 1 + 7


def test_run_project_bundle_roundtrip(tmp_path):
    gfa, gaf = write_inputs(tmp_path)
    out = tmp_path / "sample.proj"
    summary = run_project(gfa, gaf, str(out), output_format="proj")
    assert os.path.isdir(out)
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["feature_space"] == "gfa-segment"
    assert manifest["read_space"] == "gaf-graph-walk"
    assert (out / "alignments.gaf").read_text().count("\n") == 3
    bundle = load_projection_bundle(str(out))
    assert os.path.exists(bundle["pack_path"])
    assert os.path.exists(bundle["gaf_path"])
    assert os.path.exists(bundle["read_contributions_path"])
    assert bundle["graph_id"] == summary["graph_id"]
    # --read-contributions is bundle-incompatible (reference contract).
    with pytest.raises(ValueError, match="only used with -o pack-tsv"):
        run_project(
            gfa, gaf, str(out), output_format="proj",
            read_contributions="x.tsv",
        )


def test_cli_project(tmp_path):
    gfa, gaf = write_inputs(tmp_path)
    out = tmp_path / "b.proj"
    r = run_cli("project", "--gfa", gfa, "--gaf", gaf, "-O", str(out))
    assert r.returncode == 0, r.stderr
    assert "Projected 3/3 GAF record(s), 7 step(s)" in r.stderr
    assert (out / "sample.pack.tsv").exists()
    # pack-tsv format + dense mode on non-numeric names
    gfa2 = tmp_path / "g2.gfa"
    gfa2.write_text(GFA.replace("\t1\t", "\ts1\t").replace("1+", "s1+")
                    .replace(">1", ">s1"))
    gaf2 = tmp_path / "r2.gaf"
    gaf2.write_text("r3\t4\t0\t4\t+\ts1+,2+\t12\t0\t4\t4\t4\t60\n")
    pt = tmp_path / "p.tsv"
    r = run_cli("project", "--gfa", str(gfa2), "--gaf", str(gaf2),
                "-o", "pack-tsv", "-O", str(pt))
    assert r.returncode == 0, r.stderr
    assert "#feature_id_mode\tdense" in pt.read_text()
    # Unknown segment -> clean error, exit 2.
    bad = tmp_path / "bad.gaf"
    bad.write_text("r\t4\t0\t4\t+\t>zz\t8\t0\t4\t4\t4\t60\n")
    r = run_cli("project", "--gfa", gfa, "--gaf", str(bad), "-O",
                str(tmp_path / "x.proj"))
    assert r.returncode == 2
    assert "unknown GFA segment" in r.stderr


def test_project_own_map_gaf_output(tmp_path):
    """End-to-end: map reads onto a region graph -> GAF -> project -> pack
    counts cover the graph's segments."""
    import random

    from tests import datagen

    rng = random.Random(7)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=2, seq_len=3000, return_sequences=True
    )
    fa = tmp_path / "p.fa"
    paf = tmp_path / "p.paf"
    datagen.write_fasta(str(fa), seq_data)
    paf.write_text(text)
    from impg_tpu.graph import region as region_mod
    from impg_tpu.index.impg_index import load_or_build
    from impg_tpu.io.fasta import UnifiedSequenceIndex
    from impg_tpu.query import engine as engine_mod

    index = load_or_build([str(paf)])
    useq = UnifiedSequenceIndex.from_files([str(fa)])
    qid = index.seq_index.get_id("ref")
    rows = engine_mod.query(index, qid, 0, 3000)
    gfa_path = tmp_path / "g.gfa"
    gfa_path.write_text(region_mod.generate_gfa(index, rows, useq))
    src = seq_data["s0"]
    fq = tmp_path / "reads.fastq"
    with fq.open("w") as fh:
        for i in range(60):
            s = rng.randint(0, len(src) - 150)
            fh.write(f"@r{i}\n{src[s : s + 150]}\n+\n{'I' * 150}\n")
    r = run_cli("map", "--graph", str(gfa_path), "-q", str(fq), "-o", "gaf")
    assert r.returncode == 0, r.stderr
    gaf = tmp_path / "m.gaf"
    gaf.write_text(r.stdout)
    out = tmp_path / "m.proj"
    r = run_cli("project", "--gfa", str(gfa_path), "--gaf", str(gaf),
                "-O", str(out))
    assert r.returncode == 0, r.stderr
    pack = (out / "sample.pack.tsv").read_text().splitlines()
    data_rows = [ln for ln in pack if not ln.startswith("#")]
    assert len(data_rows) >= 1
    assert all(int(ln.split("\t")[1]) > 0 for ln in data_rows)
