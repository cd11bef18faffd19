"""Refine command semantics (reference: commands/refine.rs)."""

import random

from impg_tpu.commands import refine
from tests import datagen, pyref
from tests.test_cli import run_cli
from tests.test_query import index_from_text


def test_build_flanks():
    assert refine.build_flanks(0, 1000) == [0]
    assert refine.build_flanks(2500, 1000) == [0, 1000, 2000, 2500]
    assert refine.build_flanks(1000, 1000) == [0, 1000]
    assert refine.build_flanks(999, 1000) == [0, 999]


def test_extract_pansn_key():
    assert refine.extract_pansn_key("HG002#1#chr1", "sample") == "HG002"
    assert refine.extract_pansn_key("HG002#1#chr1", "haplotype") == "HG002#1"
    assert refine.extract_pansn_key("HG002#1#chr1", "sequence") == "HG002#1#chr1"
    assert refine.extract_pansn_key("plain", "sample") == "plain"


def make_support_paf():
    """Three queries against ref:0-10000; a spans all, b spans only the middle,
    c spans all but via two merged pieces."""
    lines = [
        datagen.make_paf_line("A#1#x", 12000, 0, 10000, "+", "ref", 10000, 0,
                              10000, pyref.parse_cigar("10000=")),
        datagen.make_paf_line("B#1#x", 6000, 0, 4000, "+", "ref", 10000, 3000,
                              7000, pyref.parse_cigar("4000=")),
        datagen.make_paf_line("C#1#x", 12000, 0, 5000, "+", "ref", 10000, 0,
                              5000, pyref.parse_cigar("5000=")),
        datagen.make_paf_line("C#1#x", 12000, 5100, 10100, "+", "ref", 10000,
                              5000, 10000, pyref.parse_cigar("5000=")),
    ]
    return "\n".join(lines) + "\n"


def test_support_counting():
    index = index_from_text(make_support_paf())
    from impg_tpu.query import engine

    rid = index.seq_index.get_id("ref")
    config = refine.RefineConfig(
        span_bp=500, max_extension=0.0, extension_step=1000, merge_distance=200
    )
    rec = refine.refine_single_range(index, "ref", 2000, 8000, "L", config)
    # A spans 2000-8000 fully; B (3000-7000) does not; C's two pieces merge
    # (query gap 100 <= 200) into 0-10000 and span.
    assert rec.support_count == 2
    names = {e.sequence for e in rec.support_entities}
    assert names == {"A#1#x", "C#1#x"}

    # Without merging, C's pieces each fail to span alone.
    config2 = refine.RefineConfig(
        span_bp=500, max_extension=0.0, extension_step=1000, merge_distance=-1
    )
    rec2 = refine.refine_single_range(index, "ref", 2000, 8000, "L", config2)
    assert rec2.support_count == 1


def test_refine_expands_to_gain_support():
    # B only spans a narrow middle region; refining a region that's slightly
    # too wide for B should not shrink (refine only extends), but a region
    # around the middle keeps support; extending must never lose support.
    index = index_from_text(make_support_paf())
    config = refine.RefineConfig(
        span_bp=100, max_extension=2000.0, extension_step=500, merge_distance=0
    )
    rec = refine.refine_single_range(index, "ref", 4000, 5000, "L", config)
    # Baseline support at 4000-5000: A, B, C(first piece covers 0-5000 t-range
    # => t_end 5000 >= 5000 ok, spans). Extensions shouldn't reduce support.
    assert rec.support_count >= rec.original_support_count
    # Candidate ordering prefers minimal extension on ties.
    base = refine.refine_single_range(
        index, "ref", 4000, 5000, "L",
        refine.RefineConfig(span_bp=100, max_extension=0.0, merge_distance=0),
    )
    if rec.support_count == base.support_count:
        assert (rec.applied_left_extension, rec.applied_right_extension) == (0, 0)


def test_pansn_aggregation_counts_samples_once():
    lines = [
        datagen.make_paf_line("S#1#a", 12000, 0, 10000, "+", "ref", 10000, 0,
                              10000, pyref.parse_cigar("10000=")),
        datagen.make_paf_line("S#2#b", 12000, 0, 10000, "+", "ref", 10000, 0,
                              10000, pyref.parse_cigar("10000=")),
    ]
    index = index_from_text("\n".join(lines) + "\n")
    cfg_seq = refine.RefineConfig(span_bp=100, max_extension=0.0, merge_distance=0)
    rec = refine.refine_single_range(index, "ref", 1000, 9000, "L", cfg_seq)
    assert rec.support_count == 2  # two sequences
    cfg_sample = refine.RefineConfig(
        span_bp=100, max_extension=0.0, merge_distance=0, support_level="sample"
    )
    rec = refine.refine_single_range(index, "ref", 1000, 9000, "L", cfg_sample)
    assert rec.support_count == 1  # one sample 'S'
    cfg_hap = refine.RefineConfig(
        span_bp=100, max_extension=0.0, merge_distance=0, support_level="haplotype"
    )
    rec = refine.refine_single_range(index, "ref", 1000, 9000, "L", cfg_hap)
    assert rec.support_count == 2  # S#1 and S#2


def test_blacklist_excludes_entity():
    index = index_from_text(make_support_paf())
    config = refine.RefineConfig(
        span_bp=500, max_extension=0.0, merge_distance=200,
        blacklist={"A#1#x": [(0, 100000)]},
    )
    rec = refine.refine_single_range(index, "ref", 2000, 8000, "L", config)
    names = {e.sequence for e in rec.support_entities}
    assert "A#1#x" not in names


def test_cli_refine(tmp_path):
    paf = tmp_path / "s.paf"
    paf.write_text(make_support_paf())
    r = run_cli(
        "refine", "-a", str(paf), "-r", "ref:2000-8000", "-d", "200",
        "--max-extension", "0",
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("#chrom")
    fields = lines[1].split("\t")
    assert fields[0] == "ref"
    assert fields[3] == "ref:2000-8000"
    assert int(fields[5]) == 2  # support
    # support output file
    sup = tmp_path / "support.bed"
    r = run_cli(
        "refine", "-a", str(paf), "-r", "ref:2000-8000", "-d", "200",
        "--max-extension", "0", "--support-output", str(sup),
    )
    assert r.returncode == 0, r.stderr
    names = {l.split("\t")[0] for l in sup.read_text().splitlines()}
    assert names == {"A#1#x", "C#1#x"}
