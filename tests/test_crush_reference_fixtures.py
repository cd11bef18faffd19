"""Crush validation on the REFERENCE'S OWN fixtures (read-only mount):

  * tests/test_data/local_compression/* — the reference's local-compression
    testbed (scripts/local_compression_testbed.py): per-fixture input
    sequences, expected path spellings, and `allowed_ranges` topology
    envelopes from each metadata.json.  We build the worst-case totally
    unshared graph (one segment per path) and require crush to compress it
    into the reference's allowed envelope with exact spellings.
  * tests/test_data/crush/nested_bubbles_real.gfa — real C4A pangenome
    extract (5 haplotypes, 40 segments; see the reference's
    test_crush_integration.rs:1343 commentary): crush must shrink it while
    preserving spellings and not increase the flubble-site count.
  * tests/test_data/crush/c4_fragments/*.{fa,paf} — real C4 traversal
    fragments protecting the PAF->seqwish induction path against the
    "unfolded" failure class (one path-specific segment per traversal).
"""

from __future__ import annotations

import json
import os

import pytest

from impg_tpu.graph.crush import crush_gfa
from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import reverse_complement

REF_DATA = "/root/reference/tests/test_data"
LC_DIR = os.path.join(REF_DATA, "local_compression")
CRUSH_DIR = os.path.join(REF_DATA, "crush")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted"
)


def _read_fasta(path: str) -> dict[str, str]:
    seqs: dict[str, str] = {}
    name = None
    parts: list[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(parts)
                name = line[1:].split()[0]
                parts = []
            elif line:
                parts.append(line)
    if name is not None:
        seqs[name] = "".join(parts)
    return seqs


def _unshared_gfa(seqs: dict[str, str]) -> str:
    """Worst-case input: one private segment per path (the reference's
    'unfolded' failure signature that crush must compress away)."""
    lines = ["H\tVN:Z:1.0"]
    for i, (name, s) in enumerate(seqs.items(), 1):
        lines.append(f"S\t{i}\t{s}")
    for i, name in enumerate(seqs, 1):
        lines.append(f"P\t{name}\t{i}+\t*")
    return "\n".join(lines) + "\n"


def _spell(gfa_text: str) -> dict[str, str]:
    g = Gfa.parse(gfa_text)
    out = {}
    for name, steps in g.paths:
        b = b"".join(
            reverse_complement(g.segments[sid].encode())
            if rev else g.segments[sid].encode()
            for sid, rev in steps
        )
        out[name] = b.decode()
    return out


def _ci_fixtures():
    man_path = os.path.join(LC_DIR, "manifest.json")
    if not os.path.exists(man_path):
        return []
    man = json.load(open(man_path))
    return [f["fixture_id"] for f in man["fixtures"] if f["tier"] == "ci"]


@pytest.mark.parametrize("fixture_id", _ci_fixtures())
def test_local_compression_fixture(fixture_id):
    fdir = os.path.join(LC_DIR, fixture_id)
    meta = json.load(open(os.path.join(fdir, "metadata.json")))
    expected: dict[str, str] = {}
    with open(os.path.join(fdir, "expected_paths.tsv")) as fh:
        next(fh)
        for line in fh:
            name, spelling = line.rstrip("\n").split("\t")
            expected[name] = spelling

    seqs = _read_fasta(os.path.join(fdir, "input.fa"))
    assert seqs == expected, "fixture input.fa and expected_paths disagree"

    out, st = crush_gfa(_unshared_gfa(seqs))

    # 1. Exact path spellings (the reference's hard contract).
    assert _spell(out) == expected

    # 2. Topology envelope from the reference's own metadata.
    g = Gfa.parse(out)
    ranges = meta.get("allowed_ranges", {})
    seg_rng = ranges.get("segment_count")
    if seg_rng is not None:
        assert seg_rng["min"] <= len(g.segments) <= seg_rng["max"], (
            f"{fixture_id}: {len(g.segments)} segments outside "
            f"[{seg_rng['min']}, {seg_rng['max']}]"
        )
    self_rng = ranges.get("self_loop_count")
    if self_rng is not None:
        self_loops = sum(1 for a, _ar, b, _br in g.links if a == b)
        assert self_loops <= self_rng["max"], fixture_id

    # 3. Crush actually compressed the unshared input (every fixture has
    # shared flanks by construction) unless the class is adversarial
    # (inversion alleles have no forward homology: do-no-harm keeps them).
    if meta["fixture_class"] not in ("inversion_like",):
        assert st.bp_after < st.bp_before, fixture_id


def test_nested_bubbles_real():
    path = os.path.join(CRUSH_DIR, "nested_bubbles_real.gfa")
    text = open(path).read()
    before = _spell(text)
    out, st = crush_gfa(text)
    assert _spell(out) == before  # exact spelling preservation
    # Real compression happened (the fixture is a fragmented extract of
    # diverged C4 alleles): sequence bp must shrink substantially, and the
    # combined bp+node cost must not grow (node count MAY rise — the POA
    # exposes real allele structure; unchop/gfaffix is a downstream stage
    # in the reference's own transform chain, lib.rs:855).
    assert st.bubbles_resolved >= 1 and st.rounds >= 1
    assert st.bp_after < st.bp_before
    from impg_tpu.graph.crush import _NODE_COST

    assert (st.bp_after + _NODE_COST * st.nodes_after
            < st.bp_before + _NODE_COST * st.nodes_before)

    # Flubble-site count must not grow (the reference's round-fragmentation
    # failure signature re-introduces sites each round).
    from impg_tpu.graph.bubbles import decompose_flubbles

    # The reference's strict "<=2 sites after" assertion is documented
    # UNSATISFIABLE under POA + path preservation (its own test is
    # #[ignore]d, test_crush_integration.rs:1427). The honest structural
    # contract: the big tangled parent site decomposes into SMALL, FLAT
    # sites — max reference span shrinks and the site tree flattens to
    # leaves (fixture: one 16-step L0 parent -> dozens of <=4-step leaf
    # SNP bubbles in the 41%-compressed MSA subgraph).
    ref = ["CHM13#0#chr6:31744284-31976975"]
    before_sites = decompose_flubbles(text, ref).sites
    after_sites = decompose_flubbles(out, ref).sites
    assert after_sites, "resolved graph should still expose variant sites"
    max_span_before = max(s.reference_span_steps for s in before_sites)
    max_span_after = max(s.reference_span_steps for s in after_sites)
    assert max_span_after < max_span_before
    leaf_frac = sum(s.is_leaf for s in after_sites) / len(after_sites)
    assert leaf_frac >= 0.9


def _paf_rows(paf_path: str, seqs: dict[str, str]) -> list[dict]:
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.io import paf as paf_mod

    si = SequenceIndex()
    recs = paf_mod.parse_paf_bytes(open(paf_path, "rb").read(), si)
    rows = []
    for i in range(len(recs.q_start)):
        off, end = int(recs.run_offsets[i]), int(recs.run_offsets[i + 1])
        rows.append(dict(
            qname=si.get_name(int(recs.query_id[i])),
            qstart=int(recs.q_start[i]),
            qend=int(recs.q_end[i]),
            strand="-" if int(recs.strand[i]) else "+",
            tname=si.get_name(int(recs.target_id[i])),
            tstart=int(recs.t_start[i]),
            tend=int(recs.t_end[i]),
            runs=recs.runs[off:end],
        ))
    return rows


C4_FRAGMENTS = [
    "easy_shared_flank",
    "bounded_multi_bubble",
    "short_floor",
    "duplicated_repeat",
]


@pytest.mark.parametrize("name", C4_FRAGMENTS)
def test_c4_fragment_induction(name):
    """Real C4 traversal fragments: PAF->seqwish induction must share
    homologous sequence (not unfold into per-path singletons), preserve
    spellings exactly, and survive a crush pass."""
    from impg_tpu.graph import seqwish as seqwish_mod

    fa = os.path.join(CRUSH_DIR, "c4_fragments", f"{name}.fa")
    paf = os.path.join(CRUSH_DIR, "c4_fragments", f"{name}.paf")
    seqs = {k: v for k, v in _read_fasta(fa).items()}
    rows = _paf_rows(paf, seqs)
    assert rows, f"{name}: fixture PAF parsed empty"
    sdict = {k: v.encode() for k, v in seqs.items()}
    gfa_text = seqwish_mod.induce_graph(sdict, rows)

    got = _spell(gfa_text)
    # induce_graph names paths `name:0-len`.
    want = {f"{k}:0-{len(v)}": v for k, v in seqs.items()}
    assert got == want

    g = Gfa.parse(gfa_text)
    seg_bp = sum(len(s) for s in g.segments.values())
    path_bp = sum(len(v) for v in seqs.values())
    assert seg_bp < path_bp, (
        f"{name}: no sharing after induction (unfolded graph: "
        f"{seg_bp} segment bp vs {path_bp} path bp)"
    )

    out, st = crush_gfa(gfa_text)
    assert _spell(out) == got
    # Do-no-harm is a COMBINED bp + per-node cost (crush may trade a few
    # bp for fewer segments); require the combined cost not to grow.
    from impg_tpu.graph.crush import _NODE_COST

    assert (st.bp_after + _NODE_COST * st.nodes_after
            <= st.bp_before + _NODE_COST * st.nodes_before)


def test_top_flubble_seqwish_minrun():
    """The reference's previous top-flubble failure class: consistent C4
    PAF where the min-match floor once erased every exact run and the
    graph unfolded (crush/README.md). Sharing must survive induction."""
    from impg_tpu.graph import seqwish as seqwish_mod

    fa = os.path.join(CRUSH_DIR, "top_flubble_seqwish_minrun.fa")
    paf = os.path.join(CRUSH_DIR, "top_flubble_seqwish_minrun.paf")
    seqs = _read_fasta(fa)
    rows = _paf_rows(paf, seqs)
    sdict = {k: v.encode() for k, v in seqs.items()}
    gfa_text = seqwish_mod.induce_graph(sdict, rows)
    got = _spell(gfa_text)
    want = {f"{k}:0-{len(v)}": v for k, v in seqs.items()}
    assert got == want
    g = Gfa.parse(gfa_text)
    seg_bp = sum(len(s) for s in g.segments.values())
    assert seg_bp < sum(len(v) for v in seqs.values())
