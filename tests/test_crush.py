"""Crush (anchor-bounded bubble resolution; reference: resolution.rs
resolve_gfa_bubbles): path spellings must be preserved EXACTLY, redundant
identical-sequence bubbles must collapse, and paths the anchor walk can't
slice (inversions) must make the pass a no-op rather than degrade sharing."""

import random

import pytest

from impg_tpu.graph.crush import crush_gfa
from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import reverse_complement
from tests.test_cli import run_cli


def _spell(gfa_text: str) -> dict:
    g = Gfa.parse(gfa_text)
    out = {}
    for name, steps in g.paths:
        seq = b""
        for sid, rev in steps:
            s = g.segments[sid].encode()
            seq += reverse_complement(s) if rev else s
        out[name] = seq
    return out


def _bubble_gfa(extra_paths=()):
    seg = {
        "a1": "ACGTACGTAC",
        "m1": "TTTTGGGGCCCCAAAA",
        "m2": "TTTTGGGGCCCCAAAA",  # identical to m1: pure redundancy
        "a2": "GGGGCCCCGG",
    }
    lines = ["H\tVN:Z:1.0"]
    for sid, s in seg.items():
        lines.append(f"S\t{sid}\t{s}")
    lines += [
        "L\ta1\t+\tm1\t+\t0M", "L\tm1\t+\ta2\t+\t0M",
        "L\ta1\t+\tm2\t+\t0M", "L\tm2\t+\ta2\t+\t0M",
        "P\tp1\ta1+,m1+,a2+\t*", "P\tp2\ta1+,m2+,a2+\t*",
    ]
    lines += list(extra_paths)
    return "\n".join(lines) + "\n"


def test_crush_collapses_redundant_bubble():
    gfa = _bubble_gfa()
    out, st = crush_gfa(gfa)
    assert st.rounds == 1
    assert st.bubbles_seen >= 1 and st.bubbles_resolved >= 1
    assert st.bp_after < st.bp_before
    assert _spell(out) == _spell(gfa)


def test_crush_inversion_path_degrades_locally():
    """An RC walk no longer bails the whole crush (round-2 contract): it
    floats outside the anchor frame, pins the nodes it uses (m1 stays
    unreclaimable), and the cost gate keeps the bubble unresolved —
    a local no-op, with spellings intact."""
    gfa = _bubble_gfa(["P\tp3\ta2-,m1-,a1-\t*"])
    out, st = crush_gfa(gfa)
    assert st.rounds == 0
    assert st.excluded_paths == 0  # floater, not a global bail
    assert _spell(out) == _spell(gfa)
    assert st.bp_after == st.bp_before


def test_crush_resolves_despite_excluded_path():
    """A path with partial/duplicated anchor usage is excluded LOCALLY:
    regions it does not touch still resolve (kill-the-global-bail,
    resolution.rs:997 per-bubble contract)."""
    seg_extra = {"x1": "TTAACC"}
    extra = [
        f"S\tx1\t{seg_extra['x1']}",
        "L\ta1\t+\tx1\t+\t0M", "L\tx1\t+\ta1\t+\t0M",
        # a1 appears twice -> not once-per-path -> excluded from slicing
        "P\tp3\ta1+,x1+,a1+\t*",
    ]
    gfa = _bubble_gfa(extra)
    out, st = crush_gfa(gfa)
    assert st.excluded_paths == 1
    assert st.rounds >= 1 and st.bubbles_resolved >= 1
    assert st.bp_after < st.bp_before  # m1/m2 redundancy collapsed
    assert _spell(out) == _spell(gfa)


def test_crush_preserves_spellings_on_real_graph(tmp_path):
    """A POA-engine region graph from mutated chain data: crush must keep
    every path spelling bit-exact through its rounds."""
    from impg_tpu.graph import region as region_mod
    from impg_tpu.index.impg_index import load_or_build
    from impg_tpu.io.fasta import UnifiedSequenceIndex
    from impg_tpu.query import engine as engine_mod
    from tests import datagen

    rng = random.Random(7)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=3000, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    paf = str(tmp_path / "p.paf")
    datagen.write_fasta(fa, seq_data)
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    useq = UnifiedSequenceIndex.from_files([fa])
    qid = index.seq_index.get_id("ref")
    rows = engine_mod.query(index, qid, 0, 3000)
    gfa = region_mod.generate_gfa(index, rows, useq)
    out, st = crush_gfa(gfa, max_rounds=2)
    assert _spell(out) == _spell(gfa)
    # Splice-based resolution: rounds only count when a bubble genuinely
    # shrank, and the graph can never grow (per-region do-no-harm).
    assert st.bp_after <= st.bp_before
    assert st.nodes_after <= st.nodes_before


def test_cli_crush(tmp_path):
    gfa_path = tmp_path / "bubble.gfa"
    gfa_path.write_text(_bubble_gfa())
    out_path = tmp_path / "crushed.gfa"
    r = run_cli("crush", str(gfa_path), "--output", str(out_path))
    assert r.returncode == 0, r.stderr
    assert "bubbles resolved" in r.stderr
    crushed = out_path.read_text()
    assert _spell(crushed) == _spell(gfa_path.read_text())


def test_seqwish_native_emit_parity():
    """Native chain compaction + emission (seqwish_emit.cpp) produces
    byte-identical GFA to the Python tail."""
    import random

    from impg_tpu.graph import seqwish
    from impg_tpu.io import native as native_mod
    from tests import datagen

    if native_mod.load() is None:
        return
    rng = random.Random(31)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=3000, return_sequences=True
    )
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.io.paf import parse_paf_bytes

    si = SequenceIndex()
    recs = parse_paf_bytes(text.encode(), si)
    rows = []
    for i in range(len(recs.query_id)):
        rows.append(
            dict(
                qname=si.get_name(int(recs.query_id[i])),
                qstart=int(recs.q_start[i]),
                qend=int(recs.q_end[i]),
                strand="-" if recs.strand[i] else "+",
                tname=si.get_name(int(recs.target_id[i])),
                tstart=int(recs.t_start[i]),
                tend=int(recs.t_end[i]),
                runs=recs.runs[
                    recs.run_offsets[i] : recs.run_offsets[i + 1]
                ],
            )
        )
    sdata = {k: v.encode() for k, v in seq_data.items()}
    native = seqwish.induce_graph(sdata, rows)
    python = seqwish.induce_graph(sdata, rows, force_python_emit=True)
    assert native == python


def test_crush_large_bubble_pairwise_tier():
    """Oversized bubbles route to the pairwise-induction tier (the
    resolution.rs 3-tier dispatch role) and still validate exactly."""
    import random

    from impg_tpu.graph.crush import crush_gfa
    from impg_tpu.graph.gfa import Gfa
    from impg_tpu.graph import seqwish
    from impg_tpu.commands import align as align_mod
    from impg_tpu.syng.index import SyngIndex

    rng = random.Random(47)
    # Two haplotypes sharing flank nodes with PRIVATE near-identical mid
    # nodes (unresolved redundancy): the interior exceeds max_span so the
    # POA tier is skipped and pairwise induction must collapse the mids.
    left = "".join(rng.choice("ACGT") for _ in range(3000))
    right = "".join(rng.choice("ACGT") for _ in range(3000))
    mid_a = "".join(rng.choice("ACGT") for _ in range(8000))
    mid_b = list(mid_a)
    for _ in range(200):
        i = rng.randrange(len(mid_b))
        mid_b[i] = rng.choice("ACGT")
    mid_b = "".join(mid_b)
    gfa_text = (
        "H\tVN:Z:1.0\n"
        f"S\t1\t{left}\nS\t2\t{mid_a}\nS\t3\t{mid_b}\nS\t4\t{right}\n"
        "L\t1\t+\t2\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        "P\th1\t1+,2+,4+\t*\nP\th2\t1+,3+,4+\t*\n"
    )
    _ = (seqwish, align_mod, SyngIndex)  # tier deps exercised via crush

    out, stats = crush_gfa(gfa_text, max_span=2000, max_rounds=2)
    g_in, g_out = Gfa.parse(gfa_text), Gfa.parse(out)

    def spell(g):
        from impg_tpu.io.fasta import reverse_complement

        res = {}
        for name, steps in g.paths:
            s = b""
            for sid, rev in steps:
                t = g.segments[sid].encode()
                s += reverse_complement(t) if rev else t
            res[name.split(":")[0]] = s
        return res

    assert spell(g_out) == spell(g_in)
    assert stats.rounds >= 1
    assert stats.bubbles_resolved >= 1
    # The near-identical private mids must collapse into shared structure.
    assert stats.bp_after < stats.bp_before


def test_crush_shared_interior_node_not_credited():
    """A region interior node also used OUTSIDE the region survives the
    splice, so the do-no-harm gate must not credit its bp as reclaimed
    (a naive gate accepted growth here)."""
    x = "ACGTACGTAC" * 60  # 600 bp shared node
    a1 = "TTTTTTTTTTTTTTTTTTTTTTTTTTTTTT"
    a2 = "GGGGGGGGGGGGGGGGGGGGGGGGGGGGGG"
    y1 = "CATCATCATCAT"
    y2 = "GTAGTAGTAGTA"
    text = (
        "H\tVN:Z:1.0\n"
        f"S\t1\t{a1}\nS\t2\t{x}\nS\t3\t{a2}\n"
        f"S\t4\t{y1}\nS\t5\t{y2}\n"
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
        "L\t2\t+\t1\t+\t0M\nL\t3\t+\t4\t+\t0M\n"
        "L\t4\t+\t5\t+\t0M\nL\t1\t+\t4\t+\t0M\n"
        "P\tp1\t1+,2+,3+\t*\n"
        "P\tp2\t2+,1+,4+,5+,3+\t*\n"
    )
    out, st = crush_gfa(text, max_rounds=2)
    assert _spell(out) == _spell(text)
    assert st.bp_after <= st.bp_before
    assert st.nodes_after <= st.nodes_before


def test_crush_refuses_to_balloon_unrelated_alleles():
    """Per-region do-no-harm: when alleles share nothing, realignment
    cannot shrink the region and crush must leave the graph untouched
    (a global relace once exploded node counts 4x here)."""
    rng = random.Random(3)
    segs = {}
    paths = {f"s{i}": [] for i in range(4)}
    nid = [0]

    def new(seq):
        nid[0] += 1
        segs[str(nid[0])] = seq
        return str(nid[0])

    for _ in range(60):
        anchor = new("".join(rng.choice("ACGT") for _ in range(30)))
        alts = [
            new("".join(rng.choice("ACGT") for _ in range(12)))
            for _ in range(2)
        ]
        for p in paths:
            paths[p].append((anchor, False))
            paths[p].append((rng.choice(alts), False))
    tail = new("ACGTACGT")
    for p in paths:
        paths[p].append((tail, False))
    lines = ["H\tVN:Z:1.0"]
    for sid, s in segs.items():
        lines.append(f"S\t{sid}\t{s}")
    link_set = set()
    for st in paths.values():
        for a, b in zip(st, st[1:]):
            link_set.add((a[0], a[1], b[0], b[1]))
    for a, ar, b, br in sorted(link_set):
        lines.append(
            f"L\t{a}\t{'-' if ar else '+'}\t{b}\t{'-' if br else '+'}\t0M"
        )
    for p, st in paths.items():
        lines.append(
            f"P\t{p}\t" + ",".join(
                f"{sid}{'-' if r else '+'}" for sid, r in st
            ) + "\t*"
        )
    text = "\n".join(lines) + "\n"
    out, st = crush_gfa(text, max_rounds=2)
    assert _spell(out) == _spell(text)
    assert st.nodes_after <= st.nodes_before
    assert st.bp_after <= st.bp_before


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
def test_crush_columnar_round_matches_dict(seed, monkeypatch):
    """The columnar crush round must accept the same bubbles and produce
    the same final bp/nodes and exact spellings as the dict-model round
    (node NAMES may number in a different order)."""
    import random as pyrand

    from impg_tpu.graph import gfa_columns
    from impg_tpu.io.fasta import reverse_complement

    rng = pyrand.Random(seed)
    g = Gfa()
    n = rng.randint(4, 50)
    for i in range(1, n + 1):
        g.segments[str(i)] = "".join(
            rng.choice("ACGT") for _ in range(rng.randint(1, 30))
        )
    for i in range(1, n // 3 + 1):  # duplicate-sequence nodes
        g.segments[str(n + i)] = g.segments[str(i)]
    total = n + n // 3
    link_set = set()
    for pi in range(rng.randint(2, 7)):
        steps = [
            (str(rng.randint(1, total)), rng.random() < 0.25)
            for _ in range(rng.randint(2, 40))
        ]
        g.paths.append((f"p{pi}", steps))
        for a, b in zip(steps, steps[1:]):
            link_set.add((a[0], a[1], b[0], b[1]))
    g.links = sorted(link_set)
    text = g.write()

    out_c, st_c = crush_gfa(text)

    # Force the dict round by disabling the tokenizer inside crush.
    monkeypatch.setattr(
        gfa_columns, "parse_gfa_columns", lambda *_a, **_k: None
    )
    out_d, st_d = crush_gfa(text)

    def spell(t):
        gg = Gfa.parse(t)
        return {
            name: b"".join(
                reverse_complement(gg.segments[s].encode()) if r
                else gg.segments[s].encode()
                for s, r in steps
            )
            for name, steps in gg.paths
        }

    assert spell(out_c) == spell(out_d) == spell(text)
    assert (st_c.bubbles_resolved, st_c.rounds) == (
        st_d.bubbles_resolved, st_d.rounds
    ), (st_c, st_d)
    assert (st_c.nodes_after, st_c.bp_after) == (
        st_d.nodes_after, st_d.bp_after
    ), (st_c, st_d)


def test_crush_blunt_scale_shape():
    """CI-scale variant of the at-scale experiment (docs/crush-at-scale.md):
    seqwish-shaped blunt graph with duplicate-spelling bubbles (crush's
    target) and true SNP alleles (do-no-harm).  Spellings are preserved
    exactly and the duplicated bases collapse."""
    from tests.datagen import big_blunt_gfa

    text = big_blunt_gfa(
        backbone_bp=120_000, n_paths=8, dup_sites=30, snp_sites=15
    )

    def spell(t):
        gg = Gfa.parse(t)
        return {
            name: b"".join(
                reverse_complement(gg.segments[s].encode()) if r
                else gg.segments[s].encode()
                for s, r in steps
            )
            for name, steps in gg.paths
        }

    before = spell(text)
    out, st = crush_gfa(text, max_rounds=4)
    assert spell(out) == before
    assert st.bubbles_resolved > 0
    # Duplicate-spelling bubbles collapse; the 15 one-base SNP alleles are
    # all that may legitimately remain beyond the backbone.
    assert st.bp_after < st.bp_before
    assert st.bp_after <= 120_000 + 15 + 1000  # backbone + SNPs + slack


def test_crush_induce_tier_knn_sampling_many_alleles():
    """Oversized regions with many distinct alleles route through the
    pairwise-induction tier with mash-kNN pair sampling (resolution.rs'
    Mash kNN + random-fraction pair selection role).  Spellings must
    stay exact; near-identical alleles still compress."""
    import random as pyrand

    rng = pyrand.Random(404)
    base = "".join(rng.choice("ACGT") for _ in range(900))
    g = Gfa()
    g.segments["A"] = "".join(rng.choice("ACGT") for _ in range(40))
    g.segments["Z"] = "".join(rng.choice("ACGT") for _ in range(40))
    paths = []
    for k in range(10):  # > 8 alleles -> kNN sampling engages
        allele = list(base)
        p = rng.randrange(len(allele))
        allele[p] = rng.choice("ACGT")
        sid = f"m{k}"
        g.segments[sid] = "".join(allele)
        paths.append((f"p{k}", [("A", False), (sid, False), ("Z", False)]))
    g.paths = paths
    link_set = set()
    for _, steps in paths:
        for a, b in zip(steps, steps[1:]):
            link_set.add((a[0], a[1], b[0], b[1]))
    g.links = sorted(link_set)
    text = g.write()

    out, st = crush_gfa(text, max_span=500, max_rounds=2)  # force induce
    assert _spell(out) == _spell(text)
    assert st.bubbles_seen >= 1
