"""Crush (anchor-bounded bubble resolution; reference: resolution.rs
resolve_gfa_bubbles): path spellings must be preserved EXACTLY, redundant
identical-sequence bubbles must collapse, and paths the anchor walk can't
slice (inversions) must make the pass a no-op rather than degrade sharing."""

import random

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


def test_crush_noop_on_inversion_path():
    gfa = _bubble_gfa(["P\tp3\ta2-,m1-,a1-\t*"])
    out, st = crush_gfa(gfa)
    assert st.rounds == 0
    assert st.excluded_paths == 1
    assert out == gfa  # untouched


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
    assert st.rounds >= 1
    assert _spell(out) == _spell(gfa)
    assert st.bp_after <= st.bp_before + 50  # no runaway duplication


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
    # Two haplotypes sharing big flanks with a large divergent interior:
    # the bubble interior exceeds max_span so POA would be skipped.
    left = "".join(rng.choice("ACGT") for _ in range(3000))
    right = "".join(rng.choice("ACGT") for _ in range(3000))
    mid_a = "".join(rng.choice("ACGT") for _ in range(8000))
    mid_b = list(mid_a)
    for _ in range(200):
        i = rng.randrange(len(mid_b))
        mid_b[i] = rng.choice("ACGT")
    seqs = {
        "h1": (left + mid_a + right).encode(),
        "h2": (left + "".join(mid_b) + right).encode(),
    }
    syng = SyngIndex.build(list(seqs.items()))
    rows = []
    for q in seqs:
        for t in seqs:
            if q != t:
                rows.extend(align_mod.align_sequence_pair(syng, seqs, q, t))
    gfa_text = seqwish.induce_graph(seqs, rows)

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
