"""Columnar transform hot passes (graph/columnar_ops.py) vs the dict
model oracle: path spelling (native spellc.cpp kernel + numpy fallback),
zero-copy validation, and packed link regeneration."""

import random

import numpy as np
import pytest

from impg_tpu.graph import columnar_ops as co
from impg_tpu.graph.gfa import Gfa
from impg_tpu.graph.gfa_columns import parse_gfa_columns
from impg_tpu.io.fasta import reverse_complement


def _random_gfa(seed=5, n_nodes=60, n_paths=6) -> str:
    rng = random.Random(seed)
    lines = ["H\tVN:Z:1.0"]
    for i in range(1, n_nodes + 1):
        L = rng.randint(1, 40)
        lines.append(
            f"S\tn{i}\t" + "".join(rng.choice("ACGTN") for _ in range(L))
        )
    for p in range(n_paths):
        steps = [
            f"n{rng.randint(1, n_nodes)}{rng.choice('+-')}"
            for _ in range(rng.randint(1, 50))
        ]
        lines.append(f"P\tp{p}\t" + ",".join(steps) + "\t*")
    # links (content irrelevant to these passes)
    lines.append("L\tn1\t+\tn2\t+\t0M")
    return "\n".join(lines) + "\n"


def _dict_spell(g: Gfa) -> dict[str, bytes]:
    out = {}
    for name, steps in g.paths:
        out[name] = b"".join(
            reverse_complement(g.segments[s].encode()) if r
            else g.segments[s].encode()
            for s, r in steps
        )
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_spell_paths_matches_dict_model(seed):
    text = _random_gfa(seed)
    gc = parse_gfa_columns(text)
    assert gc is not None
    want = _dict_spell(Gfa.parse(text))
    got = co.path_spellings(gc)
    assert got == want


@pytest.mark.parametrize("seed", [1, 2])
def test_spell_numpy_fallback_matches(seed):
    text = _random_gfa(seed)
    gc = parse_gfa_columns(text)
    rows = gc.seg_row_of_name()[gc.step_name_idx]
    lens = gc.seg_lens()[rows].astype(np.int64)
    bp_off = np.concatenate([[0], np.cumsum(lens)])
    out = co._spell_numpy(gc, rows, lens, bp_off)
    path_bp = bp_off[gc.path_off]
    want = _dict_spell(Gfa.parse(text))
    for p, name in enumerate(gc.path_names):
        assert (
            out[int(path_bp[p]) : int(path_bp[p + 1])].tobytes()
            == want[name]
        ), name


def test_validate_spellings():
    text = _random_gfa(7)
    gc = parse_gfa_columns(text)
    want = _dict_spell(Gfa.parse(text))
    assert co.validate_spellings(gc, want)
    # Any single-byte corruption must fail.
    name = next(iter(want))
    bad = dict(want)
    b = bytearray(bad[name] or b"A")
    b[0] = ord("A") if b[0] != ord("A") else ord("C")
    bad[name] = bytes(b)
    if bad[name] != want[name]:
        assert not co.validate_spellings(gc, bad)
    # Missing / extra paths fail.
    assert not co.validate_spellings(gc, {})
    extra = dict(want)
    extra["ghost"] = b"A"
    assert not co.validate_spellings(gc, extra)
    # Text-level entry point agrees.
    assert co.validate_text_spellings(text, want) in (True, None)


def test_links_from_paths_matches_dict_model():
    text = _random_gfa(9, n_nodes=40, n_paths=8)
    gc = parse_gfa_columns(text)
    g = Gfa.parse(text)
    want = set()
    for _, steps in g.paths:
        for a, b in zip(steps, steps[1:]):
            want.add((a[0], a[1], b[0], b[1]))
    packed = co.links_from_paths(gc)
    got = set(co.unpack_links(gc, packed))
    assert got == want


def test_spell_missing_segment_raises():
    text = "H\tVN:Z:1.0\nS\tn1\tACGT\nP\tp\tn1+,nX-\t*\n"
    gc = parse_gfa_columns(text)
    if gc is None:
        pytest.skip("native tokenizer unavailable")
    with pytest.raises(ValueError, match="nX"):
        co.spell_paths(gc)


def _pipeline_gfa(seed=21, n_nodes=120, n_paths=5) -> str:
    """Graph where every step references a real segment (sort pipelines
    drop dangling refs; parity needs clean input)."""
    rng = random.Random(seed)
    lines = ["H\tVN:Z:1.0"]
    for i in range(1, n_nodes + 1):
        L = rng.randint(1, 30)
        lines.append(
            f"S\ts{i}\t" + "".join(rng.choice("ACGT") for _ in range(L))
        )
    links = set()
    for p in range(n_paths):
        steps = []
        for _ in range(rng.randint(2, 60)):
            steps.append((f"s{rng.randint(1, n_nodes)}", rng.choice([True, False])))
        for a, b in zip(steps, steps[1:]):
            links.add((a[0], a[1], b[0], b[1]))
        lines.append(
            f"P\tp{p}\t"
            + ",".join(f"{s}{'-' if r else '+'}" for s, r in steps)
            + "\t*"
        )
    for a, ar, b, br in sorted(links):
        lines.append(
            f"L\t{a}\t{'-' if ar else '+'}\t{b}\t{'-' if br else '+'}\t0M"
        )
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("pipeline", ["gs", "s", "g", "Ygs"])
@pytest.mark.parametrize("seed", [21, 22])
def test_sort_pipeline_columns_matches_dict(pipeline, seed):
    """The columnar fast path of sort_pipeline must produce byte-identical
    text to the dict-model loop (same groom votes, same priority topo tie
    rules, same writer formats)."""
    from impg_tpu.graph import sortgfa

    text = _pipeline_gfa(seed)
    fast = sortgfa._sort_pipeline_columns(text, pipeline, "numpy")
    if fast is None:
        pytest.skip("native tokenizer unavailable")
    # dict-model oracle (the old body)
    g = Gfa.parse(text)
    for c in pipeline:
        if c == "Y":
            order = sortgfa.path_sgd_order(g, backend="numpy")
            rank = {sid: k for k, sid in enumerate(order)}
            g.segments = dict(
                sorted(g.segments.items(), key=lambda kv: rank[kv[0]])
            )
        elif c == "g":
            g = sortgfa.groom(g)
        elif c == "s":
            g = sortgfa._topo_priority(g)
    assert fast == g.write()


def test_sort_pipeline_columns_preserves_spellings():
    from impg_tpu.graph import sortgfa

    text = _pipeline_gfa(33)
    before = _dict_spell(Gfa.parse(text))
    out = sortgfa.sort_pipeline(text, "Ygs")
    after = _dict_spell(Gfa.parse(out))
    assert before == after


def test_sort_pipeline_walk_lines_parity():
    """GFA 1.1 W-line graphs: groom/_topo_priority must keep walk_names so
    the dict fallback emits W lines like the columnar writer (round-2
    review: Gfa(header=...) copies dropped the set, silently rewriting W
    as P depending on whether libimpg_native loaded)."""
    from impg_tpu.graph import sortgfa

    text = (
        "H\tVN:Z:1.1\n"
        "S\ta\tACGT\n"
        "S\tb\tTTT\n"
        "L\ta\t+\tb\t+\t0M\n"
        "W\tsamp\t1\tchr1\t0\t7\t>a>b\n"
    )
    g = Gfa.parse(text)
    g = sortgfa.groom(g)
    g = sortgfa._topo_priority(g)
    dict_out = g.write()
    assert "\nW\t" in "\n" + dict_out
    assert "\nP\t" not in "\n" + dict_out
    fast = sortgfa._sort_pipeline_columns(text, "gs", "numpy")
    if fast is not None:
        assert fast == dict_out
