"""Randomized invariant checks beyond cross-engine exactness:

- partition: full coverage (up to sub-threshold slivers), disjointness,
  determinism across random topologies and parameter combos;
- graph transforms: path-spelling preservation for normalize / sort /
  topo / chop / self-loop collapse / crush / smooth on random graphs.

Wider campaigns of the same generators run out-of-band; these seeds keep
the invariants pinned in CI time.
"""

import os
import random

import pytest

from impg_tpu.commands import partition as part
from impg_tpu.graph.gfa import Gfa, chop_gfa, topological_sort
from impg_tpu.index.impg_index import load_or_build
from impg_tpu.io.fasta import reverse_complement
from tests import datagen


@pytest.mark.parametrize("seed", [3101, 3107, 3113, 3125])
def test_partition_invariants_random(seed, tmp_path):
    rng = random.Random(seed)
    kind = rng.choice(["chain", "pan"])
    n_seqs = rng.randint(2, 8)
    seq_len = rng.choice([3000, 8000, 20_000])
    if kind == "chain":
        text, seqs, alns = datagen.mutate_chain_paf(
            rng, n_seqs=n_seqs, seq_len=seq_len
        )
    else:
        text, seqs, alns = datagen.pangenome_paf(
            rng, n_seqs=n_seqs, seq_len=seq_len,
            cross_links=rng.randint(0, 3),
        )
    paf = str(tmp_path / "p.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    window = rng.choice([500, 1500, 4000])
    kw = dict(
        merge_distance=rng.choice([0, 50, 300]),
        min_missing_size=rng.choice([1, 50, 300]),
        min_boundary_distance=rng.choice([0, 100]),
        selection_mode=rng.choice(["longest", "sample", "haplotype"]),
        min_identity=rng.choice([None, 0.5]),
        max_depth=rng.choice([1, 2]),
        transitive_dfs=rng.random() < 0.3,
    )
    out1 = tmp_path / "a"
    out2 = tmp_path / "b"
    os.makedirs(out1, exist_ok=True)
    os.makedirs(out2, exist_ok=True)
    c1 = part.partition_alignments(index, window, output_folder=str(out1),
                                   **kw)
    c2 = part.partition_alignments(index, window, output_folder=str(out2),
                                   **kw)
    ser = lambda c: [
        (p, sorted((iv.seq_id,) + iv.span() for iv in ivs)) for p, ivs in c
    ]
    assert ser(c1) == ser(c2), "nondeterministic"

    cov: dict[int, set] = {}
    seen: dict[tuple, int] = {}
    for pnum, ivs in c1:
        for iv in ivs:
            s, e = iv.span()
            assert 0 <= s < e
            for pos in range(s, e):
                key = (iv.seq_id, pos)
                assert key not in seen, (
                    f"overlap at {key}: {seen[key]} vs {pnum}"
                )
                seen[key] = pnum
            cov.setdefault(iv.seq_id, set()).update(range(s, e))
    for name, L in seqs.items():
        covered = cov.get(index.seq_index.get_id(name), set())
        holes = sorted(set(range(L)) - covered)
        run, last, max_run = 0, None, 0
        for h in holes:
            run = run + 1 if last is not None and h == last + 1 else 1
            last = h
            max_run = max(max_run, run)
        assert max_run < kw["min_missing_size"], (
            f"{name}: hole {max_run} >= min_missing_size"
        )


@pytest.mark.parametrize("seed", [7103, 7119, 7131])
def test_bfs_dfs_coverage_equivalence_random(seed, tmp_path):
    """At depth 1, BFS and DFS expand the same seed once, so merged
    per-sequence coverage must agree up to visited-order slop at range
    boundaries (the reference's transitive-integrity contract).  Deeper
    walks are legitimately order-dependent: the visited set prunes
    differently along BFS frontiers vs DFS branches."""
    from impg_tpu.query import engine

    rng = random.Random(seed)
    text, seqs, alns = datagen.pangenome_paf(
        rng, n_seqs=rng.randint(3, 7),
        seq_len=rng.choice([4000, 12000]),
        cross_links=rng.randint(0, 3),
    )
    paf = str(tmp_path / "d.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    index = load_or_build([paf])
    names = list(seqs)
    for _ in range(4):
        nm = names[rng.randrange(len(names))]
        L = seqs[nm]
        s = rng.randrange(0, max(1, L - 2000))
        tid = index.seq_index.get_id(nm)
        rng.choice([1, 2])  # keep the seed stream stable
        bfs = engine.query_transitive_bfs(
            index, tid, s, s + 2000, max_depth=1
        )
        dfs = engine.query_transitive_dfs(
            index, tid, s, s + 2000, max_depth=1
        )

        def cov(rows, sid):
            out = set()
            for r in rows:
                if r.q_id == sid:
                    lo, hi = sorted((r.q_first, r.q_last))
                    out.update(range(lo, hi))
            return out

        for name in names:
            sid = index.seq_index.get_id(name)
            diff = cov(bfs, sid) ^ cov(dfs, sid)
            assert len(diff) <= 128, (nm, s, name, len(diff))


def _spell(gfa: Gfa) -> dict[str, str]:
    """Base-name -> spelled bases; NAME:START-END range paths (the lace
    convention) reassemble in range order."""
    pieces: dict[str, list[tuple[int, str]]] = {}
    for name, steps in gfa.paths:
        parts = []
        for sid, rev in steps:
            seq = gfa.segments.get(sid, "")
            if rev:
                seq = reverse_complement(seq.encode()).decode()
            parts.append(seq)
        base, _, rng_part = name.rpartition(":")
        start, key = 0, name
        if base and "-" in rng_part:
            a, _, _b = rng_part.partition("-")
            try:
                start, key = int(a), base
            except ValueError:
                pass
        pieces.setdefault(key, []).append((start, "".join(parts)))
    return {k: "".join(s for _, s in sorted(v)) for k, v in pieces.items()}


def _random_gfa(rng: random.Random) -> Gfa:
    g = Gfa()
    n = rng.randint(1, 25)
    for i in range(1, n + 1):
        g.segments[str(i)] = "".join(
            rng.choice("ACGT") for _ in range(rng.randint(1, 30))
        )
    link_set = set()
    for pi in range(rng.randint(1, 6)):
        steps = [
            (str(rng.randint(1, n)), rng.random() < 0.3)
            for _ in range(rng.randint(1, 30))
        ]
        g.paths.append((f"s{pi}#1#chr1", steps))
        for (a, ar), (b, br) in zip(steps, steps[1:]):
            link_set.add((a, ar, b, br))
    g.links = sorted(link_set)
    return g


@pytest.mark.parametrize("seed", [4103, 4111, 4122, 4137])
def test_transform_spelling_preservation_random(seed):
    from impg_tpu.graph import crush as crush_mod
    from impg_tpu.graph import normalize as norm_mod
    from impg_tpu.graph import selfloops, smooth as smooth_mod, sortgfa

    rng = random.Random(seed)
    g = _random_gfa(rng)
    base = _spell(g)
    text = g.write()

    assert _spell(Gfa.parse(norm_mod.normalize_gfa(text))) == base
    assert _spell(Gfa.parse(sortgfa.sort_pipeline(text, "Ygs"))) == base
    assert _spell(topological_sort(Gfa.parse(text))) == base
    assert _spell(chop_gfa(Gfa.parse(text), rng.choice([1, 3, 7]))) == base
    out, _ = selfloops.normalize_self_loops(text)
    assert _spell(Gfa.parse(out)) == base
    out, _ = crush_mod.crush_gfa(text)
    assert _spell(Gfa.parse(out)) == base
    out = smooth_mod.smooth_gfa(text, block_len=rng.choice([40, 120]))
    assert _spell(Gfa.parse(out)) == base
