"""Crush: bubble-bounded local graph resolution (reference: resolution.rs
resolve_gfa_bubbles — POVU flubble discovery + tiered POA/POASTA/pairwise
realignment with exact path validation, iterated to a fixed point).

Round-1 tier: anchor-bounded bubbles realigned with the native POA.

  - anchors: nodes every path traverses exactly once, in the same relative
    order (computed from path walks, not topology — robust to spurious
    edges);
  - the region between consecutive anchors is a bubble when at least two
    paths spell different sequences through it; bounded by `max_span` bp;
  - each bubble's path slices realign with POA and the block graphs (plus
    single-node anchor blocks) lace back together;
  - path spellings are validated EXACTLY after every round (the reference's
    contract); rounds repeat until no bubble changes or `max_rounds`.
"""

from __future__ import annotations

from dataclasses import dataclass

from impg_tpu.graph import poa as poa_mod
from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import reverse_complement


@dataclass
class CrushStats:
    rounds: int = 0
    bubbles_seen: int = 0
    bubbles_resolved: int = 0
    nodes_before: int = 0
    nodes_after: int = 0
    bp_before: int = 0
    bp_after: int = 0
    excluded_paths: int = 0  # paths whose walk disagreed (e.g. inversions)


# Per-node charge in the region-acceptance cost (bp-equivalent overhead
# of one more segment: S-line + links + step bookkeeping downstream).
_NODE_COST = 8


def _step_seq(gfa: Gfa, step) -> bytes:
    s = gfa.segments[step[0]].encode()
    return reverse_complement(s) if step[1] else s


def _find_anchors(gfa: Gfa) -> tuple[list, set]:
    """(anchors, participating path names).

    Anchors are oriented steps every PARTICIPATING path contains exactly
    once, in a consistent order.  Paths whose walks disagree with the first
    path's orientation/order (e.g. reverse-complement members) are excluded
    and handled as untouched whole blocks by the caller.
    """
    if not gfa.paths:
        return [], set()
    per_path_once: list[set] = []
    for _, steps in gfa.paths:
        seen: dict = {}
        for st in steps:
            seen[st] = seen.get(st, 0) + 1
        per_path_once.append({st for st, c in seen.items() if c == 1})

    participating = [0]
    candidate = set(per_path_once[0])
    order0 = [st for st in gfa.paths[0][1] if st in candidate]
    index0 = {st: i for i, st in enumerate(order0)}
    for pi in range(1, len(gfa.paths)):
        shared = per_path_once[pi] & candidate
        seq = [index0[st] for st in gfa.paths[pi][1] if st in shared]
        if not seq:
            continue
        inc = sum(1 for a, b in zip(seq, seq[1:]) if b > a)
        # A single shared step cannot disagree with any order.
        if len(seq) < 2 or inc >= 0.5 * (len(seq) - 1):
            participating.append(pi)
    candidate = set(per_path_once[participating[0]])
    for pi in participating[1:]:
        candidate &= per_path_once[pi]
    first = [st for st in gfa.paths[0][1] if st in candidate]
    index0 = {st: i for i, st in enumerate(first)}
    ok = set(first)
    for pi in participating[1:]:
        last = -1
        for st in gfa.paths[pi][1]:
            if st not in index0:
                continue
            if index0[st] < last:
                ok.discard(st)
            else:
                last = index0[st]
    names = {gfa.paths[pi][0] for pi in participating}
    return [st for st in first if st in ok], names


def _induce_block(names: list[str], seqs: list[bytes]) -> str:
    """Pairwise-induction realignment of one oversized region: all-vs-all
    syncmer-anchored native alignment + seqwish transitive closure (the
    large-bubble tier of resolution.rs' POA/POASTA/pairwise dispatch)."""
    from impg_tpu.commands import align as align_mod
    from impg_tpu.graph import seqwish as seqwish_mod
    from impg_tpu.syng.index import SyngIndex

    sdict = dict(zip(names, seqs))
    syng = SyngIndex.build(list(sdict.items()))
    rows = []
    keys = list(sdict)
    for q in keys:
        for t in keys:
            if q != t:
                rows.extend(align_mod.align_sequence_pair(syng, sdict, q, t))
    gfa = seqwish_mod.induce_graph(sdict, rows)
    # induce_graph names paths `key:0-len`; the keys already carry their
    # lace ranges, so strip the redundant suffix.
    fixed = []
    for line in gfa.splitlines():
        if line.startswith("P\t"):
            parts = line.split("\t")
            base, _, suffix = parts[1].rpartition(":")
            if suffix.startswith("0-") and base in sdict:
                parts[1] = base
            fixed.append("\t".join(parts))
        else:
            fixed.append(line)
    return "\n".join(fixed) + "\n"


def crush_gfa(
    gfa_text: str,
    max_span: int = 10_000,
    max_rounds: int = 4,
    scoring=poa_mod.DEFAULT_SCORING,
) -> tuple[str, CrushStats]:
    stats = CrushStats()
    g0 = Gfa.parse(gfa_text)
    stats.nodes_before = len(g0.segments)
    stats.bp_before = sum(len(s) for s in g0.segments.values())
    # Pre-groom (spelling-preserving majority-orientation flips): paths
    # that traverse the shared backbone reverse-complemented become
    # forward walks, so they can participate in anchor slicing instead of
    # forcing the do-no-harm no-op below.
    from impg_tpu.graph.sortgfa import groom

    gfa_text = groom(g0).write()

    def spell_all(g: Gfa):
        return {
            name: b"".join(_step_seq(g, st) for st in steps)
            for name, steps in g.paths
        }

    before_spell = spell_all(g0)
    text = gfa_text

    for _round in range(max_rounds):
        gfa = Gfa.parse(text)
        anchors, participating = _find_anchors(gfa)
        # Do-no-harm: rebuilding the graph from per-path blocks duplicates
        # the sequence of any path we can't slice at anchors (losing its node
        # sharing), so only proceed when EVERY path participates.
        stats.excluded_paths = len(gfa.paths) - len(participating)
        if len(anchors) < 2 or stats.excluded_paths:
            break
        anchor_set = set(anchors)

        # Interior slices STRICTLY between consecutive anchor steps, per
        # path: (path_idx, step_lo, step_hi, walk) where steps[lo:hi] is
        # the allele walk (anchors stay untouched — accepted realignments
        # SPLICE into the standing graph, the reference's path-preserving
        # local resolution, instead of relacing the whole graph).
        region_slices: dict[tuple, list[tuple[int, int, int, tuple]]] = {}
        for pi, (name, steps) in enumerate(gfa.paths):
            apos = [k for k, st in enumerate(steps) if st in anchor_set]
            for a, b in zip(apos, apos[1:]):
                rid = (steps[a], steps[b])
                region_slices.setdefault(rid, []).append(
                    (pi, a + 1, b, tuple(steps[a + 1 : b]))
                )

        next_id = 1 + max(
            (int(s) for s in gfa.segments if s.isdigit()), default=0
        )
        # Global per-node step-usage counts: a region may only claim the
        # bp of nodes whose EVERY use lies inside that region's slices —
        # shared nodes survive the splice and reclaim nothing.
        global_use: dict[str, int] = {}
        for _name, steps in gfa.paths:
            for sid, _rev in steps:
                global_use[sid] = global_use.get(sid, 0) + 1
        new_segments: dict[str, str] = {}
        splices: dict[int, list[tuple[int, int, tuple]]] = {}
        n_bubbles = 0
        for rid, slices in region_slices.items():
            walks = {w for _, _, _, w in slices}
            # A bubble = the paths take different node walks through the
            # region (identical-sequence walks through duplicated nodes
            # count: that redundancy is exactly what realignment collapses).
            if len(walks) <= 1:
                continue
            stats.bubbles_seen += 1
            walk_seq = {
                w: b"".join(_step_seq(gfa, st) for st in w) for w in walks
            }
            uniq = sorted({s for s in walk_seq.values() if s})
            if not uniq:
                continue  # every allele spells empty; nothing to realign
            span = max(len(s) for s in uniq)
            names_u = [f"u{k}" for k in range(len(uniq))]
            if span > max_span:
                # Large-bubble tier (resolution.rs 3-tier dispatch role:
                # bubbles beyond the POA budget route to pairwise
                # induction): syncmer-anchored native pairwise alignment +
                # seqwish induction — scales far beyond O(n*m) POA.
                block_text = _induce_block(names_u, uniq)
            else:
                result = poa_mod.poa_align(uniq, scoring)
                block_text = poa_mod.poa_to_gfa(result, names_u)
            block = Gfa.parse(block_text)
            # Per-region do-no-harm (the reference validates resolution
            # quality per bubble): accept only when the realignment SHRINKS
            # the region under a combined cost — bp plus a per-node charge,
            # so neither ballooning unrelated alleles into duplicated
            # sequence nor shredding them into confetti nodes can win.
            cand = (
                sum(len(s) for s in block.segments.values())
                + _NODE_COST * len(block.segments)
            )
            region_use: dict[str, int] = {}
            for _pi, _lo, _hi, w in slices:
                for sid, _rev in w:
                    region_use[sid] = region_use.get(sid, 0) + 1
            reclaimable = {
                sid for sid, c in region_use.items()
                if global_use.get(sid, 0) == c
            }
            old = (
                sum(len(gfa.segments[s]) for s in reclaimable)
                + _NODE_COST * len(reclaimable)
            )
            if cand >= old:
                continue
            rename = {}
            for sid, seq in block.segments.items():
                nid = str(next_id)
                next_id += 1
                rename[sid] = nid
                new_segments[nid] = seq
            walk_of = dict(block.paths)
            seq_new_walk: dict[bytes, tuple] = {b"": ()}
            for k, s in enumerate(uniq):
                seq_new_walk[s] = tuple(
                    (rename[sid], rev) for sid, rev in walk_of[f"u{k}"]
                )
            for pi, lo, hi, w in slices:
                splices.setdefault(pi, []).append(
                    (lo, hi, seq_new_walk[walk_seq[w]])
                )
            n_bubbles += 1

        if not n_bubbles:
            break

        # Splice accepted regions back-to-front per path; prune nodes no
        # path uses; regenerate links from path adjacencies (blunt 0M).
        new_paths = []
        for pi, (name, steps) in enumerate(gfa.paths):
            reps = sorted(splices.get(pi, []), reverse=True)
            steps = list(steps)
            for lo, hi, walk in reps:
                steps[lo:hi] = list(walk)
            new_paths.append((name, steps))
        ng = Gfa(header=gfa.header, walk_names=set(gfa.walk_names))
        used = {sid for _, steps in new_paths for sid, _ in steps}
        merged = {**gfa.segments, **new_segments}
        ng.segments = {
            sid: seq for sid, seq in merged.items() if sid in used
        }
        link_set = set()
        for _, steps in new_paths:
            for a, b in zip(steps, steps[1:]):
                link_set.add((a[0], a[1], b[0], b[1]))
        ng.links = sorted(link_set)
        ng.paths = new_paths
        # Exact path validation (the reference's contract): refuse an
        # invalid round and keep the previous text.
        if spell_all(ng) != before_spell:
            break
        new_text = ng.write()
        if new_text == text:
            break
        stats.rounds += 1
        stats.bubbles_resolved += n_bubbles
        text = new_text

    final = Gfa.parse(text)
    stats.nodes_after = len(final.segments)
    stats.bp_after = sum(len(s) for s in final.segments.values())
    return text, stats
