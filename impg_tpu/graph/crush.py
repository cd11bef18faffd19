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

from impg_tpu.graph import lace as lace_mod
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
        anchor_rank = {st: i for i, st in enumerate(anchors)}

        # Per path: positions of anchors + bp offsets.
        # Build per-path slices between consecutive anchors (inclusive of the
        # anchors themselves so blocks lace contiguously).
        n_bubbles = 0
        changed = False
        # Region id = anchor rank i (between anchors[i] and anchors[i+1]).
        region_paths: dict[int, list[tuple[str, int, bytes, tuple]]] = {}

        for name, steps in gfa.paths:
            pos = 0
            cur_anchor = None
            cur_start = 0
            cur_seq: list[bytes] = []
            cur_walk: list = []
            for st in steps:
                piece = _step_seq(gfa, st)
                if st in anchor_set:
                    if cur_anchor is not None:
                        rid = anchor_rank[cur_anchor]
                        region_paths.setdefault(rid, []).append(
                            (
                                name,
                                cur_start,
                                b"".join(cur_seq) + piece,
                                tuple(cur_walk) + (st,),
                            )
                        )
                    cur_anchor = st
                    cur_start = pos
                    cur_seq = [piece]
                    cur_walk = [st]
                elif cur_anchor is not None:
                    cur_seq.append(piece)
                    cur_walk.append(st)
                pos += len(piece)
            # Tail after last anchor + head before first anchor stay as
            # untouched blocks per path.

        # Head/tail slices (before first anchor / after last) per path.
        extra_blocks: list[tuple[str, int, bytes]] = []
        for name, steps in gfa.paths:
            pos = 0
            first_anchor_at = None
            last_anchor_end = None
            for st in steps:
                piece_len = len(gfa.segments[st[0]])
                if st in anchor_set:
                    if first_anchor_at is None:
                        first_anchor_at = pos
                    last_anchor_end = pos + piece_len
                pos += piece_len
            total = pos
            if first_anchor_at is None:
                extra_blocks.append(
                    (name, 0, b"".join(_step_seq(gfa, st) for st in steps))
                )
                continue
            if first_anchor_at > 0:
                seq = b""
                p = 0
                for st in steps:
                    if p >= first_anchor_at:
                        break
                    seq += _step_seq(gfa, st)
                    p += len(gfa.segments[st[0]])
                # Include the first anchor so lace links head to body.
                extra_blocks.append((name, 0, seq))
            if last_anchor_end is not None and last_anchor_end < total:
                seq = b""
                p = 0
                for st in steps:
                    if p >= last_anchor_end:
                        seq += _step_seq(gfa, st)
                    p += len(gfa.segments[st[0]])
                extra_blocks.append((name, last_anchor_end, seq))

        block_gfas: list[str] = []
        for rid in sorted(region_paths):
            slices = region_paths[rid]
            seqs = [s for _, _, s, _ in slices]
            span = max(len(s) for s in seqs)
            # A bubble = slices take different node walks through the region
            # (identical-sequence walks through duplicated nodes count: those
            # are exactly the redundancy realignment collapses).
            distinct_walks = len({w for _, _, _, w in slices})
            if distinct_walks > 1:
                stats.bubbles_seen += 1
                if span <= max_span:
                    n_bubbles += 1
            names = [
                f"{n}:{start}-{start + len(s)}" for n, start, s, _ in slices
            ]
            if span > max_span and distinct_walks > 1:
                # Large-bubble tier (resolution.rs 3-tier dispatch role:
                # bubbles beyond the POA budget route to pairwise
                # induction): syncmer-anchored native pairwise alignment of
                # the slices, seqwish-induced into the block graph — scales
                # far beyond O(n*m) POA.
                block_gfas.append(_induce_block(names, seqs))
                n_bubbles += 1
            else:
                result = poa_mod.poa_align(seqs, scoring)
                block_gfas.append(poa_mod.poa_to_gfa(result, names))
        for name, start, seq in extra_blocks:
            if not seq:
                continue
            result = poa_mod.poa_align([seq], scoring)
            block_gfas.append(
                poa_mod.poa_to_gfa(
                    result, [f"{name}:{start}-{start + len(seq)}"]
                )
            )

        if not block_gfas:
            break
        new_text = lace_mod.lace_gfas(block_gfas)
        new_g = Gfa.parse(new_text)
        # Exact path validation (the reference's contract).  Laced paths are
        # named `<original>:<start>-<end>`; strip the lace range to compare
        # against the original names.
        after = {}
        for name, seq in spell_all(new_g).items():
            parsed = lace_mod.split_path_name(name)
            after[parsed[0] if parsed else name] = seq
        want = dict(before_spell)
        if after != want:
            break  # refuse an invalid round; keep previous text
        # Restore original path names (lace appended its :start-end range)
        # so subsequent rounds and consumers see stable names.
        renamed = []
        for line in new_text.splitlines():
            if line.startswith("P\t"):
                parts = line.split("\t")
                parsed = lace_mod.split_path_name(parts[1])
                if parsed and parsed[0] in want:
                    parts[1] = parsed[0]
                renamed.append("\t".join(parts))
            else:
                renamed.append(line)
        new_text = "\n".join(renamed) + "\n"
        if new_text == text:
            break
        changed = True
        stats.rounds += 1
        stats.bubbles_resolved += n_bubbles
        text = new_text
        if not changed:
            break

    final = Gfa.parse(text)
    stats.nodes_after = len(final.segments)
    stats.bp_after = sum(len(s) for s in final.segments.values())
    return text, stats
