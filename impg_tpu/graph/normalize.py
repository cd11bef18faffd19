"""GFA normalization: shared-affix collapse (reference: gfaffix via
graph.rs:994 run_gfaffix / normalize_and_sort).

Walk-preserving simplifications, iterated to fixpoint:
  1. duplicate siblings: children of the same oriented parent with identical
     sequence merge into one node (both directions: shared parent and
     shared child);
  2. shared prefixes: children of the same oriented parent that share a
     common sequence prefix are split so the prefix becomes one shared node
     (the GFAffix "shared prefix decomposition");
  3. shared suffixes: the symmetric decomposition, run by reversing the
     graph (RC segments, flipped links/paths), applying the prefix sweep,
     and reversing back;
  4. unchop: unbranched forward chains merge, path-endpoint aware (a chain
     is only merged when every walk that enters it traverses it whole).

All path walks re-spell the exact same bases (fuzz-tested invariant,
tests/test_invariant_fuzz.py).

Note: affix sweeps operate on forward-orientation links whose members
never appear reversed in links or walks; mixed-orientation bubbles are
left untouched (conservative subset of gfaffix). `pre_groom` flips
majority-reverse paths forward first so that subset covers more.
"""

from __future__ import annotations

from impg_tpu.graph.gfa import Gfa
from impg_tpu.io.fasta import reverse_complement


def _rc(seq: str) -> str:
    # IUPAC-aware (lowercase, ambiguity codes): unmapped bytes pass through
    # the translate table unchanged, so the suffix-sweep's double mirror
    # (_reverse_gfa twice) is lossless on every legal GFA sequence.
    return reverse_complement(seq.encode("ascii")).decode("ascii")


def _children(gfa: Gfa) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for a, ar, b, br in gfa.links:
        if not ar and not br:
            out.setdefault(a, []).append(b)
    return out


def _rewrite_paths(gfa: Gfa, mapping: dict[str, list[str]]) -> None:
    """Replace node ids in paths: mapping id -> replacement step list."""
    new_paths = []
    for name, steps in gfa.paths:
        out = []
        for sid, rev in steps:
            repl = mapping.get(sid)
            if repl is None:
                out.append((sid, rev))
            elif rev:
                out.extend((r, True) for r in reversed(repl))
            else:
                out.extend((r, False) for r in repl)
        new_paths.append((name, out))
    gfa.paths = new_paths


def _merge_duplicate_siblings(gfa: Gfa) -> bool:
    """Merge same-sequence forward children of a common parent."""
    children = _children(gfa)
    merged: dict[str, str] = {}
    for parent, kids in children.items():
        by_seq: dict[str, str] = {}
        for kid in kids:
            if kid in merged or kid == parent:
                continue
            seq = gfa.segments.get(kid)
            if seq is None:
                continue
            keep = by_seq.get(seq)
            if keep is None:
                by_seq[seq] = kid
            elif keep != kid:
                merged[kid] = keep
    if not merged:
        return False
    # Resolve chains.
    def resolve(x: str) -> str:
        while x in merged:
            x = merged[x]
        return x

    new_links = set()
    for a, ar, b, br in gfa.links:
        new_links.add((resolve(a), ar, resolve(b), br))
    gfa.links = sorted(new_links)
    for sid in list(merged):
        gfa.segments.pop(sid, None)
    _rewrite_paths(gfa, {sid: [resolve(sid)] for sid in merged})
    return True


def _reversed_participants(gfa: Gfa) -> set[str]:
    """Nodes appearing with reversed orientation in any link or walk."""
    out: set[str] = set()
    for a, ar, b, br in gfa.links:
        if ar:
            out.add(a)
        if br:
            out.add(b)
    for _name, steps in gfa.paths:
        for sid, rev in steps:
            if rev:
                out.add(sid)
    return out


def _shared_prefix_sweep(gfa: Gfa, next_id: list[int]) -> bool:
    """Split forward children sharing a sequence prefix; the prefix becomes
    one shared node. Batched: one pass collects every applicable
    (parent, group) whose nodes are untouched so far, then applies them
    all in a single link/path rewrite (the old implementation restarted
    the whole scan after each split, capping a round at one split)."""
    children = _children(gfa)
    rev_part = _reversed_participants(gfa)
    incoming: dict[str, int] = {}
    for a, ar, b, br in gfa.links:
        if not br:
            incoming[b] = incoming.get(b, 0) + 1

    actions: list[tuple[str, list[str], int]] = []
    touched: set[str] = set()
    for parent, kids in children.items():
        if parent in touched:
            continue
        kids = [k for k in dict.fromkeys(kids)
                if k in gfa.segments and k != parent]
        if len(kids) < 2:
            continue
        by_first: dict[str, list[str]] = {}
        for k in kids:
            seq = gfa.segments[k]
            if seq:
                by_first.setdefault(seq[0], []).append(k)
        for _first, group in by_first.items():
            # Guards: every member's only forward incoming link is from
            # `parent`, no reversed participation anywhere (its links and
            # walk steps are rewritten forward-only below), untouched this
            # sweep.
            group = [
                k for k in group
                if k not in touched and k not in rev_part
                and incoming.get(k, 0) == 1
            ]
            if len(group) < 2 or parent in group:
                continue
            seqs = [gfa.segments[k] for k in group]
            prefix_len = 0
            while all(
                len(s) > prefix_len and s[prefix_len] == seqs[0][prefix_len]
                for s in seqs
            ):
                prefix_len += 1
            # A member may BE the prefix (rest empty); require prefix>0.
            if prefix_len == 0:
                continue
            actions.append((parent, group, prefix_len))
            touched.update(group)
            touched.add(parent)
    if not actions:
        return False

    mapping: dict[str, list[str]] = {}
    member_parent: dict[str, str] = {}
    add_links: list[tuple[str, bool, str, bool]] = []
    for parent, group, prefix_len in actions:
        prefix = gfa.segments[group[0]][:prefix_len]
        pid = f"n{next_id[0]}"
        next_id[0] += 1
        gfa.segments[pid] = prefix
        add_links.append((parent, False, pid, False))
        for k in group:
            member_parent[k] = parent
            rest = gfa.segments[k][prefix_len:]
            if rest:
                rid = f"n{next_id[0]}"
                next_id[0] += 1
                gfa.segments[rid] = rest
                mapping[k] = [pid, rid]
                add_links.append((pid, False, rid, False))
            else:
                mapping[k] = [pid]

    final_links = set()
    for a, ar, b, br in list(gfa.links) + add_links:
        if b in member_parent and not br:
            # the sole forward incoming = parent link, replaced by
            # parent -> pid
            continue
        if a in mapping and not ar:
            a = mapping[a][-1]
        final_links.add((a, ar, b, br))
    gfa.links = sorted(final_links)
    for k in mapping:
        gfa.segments.pop(k, None)
    _rewrite_paths(gfa, mapping)
    return True


def _reverse_gfa(gfa: Gfa) -> Gfa:
    """Mirror the graph: RC segments, links (a,ar,b,br) -> (b,br,a,ar),
    walks reversed with orientations UNCHANGED. Each mirrored walk spells
    exactly the reverse complement of the original, so a spelling-
    preserving transform applied in the mirror is spelling-preserving in
    the original; applying the mirror twice is the identity. Shared
    suffixes become shared prefixes."""
    out = Gfa(header=gfa.header, walk_names=set(gfa.walk_names))
    out.segments = {sid: _rc(seq) for sid, seq in gfa.segments.items()}
    out.links = sorted({(b, br, a, ar) for a, ar, b, br in gfa.links})
    out.paths = [
        (name, [(sid, rev) for sid, rev in reversed(steps)])
        for name, steps in gfa.paths
    ]
    return out


def _half_sides(gfa: Gfa):
    """Per-node links touching its forward END / forward START side."""
    end: dict[str, list] = {}
    start: dict[str, list] = {}
    for link in gfa.links:
        a, ar, b, br = link
        (start if ar else end).setdefault(a, []).append(link)
        (end if br else start).setdefault(b, []).append(link)
    return end, start


def _unchop(gfa: Gfa) -> bool:
    """Merge unbranched forward chains, path-endpoint aware
    (graph.rs sort 'u' stage / gfaffix post-pass role)."""
    end, start = _half_sides(gfa)

    def forward_succ(a: str) -> str | None:
        ls = end.get(a, [])
        if len(ls) != 1:
            return None
        x, xr, y, yr = ls[0]
        if x == a and not xr and not yr and y != a:
            return y  # a+ -> y+
        if y == a and yr and xr and x != a:
            return x  # (x-,a-) == a+ -> x+
        return None

    def forward_pred_unique(b: str, expect: str) -> bool:
        ls = start.get(b, [])
        if len(ls) != 1:
            return False
        x, xr, y, yr = ls[0]
        if y == b and not yr and not xr:
            return x == expect
        if x == b and xr and yr:
            return y == expect
        return False

    pairs: dict[str, str] = {}
    for a in gfa.segments:
        b = forward_succ(a)
        if b is None or b not in gfa.segments:
            continue
        if forward_pred_unique(b, a):
            pairs[a] = b
    if not pairs:
        return False
    rpairs = {b: a for a, b in pairs.items()}

    # Walk validation: every traversal must cross the pair boundary whole.
    bad: set[str] = set()
    for _name, steps in gfa.paths:
        n = len(steps)
        for i, (sid, rev) in enumerate(steps):
            if sid in pairs and sid not in bad:
                b = pairs[sid]
                if not rev:  # a+ must be followed by b+
                    if i + 1 >= n or steps[i + 1] != (b, False):
                        bad.add(sid)
                else:  # a- must be preceded by b-
                    if i == 0 or steps[i - 1] != (b, True):
                        bad.add(sid)
            if sid in rpairs and rpairs[sid] not in bad:
                a0 = rpairs[sid]
                if not rev:  # b+ must be preceded by a+
                    if i == 0 or steps[i - 1] != (a0, False):
                        bad.add(a0)
                else:  # b- must be followed by a-
                    if i + 1 >= n or steps[i + 1] != (a0, True):
                        bad.add(a0)
    for a in bad:
        pairs.pop(a, None)
    if not pairs:
        return False
    rpairs = {b: a for a, b in pairs.items()}

    # Maximal chains: head = node that is not anyone's successor.
    chains: list[list[str]] = []
    for a in pairs:
        if a in rpairs:
            continue
        chain = [a]
        while chain[-1] in pairs:
            nxt = pairs[chain[-1]]
            if nxt in chain:  # cycle guard
                break
            chain.append(nxt)
        if len(chain) > 1:
            chains.append(chain)
    if not chains:
        return False

    head_of: dict[str, list[str]] = {c[0]: c for c in chains}
    tail_of: dict[str, list[str]] = {c[-1]: c for c in chains}
    inner: set[str] = set()
    for c in chains:
        inner.update(c[1:])

    for c in chains:
        gfa.segments[c[0]] = "".join(gfa.segments[s] for s in c)
    for s in inner:
        gfa.segments.pop(s, None)

    chain_edges = set()
    for c in chains:
        for x, y in zip(c, c[1:]):
            chain_edges.add((x, False, y, False))
            chain_edges.add((y, True, x, True))
    new_links = set()
    for a, ar, b, br in gfa.links:
        if (a, ar, b, br) in chain_edges:
            continue
        # End-side references to a chain tail move to the head node.
        if a in tail_of and not ar:
            a = tail_of[a][0]
        elif a in inner or (a in tail_of and ar):
            # inner nodes have no external links; a tail's start side only
            # carries the chain edge — both already excluded above.
            pass
        if b in tail_of and br:
            b = tail_of[b][0]
        new_links.add((a, ar, b, br))
    gfa.links = sorted(new_links)

    new_paths = []
    for name, steps in gfa.paths:
        out = []
        i = 0
        n = len(steps)
        while i < n:
            sid, rev = steps[i]
            if not rev and sid in head_of:
                out.append((sid, False))
                i += len(head_of[sid])
            elif rev and sid in tail_of:
                c = tail_of[sid]
                out.append((c[0], True))
                i += len(c)
            else:
                out.append((sid, rev))
                i += 1
        new_paths.append((name, out))
    gfa.paths = new_paths
    return True


def normalize_gfa(
    gfa_text: str, max_rounds: int = 200, pre_groom: bool = True
) -> str:
    gfa = Gfa.parse(gfa_text)
    if pre_groom:
        # Groom first (spelling-preserving majority-orientation flips):
        # many mixed-orientation links become forward-forward, extending
        # the reach of the forward-only affix collapse below.
        from impg_tpu.graph.sortgfa import groom

        gfa = groom(gfa)
    next_id = [
        max(
            (int(s[1:]) for s in gfa.segments
             if s.startswith("n") and s[1:].isdigit()),
            default=0,
        )
        + 1000000
    ]
    for _ in range(max_rounds):
        changed = _merge_duplicate_siblings(gfa)
        changed |= _shared_prefix_sweep(gfa, next_id)
        # Suffix side: reverse, prefix-sweep, reverse back.
        rev = _reverse_gfa(gfa)
        rchanged = _merge_duplicate_siblings(rev)
        rchanged |= _shared_prefix_sweep(rev, next_id)
        if rchanged:
            gfa = _reverse_gfa(rev)
            changed = True
        changed |= _unchop(gfa)
        if not changed:
            break
    return gfa.write()
