"""GFA normalization: shared-affix collapse (reference: gfaffix via
graph.rs:994 run_gfaffix / normalize_and_sort).

Walk-preserving simplifications, iterated to fixpoint:
  1. duplicate siblings: children of the same oriented parent with identical
     sequence merge into one node;
  2. shared prefixes: children of the same oriented parent that share a
     common sequence prefix are split so the prefix becomes one shared node
     (the GFAffix "shared prefix decomposition");
  3. unchop: unbranched chains merge (path-endpoint aware).

All path walks re-spell the exact same bases (tested invariant).

Note: operates on forward-orientation links only; mixed-orientation
bubbles are left untouched (conservative subset of gfaffix).
"""

from __future__ import annotations

from impg_tpu.graph.gfa import Gfa


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


def _shared_prefix_split(gfa: Gfa, next_id: list[int]) -> bool:
    """Split forward children sharing a sequence prefix; the prefix becomes
    one shared node."""
    children = _children(gfa)
    changed = False
    for parent, kids in list(children.items()):
        kids = [k for k in dict.fromkeys(kids) if k in gfa.segments and k != parent]
        if len(kids) < 2:
            continue
        # Group by first base.
        by_first: dict[str, list[str]] = {}
        for k in kids:
            seq = gfa.segments[k]
            if seq:
                by_first.setdefault(seq[0], []).append(k)
        for first, group in by_first.items():
            if len(group) < 2:
                continue
            seqs = [gfa.segments[k] for k in group]
            prefix_len = 0
            while all(
                len(s) > prefix_len and s[prefix_len] == seqs[0][prefix_len]
                for s in seqs
            ):
                prefix_len += 1
            if prefix_len == 0:
                continue
            # Whole-node == prefix cases can't split below; require every
            # member to be splittable or identical to the prefix.
            prefix = seqs[0][:prefix_len]
            pid = f"n{next_id[0]}"
            next_id[0] += 1
            gfa.segments[pid] = prefix
            mapping: dict[str, list[str]] = {}
            new_links = set(gfa.links)
            # parent -> prefix node
            new_links = {
                l for l in new_links
                if not (l[0] == parent and not l[1] and l[2] in group and not l[3])
            }
            new_links.add((parent, False, pid, False))
            for k in group:
                seq = gfa.segments[k]
                rest = seq[prefix_len:]
                if rest:
                    rid = f"n{next_id[0]}"
                    next_id[0] += 1
                    gfa.segments[rid] = rest
                    mapping[k] = [pid, rid]
                    new_links.add((pid, False, rid, False))
                    # k's outgoing links move to rid; incoming (other than
                    # from parent) stay pointing at k -- conservative: only
                    # split when k has no other incoming links.
                else:
                    mapping[k] = [pid]
            # Conservative guard: only apply if every group member's ONLY
    # incoming forward link is from `parent` and orientation use is forward
    # in all paths.
            ok = True
            incoming: dict[str, int] = {}
            for a, ar, b, br in gfa.links:
                if not br:
                    incoming[b] = incoming.get(b, 0) + 1
            for k in group:
                if incoming.get(k, 0) != 1:
                    ok = False
            for name, steps in gfa.paths:
                for sid, rev in steps:
                    if sid in group and rev:
                        ok = False
            if not ok:
                # Roll back the prefix node.
                gfa.segments.pop(pid, None)
                for k in group:
                    for r in mapping.get(k, []):
                        if r != pid and r.startswith("n"):
                            gfa.segments.pop(r, None)
                continue
            # Move k's outgoing links to its remainder (or prefix) node.
            final_links = set()
            for a, ar, b, br in new_links:
                if a in group and not ar:
                    a = mapping[a][-1]
                if b in group and not br:
                    continue  # replaced by parent->pid above
                final_links.add((a, ar, b, br))
            gfa.links = sorted(final_links)
            for k in group:
                gfa.segments.pop(k, None)
            _rewrite_paths(gfa, mapping)
            changed = True
            return True  # restart scan after a structural change
    return changed


def normalize_gfa(
    gfa_text: str, max_rounds: int = 50, pre_groom: bool = True
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
            (int(s[1:]) for s in gfa.segments if s.startswith("n") and s[1:].isdigit()),
            default=0,
        )
        + 1000000
    ]
    for _ in range(max_rounds):
        changed = _merge_duplicate_siblings(gfa)
        changed |= _shared_prefix_split(gfa, next_id)
        if not changed:
            break
    return gfa.write()
