"""GFA-segment genotyping (reference: commands/genotype.rs:1510
build_graph_candidate_for_path / :1563 collect_graph_candidates / :1625
sample_weights_for_graph — feature space 'gfa-segment': features are graph
segments, candidates are path walks, the sample vector is per-segment read
coverage).

Sample coverage comes from syncmer-mapping reads against segment sequences
(the gafpack/graph-pack role): each read votes once per distinct segment
its syncmers land in.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from impg_tpu.genotype import core
from impg_tpu.graph.gfa import Gfa


@dataclass
class GraphCandidate:
    path_name: str
    start: int
    end: int
    anchors: int  # steps overlapping the interval
    span_fraction: float
    features: list[tuple[int, float]]  # (segment ordinal, weight)


def segment_ordinals(gfa: Gfa) -> dict[str, int]:
    return {sid: i for i, sid in enumerate(gfa.segments)}


def map_reads_to_graph(
    gfa: Gfa, read_files: list[str]
) -> tuple[dict[int, float], int, int]:
    """Per-segment coverage (covered bp) from syncmer-mapping reads against
    PATH walk sequences, projected onto the segments the mapped span
    overlaps — small variant nodes (SNP-sized, too short to carry syncmers
    themselves) still accrue coverage through their enclosing walk
    (the gafpack per-node-coverage role)."""
    from impg_tpu.io.fasta import reverse_complement
    from impg_tpu.ops import syncmer as sm
    from impg_tpu.syng.index import SyngIndex
    from impg_tpu.syng.pack import read_sequences

    ords = segment_ordinals(gfa)
    walks: dict[str, bytes] = {}
    step_tables: dict[str, list[tuple[int, int, int]]] = {}  # (s, e, fid)
    for name, steps in gfa.paths:
        at = 0
        seq_parts = []
        table = []
        for sid, rev in steps:
            s = gfa.segments[sid].encode()
            seq_parts.append(reverse_complement(s) if rev else s)
            table.append((at, at + len(s), ords[sid]))
            at += len(s)
        walks[name] = b"".join(seq_parts)
        step_tables[name] = table
    idx = SyngIndex.build(list(walks.items()))

    counts: dict[int, float] = {}
    n_reads = 0
    n_matched = 0
    k = idx.syncmer_len
    for path in read_files:
        for _name, seq in read_sequences(path):
            n_reads += 1
            _pos, ids, _fwd = sm.extract_syncmers(seq, idx.k, idx.w, idx.seed)
            if not ids.size:
                continue
            uniq = np.unique(ids)
            lo = np.searchsorted(idx.occ_ids, uniq, side="left")
            hi = np.searchsorted(idx.occ_ids, uniq, side="right")
            # Best path = most matched seeds; span = matched extent there.
            per_path: dict[int, list[int]] = {}
            for a, b in zip(lo, hi):
                for s, p in zip(idx.occ_seq[a:b], idx.occ_pos[a:b]):
                    per_path.setdefault(int(s), []).append(int(p))
            if not per_path:
                continue
            n_matched += 1
            best = max(per_path, key=lambda s: len(per_path[s]))
            positions = per_path[best]
            span_s, span_e = min(positions), max(positions) + k
            pname = idx.seq_index.get_name(best)
            for s0, s1, fid in step_tables[pname]:
                o = min(span_e, s1) - max(span_s, s0)
                if o > 0:
                    counts[fid] = counts.get(fid, 0.0) + float(o)
    return counts, n_reads, n_matched


def collect_graph_candidates(
    gfa: Gfa,
    target_path: str | None = None,
    contribution_model: str = "length-normalized",
) -> tuple[list[GraphCandidate], str]:
    """One candidate per path over the target interval (whole paths when no
    target is given).  Weights: raw step counts, or overlap_bp/segment_len
    (genotype.rs GraphContributionModel)."""
    ords = segment_ordinals(gfa)
    seg_len = {sid: max(len(s), 1) for sid, s in gfa.segments.items()}
    path_lens = {
        name: sum(seg_len.get(sid, 0) for sid, _ in steps)
        for name, steps in gfa.paths
    }
    target_name = None
    interval = None
    if target_path:
        # Literal path names win: GFA 1.1 W-line imports are named
        # 'sample#hap#chr:start-end', so a ':N-M' suffix may be part of
        # the path's own name rather than a sub-interval.
        if target_path in path_lens:
            target_name = target_path
        elif ":" in target_path and "-" in target_path.rsplit(":", 1)[1]:
            target_name, rng = target_path.rsplit(":", 1)
            s, _, e = rng.partition("-")
            try:
                interval = (int(s), int(e))
            except ValueError:
                raise ValueError(
                    f"target '{target_path}' is neither a path name in the "
                    f"graph nor NAME:START-END"
                ) from None
            if interval[0] >= interval[1]:
                raise ValueError(
                    f"target interval '{target_path}' is empty or inverted"
                )
        else:
            target_name = target_path
        if target_name not in path_lens:
            raise ValueError(
                f"target path '{target_name}' is not present in graph"
            )
        if interval and interval[1] > path_lens[target_name]:
            raise ValueError(
                f"target interval '{target_path}' exceeds path length "
                f"{path_lens[target_name]}"
            )
    target_span = (interval[1] - interval[0]) if interval else 0

    out: list[GraphCandidate] = []
    for name, steps in gfa.paths:
        start, end = (
            (min(interval[0], path_lens[name]), min(interval[1], path_lens[name]))
            if interval
            else (0, path_lens[name])
        )
        if end <= start:
            continue
        raw: dict[int, float] = {}
        scoring: dict[int, float] = {}
        anchors = 0
        covered = 0
        at = 0
        for sid, _ in steps:
            L = seg_len.get(sid, 0)
            s0, s1 = at, at + L
            at += L
            o0, o1 = max(start, s0), min(end, s1)
            if o1 <= o0:
                continue
            anchors += 1
            covered += o1 - o0
            fid = ords[sid]
            raw[fid] = raw.get(fid, 0.0) + 1.0
            w = (
                1.0
                if contribution_model == "raw"
                else (o1 - o0) / seg_len[sid]
            )
            scoring[fid] = scoring.get(fid, 0.0) + w
        if not raw:
            continue
        span_fraction = (
            1.0 if target_span == 0 else min(covered, target_span) / target_span
        )
        out.append(
            GraphCandidate(
                path_name=name,
                start=start,
                end=end,
                anchors=anchors,
                span_fraction=span_fraction,
                features=sorted(scoring.items()),
            )
        )
    out.sort(key=lambda c: (c.path_name, c.start, c.end))
    region = (
        f"{target_name}:{interval[0]}-{interval[1]}"
        if target_name and interval
        else (target_name or "all-graph-paths")
    )
    return out, region


def genotype_graph(
    gfa_text: str,
    read_files: list[str],
    target_path: str | None = None,
    ploidy: int = 2,
    contribution_model: str = "length-normalized",
    sample_counts: dict[int, float] | None = None,
    device: bool | None = False,
    top_n: int | None = None,
) -> tuple[list[GraphCandidate], list, str]:
    """(candidates, ranked combination scores, region label).

    `device` follows the genotype_cos tri-state: True = MXU Gram +
    on-device top-k, None = auto (measured crossover,
    core.auto_device_for_dense), False = sparse host search."""
    gfa = Gfa.parse(gfa_text)
    candidates, region = collect_graph_candidates(
        gfa, target_path, contribution_model
    )
    if sample_counts is None:
        sample_counts, _, _ = map_reads_to_graph(gfa, read_files)
    if contribution_model == "length-normalized":
        ords = segment_ordinals(gfa)
        lens = {ords[sid]: max(len(s), 1) for sid, s in gfa.segments.items()}
        sample_counts = {
            f: c / lens.get(f, 1) for f, c in sample_counts.items()
        }
    feats = [c.features for c in candidates]
    universe = core.feature_universe(feats)
    if device is None:
        device = ploidy == 2 and core.auto_device_for_dense(
            len(feats), len(universe)
        )
    if device and ploidy == 2 and feats:
        feat_pos = {int(f): i for i, f in enumerate(universe)}
        dense = np.zeros((len(feats), len(universe)), np.float64)
        for ci, fl in enumerate(feats):
            for fid, cnt in fl:
                dense[ci, feat_pos[int(fid)]] += float(cnt)
        sample_vec = np.zeros(len(universe), np.float64)
        for f, c in sample_counts.items():
            i = feat_pos.get(int(f))
            if i is not None:
                sample_vec[i] = float(c)
        k = top_n if top_n is not None else len(feats) * (len(feats) + 1) // 2
        results = core.run_diploid_topk(dense, sample_vec, k, device=True)
        return candidates, results, region
    norm_sq = core.sample_norm_sq_for_features(sample_counts, universe)
    results = core.run_cosine_combination_search(
        feats, sample_counts, norm_sq, ploidy
    )
    return candidates, results, region


def map_reads_gaf(gfa: Gfa, read_files: list[str]):
    """Yield GAF rows for reads mapped onto graph path walks
    (projection/converter.rs gaf-to-gfa contract: standard GAF columns,
    `>seg<seg` walk syntax).  Mapping = syncmer anchors on path walk
    sequences; the walk column lists the steps the mapped span overlaps."""
    from impg_tpu.io.fasta import reverse_complement
    from impg_tpu.ops import syncmer as sm
    from impg_tpu.syng.index import SyngIndex
    from impg_tpu.syng.pack import read_sequences

    walks: dict[str, bytes] = {}
    step_tables: dict[str, list[tuple[int, int, str, bool]]] = {}
    path_lens: dict[str, int] = {}
    for name, steps in gfa.paths:
        at = 0
        seq_parts = []
        table = []
        for sid, rev in steps:
            s = gfa.segments[sid].encode()
            seq_parts.append(reverse_complement(s) if rev else s)
            table.append((at, at + len(s), sid, rev))
            at += len(s)
        walks[name] = b"".join(seq_parts)
        step_tables[name] = table
        path_lens[name] = at
    idx = SyngIndex.build(list(walks.items()))
    k = idx.syncmer_len

    for path in read_files:
        for rname, seq in read_sequences(path):
            _pos, ids, fwd = sm.extract_syncmers(seq, idx.k, idx.w, idx.seed)
            if not ids.size:
                continue
            uniq, inv = np.unique(ids, return_inverse=True)
            lo = np.searchsorted(idx.occ_ids, uniq, side="left")
            hi = np.searchsorted(idx.occ_ids, uniq, side="right")
            per_path: dict[int, list[tuple[int, int, bool]]] = {}
            for ui in range(uniq.size):
                read_hits = np.nonzero(inv == ui)[0]
                for a in range(int(lo[ui]), int(hi[ui])):
                    s = int(idx.occ_seq[a])
                    for ri in read_hits:
                        per_path.setdefault(s, []).append(
                            (
                                int(idx.occ_pos[a]),
                                int(_pos[ri]),
                                bool(idx.occ_fwd[a]) == bool(fwd[ri]),
                            )
                        )
            if not per_path:
                continue
            best = max(per_path, key=lambda s: len(per_path[s]))
            anchors = per_path[best]
            t_pos = [a[0] for a in anchors]
            q_pos = [a[1] for a in anchors]
            same = sum(1 for a in anchors if a[2])
            rel_fwd = same * 2 >= len(anchors)
            span_s, span_e = min(t_pos), max(t_pos) + k
            q_s, q_e = min(q_pos), max(q_pos) + k
            pname = idx.seq_index.get_name(best)
            # GAF cols 7-9 are relative to the path in col 6 — the listed
            # walk, not the containing P line (GAF spec; the reference's
            # converter.rs:330 enforces path_end <= walk length).
            walk_col = ""
            walk0 = None
            walk1 = 0
            for s0, s1, sid, rev in step_tables[pname]:
                if min(span_e, s1) - max(span_s, s0) > 0:
                    walk_col += ("<" if rev else ">") + sid
                    if walk0 is None:
                        walk0 = s0
                    walk1 = s1
            if walk0 is None:
                continue
            matches = min(len(anchors) * k, span_e - span_s)
            yield (
                f"{rname}\t{len(seq)}\t{q_s}\t{q_e}\t"
                f"{'+' if rel_fwd else '-'}\t{walk_col}\t"
                f"{walk1 - walk0}\t{span_s - walk0}\t{span_e - walk0}\t"
                f"{matches}\t{span_e - span_s}\t60"
            )


def surject_gaf_to_paf(gfa: Gfa, gaf_rows):
    """Surject graph-mapping GAF rows onto source sequence coordinates
    (reference: the GAF->reference projection role).  Path names of the
    form `name:start-end` (region graphs, render bundles) carry their
    source frame; path-frame positions shift by `start`.  Rows whose path
    name has no source range surject onto the path name at offset 0."""
    import re

    from impg_tpu.graph.lace import split_path_name

    # Per path: ordered steps with their start offsets, so a GAF row's
    # listed walk (GAF cols 7-9 are walk-relative) can be located as a
    # contiguous step run and shifted back into the path frame.
    path_steps: dict[str, list[tuple[str, bool, int]]] = {}
    path_lens: dict[str, int] = {}
    seg_paths: dict[str, list[str]] = {}
    for name, steps in gfa.paths:
        at = 0
        table = []
        for sid, rev in steps:
            table.append((sid, rev, at))
            at += len(gfa.segments[sid])
        path_steps[name] = table
        path_lens[name] = at
        for sid, _ in steps:
            seg_paths.setdefault(sid, []).append(name)

    def _match_run(walk) -> tuple[str, int] | None:
        for pname in seg_paths.get(walk[0][0], []):
            table = path_steps[pname]
            n = len(walk)
            for i in range(len(table) - n + 1):
                if all(
                    table[i + j][0] == walk[j][0]
                    and table[i + j][1] == walk[j][1]
                    for j in range(n)
                ):
                    return pname, table[i][2]
        return None

    def locate_walk(walk) -> tuple[str, int, bool] | None:
        """(path name, walk start offset in path, reverse) for the first
        path whose step list contains the walk — or its reverse
        complement (a read traversing >A>B backwards writes '<B<A') —
        as a contiguous oriented run."""
        hit = _match_run(walk)
        if hit is not None:
            return (*hit, False)
        rc = [(sid, not rev) for sid, rev in reversed(walk)]
        hit = _match_run(rc)
        if hit is not None:
            return (*hit, True)
        return None

    for row in gaf_rows:
        f = row.split("\t")
        walk = [
            (tok[1:], tok[0] == "<")
            for tok in re.findall(r"[<>][^<>]+", f[5])
        ]
        if not walk:
            continue
        hit = locate_walk(walk)
        if hit is None:
            continue
        pname, walk0, rc_hit = hit
        parsed = split_path_name(pname)
        if parsed:
            src, base, src_end = parsed
            tlen = src_end  # lower bound; true source length is unknown here
        else:
            src, base, tlen = pname, 0, path_lens[pname]
        ps, pe = int(f[7]), int(f[8])
        strand = f[4]
        if rc_hit:
            walk_bp = sum(
                len(gfa.segments.get(sid, "")) for sid, _ in walk
            )
            ps, pe = walk_bp - pe, walk_bp - ps
            strand = "-" if strand == "+" else "+"
        yield (
            f"{f[0]}\t{f[1]}\t{f[2]}\t{f[3]}\t{strand}\t"
            f"{src}\t{tlen}\t{base + walk0 + ps}\t{base + walk0 + pe}\t"
            f"{f[9]}\t{f[10]}\t{f[11]}"
        )
