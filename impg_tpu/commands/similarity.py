"""Per-region sequence similarity over a POA MSA (reference:
commands/similarity.rs).

Pipeline: query region -> merged homologous intervals -> fetch + strand-
normalize sequences -> POA MSA (native engine) -> pairwise/group
jaccard/cosine/dice + estimated identity; optional classical-MDS PCA on the
distance matrix.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from impg_tpu.graph import poa as poa_mod
from impg_tpu.index.impg_index import ImpgIndex
from impg_tpu.io.fasta import UnifiedSequenceIndex, reverse_complement
from impg_tpu.query.engine import Row


@dataclass
class SequenceMetadata:
    """Mirrors graph.rs:15 SequenceMetadata (MAF-frame start for '-')."""

    name: str
    start: int
    size: int
    strand: str
    total_length: int

    def path_name(self) -> str:
        if self.strand == "+":
            fwd_start, fwd_end = self.start, self.start + self.size
        else:
            fwd_start = self.total_length - self.start - self.size
            fwd_end = self.total_length - self.start
        return f"{self.name}:{fwd_start}-{fwd_end}"


def prepare_sequences(
    index: ImpgIndex, rows: list[Row], seq_idx: UnifiedSequenceIndex
) -> list[tuple[bytes, SequenceMetadata]]:
    """Fetch + strand-normalize each interval (graph.rs:485)."""
    out = []
    for row in rows:
        name = index.seq_index.get_name(row.q_id)
        total = index.seq_index.get_len_from_id(row.q_id) or 0
        if row.q_first <= row.q_last:
            start, end, strand = row.q_first, row.q_last, "+"
        else:
            start, end, strand = row.q_last, row.q_first, "-"
        seq = seq_idx.fetch_sequence(name, start, end)
        if strand == "-":
            seq = reverse_complement(seq)
        maf_start = (total - end) if strand == "-" else start
        out.append(
            (
                seq,
                SequenceMetadata(
                    name=name,
                    start=maf_start,
                    size=end - start,
                    strand=strand,
                    total_length=total,
                ),
            )
        )
    return out


@dataclass
class GroupInfo:
    name: str
    sequence_indices: list[int]
    total_length: int


def extract_group_name(path_name: str, delim: str, delim_pos: int) -> str:
    positions = [i for i, ch in enumerate(path_name) if ch == delim]
    target_index = max(delim_pos - 1, 0)
    if target_index < len(positions):
        return path_name[: positions[target_index]]
    return path_name


def create_groups(
    metadata: list[SequenceMetadata],
    delim: Optional[str],
    delim_pos: int,
) -> list[GroupInfo]:
    if delim is not None:
        group_map: dict[str, list[int]] = {}
        for i, meta in enumerate(metadata):
            group_map.setdefault(
                extract_group_name(meta.name, delim, delim_pos), []
            ).append(i)
        return [
            GroupInfo(name, idxs, sum(metadata[i].size for i in idxs))
            for name, idxs in sorted(group_map.items())
        ]
    return [
        GroupInfo(meta.path_name(), [i], meta.size)
        for i, meta in enumerate(metadata)
    ]


def pairwise_intersection(row_a: str, row_b: str) -> int:
    return sum(
        1
        for a, b in zip(row_a, row_b)
        if a != "-" and b != "-" and a == b
    )


def group_intersection(msa: list[str], idx_a: list[int], idx_b: list[int]) -> int:
    """Per-column min(cross-matches, non-gap count A, non-gap count B),
    summed — vectorized as per-symbol column histograms (the per-character
    double loop was the similarity hot path on --delim groups)."""
    if not msa or not idx_a or not idx_b:
        return 0
    gap = ord("-")
    a_mat = np.frombuffer(
        "".join(msa[i] for i in idx_a).encode(), np.uint8
    ).reshape(len(idx_a), -1)
    b_mat = np.frombuffer(
        "".join(msa[i] for i in idx_b).encode(), np.uint8
    ).reshape(len(idx_b), -1)
    vals = np.union1d(np.unique(a_mat), np.unique(b_mat))
    vals = vals[vals != gap]
    matches = np.zeros(a_mat.shape[1], np.int64)
    for v in vals:
        matches += (a_mat == v).sum(0).astype(np.int64) * (
            b_mat == v
        ).sum(0)
    count_a = (a_mat != gap).sum(0)
    count_b = (b_mat != gap).sum(0)
    return int(np.minimum(np.minimum(matches, count_a), count_b).sum())


@dataclass
class SimilarityMetrics:
    jaccard: float
    cosine: float
    dice: float
    estimated_identity: float

    @classmethod
    def new(cls, intersection: int, len_a: int, len_b: int) -> "SimilarityMetrics":
        perfect = len_a == len_b and intersection == len_a
        union = max(len_a + len_b - intersection, 0)
        f32 = np.float32
        jaccard = (
            f32(1.0)
            if perfect
            else (f32(intersection) / f32(union) if union > 0 else f32(0.0))
        )
        cosine = (
            f32(1.0)
            if perfect
            else (
                f32(intersection) / (np.sqrt(f32(len_a)) * np.sqrt(f32(len_b)))
                if len_a > 0 and len_b > 0
                else f32(0.0)
            )
        )
        dice = (
            f32(1.0)
            if perfect
            else (
                f32(2.0) * f32(intersection) / f32(len_a + len_b)
                if (len_a + len_b) > 0
                else f32(0.0)
            )
        )
        est = (
            f32(1.0)
            if perfect
            else (
                f32(2.0) * jaccard / (f32(1.0) + jaccard)
                if jaccard > 0
                else f32(0.0)
            )
        )
        return cls(float(jaccard), float(cosine), float(dice), float(est))

    def by_name(self, name: str) -> float:
        return {
            "jaccard": self.jaccard,
            "cosine": self.cosine,
            "dice": self.dice,
        }.get(name, self.jaccard)


def format_value(value: float) -> str:
    s = f"{np.float32(value):.7f}".rstrip("0").rstrip(".")
    return s if s else "0"


def parse_region_string(region: str) -> tuple[str, str, str]:
    name, sep, rng = region.rpartition(":")
    if sep and "-" in rng:
        start, _, end = rng.partition("-")
        return name, start, end
    return region, "", ""


def compute_similarities_for_region(
    index: ImpgIndex,
    rows: list[Row],
    seq_idx: UnifiedSequenceIndex,
    scoring,
    emit_distances: bool,
    emit_all_pairs: bool,
    delim: Optional[str],
    delim_pos: int,
    region: str,
) -> tuple[str, list[tuple[str, str, SimilarityMetrics]]]:
    pairs = prepare_sequences(index, rows, seq_idx)
    seqs = [p[0] for p in pairs]
    metadata = [p[1] for p in pairs]
    result = poa_mod.poa_align(seqs, scoring)
    msa = result.msa
    groups = create_groups(metadata, delim, delim_pos)
    chrom, start, end = parse_region_string(region)

    out_lines = []
    sims: list[tuple[str, str, SimilarityMetrics]] = []
    for i in range(len(groups)):
        for j in range(i, len(groups)):
            ga, gb = groups[i], groups[j]
            if (
                delim is None
                and len(ga.sequence_indices) == 1
                and len(gb.sequence_indices) == 1
            ):
                inter = pairwise_intersection(
                    msa[ga.sequence_indices[0]], msa[gb.sequence_indices[0]]
                )
            else:
                inter = group_intersection(
                    msa, ga.sequence_indices, gb.sequence_indices
                )
            if inter == 0 and not emit_all_pairs:
                continue
            metrics = SimilarityMetrics.new(inter, ga.total_length, gb.total_length)
            sims.append((ga.name, gb.name, metrics))

            def line(na, nb, la, lb):
                vals = (
                    (
                        1.0 - metrics.jaccard,
                        1.0 - metrics.cosine,
                        1.0 - metrics.dice,
                        1.0 - metrics.estimated_identity,
                    )
                    if emit_distances
                    else (
                        metrics.jaccard,
                        metrics.cosine,
                        metrics.dice,
                        metrics.estimated_identity,
                    )
                )
                return (
                    f"{chrom}\t{start}\t{end}\t{na}\t{nb}\t{la}\t{lb}\t{inter}\t"
                    + "\t".join(format_value(v) for v in vals)
                )

            out_lines.append(line(ga.name, gb.name, ga.total_length, gb.total_length))
            if i != j:
                out_lines.append(
                    line(gb.name, ga.name, gb.total_length, ga.total_length)
                )
    text = "".join(l + "\n" for l in out_lines)
    return text, sims


def similarity_header(emit_distances: bool) -> str:
    tail = (
        "jaccard.distance\tcosine.distance\tdice.distance\testimated.difference.rate"
        if emit_distances
        else "jaccard.similarity\tcosine.similarity\tdice.similarity\testimated.identity"
    )
    return (
        "chrom\tstart\tend\tgroup.a\tgroup.b\tgroup.a.length\tgroup.b.length"
        f"\tintersection\t{tail}"
    )


# ── PCA (classical MDS over the distance matrix, similarity.rs:866) ──


def build_distance_matrix(
    sims: list[tuple[str, str, SimilarityMetrics]], similarity_type: str
) -> tuple[np.ndarray, list[str]]:
    """PARITY NOTE: zero-initialized like the reference's DMatrix::zeros
    (similarity.rs:989) — pairs skipped upstream (zero intersection
    without --all) default to distance 0 there too."""
    labels = sorted({n for a, b, _ in sims for n in (a, b)})
    idx = {name: i for i, name in enumerate(labels)}
    n = len(labels)
    d = np.zeros((n, n), np.float32)
    for a, b, m in sims:
        dist = 1.0 - m.by_name(similarity_type)
        d[idx[a], idx[b]] = dist
        d[idx[b], idx[a]] = dist
    return d, labels


def mds_fit_transform(
    distance_matrix: np.ndarray, n_components: int
) -> tuple[np.ndarray, np.ndarray]:
    """Classical MDS: double-center D^2, eigendecompose, project."""
    n = distance_matrix.shape[0]
    n_components = min(n_components, max(n - 1, 0))
    if n_components == 0:
        raise ValueError("Cannot perform MDS with fewer than 2 samples")
    d2 = (distance_matrix.astype(np.float64)) ** 2
    j = np.eye(n) - np.full((n, n), 1.0 / n)
    b = -0.5 * j @ d2 @ j
    vals, vecs = np.linalg.eigh(b)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    coords = np.zeros((n, n_components))
    kept_vals = []
    col = 0
    for k in range(len(vals)):
        if col >= n_components:
            break
        if vals[k] > 0:
            coords[:, col] = vecs[:, k] * np.sqrt(vals[k])
            kept_vals.append(vals[k])
            col += 1
    return coords, np.asarray(kept_vals)


@dataclass
class PcaResult:
    """PCA coordinates for one region window (similarity.rs PcaResult)."""

    region: str
    labels: list[str]
    coords: np.ndarray  # [n_samples, n_components]


def polarize_adaptive(results: list["PcaResult"], n_prev: int) -> None:
    """Adaptive sliding-window sign polarization, in place (reference:
    similarity.rs:649 polarize_pca_result + the driver loop at :211-220).

    Per PC, each window's sign anchor ("polarizer") is the sample with the
    largest |value|; the flip decision majority-votes the anchor's sign
    against the last `n_prev` windows that used the same anchor."""
    window: list[tuple[list[int], list[bool]]] = []
    for res in results:
        n_comp = res.coords.shape[1] if res.coords.size else 0
        indices: list[int] = []
        signs: list[bool] = []
        for pc in range(n_comp):
            # COPY, not view: the reference collects pc_values before any
            # flip, so the recorded polarizer sign is evaluated on the
            # PRE-flip value (similarity.rs:659-663) — a live view would
            # see the negated data and record the wrong sign.
            pc_values = res.coords[:, pc].copy()
            # Rust max_by keeps the LAST maximal element on ties.
            cur_idx = 0
            for i in range(len(pc_values)):
                if abs(pc_values[i]) >= abs(pc_values[cur_idx]):
                    cur_idx = i
            # PARITY NOTE: gating history on the OLDEST window's component
            # count mirrors similarity.rs:680 exactly.
            if not window or pc >= len(window[0][0]):
                indices.append(cur_idx)
                signs.append(bool(pc_values[cur_idx] > 0.0))
                continue
            counts: dict[int, int] = {}
            for prev_idx_list, _ in window:
                if pc < len(prev_idx_list):
                    counts[prev_idx_list[pc]] = counts.get(
                        prev_idx_list[pc], 0
                    ) + 1
            most_frequent = max(counts, key=lambda k: (counts[k], -k))
            flip_votes = total_votes = 0
            if cur_idx == most_frequent:
                cur_sign = pc_values[cur_idx] > 0.0
                for prev_idx_list, prev_sign_list in window:
                    if pc < len(prev_idx_list) and prev_idx_list[pc] == cur_idx:
                        if cur_sign != prev_sign_list[pc]:
                            flip_votes += 1
                        total_votes += 1
            elif most_frequent < len(pc_values):
                sign_at_prev = pc_values[most_frequent] > 0.0
                for prev_idx_list, prev_sign_list in window:
                    if (
                        pc < len(prev_idx_list)
                        and prev_idx_list[pc] == most_frequent
                    ):
                        if sign_at_prev != prev_sign_list[pc]:
                            flip_votes += 1
                        total_votes += 1
            if total_votes > 0 and flip_votes > total_votes // 2:
                res.coords[:, pc] *= -1.0
                indices.append(cur_idx)
                signs.append(bool(pc_values[cur_idx] <= 0.0))
            else:
                indices.append(cur_idx)
                signs.append(bool(pc_values[cur_idx] > 0.0))
        window.append((indices, signs))
        if len(window) > n_prev:
            window.pop(0)


def polarize_with_guides(
    results: list["PcaResult"], guide_samples: list[str]
) -> None:
    """Guide-sample polarization, in place (reference: similarity.rs:758
    polarize_pca_result_with_guides): per PC, each guide votes to flip a
    window when its coordinate is closer to the negated previous value;
    positive consensus flips the window."""
    guide_indices: list[list[int | None]] = []
    for guide in guide_samples:
        per_window = [
            res.labels.index(guide) if guide in res.labels else None
            for res in results
        ]
        if all(i is None for i in per_window):
            raise ValueError(
                f"Guide sample '{guide}' not found in any window"
            )
        guide_indices.append(per_window)

    # PARITY NOTE: n_components from window 0 and the window-0-only
    # prev_value seeding mirror similarity.rs polarize_pca_result_with
    # _guides verbatim (a guide absent from window 0 casts no votes
    # there either).
    n_components = results[0].coords.shape[1] if results else 0
    for pc in range(n_components):
        decisions = [[0] * len(results) for _ in guide_samples]
        for gi, per_window in enumerate(guide_indices):
            prev_value: float | None = None
            for wi, res in enumerate(results):
                sample_idx = per_window[wi]
                if wi == 0:
                    if sample_idx is not None and pc < res.coords.shape[1]:
                        prev_value = float(res.coords[sample_idx, pc])
                elif sample_idx is not None and pc < res.coords.shape[1]:
                    cur = float(res.coords[sample_idx, pc])
                    if prev_value is not None:
                        if abs(cur - (-prev_value)) < abs(cur - prev_value):
                            decisions[gi][wi] = 1
                            prev_value = -cur
                        else:
                            decisions[gi][wi] = -1
                            prev_value = cur
        for wi, res in enumerate(results):
            if sum(d[wi] for d in decisions) > 0 and pc < res.coords.shape[1]:
                res.coords[:, pc] *= -1.0
