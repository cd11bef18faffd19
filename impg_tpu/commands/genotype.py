"""Cosine genotyping over syncmer features (reference: commands/genotype.rs
`run_syng_cosigt`, docs/genotype-architecture.md).

Candidates are the haplotypes homologous to a reference-path range (found
through the syng anchor index, or given explicitly); each candidate's
feature vector counts the syncmer ids inside its homologous interval.  The
sample evidence is a pack (read-derived counts over the same feature space).
Ploidy combinations are ranked by cosine similarity (genotype core).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from impg_tpu.genotype import core as gt_core
from impg_tpu.syng.index import SyngIndex
from impg_tpu.syng.pack import Pack


@dataclass
class Candidate:
    name: str  # "genome:start-end"
    genome: str
    start: int
    end: int
    features: list[tuple[int, int]]  # (syncmer id, count)


def candidate_features(
    index: SyngIndex, genome: str, start: int, end: int
) -> list[tuple[int, int]]:
    """Per-candidate count vector: syncmer ids within the interval."""
    _pos, ids, _fwd = index.region_syncmers(genome, start, end)
    uniq, counts = np.unique(ids, return_counts=True)
    return list(zip(uniq.tolist(), counts.tolist()))


def find_candidates(
    index: SyngIndex,
    target_name: str,
    start: int,
    end: int,
    merge_gap: int = 10_000,
    min_anchors: int = 2,
    mode: str = "overlapping",
) -> list[Candidate]:
    """Candidate haplotype intervals for the target range: the target region
    itself plus every homologous interval (CandidateMode genotype.rs:15;
    `spanning` keeps only candidates covering most of the query span)."""
    cands = [
        Candidate(
            name=f"{target_name}:{start}-{end}",
            genome=target_name,
            start=start,
            end=end,
            features=candidate_features(index, target_name, start, end),
        )
    ]
    span = end - start
    best_per_genome: dict[str, tuple[int, int, int]] = {}
    for iv in index.query_region(
        target_name, start, end, merge_gap=merge_gap, min_anchors=min_anchors
    ):
        if iv.genome == target_name:
            continue
        cur = best_per_genome.get(iv.genome)
        if cur is None or (iv.end - iv.start) > (cur[1] - cur[0]):
            best_per_genome[iv.genome] = (iv.start, iv.end, iv.n_anchors)
    for genome in sorted(best_per_genome):
        s, e, _ = best_per_genome[genome]
        if mode == "spanning" and (e - s) < 0.5 * span:
            continue
        cands.append(
            Candidate(
                name=f"{genome}:{s}-{e}",
                genome=genome,
                start=s,
                end=e,
                features=candidate_features(index, genome, s, e),
            )
        )
    return cands


def genotype_cos(
    index: SyngIndex,
    pack: Pack,
    target_name: str,
    start: int,
    end: int,
    ploidy: int = 2,
    top_n: int = 10,
    max_combinations: int = 1_000_000,
    mode: str = "overlapping",
    device: bool | None = False,
):
    """Rank ploidy combinations of candidate haplotypes against the pack.

    `device=True` (--compute-engine device/mesh) scores ploidy-2
    combinations as one jitted Gram matmul + on-device top-k over
    densified candidate vectors (genotype/core.run_diploid_topk) — the
    MXU path of SURVEY §7 step 11.  `device=None` (--compute-engine
    auto) routes to the accelerator exactly when the measured crossover
    says it wins end-to-end (core.auto_device_for_dense).  Other
    ploidies stay on the sparse host search (reference
    genotyping.rs:334 run_cosine_combination_search)."""
    candidates, multi = genotype_cos_multi(
        index, [("sample", pack)], target_name, start, end,
        ploidy=ploidy, top_n=top_n, max_combinations=max_combinations,
        mode=mode, device=device,
    )
    return candidates, (multi[0][1] if multi else [])


def genotype_cos_multi(
    index: SyngIndex,
    packs: list,
    target_name: str,
    start: int,
    end: int,
    ploidy: int = 2,
    top_n: int = 10,
    max_combinations: int = 1_000_000,
    mode: str = "overlapping",
    device: bool | None = False,
):
    """Cohort scoring: one candidate panel, many (name, Pack) samples.

    Extension beyond the reference (genotype.rs scores one sample per
    run): the candidate set, feature universe, and dense matrix build
    once; with the device active the panel uploads ONCE
    (genotype/core.DiploidPanel) and each sample costs a single jitted
    Gram/top-k step (~0.15 s at 4096 x 131k vs ~10 s host BLAS — bench
    detail.genotype_e2e.device_win_panel).  `device=None` (auto) routes
    using the cohort's total FLOPs so the upload amortization is priced
    in.  Returns (candidates, [(name, results), ...])."""
    candidates = find_candidates(index, target_name, start, end, mode=mode)
    if not candidates:
        return [], []
    universe = gt_core.feature_universe([c.features for c in candidates])
    uni_arr = np.asarray(universe, np.uint64)
    n = len(candidates)
    if device is None:  # --compute-engine auto: measured-crossover routing
        device = ploidy == 2 and gt_core.auto_device_for_dense(
            n, len(universe), n_samples=len(packs)
        )
    # Dense ploidy-2 scoring (host BLAS or MXU): one Gram matmul + top-k
    # instead of the per-combination sparse walk.  The sparse search
    # stays for small candidate sets (object cost negligible, exact
    # integer arithmetic) and for ploidy != 2.
    use_dense = ploidy == 2 and (device or n >= 64)
    if use_dense:
        if n * (n + 1) // 2 > max_combinations:
            raise ValueError(
                f"genotype combination search exceeded --max-combinations "
                f"({max_combinations})"
            )
        feat_pos = {int(f): i for i, f in enumerate(universe)}
        dense = np.zeros((n, len(universe)), np.float64)
        for ci, cand in enumerate(candidates):
            for fid, count in cand.features:
                dense[ci, feat_pos[int(fid)]] += float(count)
        panel = gt_core.DiploidPanel(dense) if device else None
        multi = []
        for name, pack in packs:
            vec = pack.counts_for(uni_arr).astype(np.float64)
            if panel is not None:
                multi.append((name, panel.top_k(vec, top_n)))
            else:
                multi.append((
                    name,
                    gt_core.run_diploid_topk(
                        dense, vec, top_n, device=False
                    ),
                ))
        return candidates, multi
    feats = [c.features for c in candidates]
    multi = []
    for name, pack in packs:
        sample_counts_arr = pack.counts_for(uni_arr)
        sample_counts = {
            int(f): int(c) for f, c in zip(universe, sample_counts_arr)
        }
        norm_sq = gt_core.sample_norm_sq_for_features(
            sample_counts, universe
        )
        results = gt_core.run_cosine_combination_search(
            feats, sample_counts, norm_sq, ploidy, max_combinations
        )
        multi.append((name, results[:top_n]))
    return candidates, multi


def write_genotype_report(
    out, region: str, candidates, results, sample_name: str = "sample",
    header: bool = True,
) -> None:
    """TSV report: rank, haplotype combination, cosine, qv (genotype.rs:550).

    `header=False` suppresses the column header so cohort reports
    (genotype_cos_multi) concatenate into one valid TSV."""
    if header:
        out.write(
            "#sample\tregion\trank\tgenotype\tcosine.similarity\tqv\tdot"
            "\tsample.norm\tgenotype.norm\n"
        )
    for rank, score in enumerate(results, 1):
        combo_names = "|".join(
            candidates[i].name for i in score.combination
        )
        out.write(
            f"{sample_name}\t{region}\t{rank}\t{combo_names}"
            f"\t{score.similarity:.6f}\t{score.qv:.2f}\t{score.dot:.1f}"
            f"\t{score.sample_norm:.3f}\t{score.genotype_norm:.3f}\n"
        )
