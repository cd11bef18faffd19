"""Genotyping core (reference: genotyping.rs)."""

import math
import random

import numpy as np
import pytest

from impg_tpu.genotype import core


def test_cosine_identical_vectors():
    cand = [[(0, 5), (1, 3)]]
    sample = {0: 5, 1: 3}
    universe = core.feature_universe(cand)
    norm_sq = core.sample_norm_sq_for_features(sample, universe)
    assert core.cosine_for_feature_counts(cand[0], sample, norm_sq) == pytest.approx(1.0)


def test_combination_search_recovers_diploid_truth():
    # Three haplotype candidates over 6 features; sample = hap0 + hap2.
    h0 = [(0, 4), (1, 4), (2, 4)]
    h1 = [(1, 4), (3, 4), (4, 4)]
    h2 = [(2, 4), (4, 4), (5, 4)]
    cands = [h0, h1, h2]
    sample = {}
    for f, c in h0 + h2:
        sample[f] = sample.get(f, 0) + c
    universe = core.feature_universe(cands)
    norm_sq = core.sample_norm_sq_for_features(sample, universe)
    results = core.run_cosine_combination_search(cands, sample, norm_sq, 2)
    assert results[0].combination == [0, 2]
    assert results[0].similarity == pytest.approx(1.0)
    # Floating-point: similarity lands a hair under 1.0, so qv is finite but
    # very high (same f64 behavior as the reference).
    assert results[0].qv > 100.0
    # All combinations enumerated: C(3+1, 2) = 6 multisets.
    assert len(results) == 6
    # Sorted descending.
    sims = [r.similarity for r in results]
    assert sims == sorted(sims, reverse=True)


def test_combination_limit():
    cands = [[(i, 1)] for i in range(30)]
    sample = {0: 1}
    with pytest.raises(ValueError, match="max-combinations"):
        core.run_cosine_combination_search(cands, sample, 1.0, 2, max_combinations=10)


def test_qv():
    assert core.qv_from_similarity(1.0) == 999.0
    assert core.qv_from_similarity(0.0) == 0.0
    assert core.qv_from_similarity(0.9) == pytest.approx(10.0)
    assert core.qv_from_similarity(0.99) == pytest.approx(20.0)


def test_dense_matches_sparse():
    rng = np.random.default_rng(8)
    n, d = 6, 40
    counts = rng.integers(0, 10, size=(n, d)).astype(np.float64)
    sample_vec = rng.integers(0, 20, size=d).astype(np.float64)
    cands_sparse = [
        [(j, counts[i, j]) for j in range(d) if counts[i, j] > 0]
        for i in range(n)
    ]
    sample = {j: sample_vec[j] for j in range(d) if sample_vec[j] > 0}
    universe = core.feature_universe(cands_sparse)
    norm_sq = core.sample_norm_sq_for_features(sample, universe)
    sparse = core.run_cosine_combination_search(cands_sparse, sample, norm_sq, 2)
    dense = core.run_diploid_search_dense(counts, sample_vec)
    assert len(sparse) == len(dense)
    for a, b in zip(sparse, dense):
        assert a.combination == b.combination
        assert a.similarity == pytest.approx(b.similarity, rel=1e-9)
        assert a.dot == pytest.approx(b.dot, rel=1e-9)


def test_diploid_topk_matches_dense_search():
    """run_diploid_topk (host and device paths) returns exactly the head
    of the full dense search under the reference comparator."""
    rng = np.random.default_rng(9)
    n, d = 40, 120
    counts = rng.integers(0, 8, size=(n, d)).astype(np.float64)
    # Duplicate rows to force score ties at the boundary.
    counts[7] = counts[3]
    counts[19] = counts[3]
    sample_vec = rng.integers(0, 16, size=d).astype(np.float64)
    full = core.run_diploid_search_dense(counts, sample_vec)
    for device in (False, True):
        for k in (1, 5, 25):
            topk = core.run_diploid_topk(
                counts, sample_vec, k, device=device
            )
            assert len(topk) == k
            for a, b in zip(full[:k], topk):
                assert a.combination == b.combination, (device, k)
                rel = 1e-9 if not device else 5e-5
                assert b.similarity == pytest.approx(a.similarity, rel=rel)
                assert b.dot == pytest.approx(a.dot, rel=rel)


def test_diploid_panel_multi_sample_parity():
    """DiploidPanel: one upload, many samples — each sample's top-k must
    equal its independent host run; the narrow-dtype upload (uint8 here)
    must not change results."""
    rng = np.random.default_rng(12)
    n, d = 48, 160
    counts = rng.integers(0, 4, size=(n, d)).astype(np.float64)
    panel = core.DiploidPanel(counts)
    for seed in (1, 2, 3):
        r2 = np.random.default_rng(seed)
        sample_vec = (
            counts[seed] + counts[2 * seed]
            + r2.integers(0, 2, size=d)
        ).astype(np.float64)
        host = core.run_diploid_topk(counts, sample_vec, 7, device=False)
        dev = panel.top_k(sample_vec, 7)
        assert [c.combination for c in dev] == [
            c.combination for c in host
        ]
        for a, b in zip(host, dev):
            assert b.similarity == pytest.approx(a.similarity, rel=5e-5)


def test_narrowest_upload_dtype():
    f = core._narrowest_upload_dtype
    assert f(np.zeros((2, 3))) is np.uint8
    assert f(np.full((2, 3), 300.0)) is np.uint16
    assert f(np.full((2, 3), 70000.0)) is np.float32
    assert f(np.array([[1.5]])) is np.float32
    assert f(np.array([[-1.0]])) is np.float32
    assert f(np.array([[5]], np.int64)) is np.uint8
