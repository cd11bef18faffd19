"""Device syng path (ops/syncmer_jax.py + genotype Gram device path):
bit-exact parity with the host pipeline (SURVEY §7 steps 10-11)."""

import os
import random

import numpy as np
import pytest

from impg_tpu.ops import syncmer as s_np
from impg_tpu.ops import syncmer_jax as s_j


def _seq(rng, n, with_n=False):
    alpha = "ACGTN" if with_n else "ACGT"
    return "".join(rng.choice(alpha) for _ in range(n)).encode()


def test_jit_scan_matches_numpy_oracle():
    rng = random.Random(3)
    for n, with_n in ((200, False), (1000, False), (4097, False),
                      (3000, True)):
        seq = _seq(rng, n, with_n)
        p1, i1, f1 = s_np.extract_syncmers_numpy(seq)
        p2, i2, f2 = s_j.extract_syncmers_jax(seq)
        assert np.array_equal(p1, p2), n
        assert np.array_equal(i1, i2), n
        assert np.array_equal(f1, f2), n


def test_jit_scan_padding_is_inert():
    """Padded rows/columns (255 codes) contribute no syncmers, so batch
    shape never changes results."""
    import jax.numpy as jnp

    rng = random.Random(9)
    seq = _seq(rng, 700)
    codes = s_np.encode_bases(seq)
    for pad in (1024, 2048):
        buf = np.full((3, pad), 255, np.uint8)
        buf[1, : codes.size] = codes
        sel, hi, lo, fwd = (
            np.asarray(a)
            for a in s_j.syncmer_scan(jnp.asarray(buf), 8, 55, 7)
        )
        assert not sel[0].any() and not sel[2].any()
        pos = np.nonzero(sel[1])[0]
        p_ref, i_ref, _ = s_np.extract_syncmers_numpy(seq)
        assert np.array_equal(pos, p_ref)


@pytest.fixture(scope="module")
def syng_setup(tmp_path_factory):
    from impg_tpu.syng.index import SyngIndex

    rng = random.Random(21)
    seqs = [(f"g{i}", _seq(rng, 4000)) for i in range(5)]
    idx = SyngIndex.build(seqs)
    tmp = tmp_path_factory.mktemp("sjx")
    reads = str(tmp / "reads.fa")
    base = seqs[0][1].decode()
    with open(reads, "w") as fh:
        for r in range(120):
            s = rng.randrange(0, 3500)
            ln = rng.choice((150, 300, 500))
            fh.write(f">r{r}\n{base[s:s + ln]}\n")
    return idx, reads, tmp


def test_device_map_pack_bit_identical(syng_setup):
    """map_reads_batched (fused extraction + dictionary binary search +
    segment-sum under jit) equals the host pack exactly."""
    from impg_tpu.syng import pack as pack_mod

    idx, reads, _tmp = syng_setup
    pk_h, nr_h, nm_h = pack_mod.map_reads(idx, [reads])
    pk_d, nr_d, nm_d = s_j.map_reads_batched(idx, [reads], batch=32)
    assert (nr_h, nm_h) == (nr_d, nm_d)
    assert np.array_equal(pk_h.feature_ids, pk_d.feature_ids)
    assert np.array_equal(pk_h.counts, pk_d.counts)
    assert nm_h > 0


def test_device_build_extractor_interchangeable(syng_setup):
    """SyngIndex.build(extractor='device') produces the same index arrays
    as the native/numpy extractor."""
    from impg_tpu.syng.index import SyngIndex

    rng = random.Random(4)
    seqs = [(f"s{i}", _seq(rng, 2500)) for i in range(3)]
    a = SyngIndex.build(seqs)
    b = SyngIndex.build(seqs, extractor="device")
    for col in ("occ_ids", "occ_seq", "occ_pos", "occ_fwd"):
        assert np.array_equal(getattr(a, col), getattr(b, col)), col


def test_genotype_gram_device_matches_host_ranking(syng_setup):
    """genotype cos device path (jitted float32 Gram) ranks like the
    sparse float64 host search, with near-equal scores."""
    from impg_tpu.genotype import core as gt_core

    rng = np.random.default_rng(11)
    n, d = 7, 400
    cands = rng.integers(0, 30, (n, d)).astype(np.float64)
    sample = (cands[2] + cands[5] + rng.integers(0, 3, d)).astype(np.float64)
    host = gt_core.run_diploid_search_dense(cands, sample, device=False)
    dev = gt_core.run_diploid_search_dense(cands, sample, device=True)
    assert [c.combination for c in host[:5]] == [
        c.combination for c in dev[:5]
    ]
    assert host[0].combination == [2, 5]
    for h, g in zip(host[:5], dev[:5]):
        assert abs(h.similarity - g.similarity) < 1e-5


def test_cli_map_pack_device_equals_host(syng_setup, tmp_path):
    """CLI: map -o pack-tsv with --compute-engine device matches host."""
    from tests.test_cli import run_cli

    idx, reads, tmp = syng_setup
    prefix = str(tmp / "panel")
    idx.save(prefix + ".syngt")
    outs = {}
    for eng in ("host", "device"):
        out = str(tmp_path / f"{eng}.pack.tsv")
        r = run_cli("map", "-a", prefix + ".syngt", "-q", reads,
                    "-o", "pack-tsv", "-O", out, "--compute-engine", eng)
        assert r.returncode == 0, r.stderr
        outs[eng] = open(out).read()
    assert outs["host"] == outs["device"]
    assert len(outs["host"].splitlines()) > 10


def test_cli_genotype_device_flag(syng_setup, tmp_path):
    """CLI: genotype cos accepts --compute-engine device and agrees with
    the host ranking on a separated fixture."""
    from tests.test_cli import run_cli

    idx, reads, tmp = syng_setup
    prefix = str(tmp / "panel2")
    idx.save(prefix + ".syngt")
    pack_path = str(tmp_path / "s.packt")
    r = run_cli("map", "-a", prefix + ".syngt", "-q", reads, "-o", "pack",
                "-O", pack_path)
    assert r.returncode == 0, r.stderr
    region = f"g0:500-3000"
    outs = {}
    for eng in ("host", "device"):
        r = run_cli("genotype", "cos", "-a", prefix + ".syngt",
                    "-p", pack_path, "-r", region, "--compute-engine", eng)
        assert r.returncode == 0, r.stderr
        rows = [l.split("\t") for l in r.stdout.splitlines()[1:]]
        outs[eng] = [row[3] for row in rows]  # genotype column
    assert outs["host"][0] == outs["device"][0]
