"""Syncmer extraction + syng anchor index (reference: syng.rs raw mode)."""

import os
import random

import numpy as np
import pytest

from impg_tpu.io.fasta import reverse_complement
from impg_tpu.ops import syncmer
from impg_tpu.syng.index import SyngIndex
from tests import datagen
from tests.test_cli import run_cli


def test_syncmer_extraction_basic():
    rng = random.Random(4)
    seq = "".join(rng.choice("ACGT") for _ in range(5000)).encode()
    pos, ids, fwd = syncmer.extract_syncmers(seq)
    assert pos.size > 0
    # Density: closed syncmers select ~2/(w+1) of positions.
    density = pos.size / len(seq)
    assert 0.01 < density < 0.2
    # Positions strictly increasing, within bounds.
    assert np.all(np.diff(pos) > 0)
    assert pos[-1] + 63 <= len(seq)


def test_syncmer_strand_symmetry():
    rng = random.Random(9)
    seq = "".join(rng.choice("ACGT") for _ in range(3000)).encode()
    rc = reverse_complement(seq)
    pos_f, ids_f, fwd_f = syncmer.extract_syncmers(seq)
    pos_r, ids_r, fwd_r = syncmer.extract_syncmers(rc)
    # Same number of syncmers, mirrored positions, same canonical ids.
    assert pos_f.size == pos_r.size
    mirrored = len(seq) - 63 - pos_r[::-1]
    assert np.array_equal(pos_f, mirrored)
    assert np.array_equal(ids_f, ids_r[::-1])
    # Orientation flags flip.
    assert np.array_equal(fwd_f, ~fwd_r[::-1])


def test_syncmer_determinism_and_mutation_stability():
    rng = random.Random(2)
    seq = "".join(rng.choice("ACGT") for _ in range(4000))
    pos1, ids1, _ = syncmer.extract_syncmers(seq.encode())
    pos2, ids2, _ = syncmer.extract_syncmers(seq.encode())
    assert np.array_equal(pos1, pos2) and np.array_equal(ids1, ids2)
    # A single SNP changes only syncmers overlapping it.
    mutated = list(seq)
    mutated[2000] = "A" if seq[2000] != "A" else "C"
    pos3, ids3, _ = syncmer.extract_syncmers("".join(mutated).encode())
    far_before = pos1[pos1 < 2000 - 63]
    far_before3 = pos3[pos3 < 2000 - 63]
    assert np.array_equal(far_before, far_before3)


def test_syncmer_skips_N_runs():
    seq = (b"ACGT" * 50) + (b"N" * 100) + (b"TGCA" * 50)
    pos, ids, fwd = syncmer.extract_syncmers(seq)
    # No syncmer may overlap the N run [200, 300).
    for p in pos:
        assert p + 63 <= 200 or p >= 300


def test_syncmer_native_matches_numpy_oracle():
    """native/syncmer.cpp must be bit-exact vs the numpy pipeline
    (indexes built by either path interoperate)."""
    from impg_tpu.io import native as native_mod

    if native_mod.load() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(11)
    for _ in range(25):
        n = rng.randint(0, 2500)
        seq = "".join(
            rng.choice("ACGTacgtNn-")
            if rng.random() < 0.02
            else rng.choice("ACGT")
            for _ in range(n)
        ).encode()
        k = rng.choice([4, 8, 11, 16])
        w = rng.choice([5, 20, 55])
        seed = rng.randint(0, 100)
        threads = rng.choice([1, 4])
        nat = native_mod.extract_syncmers_native(seq, k, w, seed, threads)
        exp = syncmer.extract_syncmers_numpy(seq, k, w, seed)
        assert np.array_equal(nat[0], exp[0]), (n, k, w, seed)
        assert np.array_equal(nat[1], exp[1]), (n, k, w, seed)
        assert np.array_equal(nat[2], exp[2]), (n, k, w, seed)


def test_syncmer_batch_matches_per_sequence():
    """sx_extract_batch (parallel across sequences — the index-build
    path) must concatenate exactly the per-sequence extractions, with
    correct per-seq counts, for any thread count."""
    from impg_tpu.io import native as native_mod

    if (
        native_mod.load() is None
        or native_mod.extract_syncmers_batch_native([], 8, 55, 7) is None
    ):
        pytest.skip("native batch extraction unavailable")
    rng = random.Random(19)
    seqs = []
    for _ in range(13):
        n = rng.randint(0, 3000)
        seqs.append(
            "".join(
                rng.choice("ACGTN") if rng.random() < 0.02
                else rng.choice("ACGT")
                for _ in range(n)
            ).encode()
        )
    k, w, seed = 8, 55, 7
    exp_pos, exp_ids, exp_fwd, exp_counts = [], [], [], []
    for s in seqs:
        p, i, f = syncmer.extract_syncmers_numpy(s, k, w, seed)
        exp_pos.append(p)
        exp_ids.append(i)
        exp_fwd.append(f)
        exp_counts.append(p.size)
    for threads in (1, 3, 8):
        pos, ids, fwd, counts = native_mod.extract_syncmers_batch_native(
            seqs, k, w, seed, threads=threads
        )
        assert np.array_equal(pos, np.concatenate(exp_pos)), threads
        assert np.array_equal(ids, np.concatenate(exp_ids)), threads
        assert np.array_equal(fwd, np.concatenate(exp_fwd)), threads
        assert counts.tolist() == exp_counts, threads


def test_radix_argsort_matches_numpy_stable():
    """The native uint64 radix argsort (occurrence-table sort) must equal
    numpy's stable argsort, including tie stability."""
    from impg_tpu.io.native import load, radix_argsort_u64

    if load() is None or radix_argsort_u64(np.zeros(0, np.uint64)) is None:
        pytest.skip("native radix argsort unavailable")
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 17, 4096, 100_000):
        keys = rng.integers(0, 2**64, n, dtype=np.uint64)
        if n > 4:  # force duplicate keys to exercise stability
            keys[:: 3] = keys[0]
            keys[n // 2 :] >>= np.uint64(40)  # constant high bytes too
        got = radix_argsort_u64(keys)
        assert np.array_equal(got, np.argsort(keys, kind="stable")), n


@pytest.fixture(scope="module")
def chain_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("syng")
    rng = random.Random(64)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=8000, return_sequences=True
    )
    fa = str(tmp / "genomes.fa")
    datagen.write_fasta(fa, seq_data)
    return fa, seqs, seq_data


def test_syng_index_finds_homologs(chain_fixture):
    fa, seqs, seq_data = chain_fixture
    idx = SyngIndex.build_from_fasta([fa])
    hits = idx.query_region("ref", 1000, 5000)
    by_genome = {}
    for h in hits:
        by_genome.setdefault(h.genome, []).append(h)
    # The direct child s0 must be found with good coverage.
    assert "s0" in by_genome
    best = max(by_genome["s0"], key=lambda h: h.n_anchors)
    # The homologous interval should be roughly the same locus.
    assert best.end - best.start > 2000
    assert best.n_anchors > 10


def test_syng_roundtrip_and_cli(chain_fixture, tmp_path):
    fa, seqs, seq_data = chain_fixture
    prefix = str(tmp_path / "pan")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    # Query through the common pipeline (gap-2d merge path).
    r = run_cli(
        "query", "-a", prefix + ".syngt", "-r", "ref:1000-5000",
        "-d", "2000", "-o", "bed",
    )
    assert r.returncode == 0, r.stderr
    lines = [l.split("\t") for l in r.stdout.splitlines() if l]
    names = {l[0] for l in lines}
    assert "ref" in names and "s0" in names
    # BEDPE path too.
    r = run_cli(
        "query", "-a", prefix + ".syngt", "-r", "ref:1000-5000",
        "-d", "2000", "-o", "bedpe",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()


def test_syng_reverse_strand_homolog(tmp_path):
    rng = random.Random(11)
    base = "".join(rng.choice("ACGT") for _ in range(6000))
    rc = reverse_complement(base.encode()).decode()
    fa = tmp_path / "two.fa"
    datagen.write_fasta(str(fa), {"fwd": base, "rev": rc})
    idx = SyngIndex.build_from_fasta([str(fa)])
    hits = idx.query_region("fwd", 1000, 5000)
    rev_hits = [h for h in hits if h.genome == "rev"]
    assert rev_hits
    assert all(h.strand == "-" for h in rev_hits)
    best = max(rev_hits, key=lambda h: h.n_anchors)
    # Mirrored locus on the RC sequence.
    assert abs(best.start - (6000 - 5000)) < 200
    assert abs(best.end - (6000 - 1000)) < 200


def test_syng_query_region_formats(chain_fixture, tmp_path):
    """Syng queries route fasta/gfa/vcf through realignment
    (main.rs:6602/6668 contract)."""
    fa, seqs, seq_data = chain_fixture
    prefix = str(tmp_path / "rf")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    args = ["-a", prefix + ".syngt", "-r", "ref:1000-4000", "-d", "100",
            "--sequence-files", fa]
    # FASTA: the query region itself plus homologous intervals.
    r = run_cli("query", *args, "-o", "fasta")
    assert r.returncode == 0, r.stderr
    headers = [l for l in r.stdout.splitlines() if l.startswith(">")]
    assert any(h.startswith(">ref:1000-4000") for h in headers)
    assert len(headers) >= 2
    # GFA: POA region graph with one path per interval.
    r = run_cli("query", *args, "-o", "gfa")
    assert r.returncode == 0, r.stderr
    assert any(l.startswith("S\t") for l in r.stdout.splitlines())
    p_lines = [l for l in r.stdout.splitlines() if l.startswith("P\t")]
    assert len(p_lines) >= 2
    # VCF against the target path.
    r = run_cli("query", *args, "-o", "vcf")
    assert r.returncode == 0, r.stderr
    assert r.stdout.startswith("##fileformat=VCF")
    # Unsupported format errors cleanly.
    r = run_cli("query", "-a", prefix + ".syngt", "-r", "ref:1000-4000",
                "-d", "100", "-o", "paf")
    assert r.returncode == 2


def test_syng_repair(tmp_path):
    """syng-repair validates + re-canonicalizes a .syngt without source
    sequences (reference: Args::SyngRepair main.rs:10140 sidecar rebuild
    role)."""
    import numpy as np

    fa = str(tmp_path / "r.fa")
    datagen.write_fasta(
        fa,
        {
            "ref": "".join(random.Random(3).choice("ACGT") for _ in range(3000)),
            "alt": "".join(random.Random(4).choice("ACGT") for _ in range(3000)),
        },
    )
    prefix = str(tmp_path / "ridx")
    r = run_cli("syng", "-f", fa, "-o", prefix)
    assert r.returncode == 0, r.stderr
    path = prefix + ".syngt"

    r = run_cli("syng-repair", prefix)
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stderr

    before = run_cli(
        "query", "-a", path, "-r", "ref:200-2800", "-d", "100", "-o", "bed"
    )
    assert before.returncode == 0

    # Corrupt the derived sort order; repair must restore exact behavior.
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    perm = np.random.default_rng(0).permutation(arrays["occ_ids"].size)
    for k in ("occ_ids", "occ_seq", "occ_pos", "occ_fwd"):
        arrays[k] = arrays[k][perm]
    np.savez(path + ".npz", **arrays)
    os.replace(path + ".npz", path)

    r = run_cli("syng-repair", prefix)
    assert r.returncode == 0, r.stderr
    assert "re-canonicalized" in r.stderr
    after = run_cli(
        "query", "-a", path, "-r", "ref:200-2800", "-d", "100", "-o", "bed"
    )
    assert after.returncode == 0
    assert after.stdout == before.stdout

    # Inconsistent data (positions beyond sequence bounds) is refused.
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    arrays["occ_pos"] = arrays["occ_pos"] + 10_000_000
    np.savez(path + ".npz", **arrays)
    os.replace(path + ".npz", path)
    r = run_cli("syng-repair", prefix)
    assert r.returncode == 1
    assert "rebuild" in r.stderr


def test_syng_build_duplicate_names_matches_lexsort():
    """Two input sequences sharing a name dedup to one sid, which keeps
    occ_seq monotone while positions restart — the radix shortcut must
    detect this and fall back to the full (ids, seq, pos) lexsort."""
    rng = random.Random(77)
    bases = "ACGT"
    s1 = "".join(rng.choice(bases) for _ in range(3000)).encode()
    s2 = "".join(rng.choice(bases) for _ in range(2500)).encode()
    # Adjacent same-named DIFFERENT sequences: occ_seq stays monotone
    # ([0..0,0..0,1..1]) but positions restart inside the sid-0 run — the
    # case a seq-only monotonicity check misses.  s1b shares s1's middle
    # kilobase shifted to its front, so shared syncmer ids occur at
    # strictly smaller positions in the second part.
    s1b = s1[1000:2000] + s2[:1500]
    dup = SyngIndex.build([("a", s1), ("a", s1b), ("b", s2)])
    keys = list(zip(dup.occ_ids.tolist(), dup.occ_seq.tolist(),
                    dup.occ_pos.tolist()))
    assert keys == sorted(keys)
