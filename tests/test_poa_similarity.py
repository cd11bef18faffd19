"""POA engine + similarity command (reference: graph.rs SPOA usage,
commands/similarity.rs)."""

import random

import numpy as np
import pytest

from impg_tpu.commands import similarity as sim
from impg_tpu.graph.poa import poa_align, poa_to_gfa
from tests import datagen
from tests.test_cli import run_cli
from tests.test_fasta import make_fasta


_POA_AB_SCRIPT = r"""
import random, sys, hashlib
from impg_tpu.graph.poa import poa_align
rng = random.Random(int(sys.argv[1]))
out = []
for trial in range(20):
    n = rng.randint(2, 8)
    L = rng.randint(0, 250)
    base = "".join(rng.choice("ACGT") for _ in range(L))
    seqs = []
    for _ in range(n):
        s = list(base)
        for _ in range(rng.randint(0, 12)):
            if not s:
                break
            op = rng.random()
            p = rng.randrange(len(s))
            if op < 0.4:
                s[p] = rng.choice("ACGT")
            elif op < 0.7:
                s.insert(p, rng.choice("ACGT"))
            else:
                del s[p]
        seqs.append("".join(s).encode())
    res = poa_align(seqs)
    out.append(repr((res.msa, [list(p) for p in res.paths])))
print(hashlib.sha256("\n".join(out).encode()).hexdigest())
"""


def test_poa_fast_kernel_bit_identical_to_reference():
    """align_fast (vectorized two-pass DP) must reproduce align_ref (the
    original straight-line DP, IMPG_POA_REF=1) exactly — MSA rows and
    node paths — across randomized indel/SNP MSAs.  Subprocesses because
    the kernel choice is latched once per process."""
    import subprocess
    import sys

    from tests.envutil import cpu_env

    for seed in (11, 22):
        outs = []
        for ref in ("0", "1"):
            r = subprocess.run(
                [sys.executable, "-c", _POA_AB_SCRIPT, str(seed)],
                capture_output=True,
                text=True,
                env=cpu_env(IMPG_POA_REF=ref),
            )
            assert r.returncode == 0, r.stderr
            outs.append(r.stdout.strip())
        assert outs[0] == outs[1], f"seed {seed}: fast != ref"


def test_poa_msa_reproduces_inputs():
    rng = random.Random(9)
    base = "".join(rng.choice("ACGT") for _ in range(200))
    seqs = [base.encode()]
    for _ in range(4):
        mutated = list(base)
        for _ in range(8):
            pos = rng.randrange(len(mutated))
            op = rng.random()
            if op < 0.5:
                mutated[pos] = rng.choice("ACGT")
            elif op < 0.75:
                mutated[pos] = ""
            else:
                mutated[pos] = mutated[pos] + rng.choice("ACGT")
        seqs.append("".join(mutated).encode())
    res = poa_align(seqs)
    assert len({len(r) for r in res.msa}) == 1  # equal-width rows
    for row, s in zip(res.msa, seqs):
        assert row.replace("-", "").encode() == s
    # Identical sequences get identical rows.
    res2 = poa_align([b"ACGT" * 10] * 3)
    assert res2.msa[0] == res2.msa[1] == res2.msa[2]
    assert "-" not in res2.msa[0]


def test_poa_gfa_structure():
    res = poa_align([b"ACGTACGTAC", b"ACGTTCGTAC", b"ACGTACGAC"])
    gfa = poa_to_gfa(res, ["a", "b", "c"])
    lines = gfa.splitlines()
    segs = {l.split("\t")[1]: l.split("\t")[2] for l in lines if l.startswith("S")}
    paths = [l.split("\t") for l in lines if l.startswith("P")]
    assert len(paths) == 3
    # Path sequence reconstruction must equal the input sequence.
    for pl, seq in zip(paths, [b"ACGTACGTAC", b"ACGTTCGTAC", b"ACGTACGAC"]):
        walk = "".join(segs[s[:-1]] for s in pl[2].split(","))
        assert walk.encode() == seq
    # Links reference existing segments.
    for l in lines:
        if l.startswith("L"):
            f = l.split("\t")
            assert f[1] in segs and f[3] in segs


def test_similarity_metrics():
    m = sim.SimilarityMetrics.new(100, 100, 100)
    assert m.jaccard == m.cosine == m.dice == m.estimated_identity == 1.0
    m = sim.SimilarityMetrics.new(50, 100, 100)
    assert m.jaccard == pytest.approx(50 / 150, abs=1e-6)
    assert m.dice == pytest.approx(0.5, abs=1e-6)
    assert m.cosine == pytest.approx(0.5, abs=1e-6)
    m = sim.SimilarityMetrics.new(0, 100, 100)
    assert m.jaccard == 0.0 and m.estimated_identity == 0.0


def test_group_name_extraction():
    assert sim.extract_group_name("HG002#1#chr1", "#", 1) == "HG002"
    assert sim.extract_group_name("HG002#1#chr1", "#", 2) == "HG002#1"
    assert sim.extract_group_name("HG002#1#chr1", "#", 9) == "HG002#1#chr1"


def test_mds_recovers_structure():
    # Two tight clusters far apart.
    d = np.array(
        [
            [0.0, 0.1, 0.9, 0.9],
            [0.1, 0.0, 0.9, 0.9],
            [0.9, 0.9, 0.0, 0.1],
            [0.9, 0.9, 0.1, 0.0],
        ],
        np.float32,
    )
    coords, vals = sim.mds_fit_transform(d, 2)
    # First axis separates the clusters.
    assert np.sign(coords[0, 0]) == np.sign(coords[1, 0])
    assert np.sign(coords[2, 0]) == np.sign(coords[3, 0])
    assert np.sign(coords[0, 0]) != np.sign(coords[2, 0])


def test_cli_similarity(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    r = run_cli(
        "similarity", "-a", paf, "-r", "ref:100-900", "-d", "100", "-x",
        "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert lines[0].startswith("chrom\tstart\tend")
    rows = [l.split("\t") for l in lines[1:]]
    assert rows
    names = {r0[3] for r0 in rows}
    assert any(n.startswith("ref:") for n in names)
    assert any(n.startswith("s0:") for n in names)
    # Self-similarity rows are 1.
    for r0 in rows:
        if r0[3] == r0[4]:
            assert float(r0[8]) == 1.0
        # Chain identity ~96%: estimated identity should be high for ref/s0.
    ref_s0 = [
        r0 for r0 in rows
        if r0[3].startswith("ref:") and r0[4].startswith("s0:")
    ]
    assert ref_s0 and float(ref_s0[0][11]) > 0.8


def test_cli_similarity_pca_and_distances(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    r = run_cli(
        "similarity", "-a", paf, "-r", "ref:100-900", "-d", "100", "-x",
        "--sequence-files", fa, "--distances", "--pca",
    )
    assert r.returncode == 0, r.stderr
    assert "jaccard.distance" in r.stdout.splitlines()[0]
    pca_lines = [l for l in r.stdout.splitlines() if l.startswith("#PCA")]
    assert pca_lines


def test_cli_query_gfa_maf_fasta_aln(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    # GFA: paths must reconstruct the region sequences.
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-900", "-d", "100", "-x", "-o", "gfa",
        "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    segs, paths = {}, {}
    for line in r.stdout.splitlines():
        f = line.split("\t")
        if f[0] == "S":
            segs[f[1]] = f[2]
        elif f[0] == "P":
            paths[f[1]] = f[2]
    assert paths and segs
    from impg_tpu.io.fasta import reverse_complement

    for name, walk in paths.items():
        seq_name, rng_part = name.rsplit(":", 1)
        s, e = map(int, rng_part.split("-"))
        expected = seq_data[seq_name][s:e]
        got = ""
        for step in walk.split(","):
            piece = segs[step[:-1]]
            if step.endswith("-"):
                piece = reverse_complement(piece.encode()).decode()
            got += piece
        # Forward paths reconstruct directly; reverse paths reconstruct the RC.
        assert got in (expected, reverse_complement(expected.encode()).decode()), name

    # MAF: per-row size/total fields consistent, rows reproduce sequences.
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-900", "-d", "100", "-x", "-o", "maf",
        "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    maf_lines = [l for l in r.stdout.splitlines() if l.startswith("s ")]
    assert maf_lines
    for l in maf_lines:
        _, name, start, size, strand, total, text = l.split(maxsplit=6)
        assert int(total) == seqs[name]
        assert sum(1 for c in text if c != "-") == int(size)

    # fasta-aln: equal-width gapped rows.
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-900", "-d", "100", "-x",
        "-o", "fasta-aln", "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    rows = {}
    cur = None
    for line in r.stdout.splitlines():
        if line.startswith(">"):
            cur = line[1:]
            rows[cur] = ""
        else:
            rows[cur] += line
    widths = {len(v) for v in rows.values()}
    assert len(widths) == 1


def test_polarize_adaptive_and_guides():
    """PCA sign polarization across windows (reference: similarity.rs:649
    polarize_pca_result, :758 polarize_pca_result_with_guides)."""
    import numpy as np

    from impg_tpu.commands.similarity import (
        PcaResult, polarize_adaptive, polarize_with_guides,
    )

    def mk(sign):
        coords = np.array(
            [[1.0, 0.5], [-2.0, 0.1], [0.5, -0.3]]
        ) * [sign, 1.0]
        return PcaResult("r", ["a", "b", "c"], coords.copy())

    # Window 1's PC0 is sign-flipped vs windows 0 and 2: adaptive
    # polarization must make the anchor sample's sign continuous.
    res = [mk(1), mk(-1), mk(1)]
    polarize_adaptive(res, 3)
    assert np.allclose(res[0].coords[:, 0], res[1].coords[:, 0])
    assert np.allclose(res[0].coords[:, 0], res[2].coords[:, 0])
    # PC1 untouched (no flips needed).
    assert np.allclose(res[0].coords[:, 1], mk(1).coords[:, 1])

    res = [mk(1), mk(-1), mk(1)]
    polarize_with_guides(res, ["b"])
    vals = [r.coords[1, 0] for r in res]
    assert all(v == vals[0] for v in vals), vals

    import pytest

    with pytest.raises(ValueError, match="not found in any window"):
        polarize_with_guides(res, ["zzz"])


def test_cli_similarity_pca_polarized_windows(tmp_path):
    """--target-bed windows + --polarize-n-prev: PC signs continuous across
    consecutive windows for every sample."""
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    bed = tmp_path / "wins.bed"
    bed.write_text(
        "ref\t100\t500\nref\t300\t700\nref\t500\t900\n"
    )
    out = {}
    for flags in ([], ["--polarize-n-prev", "2"]):
        r = run_cli(
            "similarity", "-a", paf, "--target-bed", str(bed), "-d", "100",
            "-x", "--sequence-files", fa, "--pca", *flags,
        )
        assert r.returncode == 0, r.stderr
        pca = {}
        for l in r.stdout.splitlines():
            if l.startswith("#PCA"):
                _, region, label, *comps = l.split("\t")
                pca.setdefault(region, {})[label] = [
                    float(c) for c in comps
                ]
        assert len(pca) == 3
        out[bool(flags)] = pca
    # Polarized coordinates are the raw ones up to a per-window sign on PC0.
    raw, pol = out[False], out[True]
    for region in raw:
        labels = sorted(raw[region])
        r0 = [raw[region][l][0] for l in labels]
        p0 = [pol[region][l][0] for l in labels]
        same = all(abs(a - b) < 1e-9 for a, b in zip(r0, p0))
        flip = all(abs(a + b) < 1e-9 for a, b in zip(r0, p0))
        assert same or flip, (region, r0, p0)


def test_group_intersection_matches_scalar_oracle():
    """Vectorized histogram intersection == the per-character loop."""
    import random

    from impg_tpu.commands.similarity import group_intersection

    def oracle(msa, idx_a, idx_b):
        total = 0
        for pos in range(len(msa[0])):
            matches = 0
            count_a = 0
            for ia in idx_a:
                ca = msa[ia][pos]
                if ca == "-":
                    continue
                count_a += 1
                for ib in idx_b:
                    cb = msa[ib][pos]
                    if cb != "-" and ca == cb:
                        matches += 1
            count_b = sum(1 for ib in idx_b if msa[ib][pos] != "-")
            total += min(matches, count_a, count_b)
        return total

    rng = random.Random(3)
    for _ in range(20):
        n_rows = rng.randint(2, 6)
        n_cols = rng.randint(1, 40)
        msa = [
            "".join(rng.choice("ACGTN-") for _ in range(n_cols))
            for _ in range(n_rows)
        ]
        ia = [i for i in range(n_rows) if rng.random() < 0.5] or [0]
        ib = [i for i in range(n_rows) if rng.random() < 0.5] or [
            n_rows - 1
        ]
        assert group_intersection(msa, ia, ib) == oracle(msa, ia, ib)


def test_poa_dedup_is_exact():
    """poa_align's duplicate-sequence fan-out must be byte-identical to
    the raw no-dedup run: same MSA rows, node bases, edges, paths."""
    import os
    import random as _random

    import numpy as np

    from impg_tpu.graph import poa as poa_mod

    rng = _random.Random(21)
    for trial in range(6):
        base = "".join(rng.choice("ACGT") for _ in range(rng.randint(60, 200)))
        variants = [base]
        for _ in range(3):
            v = list(base)
            for _ in range(rng.randint(1, 6)):
                p = rng.randrange(len(v))
                op = rng.random()
                if op < 0.5:
                    v[p] = rng.choice("ACGT")
                elif op < 0.75:
                    v.insert(p, rng.choice("ACGT"))
                else:
                    del v[p]
            variants.append("".join(v))
        # Heavy duplication in arbitrary order.
        seqs = [
            variants[rng.randrange(len(variants))].encode()
            for _ in range(rng.randint(6, 14))
        ]
        dedup = poa_mod.poa_align(seqs)
        os.environ["IMPG_POA_DEDUP"] = "0"
        try:
            raw = poa_mod.poa_align(seqs)
        finally:
            del os.environ["IMPG_POA_DEDUP"]
        assert dedup.msa == raw.msa, trial
        assert dedup.node_bases == raw.node_bases, trial
        assert np.array_equal(dedup.edges, raw.edges), trial
        assert len(dedup.paths) == len(raw.paths)
        for a, b in zip(dedup.paths, raw.paths):
            assert np.array_equal(a, b), trial
