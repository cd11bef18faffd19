"""Cross-backend validation: the alignment-free syng backend must find
the same homologous regions as the PAF-alignment backend on the same
data (the reference's tests/validation/compare_syng_vs_paf.sh role,
hardened into coverage-Jaccard assertions)."""

import random

from tests import datagen
from tests.test_cli import run_cli


def _bed_coverage(bed_text: str) -> dict[str, set]:
    cov: dict[str, set] = {}
    for line in bed_text.splitlines():
        if not line.strip():
            continue
        f = line.split("\t")
        cov.setdefault(f[0], set()).update(range(int(f[1]), int(f[2])))
    return cov


def test_syng_backend_matches_paf_backend_coverage(tmp_path):
    rng = random.Random(31)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=5, seq_len=9000, return_sequences=True
    )
    paf = str(tmp_path / "a.paf")
    fa = str(tmp_path / "g.fa")
    with open(paf, "w") as fh:
        fh.write(text)
    datagen.write_fasta(fa, seq_data)
    r = run_cli("syng", "-f", fa, "-o", str(tmp_path / "pan"))
    assert r.returncode == 0, r.stderr
    syngt = str(tmp_path / "pan.syngt")

    names = list(seqs)
    qrng = random.Random(5)
    for _ in range(4):
        nm = names[qrng.randrange(len(names))]
        L = seqs[nm]
        s = qrng.randrange(0, max(1, L - 5000))
        region = f"{nm}:{s}-{s + 5000}"
        ra = run_cli(
            "query", "-a", paf, "-r", region, "-d", "100", "-o", "bed"
        )
        rb = run_cli(
            "query", "-a", syngt, "-r", region, "-d", "100", "-o", "bed"
        )
        assert ra.returncode == 0, ra.stderr
        assert rb.returncode == 0, rb.stderr
        cov_a = _bed_coverage(ra.stdout)
        cov_b = _bed_coverage(rb.stdout)
        # Homolog discovery recall: every sequence the alignment backend
        # reaches, the syncmer backend reaches too.
        missing = set(cov_a) - set(cov_b)
        assert not missing, (region, missing)
        # Coverage agreement per shared sequence (syng boundaries are
        # approximate within ~syncmer length; be generous but binding).
        for sid in cov_a:
            inter = len(cov_a[sid] & cov_b[sid])
            union = len(cov_a[sid] | cov_b[sid])
            jac = inter / union if union else 1.0
            assert jac >= 0.7, (region, sid, round(jac, 3))
