"""Native aligner + align command (reference: commands/align.rs role)."""

import random

import numpy as np
import pytest

from impg_tpu.core import cigar
from impg_tpu.io.fasta import reverse_complement
from impg_tpu.ops.align import align_pair
from tests import datagen
from tests.test_cli import run_cli


def validate_cigar(q: bytes, t: bytes, runs: np.ndarray) -> None:
    """Walk the CIGAR: '=' runs must match exactly, 'X' must differ."""
    qi = ti = 0
    for r in runs:
        length = int(r & cigar.LEN_MASK)
        op = int(r >> 29)
        if op == cigar.OP_EQ:
            assert q[qi : qi + length] == t[ti : ti + length]
            qi += length
            ti += length
        elif op == cigar.OP_X:
            for j in range(length):
                assert q[qi + j] != t[ti + j]
            qi += length
            ti += length
        elif op == cigar.OP_I:
            qi += length
        elif op == cigar.OP_D:
            ti += length
    assert qi == len(q) and ti == len(t)


def test_align_pair_validates():
    rng = random.Random(6)
    for _ in range(30):
        t = "".join(rng.choice("ACGT") for _ in range(rng.randint(20, 400)))
        q = datagen.apply_ops(
            rng,
            t,
            [(len(t), "=")] if rng.random() < 0.2 else
            pyops(rng, len(t)),
        )
        runs = align_pair(q.encode(), t.encode())
        validate_cigar(q.encode(), t.encode(), runs)


def pyops(rng, tlen):
    ops = []
    pos = 0
    while pos < tlen:
        r = rng.random()
        if r < 0.7:
            l = min(rng.randint(5, 60), tlen - pos)
            ops.append((l, "="))
            pos += l
        elif r < 0.85:
            l = min(rng.randint(1, 3), tlen - pos)
            ops.append((l, "X"))
            pos += l
        elif r < 0.93:
            ops.append((rng.randint(1, 8), "I"))
        else:
            l = min(rng.randint(1, 8), tlen - pos)
            ops.append((l, "D"))
            pos += l
    return ops


@pytest.fixture(scope="module")
def chain_fa(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("align")
    rng = random.Random(808)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=6000, return_sequences=True
    )
    fa = str(tmp / "genomes.fa")
    datagen.write_fasta(fa, seq_data)
    return tmp, fa, seqs, seq_data


def test_align_command_produces_valid_paf(chain_fa, tmp_path):
    tmp, fa, seqs, seq_data = chain_fa
    paf_out = tmp_path / "out.paf"
    r = run_cli("align", "-f", fa, "-o", str(paf_out))
    assert r.returncode == 0, r.stderr
    lines = [l for l in paf_out.read_text().splitlines() if l]
    assert lines
    covered_pairs = set()
    for line in lines:
        f = line.split("\t")
        qname, qlen, qs, qe = f[0], int(f[1]), int(f[2]), int(f[3])
        strand = f[4]
        tname, tlen, ts, te = f[5], int(f[6]), int(f[7]), int(f[8])
        covered_pairs.add((qname, tname))
        runs = np.array(
            [
                (["=", "X", "I", "D", "M"].index(op) << 29) | int(n)
                for n, op in __import__("re").findall(r"(\d+)([=XIDM])", f[12][5:])
            ],
            np.uint32,
        )
        q_seq = seq_data[qname][qs:qe].encode()
        if strand == "-":
            q_seq = reverse_complement(q_seq)
        t_seq = seq_data[tname][ts:te].encode()
        validate_cigar(q_seq, t_seq, runs)
    # Adjacent chain members must align.
    assert ("s0", "ref") in covered_pairs or ("ref", "s0") in covered_pairs


def test_align_then_index_then_query(chain_fa, tmp_path):
    """Full loop: FASTA -> align -> index -> transitive query."""
    tmp, fa, seqs, seq_data = chain_fa
    paf_out = tmp_path / "self.paf"
    r = run_cli("align", "-f", fa, "-o", str(paf_out))
    assert r.returncode == 0, r.stderr
    r = run_cli(
        "query", "-a", str(paf_out), "-r", "ref:1000-5000", "-d", "200",
        "-x", "-m", "3", "-o", "bed",
    )
    assert r.returncode == 0, r.stderr
    names = {l.split("\t")[0] for l in r.stdout.splitlines() if l}
    assert {"ref", "s0", "s1"} <= names


def test_mash_sketch_distance():
    """Mash distance: identical sequences ~0; diverged ones larger; RC
    invariance via canonical k-mers (align.rs:94 KmerSketch role)."""
    import numpy as np

    from impg_tpu.commands.align import mash_distance, mash_sketch
    from impg_tpu.io.fasta import reverse_complement

    rng = random.Random(3)
    seq = "".join(rng.choice("ACGT") for _ in range(5000)).encode()
    a = mash_sketch(seq)
    assert mash_distance(a, a) == 0.0
    assert mash_distance(a, mash_sketch(reverse_complement(seq))) == 0.0
    # 5% mutated copy: small but nonzero distance.
    mut = bytearray(seq)
    for i in rng.sample(range(len(mut)), len(mut) // 20):
        mut[i] = ord(rng.choice("ACGT"))
    d_near = mash_distance(a, mash_sketch(bytes(mut)))
    assert 0.0 < d_near < 0.2, d_near
    rnd = "".join(rng.choice("ACGT") for _ in range(5000)).encode()
    d_far = mash_distance(a, mash_sketch(rnd))
    assert d_far > d_near


def test_select_pairs_strategies():
    import random as _r

    from impg_tpu.commands.align import select_pairs

    rng = _r.Random(8)
    base = "".join(rng.choice("ACGT") for _ in range(3000))

    def mutate(s, frac):
        b = bytearray(s.encode())
        for i in rng.sample(range(len(b)), int(len(b) * frac)):
            b[i] = ord(rng.choice("ACGT"))
        return b.decode()

    seqs = {
        "a#1#c": base,
        "b#1#c": mutate(base, 0.02),
        "c#1#c": mutate(base, 0.03),
        "d#1#c": "".join(rng.choice("ACGT") for _ in range(3000)),
    }
    seqs_b = {k: v.encode() for k, v in seqs.items()}
    names = list(seqs)
    dense = select_pairs(names, seqs_b, "none")
    assert len(dense) == 12  # all ordered pairs
    knn = select_pairs(names, seqs_b, "knn:1")
    assert set(knn) <= set(dense)
    # The unrelated group d only keeps its own nearest edge; the related
    # trio stays connected.
    knn_unordered = {tuple(sorted(p)) for p in knn}
    assert ("a#1#c", "b#1#c") in knn_unordered
    assert len(knn_unordered) < 6
    import pytest

    with pytest.raises(ValueError, match="unknown sparsification"):
        select_pairs(names, seqs_b, "bogus")


def test_cli_align_sparsify(tmp_path):
    rng = random.Random(13)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=2500, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    from tests.test_cli import run_cli

    r = run_cli("align", "-f", fa, "--sparsify", "knn:2")
    assert r.returncode == 0, r.stderr
    assert "Wrote" in r.stderr
    rows = [l for l in r.stdout.splitlines() if l]
    assert rows and all("cg:Z:" in l for l in rows)


def test_cli_align_pair_and_job_list(tmp_path):
    """--job-list emits one command per pair; running one of those
    commands (--pair) produces exactly that pair's PAF rows."""
    import subprocess
    import sys as _sys

    rng = random.Random(21)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=2000, return_sequences=True
    )
    fa = str(tmp_path / "p.fa")
    datagen.write_fasta(fa, seq_data)
    from tests.test_cli import run_cli

    r = run_cli("align", "-f", fa, "--job-list")
    assert r.returncode == 0, r.stderr
    jobs = r.stdout.splitlines()
    assert len(jobs) == 6  # 3 seqs, all ordered pairs
    assert all("--pair" in j and "impg_tpu.cli align" in j for j in jobs)
    # Run one job's pair directly.
    r = run_cli("align", "-f", fa, "--pair", "ref:s0")
    assert r.returncode == 0, r.stderr
    rows = [l.split("\t") for l in r.stdout.splitlines() if l]
    assert rows
    assert all(x[0] == "ref" and x[5] == "s0" for x in rows)
    r = run_cli("align", "-f", fa, "--pair", "nope")
    assert r.returncode == 2


def test_align_run_joblist(tmp_path):
    """--run-joblist executes the emitted jobs in parallel slots
    (align.rs --run-joblist role)."""
    import random

    from tests import datagen
    from tests.test_cli import run_cli

    rng = random.Random(71)
    base = "".join(rng.choice("ACGT") for _ in range(4000))
    seqs = {}
    for i in range(3):
        s = list(base)
        for _ in range(20):
            j = rng.randrange(len(s))
            s[j] = rng.choice("ACGT")
        seqs[f"g{i}"] = "".join(s)
    fa = str(tmp_path / "g.fa")
    datagen.write_fasta(fa, seqs)
    jl = str(tmp_path / "jobs.txt")
    r = run_cli("align", "-f", fa, "--job-list", "-o", jl)
    assert r.returncode == 0, r.stderr
    jobs = open(jl).read().splitlines()
    assert jobs
    # Rewrite outputs into tmp_path and execute.
    rewritten = str(tmp_path / "jobs2.txt")
    with open(rewritten, "w") as fh:
        for i, line in enumerate(jobs):
            fh.write(
                line.replace(
                    f"pair_{i:05d}.paf", str(tmp_path / f"pair_{i:05d}.paf")
                )
                + "\n"
            )
    r = run_cli("align", "-f", fa, "--run-joblist", rewritten, "--jobs", "2")
    assert r.returncode == 0, r.stderr
    outs = sorted(tmp_path.glob("pair_*.paf"))
    assert len(outs) == len(jobs)
    assert any(o.read_text().strip() for o in outs)


def test_oversized_gap_splits_chain_instead_of_dropping(tmp_path):
    """An inter-anchor gap beyond the native aligner's budget must SPLIT
    the chain into two PAF rows (both flanks survive), not erase the
    whole alignment (round-1 behavior dropped the row)."""
    import random

    import numpy as np

    from impg_tpu.commands import align as align_mod
    from impg_tpu.syng.index import SyngIndex

    rng = random.Random(3)
    flank_a = "".join(rng.choice("ACGT") for _ in range(4000))
    flank_b = "".join(rng.choice("ACGT") for _ in range(4000))
    ins_q = "".join(rng.choice("ACGT") for _ in range(30000))
    ins_t = "".join(rng.choice("ACGT") for _ in range(30000))
    seqs = {
        "q": (flank_a + ins_q + flank_b).encode(),
        "t": (flank_a + ins_t + flank_b).encode(),
    }
    index = SyngIndex.build(list(seqs.items()))
    # max_gap large enough that chaining does NOT split at the insertion,
    # forcing the aligner-budget path; cap the aligner via a monkeypatch.
    cfg = align_mod.AlignConfig(max_gap=100_000)
    orig = align_mod.align_pair

    def capped(q, t, scoring=None):
        if len(q) * len(t) > 1_000_000:
            raise ValueError("segment too large (test cap)")
        return orig(q, t) if scoring is None else orig(q, t, scoring)

    align_mod_align_pair = align_mod.align_pair
    align_mod.align_pair = capped
    try:
        rows = align_mod.align_sequence_pair(index, seqs, "q", "t", cfg)
    finally:
        align_mod.align_pair = align_mod_align_pair
    fwd = [r for r in rows if r["strand"] == "+"]
    assert len(fwd) >= 2, f"expected a split chain, got {len(fwd)} rows"
    spans = sorted((r["qstart"], r["qend"]) for r in fwd)
    # Both flanks are covered by separate rows.
    assert spans[0][0] < 4000 and spans[-1][1] > 34000


def _score(runs: np.ndarray, q: bytes, t: bytes, scoring=(1, 4, 6, 2)) -> int:
    m, x, go, ge = scoring
    s = 0
    for r in runs:
        length = int(r & cigar.LEN_MASK)
        op = int(r >> 29)
        if op == cigar.OP_EQ:
            s += m * length
        elif op == cigar.OP_X:
            s -= x * length
        else:
            s -= go + ge * (length - 1)
    return s


def test_wfa_matches_gotoh_optimum():
    """WFA (score-domain transform) must reach the Gotoh optimum exactly
    (native/align.cpp align_wfa; reference WFA2 role impg.rs:43-71)."""
    from impg_tpu.ops.align import align_pair_wfa

    rng = random.Random(7)
    bases = "ACGT"
    checked = 0
    for _ in range(60):
        n = rng.randrange(1, 300)
        a = "".join(rng.choice(bases) for _ in range(n))
        b = list(a)
        for _ in range(rng.randrange(0, max(1, n // 4))):
            p = rng.randrange(0, max(1, len(b)))
            r = rng.random()
            if r < 0.4 and b:
                b[p] = rng.choice(bases)
            elif r < 0.7:
                b[p:p] = [rng.choice(bases) for _ in range(rng.randrange(1, 6))]
            elif len(b) > 2:
                del b[p : p + rng.randrange(1, 6)]
        bs = "".join(b)
        if not bs:
            continue
        qa, ta = a.encode(), bs.encode()
        g = align_pair(qa, ta)
        w = align_pair_wfa(qa, ta)
        assert w is not None
        validate_cigar(qa, ta, w)
        assert _score(w, qa, ta) == _score(g, qa, ta)
        checked += 1
    assert checked > 40


def test_wfa_handles_long_near_identical_pair():
    """The regime Gotoh's O(n*m) guard rejects: long, near-identical pairs
    (tracepoint reconstruction / chain-gap fills) — WFA is near-linear."""
    rng = random.Random(11)
    bases = "ACGT"
    n = 120_000  # 120k x 120k = 14.4G cells: far past the Gotoh guard
    a = "".join(rng.choice(bases) for _ in range(n))
    b = list(a)
    for _ in range(12):
        p = rng.randrange(0, len(b) - 10)
        r = rng.random()
        if r < 0.5:
            b[p] = rng.choice(bases)
        elif r < 0.75:
            b[p:p] = [rng.choice(bases) for _ in range(3)]
        else:
            del b[p : p + 3]
    qa, ta = a.encode(), "".join(b).encode()
    runs = align_pair(qa, ta)  # routed: WFA, no ValueError
    validate_cigar(qa, ta, runs)
    n_eq = sum(
        int(r & cigar.LEN_MASK) for r in runs if (r >> 29) == cigar.OP_EQ
    )
    assert n_eq >= n - 200


def test_wfa_declines_cleanly_on_divergent_pair():
    """Fully divergent large pairs exceed the wavefront budget: WFA returns
    None and align_pair falls back (here: past both guards -> ValueError,
    which chain callers treat as a split point)."""
    from impg_tpu.ops.align import align_pair_wfa

    rng = random.Random(13)
    a = "".join(rng.choice("ACGT") for _ in range(40_000)).encode()
    b = "".join(rng.choice("ACGT") for _ in range(40_000)).encode()
    assert align_pair_wfa(a, b) is None
