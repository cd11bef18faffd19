"""FASTA indexing/fetch + fasta output (reference: faidx.rs, main.rs:12351)."""

import gzip
import random

from impg_tpu.io.fasta import FastaIndex, UnifiedSequenceIndex, reverse_complement
from tests import datagen
from tests.test_cli import run_cli


def make_fasta(tmp_path, seed=5):
    rng = random.Random(seed)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=4, seq_len=1500, return_sequences=True
    )
    fa = str(tmp_path / "seqs.fa")
    datagen.write_fasta(fa, seq_data, width=60)
    paf = str(tmp_path / "chain.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    return fa, paf, seqs, seq_data


def test_fai_build_and_fetch(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    idx = FastaIndex.build_from_files([fa])
    rng = random.Random(2)
    for name, seq in seq_data.items():
        assert idx.get_sequence_length(name) == len(seq)
        for _ in range(20):
            a = rng.randint(0, len(seq) - 1)
            b = rng.randint(a + 1, len(seq))
            assert idx.fetch_sequence(name, a, b) == seq[a:b].encode()
    # .fai sidecar was created and is reusable.
    assert (tmp_path / "seqs.fa.fai").exists()
    idx2 = FastaIndex.build_from_files([fa])
    assert idx2.fetch_sequence("ref", 10, 50) == seq_data["ref"][10:50].encode()


def test_fasta_gzip(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    gz = fa + ".gz"
    with open(fa, "rb") as src, gzip.open(gz, "wb") as dst:
        dst.write(src.read())
    idx = FastaIndex.build_from_files([gz])
    for name, seq in seq_data.items():
        assert idx.fetch_sequence(name, 0, len(seq)) == seq.encode()


def test_reverse_complement():
    assert reverse_complement(b"ACGT") == b"ACGT"
    assert reverse_complement(b"AACCGGTTN") == b"NAACCGGTT"


def test_fetch_out_of_bounds(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    idx = FastaIndex.build_from_files([fa])
    import pytest

    with pytest.raises(ValueError):
        idx.fetch_sequence("ref", 0, 10**9)
    with pytest.raises(KeyError):
        idx.fetch_sequence("nope", 0, 10)


def test_cli_fasta_output(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-700", "-d", "100", "-o", "fasta",
        "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    records = {}
    cur = None
    for line in r.stdout.splitlines():
        if line.startswith(">"):
            cur = line[1:]
            records[cur] = ""
        elif cur:
            records[cur] += line
    assert records
    # Every emitted record's bases match the source FASTA slice.
    for header, seq in records.items():
        name, rng_part = header.rsplit(":", 1)
        s, e = map(int, rng_part.split("-"))
        assert seq == seq_data[name][s:e], header
    # The self region is present.
    assert "ref:100-700" in records
    # Alignment sanity: s0's homologous region should be mostly identical to
    # the ref query region (chain has ~96% identity).
    s0_headers = [h for h in records if h.startswith("s0:")]
    assert s0_headers


def test_cli_fasta_requires_sequence_files(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    r = run_cli("query", "-a", paf, "-r", "ref:100-700", "-d", "0", "-o", "fasta")
    assert r.returncode == 2
    assert "--sequence-files" in r.stderr


def test_partition_fasta_output(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    out = tmp_path / "pf"
    r = run_cli(
        "partition", "-a", paf, "-w", "800", "-d", "100",
        "--min-missing-size", "100", "--min-boundary-distance", "100",
        "--separate-files", "-o", "fasta", "--sequence-files", fa,
        "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    fastas = list(out.glob("partition*.fasta"))
    assert fastas
    total = 0
    for f in fastas:
        cur = None
        body = {}
        for line in f.read_text().splitlines():
            if line.startswith(">"):
                cur = line[1:]
                body[cur] = ""
            else:
                body[cur] += line
        for header, seq in body.items():
            name, rng_part = header.rsplit(":", 1)
            s, e = map(int, rng_part.split("-"))
            assert seq == seq_data[name][s:e]
            total += e - s
    assert total == sum(seqs.values())


def test_cli_fasta_plus_paf(tmp_path):
    fa, paf, seqs, seq_data = make_fasta(tmp_path)
    r = run_cli(
        "query", "-a", paf, "-r", "ref:100-700", "-d", "100", "-o",
        "fasta+paf", "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    lines = r.stdout.splitlines()
    assert any(l.startswith(">") for l in lines)
    paf_lines = [l for l in lines if "\tcg:Z:" in l]
    assert paf_lines
    for l in paf_lines:
        assert len(l.split("\t")) >= 16


def test_multi_file_index_cache_distinct(tmp_path):
    import random
    from impg_tpu.index.impg_index import index_path_for

    rng = random.Random(3)
    t1, _, _ = datagen.random_paf(rng, n_seqs=3, n_alns=5, n_ops=5)
    t2, _, _ = datagen.random_paf(rng, n_seqs=3, n_alns=5, n_ops=5)
    p1, p2, p3 = (str(tmp_path / f"{n}.paf") for n in "abc")
    for p, t in ((p1, t1), (p2, t2), (p3, t1)):
        open(p, "w").write(t)
    assert index_path_for([p1]) == p1 + ".impgt"
    assert index_path_for([p1, p2]) != index_path_for([p1, p3])


def test_per_file_index_caching_and_merge(tmp_path):
    """Multi-file load_or_build caches one artifact per file and merges in
    memory with identical query results to a combined one-shot build
    (reference: multi_impg.rs lazily-combined per-file caches)."""
    import os
    import random

    from impg_tpu.index.impg_index import ImpgIndex, load_or_build
    from impg_tpu.query import engine

    rng = random.Random(9)
    t1, seqs1, _ = datagen.random_paf(rng, n_seqs=4, n_alns=12, n_ops=8)
    t2, seqs2, _ = datagen.random_paf(rng, n_seqs=4, n_alns=12, n_ops=8)
    p1, p2 = str(tmp_path / "a.paf"), str(tmp_path / "b.paf")
    open(p1, "w").write(t1)
    open(p2, "w").write(t2)

    merged = load_or_build([p1, p2])
    # Per-file artifacts exist; no combined-digest artifact was created.
    assert os.path.exists(p1 + ".impgt") and os.path.exists(p2 + ".impgt")
    assert not any(
        ".multi-" in f for f in os.listdir(tmp_path)
    ), os.listdir(tmp_path)

    oneshot = ImpgIndex.from_paf_files([p1, p2])
    assert len(merged.records) == len(oneshot.records)
    assert len(merged.seq_index) == len(oneshot.seq_index)
    # Same query answers across every sequence (ids may be permuted, so
    # compare by name).
    def rows_by_name(idx, name, s, e):
        tid = idx.seq_index.get_id(name)
        out = set()
        for r in engine.query(idx, tid, s, e):
            out.add(
                (
                    idx.seq_index.get_name(r.q_id), r.q_first, r.q_last,
                    idx.seq_index.get_name(r.t_id), r.t_first, r.t_last,
                )
            )
        return out

    checked = 0
    for name in list(seqs1) + list(seqs2):
        if merged.seq_index.get_id(name) is None:
            continue
        L = merged.seq_index.get_len_from_id(
            merged.seq_index.get_id(name)
        )
        got = rows_by_name(merged, name, 0, L)
        want = rows_by_name(oneshot, name, 0, L)
        assert got == want, name
        checked += 1
    assert checked >= 4

    # Touching one file invalidates only that file's artifact (the other's
    # mtime ordering still serves its cache) and results stay correct.
    mtime_b = os.path.getmtime(p2 + ".impgt")
    os.utime(p1, None)
    merged2 = load_or_build([p1, p2])
    assert os.path.getmtime(p2 + ".impgt") == mtime_b
    assert len(merged2.records) == len(merged.records)
