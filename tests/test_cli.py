"""End-to-end CLI tests driving `python -m impg_tpu.cli` as a subprocess,
mirroring the reference's integration-test style (SURVEY.md §4)."""

import os
import random
import subprocess
import sys

import pytest

from tests import datagen

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, cwd=None):
    from tests.envutil import cpu_env

    env = cpu_env(IMPG_TPU_PLATFORM="cpu")  # keep children off the real chip
    return subprocess.run(
        [sys.executable, "-m", "impg_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
    )


@pytest.fixture(scope="module")
def chain_paf(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = random.Random(99)
    text, seqs, alns = datagen.mutate_chain_paf(rng, n_seqs=4, seq_len=3000)
    path = str(tmp / "chain.paf")
    with open(path, "w") as fh:
        fh.write(text)
    return path, seqs, alns


def test_cli_query_bed(chain_paf):
    path, seqs, alns = chain_paf
    r = run_cli("query", "-a", path, "-r", "ref:500-1500", "-d", "100", "-o", "bed")
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l]
    assert lines, r.stdout
    fields = [l.split("\t") for l in lines]
    assert all(len(f) == 6 for f in fields)
    names = {f[0] for f in fields}
    assert "ref" in names and "s0" in names
    assert all(f[3] == "ref:500-1500" for f in fields)
    # deterministic: run twice -> identical
    r2 = run_cli("query", "-a", path, "-r", "ref:500-1500", "-d", "100", "-o", "bed")
    assert r2.stdout == r.stdout


def test_cli_query_transitive(chain_paf):
    path, seqs, alns = chain_paf
    r = run_cli(
        "query", "-a", path, "-r", "ref:500-1500", "-d", "100", "-x", "-m", "3",
        "-o", "bed",
    )
    assert r.returncode == 0, r.stderr
    names = {l.split("\t")[0] for l in r.stdout.splitlines() if l}
    assert {"ref", "s0", "s1", "s2"} <= names


def test_cli_query_paf_roundtrip(chain_paf):
    path, seqs, alns = chain_paf
    r = run_cli(
        "query", "-a", path, "-r", "ref:0-3000", "-d", "0", "-o", "paf"
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.splitlines() if l]
    assert lines
    for l in lines:
        f = l.split("\t")
        assert len(f) >= 16
        assert f[4] in "+-"
        assert f[14].startswith("cg:Z:")
        # CIGAR spans consistent with coordinates
        import re

        runs = re.findall(r"(\d+)([=XIDM])", f[14][5:])
        q_span = sum(int(n) for n, op in runs if op != "D")
        t_span = sum(int(n) for n, op in runs if op != "I")
        assert q_span == int(f[3]) - int(f[2])
        assert t_span == int(f[8]) - int(f[7])


def test_cli_query_bedpe(chain_paf):
    path, seqs, alns = chain_paf
    r = run_cli("query", "-a", path, "-r", "ref:100-900", "-d", "50", "-o", "bedpe")
    assert r.returncode == 0, r.stderr
    for l in r.stdout.splitlines():
        f = l.split("\t")
        assert len(f) == 12
        assert f[10].startswith("gi:f:")
        assert f[11].startswith("bi:f:")
        gi = float(f[10][5:])
        assert 0.0 <= gi <= 1.0


def test_cli_bed_batch(chain_paf, tmp_path):
    path, seqs, alns = chain_paf
    bed = tmp_path / "targets.bed"
    bed.write_text("ref\t100\t600\tlocusA\nref\t1500\t2000\n")
    r = run_cli(
        "query", "-a", path, "-b", str(bed), "-d", "100", "-o", "bed"
    )
    assert r.returncode == 0, r.stderr
    names = {l.split("\t")[3] for l in r.stdout.splitlines() if l}
    assert names == {"locusA", "ref:1500-2000"}


def test_cli_errors(chain_paf):
    path, _, _ = chain_paf
    r = run_cli("query", "-a", path, "-r", "ref:500-1500", "-o", "bed")
    assert r.returncode == 2
    assert "merge-distance" in r.stderr
    r = run_cli("query", "-a", path, "-r", "nope:1-10", "-d", "0")
    assert r.returncode == 1
    assert "not found" in r.stderr
    r = run_cli("query", "-a", path, "-r", "ref:1-999999999", "-d", "0")
    assert r.returncode == 1
    assert "exceeds" in r.stderr
    r = run_cli("query", "-a", path, "-d", "0")
    assert r.returncode == 2


def test_cli_index_and_stats(chain_paf, tmp_path):
    path, seqs, alns = chain_paf
    idx = str(tmp_path / "x.impgt")
    r = run_cli("index", "-a", path, "--index", idx)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(idx)
    r = run_cli("stats", "-a", path, "--index", idx)
    assert r.returncode == 0, r.stderr
    assert "Directed intervals" in r.stdout
    r = run_cli("stats", "-a", path, "--index", idx, "--list-sequences")
    assert "ref" in r.stdout


def test_cli_no_merge_and_subset(chain_paf, tmp_path):
    path, seqs, alns = chain_paf
    r_all = run_cli(
        "query", "-a", path, "-r", "ref:500-1500", "--no-merge", "-x", "-o", "bed"
    )
    assert r_all.returncode == 0, r_all.stderr
    subset = tmp_path / "subset.txt"
    subset.write_text("s0\n")
    r_sub = run_cli(
        "query", "-a", path, "-r", "ref:500-1500", "--no-merge", "-x", "-o", "bed",
        "--subset-sequence-list", str(subset),
    )
    names = {l.split("\t")[0] for l in r_sub.stdout.splitlines() if l}
    assert names <= {"ref", "s0"}
    all_names = {l.split("\t")[0] for l in r_all.stdout.splitlines() if l}
    assert "s1" in all_names


def test_cli_device_engine_equivalence(chain_paf, tmp_path):
    path, seqs, alns = chain_paf
    bed = tmp_path / "t.bed"
    bed.write_text("ref\t200\t900\n ref\t1200\t2000\n".replace(" ", ""))
    base = ["query", "-a", path, "-b", str(bed), "-d", "100", "-x", "-m", "3",
            "-o", "bed"]
    r_host = run_cli(*base)
    r_dev = run_cli(*base, "--compute-engine", "device")
    assert r_host.returncode == 0, r_host.stderr
    assert r_dev.returncode == 0, r_dev.stderr
    assert r_host.stdout == r_dev.stdout


def test_cli_partition(chain_paf, tmp_path):
    path, seqs, alns = chain_paf
    out = tmp_path / "parts"
    r = run_cli(
        "partition", "-a", path, "-w", "1500", "-d", "100",
        "--min-missing-size", "200", "--min-boundary-distance", "200",
        "--output-folder", str(out),
    )
    assert r.returncode == 0, r.stderr
    lines = (out / "partitions.bed").read_text().splitlines()
    assert lines
    # Every sequence fully covered by disjoint intervals.
    cov = {}
    for l in lines:
        name, s, e, p = l.split("\t")
        cov.setdefault(name, []).append((int(s), int(e)))
    for name, L in seqs.items():
        ivs = sorted(cov.get(name, []))
        total = 0
        prev_end = 0
        for s, e in ivs:
            assert s >= prev_end  # disjoint
            total += e - s
            prev_end = e
        assert total == L, name


def test_sequence_list_flag(tmp_path):
    """--sequence-list resolves a file of sequence paths and is mutually
    exclusive with --sequence-files (SequenceOpts::resolve_sequence_files,
    main.rs:4126)."""
    import random

    from tests import datagen

    rng = random.Random(11)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=2000, return_sequences=True
    )
    paf = str(tmp_path / "s.paf")
    fa = str(tmp_path / "s.fa")
    lst = str(tmp_path / "seqs.txt")
    with open(paf, "w") as fh:
        fh.write(text)
    datagen.write_fasta(fa, seq_data)
    with open(lst, "w") as fh:
        fh.write("# comment line\n" + fa + "\n")
    L = len(seq_data["ref"])
    via_files = run_cli(
        "query", "-a", paf, "-r", f"ref:0-{L}", "-d", "100",
        "-o", "fasta", "--sequence-files", fa,
    )
    via_list = run_cli(
        "query", "-a", paf, "-r", f"ref:0-{L}", "-d", "100",
        "-o", "fasta", "--sequence-list", lst,
    )
    assert via_files.returncode == 0, via_files.stderr
    assert via_list.returncode == 0, via_list.stderr
    assert via_list.stdout == via_files.stdout
    both = run_cli(
        "query", "-a", paf, "-r", f"ref:0-{L}", "-d", "100",
        "-o", "fasta", "--sequence-files", fa, "--sequence-list", lst,
    )
    assert both.returncode == 2
    assert "both" in both.stderr
    missing = run_cli(
        "query", "-a", paf, "-r", f"ref:0-{L}", "-d", "100",
        "-o", "fasta", "--sequence-list", str(tmp_path / "nope.txt"),
    )
    assert missing.returncode == 2


def test_cli_stats_region_depth(chain_paf, tmp_path):
    """`stats -r/-b` prints per-region overlapping directed-record counts;
    the pallas-backed device path (DeviceEngine.stab_counts) and the host
    stab agree (reference role: main.rs:13194 print_stats accounting)."""
    path, seqs, alns = chain_paf
    host = run_cli("stats", "-a", path, "-r", "ref:500-1500",
                   "--compute-engine", "host")
    assert host.returncode == 0, host.stderr
    lines = host.stdout.strip().splitlines()
    assert lines[0] == "Region\tOverlapping_records"
    region, count = lines[1].split("\t")
    assert region == "ref:500-1500" and int(count) > 0
    dev = run_cli("stats", "-a", path, "-r", "ref:500-1500",
                  "--compute-engine", "device")
    assert dev.returncode == 0, dev.stderr
    assert dev.stdout == host.stdout
    # BED batch
    bed = tmp_path / "regions.bed"
    bed.write_text("ref\t100\t400\nref\t500\t1500\n")
    r = run_cli("stats", "-a", path, "-b", str(bed),
                "--compute-engine", "device")
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.strip().splitlines()) == 3
    assert f"ref:500-1500\t{count}" in r.stdout
    # unknown sequence errors like query
    r = run_cli("stats", "-a", path, "-r", "nope:0-10")
    assert r.returncode == 2
