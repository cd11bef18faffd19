"""CLI-level compute-engine surface: `--compute-engine mesh` (sharded
engine over the virtual 8-device CPU mesh) must be bit-identical to the
host engine through the product path, and `auto` must degrade to host on
CPU (VERDICT round-1: the mesh engines were library-only)."""

import random

import pytest

from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def mesh_workload(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("climesh")
    rng = random.Random(4242)
    text, seqs, alns = datagen.pangenome_paf(
        rng, n_seqs=5, seq_len=8000, cross_links=2
    )
    paf = str(tmp / "m.paf")
    with open(paf, "w") as fh:
        fh.write(text)
    bed = str(tmp / "t.bed")
    with open(bed, "w") as fh:
        for name, L in list(seqs.items())[:4]:
            fh.write(f"{name}\t100\t{max(200, L // 2)}\n")
    return paf, bed


def _query(paf, bed, eng, *extra):
    r = run_cli(
        "query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "bed",
        "--compute-engine", eng, *extra,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_cli_mesh_query_bit_identical_to_host(mesh_workload):
    paf, bed = mesh_workload
    host = _query(paf, bed, "host")
    mesh = _query(paf, bed, "mesh")
    assert host and host == mesh


def test_cli_device_query_bit_identical_to_host(mesh_workload):
    paf, bed = mesh_workload
    host = _query(paf, bed, "host")
    dev = _query(paf, bed, "device")
    assert host == dev


def test_cli_auto_matches_host(mesh_workload):
    """auto routes default-filter transitive queries to the C++ engine
    (no accelerator init); output stays bit-identical to host."""
    paf, bed = mesh_workload
    host = _query(paf, bed, "host")
    auto = _query(paf, bed, "auto")
    assert host == auto


def test_cli_native_engine_bit_identical_to_host(mesh_workload):
    paf, bed = mesh_workload
    host = _query(paf, bed, "host")
    native = _query(paf, bed, "native")
    assert host and host == native


def test_cli_native_engine_rejects_unsupported_filters(mesh_workload):
    """Explicit --compute-engine native with filters the C++ engine does
    not cover (CIGAR-bearing PAF output) is a hard error, not a silent
    fallback."""
    paf, bed = mesh_workload
    r = run_cli(
        "query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "paf",
        "--compute-engine", "native",
    )
    assert r.returncode == 2
    assert "CIGAR-bearing" in r.stderr


def test_cli_mesh_paf_output(mesh_workload):
    """CIGAR-bearing output through the mesh engine (store_cigar path)."""
    paf, bed = mesh_workload
    r_host = run_cli(
        "query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "paf",
        "--compute-engine", "host",
    )
    r_mesh = run_cli(
        "query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "paf",
        "--compute-engine", "mesh",
    )
    assert r_host.returncode == 0 and r_mesh.returncode == 0, (
        r_host.stderr + r_mesh.stderr
    )
    assert r_host.stdout and r_host.stdout == r_mesh.stdout


def test_cli_refine_mesh_matches_host(mesh_workload):
    paf, bed = mesh_workload
    args = (
        "refine", "-a", paf, "-b", bed, "-d", "200",
        "--max-extension", "0.2",
    )
    r_host = run_cli(*args, "--compute-engine", "host")
    r_mesh = run_cli(*args, "--compute-engine", "mesh")
    assert r_host.returncode == 0 and r_mesh.returncode == 0, (
        r_host.stderr + r_mesh.stderr
    )
    assert r_host.stdout and r_host.stdout == r_mesh.stdout


def test_cli_partition_native_matches_host(mesh_workload, tmp_path):
    """Partition's masked per-window walks run natively (auto) with
    bit-identical partitions.bed."""
    paf, _bed = mesh_workload
    outs = {}
    for eng in ("host", "native"):
        folder = tmp_path / f"parts_{eng}"
        r = run_cli(
            "partition", "-a", paf, "-w", "4000", "-d", "100",
            "--min-missing-size", "200", "--min-boundary-distance", "200",
            "--output-folder", str(folder), "--compute-engine", eng,
        )
        assert r.returncode == 0, r.stderr
        outs[eng] = (folder / "partitions.bed").read_text()
    assert outs["host"] and outs["host"] == outs["native"]


def test_cli_refine_native_matches_host(mesh_workload):
    paf, bed = mesh_workload
    args = (
        "refine", "-a", paf, "-b", bed, "-d", "200",
        "--max-extension", "0.2", "-x",
    )
    r_host = run_cli(*args, "--compute-engine", "host")
    r_nat = run_cli(*args, "--compute-engine", "native")
    assert r_host.returncode == 0 and r_nat.returncode == 0, (
        r_host.stderr + r_nat.stderr
    )
    assert r_host.stdout and r_host.stdout == r_nat.stdout


def test_cli_similarity_native_matches_host(mesh_workload, tmp_path):
    import random as _random

    paf, bed = mesh_workload
    # Similarity needs sequences; synthesize a FASTA matching the PAF's
    # names/lengths (both engines read the same file).
    from impg_tpu.index.impg_index import load_or_build

    idx = load_or_build([paf])
    rng = _random.Random(5)
    fa = tmp_path / "seqs.fa"
    with open(fa, "w") as fh:
        for i in range(len(idx.seq_index)):
            name = idx.seq_index.get_name(i)
            L = idx.seq_index.get_len_from_id(i)
            fh.write(f">{name}\n")
            fh.write("".join(rng.choice("ACGT") for _ in range(L)) + "\n")
    args = ("similarity", "-a", paf, "-b", bed, "-d", "200", "-x",
            "--sequence-files", str(fa))
    r_host = run_cli(*args, "--compute-engine", "host")
    r_nat = run_cli(*args, "--compute-engine", "native")
    assert r_host.returncode == 0 and r_nat.returncode == 0, (
        r_host.stderr + r_nat.stderr
    )
    assert r_host.stdout and r_host.stdout == r_nat.stdout


def test_cli_native_min_identity_matches_host(mesh_workload):
    paf, bed = mesh_workload
    args = ("query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "bed",
            "--min-result-identity", "0.9")
    host = run_cli(*args, "--compute-engine", "host")
    nat = run_cli(*args, "--compute-engine", "native")
    assert host.returncode == 0 and nat.returncode == 0, (
        host.stderr + nat.stderr
    )
    assert host.stdout and host.stdout == nat.stdout


def test_cli_native_subset_and_min_length_match_host(mesh_workload,
                                                     tmp_path):
    paf, bed = mesh_workload
    from impg_tpu.index.impg_index import load_or_build

    idx = load_or_build([paf])
    sub = tmp_path / "subset.txt"
    names = [idx.seq_index.get_name(i) for i in range(len(idx.seq_index))]
    sub.write_text("\n".join(names[::2]) + "\n")
    args = ("query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "bed",
            "--subset-sequence-list", str(sub), "-l", "500")
    host = run_cli(*args, "--compute-engine", "host")
    nat = run_cli(*args, "--compute-engine", "native")
    assert host.returncode == 0 and nat.returncode == 0, (
        host.stderr + nat.stderr
    )
    assert host.stdout and host.stdout == nat.stdout


def test_cli_native_approximate_matches_host(mesh_workload):
    paf, bed = mesh_workload
    args = ("query", "-a", paf, "-b", bed, "-d", "200", "-x", "-o", "bed",
            "--approximate")
    host = run_cli(*args, "--compute-engine", "host")
    nat = run_cli(*args, "--compute-engine", "native")
    assert host.returncode == 0 and nat.returncode == 0, (
        host.stderr + nat.stderr
    )
    assert host.stdout and host.stdout == nat.stdout
