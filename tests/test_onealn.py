"""ASCII 1aln tracepoint container: export + ingest round trip
(reference: onealn.rs record schema; impg.rs:873 CIGAR-from-tracepoints
reconstruction; notes/FAST_MODE_IMPLEMENTATION.md approximate contract)."""

import random

import numpy as np
import pytest

from impg_tpu.index.impg_index import ImpgIndex, load_or_build
from impg_tpu.io import onealn
from impg_tpu.query import engine
from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("onealn")
    rng = random.Random(61)
    text, seqs, alns, seq_data = datagen.mutate_chain_paf(
        rng, n_seqs=3, seq_len=4000, return_sequences=True
    )
    paf = str(tmp / "p.paf")
    fa = str(tmp / "p.fa")
    with open(paf, "w") as fh:
        fh.write(text)
    datagen.write_fasta(fa, seq_data)
    index = load_or_build([paf])
    tp = index.ensure_tracepoints(100)
    out = str(tmp / "p.1aln")
    n = onealn.write_1aln(out, index.seq_index, index.records, index.arena, tp)
    assert n == len(alns)
    return tmp, paf, fa, out, index, seqs, seq_data


def test_export_format(roundtrip):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    lines = open(out).read().splitlines()
    assert lines[0].startswith("1 3 aln")
    assert any(l.startswith("t 100") for l in lines)
    n_lines = [l for l in lines if l.startswith("N ")]
    assert len(n_lines) == len(index.seq_index)
    a_lines = [l for l in lines if l.startswith("A ")]
    t_lines = [l for l in lines if l.startswith("T ")]
    assert len(a_lines) == len(t_lines) > 0
    # T lists are count-prefixed TARGET deltas over the query grid
    # (impg.rs:714-746 FASTGA convention): they sum to the target span and
    # there is one entry per query-grid segment (first boundary at the next
    # absolute multiple of spacing after q_start).
    from impg_tpu.io.onealn import query_grid_bounds

    for al, tl in zip(a_lines, t_lines):
        af = al.split()
        tf = tl.split()
        assert int(tf[1]) == len(tf) - 2
        qs, qe = int(af[2]), int(af[3])
        t_span = abs(int(af[6]) - int(af[5]))
        assert sum(int(x) for x in tf[2:]) == t_span
        assert len(tf) - 2 == len(query_grid_bounds(qs, qe, 100)) - 1


def _rows_by_coords(index, rows):
    return sorted(
        (
            index.seq_index.get_name(r.q_id), r.q_first, r.q_last,
            index.seq_index.get_name(r.t_id), r.t_first, r.t_last,
        )
        for r in rows
    )


def test_ingest_approx_interval_parity(roundtrip):
    """Approximate ingest (no sequences): endpoints/strand/spans of every
    query answer match the PAF-built index exactly; CIGAR interiors are
    approximate by contract."""
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    idx2 = ImpgIndex.from_paf_files([out])
    assert len(idx2.records) == len(index.records)
    for name, L in seqs.items():
        tid1 = index.seq_index.get_id(name)
        tid2 = idx2.seq_index.get_id(name)
        got = _rows_by_coords(idx2, engine.query(idx2, tid2, 0, L))
        want = _rows_by_coords(index, engine.query(index, tid1, 0, L))
        assert got == want, name


def test_ingest_exact_reconstruction(roundtrip):
    """With sequences the native aligner rebuilds segment CIGARs: projected
    sub-range queries also agree with the PAF-built index (boundary
    coordinates inside segments need real runs)."""
    from impg_tpu.io.fasta import UnifiedSequenceIndex

    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    fetch = UnifiedSequenceIndex.from_files([fa]).fetch_sequence
    idx3 = ImpgIndex.from_paf_files([out], seq_fetch=fetch)
    mismatch = 0
    total = 0
    for name, L in seqs.items():
        tid1 = index.seq_index.get_id(name)
        tid3 = idx3.seq_index.get_id(name)
        for s, e in ((L // 4, 3 * L // 4), (137, 2000)):
            got = _rows_by_coords(idx3, engine.query(idx3, tid3, s, e))
            want = _rows_by_coords(index, engine.query(index, tid1, s, e))
            total += len(want)
            # Reconstruction is per-trace-segment: identical target spans,
            # query endpoints may differ by small per-segment alignment
            # ambiguity. Require exact row count and near-identical coords.
            assert len(got) == len(want), (name, s, e)
            for g, w in zip(got, want):
                assert g[0] == w[0] and g[3] == w[3]
                assert abs(g[1] - w[1]) <= 25 and abs(g[2] - w[2]) <= 25
                assert g[4] == w[4] and g[5] == w[5]
                if (g[1], g[2]) != (w[1], w[2]):
                    mismatch += 1
    assert total > 0
    # The vast majority reconstruct exactly.
    assert mismatch <= total // 5, (mismatch, total)


def test_cli_export_and_query_1aln(roundtrip, tmp_path):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    exported = str(tmp_path / "cli.1aln")
    r = run_cli("export-1aln", "-a", paf, "-o", exported)
    assert r.returncode == 0, r.stderr
    assert "Wrote" in r.stderr
    # Query directly from the 1aln (approximate ingest).
    L = len(seq_data["ref"])
    r = run_cli(
        "query", "-a", exported, "-r", f"ref:0-{L}", "-d", "100", "-x"
    )
    assert r.returncode == 0, r.stderr
    names = {l.split("\t")[0] for l in r.stdout.splitlines() if l}
    assert "ref" in names and names & {"s0", "s1"}, names


def test_binary_roundtrip_equivalence(roundtrip, tmp_path):
    """Binary container parses to the exact same SoA columns + runs as
    the ASCII form of the same index."""
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    from impg_tpu.core.seqidx import SequenceIndex

    bout = str(tmp_path / "p.bin.1aln")
    tp = index.ensure_tracepoints(100)
    n = onealn.write_1aln(
        bout, index.seq_index, index.records, index.arena, tp, binary=True
    )
    assert n > 0
    recs_a, sp_a = onealn.parse_1aln(out, SequenceIndex())
    recs_b, sp_b = onealn.parse_1aln(bout, SequenceIndex())
    assert sp_a == sp_b == 100
    for col in (
        "query_id", "q_start", "q_end", "target_id", "t_start", "t_end",
        "strand", "runs", "run_offsets",
    ):
        np.testing.assert_array_equal(
            getattr(recs_a, col), getattr(recs_b, col), err_msg=col
        )


def test_binary_container_structure(roundtrip, tmp_path):
    from impg_tpu.io import onecode

    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    bout = str(tmp_path / "s.1aln")
    tp = index.ensure_tracepoints(100)
    n = onealn.write_1aln(
        bout, index.seq_index, index.records, index.arena, tp, binary=True
    )
    assert onecode.is_onecode_binary(bout)
    assert not onecode.is_onecode_binary(out)  # ASCII form
    r = onecode.OneBinaryReader(bout)
    assert r.file_type == "aln"
    assert r.counts["A"] == n
    assert r.counts["N"] == len(index.seq_index)
    assert set(onealn.ALN_SCHEMA) <= set(r.schema)
    assert len(r.index["A"]) == n
    # header declares list stats for T/X lines
    assert r.list_total["T"] == r.list_total["X"] > 0


def test_onealn_reader_goto(roundtrip, tmp_path):
    """O(1) fetch returns the same record as the ASCII stream, in any
    access order (onealn.rs:93 fetch_alignment_from_reader role)."""
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    bout = str(tmp_path / "g.1aln")
    tp = index.ensure_tracepoints(100)
    n = onealn.write_1aln(
        bout, index.seq_index, index.records, index.arena, tp, binary=True
    )
    # Collect ASCII records in file order for comparison.
    ascii_recs = []
    cur = None
    for lt, fields in onealn.iter_1aln_lines(out):
        if lt == "A":
            cur = {
                "coords": tuple(fields), "strand": "+",
                "T": [], "X": [], "D": 0,
            }
            ascii_recs.append(cur)
        elif lt == "R":
            cur["strand"] = "-"
        elif lt == "T":
            cur["T"] = fields[0]
        elif lt == "X":
            cur["X"] = fields[0]
        elif lt == "D":
            cur["D"] = int(fields[0])
    assert len(ascii_recs) == n
    rd = onealn.OneAlnReader(bout)
    assert rd.n_alignments == n
    assert rd.trace_spacing == 100
    for i in [n - 1, 0, n // 2, n - 1, 1 % n]:  # out-of-order access
        got = rd.fetch_alignment(i)
        want = ascii_recs[i]
        assert (
            got["query_id"], got["q_start"], got["q_end"],
            got["target_id"], got["t_start"], got["t_end"],
        ) == want["coords"], i
        assert got["strand"] == want["strand"]
        assert got["tracepoints"] == want["T"]
        assert got["diffs"] == want["X"]
        assert got["differences"] == want["D"]
    with pytest.raises(IndexError):
        rd.fetch_alignment(n)
    with pytest.raises(ValueError):
        onealn.OneAlnReader(out)  # ASCII: no object index


def test_cli_export_binary_and_query(roundtrip, tmp_path):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    exported = str(tmp_path / "cli.bin.1aln")
    r = run_cli("export-1aln", "-a", paf, "--binary", "-o", exported)
    assert r.returncode == 0, r.stderr
    assert "binary" in r.stderr
    L = len(seq_data["ref"])
    rb = run_cli(
        "query", "-a", exported, "-r", f"ref:0-{L}", "-d", "100", "-x"
    )
    ra = run_cli("query", "-a", out, "-r", f"ref:0-{L}", "-d", "100", "-x")
    assert rb.returncode == 0, rb.stderr
    assert rb.stdout == ra.stdout  # binary ingest == ASCII ingest


def test_upstream_binary_1aln_rejected(tmp_path):
    """A ONElib-style binary .1aln (ASCII header + binary payload, no
    framework footer) errors with the ONEview conversion path."""
    p = tmp_path / "up.1aln"
    p.write_bytes(b"1 3 aln 3 1\n" + bytes(range(256)) * 4)
    with pytest.raises(ValueError, match="ONEview"):
        list(onealn.iter_1aln_lines(str(p)))


def test_ascii_1aln_without_name_table_rejected(tmp_path):
    """Upstream ASCII .1aln resolves names via an external .1gdb skeleton;
    without embedded N lines the parser must error precisely, not emit
    bogus ids."""
    from impg_tpu.core.seqidx import SequenceIndex

    p = tmp_path / "ext.1aln"
    p.write_text(
        "1 3 aln 1 1\nt 100\nA 0 0 500 1 0 500\nT 1 500\nX 1 3\nD 3\n"
    )
    with pytest.raises(ValueError, match="1gdb"):
        onealn.parse_1aln(str(p), SequenceIndex())


def test_fastga_lists_terminal_deletions():
    """Leading/trailing D runs advance the target at zero query progress;
    T must still sum to the target span and X must count the deleted bp
    (round-2 review: the cq searchsorted walk dropped them at the
    alignment endpoints)."""
    from impg_tpu.core import cigar
    from impg_tpu.io.onealn import _fastga_lists

    trail = cigar.pack(
        np.asarray([10, 5], np.int64),
        np.asarray([cigar.OP_EQ, cigar.OP_D], np.uint32),
    )
    lead = cigar.pack(
        np.asarray([5, 10], np.int64),
        np.asarray([cigar.OP_D, cigar.OP_EQ], np.uint32),
    )
    for runs in (trail, lead):
        for spacing in (4, 100):
            for rev in (False, True):
                T, X, D = _fastga_lists(runs, 0, 10, spacing, rev)
                assert sum(T) == 15, (runs, spacing, rev, T)
                assert D == 5
                assert sum(X) == 5, (runs, spacing, rev, X)
    # Leading D belongs to the first query-grid segment.
    T, X, D = _fastga_lists(lead, 0, 10, 4, False)
    assert T == [9, 4, 2] and X == [5, 0, 0]


def test_onecode_writer_guards(tmp_path):
    """Round-2 review fixes: INT fields outside int64 raise instead of
    spinning the varint loop forever; writes after close() raise instead
    of silently dropping data."""
    import pytest

    from impg_tpu.io.onecode import T_INT, OneBinaryWriter

    p = str(tmp_path / "g.1x")
    w = OneBinaryWriter(p, "tst", schema={"A": (T_INT,)}, indexed=("A",))
    w.write("A", -(2**63))  # int64 min is fine
    with pytest.raises(OverflowError, match="int64"):
        w.write("A", -(2**63) - 1)
    with pytest.raises(OverflowError, match="int64"):
        w.write("A", 2**63)
    w.close()
    with pytest.raises(ValueError, match="closed"):
        w.write("A", 1)


def test_onecode_writer_spills_large_bodies(tmp_path):
    """Bodies over the spill limit stream through a temp file; the output
    bytes are identical to the all-in-RAM path."""
    from impg_tpu.io.onecode import T_INT, T_STRING, OneBinaryWriter

    def fill(path, limit=None):
        w = OneBinaryWriter(
            path, "tst", schema={"A": (T_INT, T_STRING)}, indexed=("A",)
        )
        if limit:
            w._spill_limit = limit
        for i in range(2000):
            w.write("A", i * 7 - 3, "x" * (i % 40))
        w.close()

    p1, p2 = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    fill(p1)
    fill(p2, limit=512)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_describe_onecode_header_on_own_export(roundtrip, tmp_path):
    """The header probe reads our own binary container's ASCII header —
    the grammar is shared with upstream ONElib (onealn.rs:50)."""
    from impg_tpu.io import onecode

    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    bout = str(tmp_path / "d.1aln")
    tp = index.ensure_tracepoints(100)
    n = onealn.write_1aln(
        bout, index.seq_index, index.records, index.arena, tp, binary=True
    )
    info = onecode.describe_onecode_header(bout)
    assert info is not None
    assert info["filetype"] == "aln"
    assert info["binary"] is True
    assert info["counts"].get("A") == n
    assert "A" in info["schema"]
    assert len(info["missing"]) == 3
    summary = onecode.describe_onecode_summary(bout)
    assert "type 'aln'" in summary and "binary" in summary


def test_upstream_onelib_binary_recognized_and_described(tmp_path):
    """A ONElib-style binary .1aln (ASCII header + compressed payload,
    no container footer) is recognized and described in the ingest error
    with the documented missing-codec gap list (VERDICT round-2 ask #7;
    onealn.rs:14-93)."""
    import pytest

    p = str(tmp_path / "upstream.1aln")
    header = (
        b"1 3 aln 2 2\n"
        b"2 3 sxs\n"
        b"! 6 FastGA 5 1.0.2 9 <command> 8 20250101\n"
        b"# A 42\n"
        b"# T 42\n"
        b"@ T 99\n"
        b"$ 0\n"
    )
    with open(p, "wb") as fh:
        fh.write(header + bytes(range(256)) * 8)
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.io import onecode

    info = onecode.describe_onecode_header(p)
    assert info["filetype"] == "aln" and info["version"] == "2.2"
    assert info["subtype"] == "sxs"
    assert info["counts"] == {"A": 42, "T": 42}
    assert info["binary"] is True
    assert info["provenance"][0][0] == "FastGA"
    with pytest.raises(ValueError) as ei:
        onealn.parse_1aln(p, SequenceIndex())
    msg = str(ei.value)
    assert "recognized" in msg and "FastGA" in msg
    assert "42 'A'" in msg
    assert "missing codec facts" in msg and "footer" in msg
    assert "ONEview" in msg  # conversion path still offered
