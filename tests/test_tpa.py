"""Binary TPA tracepoint container: export + ingest round trip
(reference: tpa_parser.rs TpaParser/fetch_alignment data model)."""

import random

import numpy as np
import pytest

from impg_tpu.core import cigar
from impg_tpu.index.impg_index import ImpgIndex, load_or_build
from impg_tpu.io import tpa
from impg_tpu.query import engine
from tests import datagen
from tests.test_cli import run_cli


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tpa")
    rng = random.Random(62)
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
    out = str(tmp / "p.tpa")
    n = tpa.write_tpa(out, index.seq_index, index.records, index.arena, tp)
    assert n == len(alns)
    return tmp, paf, fa, out, index, seqs, seq_data


def _rows_by_coords(index, rows):
    return sorted(
        (
            index.seq_index.get_name(r.q_id), r.q_first, r.q_last,
            index.seq_index.get_name(r.t_id), r.t_first, r.t_last,
        )
        for r in rows
    )


def test_header_and_layout(roundtrip):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    assert tpa.read_trace_spacing(out) == 100
    with np.load(out, allow_pickle=False) as z:
        assert str(z["tp_type"]) == "fastga"
        n = len(z["query_id"])
        assert n > 0
        assert len(z["tp_off"]) == n + 1
        assert z["tp_off"][-1] == len(z["tp_a"]) == len(z["tp_b"])
        # Fastga pairs: per-record target deltas sum to the target span.
        for r in range(n):
            lo, hi = int(z["tp_off"][r]), int(z["tp_off"][r + 1])
            t_span = int(z["t_end"][r]) - int(z["t_start"][r])
            assert int(z["tp_b"][lo:hi].sum()) == t_span


def test_ingest_approx_interval_parity(roundtrip):
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
            assert len(got) == len(want), (name, s, e)
            for g, w in zip(got, want):
                assert g[0] == w[0] and g[3] == w[3]
                assert abs(g[1] - w[1]) <= 25 and abs(g[2] - w[2]) <= 25
                assert g[4] == w[4] and g[5] == w[5]
                if (g[1], g[2]) != (w[1], w[2]):
                    mismatch += 1
    assert total > 0
    assert mismatch <= total // 5, (mismatch, total)


def test_standard_mode_roundtrip(roundtrip, tmp_path):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    tp = index.ensure_tracepoints(100)
    out2 = str(tmp_path / "std.tpa")
    tpa.write_tpa(
        out2, index.seq_index, index.records, index.arena, tp,
        tp_type="standard",
    )
    with np.load(out2, allow_pickle=False) as z:
        assert str(z["tp_type"]) == "standard"
        # Standard pairs: query deltas sum to the query span.
        for r in range(len(z["query_id"])):
            lo, hi = int(z["tp_off"][r]), int(z["tp_off"][r + 1])
            q_span = abs(int(z["q_end"][r]) - int(z["q_start"][r]))
            assert int(z["tp_a"][lo:hi].sum()) == q_span
    idx2 = ImpgIndex.from_paf_files([out2])
    for name, L in seqs.items():
        got = _rows_by_coords(
            idx2, engine.query(idx2, idx2.seq_index.get_id(name), 0, L)
        )
        want = _rows_by_coords(
            index, engine.query(index, index.seq_index.get_id(name), 0, L)
        )
        assert got == want, name


def test_mixed_literal_cigar_items(tmp_path):
    """Mixed-encoding CigarOp items replay literally on ingest
    (tpa_parser.rs:189 MixedRepresentation)."""
    from impg_tpu.core.seqidx import SequenceIndex

    si = SequenceIndex()
    a = si.get_or_insert_id("a", 300)
    b = si.get_or_insert_id("b", 310)
    names, lengths = si.to_arrays()
    # One record: 100= 10I 100= (query 210bp, target 200bp), as mixed items.
    np.savez_compressed(
        tmp_path / "m.tpa.npz",
        version=np.int64(1),
        tp_type=np.str_("mixed"),
        complexity_metric=np.str_("edit"),
        max_complexity=np.int64(100),
        distance=np.str_("edit"),
        names=names.astype(str),
        lengths=np.asarray(lengths, np.int64),
        query_id=np.asarray([0], np.int32),
        target_id=np.asarray([1], np.int32),
        strand=np.asarray([0], np.int8),
        q_start=np.asarray([0], np.int64),
        q_end=np.asarray([210], np.int64),
        t_start=np.asarray([10], np.int64),
        t_end=np.asarray([210], np.int64),
        tp_kind=np.asarray([1, 1, 1], np.uint8),
        tp_a=np.asarray(
            [cigar.OP_EQ, cigar.OP_I, cigar.OP_EQ], np.int64
        ),
        tp_b=np.asarray([100, 10, 100], np.int64),
        tp_off=np.asarray([0, 3], np.int64),
    )
    import os

    os.replace(tmp_path / "m.tpa.npz", tmp_path / "m.tpa")
    si2 = SequenceIndex()
    recs, spacing = tpa.parse_tpa(str(tmp_path / "m.tpa"), si2)
    assert spacing == 100
    runs = recs.runs[recs.run_offsets[0] : recs.run_offsets[1]]
    lens = cigar.run_len(runs).tolist()
    ops = cigar.run_op(runs).tolist()
    assert lens == [100, 10, 100]
    assert ops == [cigar.OP_EQ, cigar.OP_I, cigar.OP_EQ]


def test_cli_export_and_query_tpa(roundtrip, tmp_path):
    tmp, paf, fa, out, index, seqs, seq_data = roundtrip
    exported = str(tmp_path / "cli.tpa")
    r = run_cli("export-tpa", "-a", paf, "-o", exported)
    assert r.returncode == 0, r.stderr
    assert "Wrote" in r.stderr
    name = "ref"
    r = run_cli(
        "query", "-a", exported, "-r", f"{name}:500-1500", "-d", "100",
        "-o", "bed",
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip(), "expected BED rows from .tpa-backed query"
    # With sequences: exact reconstruction path.
    r = run_cli(
        "query", "-a", exported, "-r", f"{name}:500-1500", "-d", "100",
        "-o", "bed", "--sequence-files", fa,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()
