"""Plain query engine vs the serial oracle, plus index round-trips."""

import os
import random

import numpy as np

from impg_tpu.core import cigar
from impg_tpu.core.seqidx import SequenceIndex
from impg_tpu.index.impg_index import ImpgIndex, load_or_build
from impg_tpu.io import paf as paf_mod
from impg_tpu.query import engine
from tests import datagen, pyref


def index_from_text(text: str, tmp_path=None, bidirectional=True) -> ImpgIndex:
    seq_index = SequenceIndex()
    recs = paf_mod.parse_paf_bytes(text.encode(), seq_index)
    import impg_tpu.core.arena as arena_mod

    records, arena = arena_mod.build_directed(
        query_id=recs.query_id,
        q_start=recs.q_start,
        q_end=recs.q_end,
        target_id=recs.target_id,
        t_start=recs.t_start,
        t_end=recs.t_end,
        strand=recs.strand,
        runs=recs.runs,
        run_offsets=recs.run_offsets,
        bidirectional=bidirectional,
    )
    return ImpgIndex._finalize(seq_index, records, arena, ["<memory>"])


def oracle_query(index, alns, target_name, start, end, seq_index):
    """Brute-force oracle: project the range through every directed alignment."""
    rows = {(target_name, start, end, target_name, start, end)}  # self row
    out = [(target_name, start, end)]
    for a in alns:
        for reversed_ in (False, True):
            if reversed_:
                if a["qname"] == a["tname"]:
                    continue
                tname, t0, te = a["qname"], a["qstart"], a["qend"]
                qname = a["tname"]
                rec = (a["qstart"], a["qend"], a["tstart"], a["tend"], a["strand"])
                ops = pyref.invert_ops(a["ops"], a["strand"])
            else:
                tname, t0, te = a["tname"], a["tstart"], a["tend"]
                qname = a["qname"]
                rec = (a["tstart"], a["tend"], a["qstart"], a["qend"], a["strand"])
                ops = a["ops"]
            if tname != target_name:
                continue
            # closed-interval stab
            if t0 > end or te < start:
                continue
            proj = pyref.project((start, end), rec, ops)
            if proj is not None:
                pq_s, pq_e, _, _, _ = proj
                out.append((qname, pq_s, pq_e))
    return out


def test_plain_query_vs_oracle():
    rng = random.Random(21)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=5, n_alns=50, n_ops=12)
    index = index_from_text(text)
    for _ in range(60):
        target_name = rng.choice(list(seqs))
        tid = index.seq_index.get_id(target_name)
        L = seqs[target_name]
        a = rng.randint(0, max(0, L - 2))
        b = rng.randint(a + 1, L)
        rows = engine.query(index, tid, a, b)
        got = sorted(
            (index.seq_index.get_name(r.q_id), r.q_first, r.q_last) for r in rows
        )
        expected = sorted(oracle_query(index, alns, target_name, a, b, seqs))
        assert got == expected


def test_query_self_row_first_and_cigar():
    rng = random.Random(5)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=3, n_alns=10, n_ops=8)
    index = index_from_text(text)
    tid = index.seq_index.get_id(alns[0]["tname"])
    s, e = alns[0]["tstart"], alns[0]["tend"]
    rows = engine.query(index, tid, s, e, store_cigar=True)
    assert rows[0].q_id == tid and rows[0].q_first == s and rows[0].q_last == e
    assert cigar.format_runs(rows[0].cigar) == f"{e - s}="
    # Every CIGAR-bearing row's runs are consistent with its interval spans.
    for r in rows[1:]:
        lens = cigar.run_len(r.cigar)
        ops = cigar.run_op(r.cigar)
        q_span = int(lens[ops != cigar.OP_D].sum())
        t_span = int(lens[ops != cigar.OP_I].sum())
        assert abs(r.q_last - r.q_first) == q_span
        assert r.t_last - r.t_first == t_span


def test_min_identity_filter():
    # One perfect alignment, one noisy alignment.
    lines = [
        datagen.make_paf_line("good", 100, 0, 100, "+", "t", 100, 0, 100,
                              pyref.parse_cigar("100=")),
        datagen.make_paf_line("bad", 100, 0, 100, "+", "t", 100, 0, 100,
                              pyref.parse_cigar("50=50X")),
    ]
    index = index_from_text("\n".join(lines) + "\n")
    tid = index.seq_index.get_id("t")
    rows = engine.query(index, tid, 0, 100, min_identity=0.9)
    names = {index.seq_index.get_name(r.q_id) for r in rows}
    assert names == {"t", "good"}
    rows = engine.query(index, tid, 0, 100, min_identity=0.2)
    names = {index.seq_index.get_name(r.q_id) for r in rows}
    assert names == {"t", "good", "bad"}


def test_index_save_load_roundtrip(tmp_path):
    rng = random.Random(9)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=4, n_alns=30, n_ops=10)
    paf_path = str(tmp_path / "test.paf")
    with open(paf_path, "w") as fh:
        fh.write(text)
    idx1 = ImpgIndex.from_paf_files([paf_path])
    index_path = str(tmp_path / "test.impgt")
    idx1.save(index_path)
    idx2 = ImpgIndex.load(index_path)
    assert len(idx2.records) == len(idx1.records)
    assert list(idx2.seq_index.names()) == list(idx1.seq_index.names())
    tid = idx1.seq_index.get_id(alns[0]["tname"])
    s, e = alns[0]["tstart"], alns[0]["tend"]
    r1 = engine.query(idx1, tid, s, e, store_cigar=True)
    r2 = engine.query(idx2, tid, s, e, store_cigar=True)
    assert len(r1) == len(r2)
    for a, b in zip(r1, r2):
        assert (a.q_id, a.q_first, a.q_last, a.t_first, a.t_last) == (
            b.q_id,
            b.q_first,
            b.q_last,
            b.t_first,
            b.t_last,
        )
        assert np.array_equal(a.cigar, b.cigar)


def test_load_or_build_staleness(tmp_path):
    rng = random.Random(2)
    text, _, _ = datagen.random_paf(rng, n_seqs=3, n_alns=5, n_ops=5)
    paf_path = str(tmp_path / "a.paf")
    with open(paf_path, "w") as fh:
        fh.write(text)
    idx = load_or_build([paf_path])
    art = paf_path + ".impgt"
    assert os.path.exists(art)
    mtime1 = os.path.getmtime(art)
    # Unchanged -> reuses artifact.
    load_or_build([paf_path])
    assert os.path.getmtime(art) == mtime1
    # Touch the PAF into the future -> rebuild.
    os.utime(paf_path, (mtime1 + 100, mtime1 + 100))
    load_or_build([paf_path])
    assert os.path.getmtime(art) > mtime1


def test_load_v2_artifact_with_eager_stats(tmp_path):
    """A v2 .impgt (stats arrays persisted, version=2) still loads and
    answers min-identity queries identically to the v3 lazy-stats form."""
    from impg_tpu.core.arena import CigarArena
    from impg_tpu.core.seqidx import SequenceIndex

    rng = random.Random(31)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=4, n_alns=30, n_ops=10)
    paf_path = str(tmp_path / "v2.paf")
    with open(paf_path, "w") as fh:
        fh.write(text)
    idx = ImpgIndex.from_paf_files([paf_path])
    # Write a v2-layout artifact by hand: eager fields + stats + version 2.
    names, lengths = idx.seq_index.to_arrays()
    v2_path = str(tmp_path / "v2.impgt.npz")
    np.savez(
        v2_path,
        version=np.int64(2),
        names=names.astype(str),
        lengths=lengths,
        files=np.array(idx.alignment_files, dtype=str),
        tgt_offsets=idx.tgt_offsets,
        **{f"rec_{k}": getattr(idx.records, k)
           for k in idx.records.__dataclass_fields__},
        **{f"arena_{k}": getattr(idx.arena, k)
           for k in CigarArena.EAGER_FIELDS + CigarArena.STATS_FIELDS},
    )
    idx2 = ImpgIndex.load(v2_path)
    assert idx2.arena.stats_materialized
    tid = idx.seq_index.get_id(alns[0]["tname"])
    s, e = alns[0]["tstart"], alns[0]["tend"]
    r1 = engine.query_transitive_bfs(idx, tid, s, e, min_identity=0.5)
    r2 = engine.query_transitive_bfs(idx2, tid, s, e, min_identity=0.5)
    assert [
        (r.q_id, r.q_first, r.q_last, r.t_first, r.t_last) for r in r1
    ] == [
        (r.q_id, r.q_first, r.q_last, r.t_first, r.t_last) for r in r2
    ]
