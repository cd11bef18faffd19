"""Pallas tiled stab-count kernel vs numpy oracle (interpret mode on CPU;
the same kernel compiles and matches on real TPU — see commit notes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from impg_tpu.ops import pallas_stab as ps


def test_pallas_stab_counts_match_oracle():
    rng = np.random.default_rng(3)
    n, b = 4000, 128
    rec_tid = rng.integers(0, 8, n).astype(np.int32)
    rec_ts = rng.integers(0, 50_000, n).astype(np.int32)
    rec_te = rec_ts + rng.integers(1, 3000, n).astype(np.int32)
    q_tid = rng.integers(0, 8, b).astype(np.int32)
    q_s = rng.integers(0, 50_000, b).astype(np.int32)
    q_e = q_s + rng.integers(1, 10_000, b).astype(np.int32)
    tid_p, ts_p, te_p = ps.pad_records(rec_tid, rec_ts, rec_te)
    got = np.asarray(
        ps.stab_counts(
            jnp.asarray(tid_p), jnp.asarray(ts_p), jnp.asarray(te_p),
            jnp.asarray(q_tid), jnp.asarray(q_s), jnp.asarray(q_e),
            interpret=True,
        )
    )
    exp = ps.stab_counts_host(rec_tid, rec_ts, rec_te, q_tid, q_s, q_e)
    assert np.array_equal(got, exp)
    assert exp.sum() > 0


def test_pallas_stab_counts_match_windowed_stab():
    """Cross-check against the index's windowed stab on real data."""
    import random

    from tests import datagen
    from tests.test_query import index_from_text

    rng = random.Random(12)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=5, n_alns=50, n_ops=10)
    index = index_from_text(text)
    tid_p, ts_p, te_p = ps.pad_records(
        index.records.target_id, index.records.t_start, index.records.t_end
    )
    q = []
    for name, L in seqs.items():
        sid = index.seq_index.get_id(name)
        q.append((sid, 0, L))
        q.append((sid, L // 4, 3 * L // 4))
    q_tid = np.asarray([x[0] for x in q], np.int32)
    q_s = np.asarray([x[1] for x in q], np.int32)
    q_e = np.asarray([x[2] for x in q], np.int32)
    got = np.asarray(
        ps.stab_counts(
            jnp.asarray(tid_p), jnp.asarray(ts_p), jnp.asarray(te_p),
            jnp.asarray(q_tid), jnp.asarray(q_s), jnp.asarray(q_e),
            interpret=True,
        )
    )
    for i, (sid, s, e) in enumerate(q):
        assert got[i] == index.stab(sid, s, e).size, q[i]
