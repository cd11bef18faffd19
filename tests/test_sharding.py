"""Sharded multi-device query path on the virtual 8-device CPU mesh."""

import random

import numpy as np
import jax
import pytest

from impg_tpu.parallel.sharding import ShardedEngine, ShardedIndex
from impg_tpu.query import engine
from tests import datagen
from tests.test_query import index_from_text


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    rng = random.Random(31)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=5, n_alns=40, n_ops=12)
    index = index_from_text(text)
    se = ShardedEngine(index, initial_capacity=256)
    return index, se, seqs


def test_sharded_matches_host(setup):
    index, se, seqs = setup
    q = [(index.seq_index.get_id(n), 0, seqs[n]) for n in seqs]
    out = se.query_batch(
        np.array([x[0] for x in q], np.int32),
        np.array([x[1] for x in q], np.int32),
        np.array([x[2] for x in q], np.int32),
    )
    for qi, (tid, s, e) in enumerate(q):
        mask = out["pair_q"] == qi
        got = sorted(
            zip(
                out["query_id"][mask].tolist(),
                out["pq_start"][mask].tolist(),
                out["pq_end"][mask].tolist(),
            )
        )
        exp = sorted(
            (r.q_id, r.q_first, r.q_last)
            for r in engine.query(index, tid, s, e)[1:]
        )
        assert got == exp, qi


def test_shard_blocks_cover_all_records(setup):
    from impg_tpu.parallel.sharding import ShardedIndex

    index, se, seqs = setup
    # The engine drops its stacked host copies after device placement
    # (only scalars are read post-init), so inspect a fresh build.
    si = ShardedIndex.build(index, 8)
    assert si.n_shards == 8
    # Global record ids reconstructed from shard blocks must be a partition.
    n = len(index.records)
    assert si.rec_base[0] == 0
    assert all(si.rec_base[i] <= si.rec_base[i + 1] for i in range(7))
    # Each shard's local arena matches the global arena slices.
    for s in range(si.n_shards):
        lo = int(si.rec_base[s])
        hi = int(si.rec_base[s + 1]) if s + 1 < si.n_shards else n
        if lo == hi:
            continue
        cnt = int(index.records.op_cnt[lo:hi].sum())
        got = si.arena["runs"][s][:cnt]
        parts = [
            index.arena.runs[o : o + c]
            for o, c in zip(
                index.records.op_off[lo:hi], index.records.op_cnt[lo:hi]
            )
        ]
        assert np.array_equal(got, np.concatenate(parts))


def test_sharded_capacity_retry(setup):
    index, se, seqs = setup
    se.k_max = 2
    name = list(seqs)[0]
    tid = index.seq_index.get_id(name)
    out = se.query_batch(
        np.array([tid] * 4, np.int32),
        np.zeros(4, np.int32),
        np.full(4, seqs[name], np.int32),
    )
    mask = out["pair_q"] == 0
    exp = sorted(
        (r.q_id, r.q_first, r.q_last)
        for r in engine.query(index, tid, 0, seqs[name])[1:]
    )
    got = sorted(
        zip(
            out["query_id"][mask].tolist(),
            out["pq_start"][mask].tolist(),
            out["pq_end"][mask].tolist(),
        )
    )
    assert got == exp


def test_transitive_bfs_over_sharded_engine():
    """query_transitive_bfs_many runs its per-depth batched step over the
    8-device mesh and matches the host walk exactly."""
    import random

    from impg_tpu.parallel.sharding import ShardedEngine
    from impg_tpu.query import engine
    from tests import datagen
    from tests.test_query import index_from_text

    rng = random.Random(17)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=6, n_alns=40, n_ops=8)
    index = index_from_text(text)
    sh = ShardedEngine(index)
    walks = []
    for name, L in list(seqs.items())[:4]:
        sid = index.seq_index.get_id(name)
        walks.append((sid, 0, L))
        walks.append((sid, L // 3, 2 * L // 3))
    got = engine.query_transitive_bfs_many(
        index, walks, max_depth=2, device_engine=sh
    )
    want = engine.query_transitive_bfs_many(index, walks, max_depth=2)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert [
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in g
        ] == [
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in w
        ]


def test_sharded_bfs_at_scale_growth_paths():
    """Mesh parity at growth-policy scale: the 8-device sharded engine
    must stay row-exact when caps grow and transfers compact (same
    premise as test_device's at-scale case, over the virtual mesh)."""
    import random

    from impg_tpu.parallel.sharding import ShardedEngine
    from impg_tpu.query import engine
    from tests import datagen
    from tests.test_query import index_from_text

    rng = random.Random(12)
    text, seqs, _alns = datagen.pangenome_paf(
        rng, n_seqs=60, seq_len=40_000, cross_links=8
    )
    index = index_from_text(text)
    assert len(index.records) > 800
    sh = ShardedEngine(index, initial_capacity=128)
    r2 = random.Random(4)
    names = list(seqs)
    walks = []
    for _ in range(6):
        n = r2.choice(names)
        L = seqs[n]
        a = r2.randint(0, L // 2)
        walks.append(
            (index.seq_index.get_id(n), a, r2.randint(a + 2000, min(L, a + 15000)))
        )
    got = engine.query_transitive_bfs_many(
        index, walks, max_depth=3, device_engine=sh
    )
    want = engine.query_transitive_bfs_many(index, walks, max_depth=3)
    total = 0
    for g, w in zip(got, want):
        assert len(g) == len(w)
        total += len(g)
        for a, b in zip(g, w):
            assert (
                a.q_id, a.q_first, a.q_last, a.t_id, a.t_first, a.t_last
            ) == (b.q_id, b.q_first, b.q_last, b.t_id, b.t_first, b.t_last)
    assert total > 5_000


def test_sharded_approximate_mode():
    """Approximate (tracepoint) projection over the mesh matches the
    single-chip DeviceEngine's approximate results."""
    import random

    from impg_tpu.parallel.sharding import ShardedEngine
    from impg_tpu.query import engine
    from impg_tpu.query.device import DeviceEngine
    from tests import datagen
    from tests.test_query import index_from_text

    rng = random.Random(23)
    text, seqs, alns = datagen.random_paf(rng, n_seqs=5, n_alns=30, n_ops=10)
    index = index_from_text(text)
    index.ensure_tracepoints(100)
    sh = ShardedEngine(index, with_tracepoints=True)
    assert sh.supports_approximate
    dev = DeviceEngine(index, with_tracepoints=True)
    walks = []
    for name, L in list(seqs.items())[:3]:
        sid = index.seq_index.get_id(name)
        walks.append((sid, L // 5, 4 * L // 5))
    got = engine.query_transitive_bfs_many(
        index, walks, max_depth=2, device_engine=sh, approximate=True
    )
    want = engine.query_transitive_bfs_many(
        index, walks, max_depth=2, device_engine=dev, approximate=True
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert [
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in g
        ] == [
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in w
        ]


def test_transitive_columnar_over_sharded_engine():
    """Columnar RowBlocks over the mesh engine match host Row lists."""
    rng = random.Random(71)
    text, seqs, alns = datagen.pangenome_paf(rng, n_seqs=6, seq_len=15_000)
    index = index_from_text(text)
    se = ShardedEngine(index, initial_capacity=256)
    names = list(seqs)
    targets = []
    qrng = random.Random(5)
    for _ in range(12):
        nm = names[qrng.randrange(len(names))]
        L = seqs[nm]
        s = qrng.randrange(0, max(1, L - 3000))
        targets.append((index.seq_index.get_id(nm), s, s + 3000))
    host = engine.query_transitive_bfs_many(index, targets, max_depth=2)
    mesh = engine.query_transitive_bfs_many(
        index, targets, max_depth=2, device_engine=se, columnar=True
    )

    def key(rows):
        return sorted(
            (r.q_id, r.q_first, r.q_last, r.t_id, r.t_first, r.t_last)
            for r in rows
        )

    assert [key(b.to_rows()) for b in mesh] == [key(r) for r in host]


def test_sharded_engine_honors_custom_mesh_axis_name(setup):
    """Round-2 review fix: a user mesh named something other than 'shard'
    must work (the query step used to hard-code the axis name), and
    multi-dim meshes are rejected up front."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from impg_tpu.parallel.sharding import ShardedEngine

    index, se, seqs = setup
    mesh = Mesh(np.array(jax.devices()), ("data",))
    se2 = ShardedEngine(index, mesh=mesh)
    names = list(seqs)
    tid = index.seq_index.get_id(names[0])
    got = se2.query_batch(
        np.asarray([tid], np.int32),
        np.asarray([100], np.int64),
        np.asarray([5000], np.int64),
    )
    want = se.query_batch(
        np.asarray([tid], np.int32),
        np.asarray([100], np.int64),
        np.asarray([5000], np.int64),
    )
    assert [len(r) for r in got] == [len(r) for r in want]

    with pytest.raises(ValueError, match="1-D mesh"):
        ShardedEngine(
            index, mesh=Mesh(np.array(jax.devices()).reshape(4, 2),
                             ("a", "b")),
        )
