"""GFA sorting: path-guided 1D SGD + grooming + topological sort — the
reference's gfasort "Ygs" pipeline (reference: graph.rs:893 sort_gfa /
sort_gfa_pipeline dispatching 'Y' sgd_sort_only, 'g' groom_only,
's' topological_sort_only via the external gfasort crate).

Path-SGD follows the odgi 1D layout recipe: nodes carry a scalar position;
random step pairs sampled within paths pull node positions toward their
path-bp distance with an annealed learning rate.  The updates are fully
vectorized per batch (numpy scatter-adds), the natural batched form for
accelerator offload.
"""

from __future__ import annotations

import numpy as np

from impg_tpu.graph.gfa import Gfa


def _path_arrays(gfa: Gfa):
    """Per-step (node ordinal, bp midpoint along its path) over all paths."""
    node_ord = {sid: i for i, sid in enumerate(gfa.segments)}
    lens = {sid: len(s) for sid, s in gfa.segments.items()}
    step_node: list[int] = []
    step_pos: list[float] = []
    path_bounds: list[tuple[int, int]] = []
    for _, steps in gfa.paths:
        s0 = len(step_node)
        at = 0.0
        for sid, _ in steps:
            L = lens.get(sid, 0)
            step_node.append(node_ord[sid])
            step_pos.append(at + L / 2.0)
            at += L
        path_bounds.append((s0, len(step_node)))
    return (
        np.asarray(step_node, np.int64),
        np.asarray(step_pos, np.float64),
        path_bounds,
        node_ord,
    )


def path_sgd_order(
    gfa: Gfa,
    epochs: int = 30,
    batch_per_step: int = 8,
    eta_max: float | None = None,
    eta_min: float = 0.01,
    rng: np.random.Generator | None = None,
    backend: str = "auto",
) -> list[str]:
    """Segment ids ordered by the converged 1D path-SGD layout.

    `backend`: "numpy", "jax" (the whole annealed epoch loop jitted as one
    lax.fori_loop of scatter-add batches — the accelerator form of the
    layout), or "auto" (device when the total update volume is large
    enough to amortize dispatch).
    """
    sids = list(gfa.segments)
    n = len(sids)
    if n <= 1 or not gfa.paths:
        return sids
    step_node, step_pos, bounds, node_ord = _path_arrays(gfa)
    order = _sgd_order_core(
        n, step_node, step_pos, bounds, epochs, batch_per_step,
        eta_max, eta_min, rng, backend,
    )
    return [sids[k] for k in order]


def _sgd_order_core(
    n, step_node, step_pos, bounds, epochs=30, batch_per_step=8,
    eta_max=None, eta_min=0.01, rng=None, backend="auto",
) -> np.ndarray:
    """Node ordinals ordered by the converged 1D layout (shared by the
    dict-model and columnar drivers)."""
    n_steps = step_node.size
    if n <= 1 or n_steps < 2:
        return np.arange(n)
    rng = rng or np.random.default_rng(42)

    # Initial positions: first-seen path position per node (stable and
    # already nearly sorted for mostly-linear graphs).
    x = np.zeros(n, np.float64)
    seen = np.zeros(n, bool)
    for i in range(n_steps - 1, -1, -1):
        x[step_node[i]] = step_pos[i]
        seen[step_node[i]] = True
    if not seen.all():
        x[~seen] = step_pos.max() + 1.0

    # Step index -> its path's [start, end) for in-path partner sampling.
    pstart = np.zeros(n_steps, np.int64)
    pend = np.zeros(n_steps, np.int64)
    for s0, s1 in bounds:
        pstart[s0:s1] = s0
        pend[s0:s1] = s1

    if eta_max is None:
        span = float(step_pos.max() - step_pos.min()) or 1.0
        eta_max = span
    lam = np.log(eta_max / max(eta_min, 1e-9)) / max(epochs - 1, 1)

    batch = n_steps * batch_per_step
    # auto: the device loop wins ~1.8x warm, but first compile costs
    # minutes through a remote-compile link — only amortized when the
    # update volume is huge (one-shot CLI runs stay on numpy).
    use_jax = backend == "jax" or (
        backend == "auto" and batch * epochs >= 500_000_000
    )
    if use_jax:
        try:
            x = _sgd_epochs_jax(
                x, step_node, step_pos, pstart, pend, epochs, batch,
                float(eta_max), float(lam),
            )
            return np.asarray(
                sorted(range(n), key=lambda k: (x[k], k)), np.int64
            )
        except Exception:
            if backend == "jax":
                raise
            # auto: fall back to the numpy loop
    for t in range(epochs):
        eta = eta_max * np.exp(-lam * t)
        i = rng.integers(0, n_steps, batch)
        # Zipf-ish partner distance in steps keeps local structure dominant
        # while long jumps still occur.
        off = np.ceil(
            np.exp(rng.uniform(0.0, np.log(n_steps), batch))
        ).astype(np.int64)
        sign = np.where(rng.random(batch) < 0.5, -1, 1)
        j = np.clip(i + sign * off, pstart[i], pend[i] - 1)
        valid = i != j
        i, j = i[valid], j[valid]
        a, b = step_node[i], step_node[j]
        d = np.abs(step_pos[i] - step_pos[j])
        d = np.maximum(d, 1e-9)
        w = 1.0 / (d * d)
        mu = np.minimum(eta * w, 1.0)
        diff = x[a] - x[b]
        mag = np.abs(diff)
        cur = np.where(mag > 1e-9, mag, 1e-9)
        r = (cur - d) / (2.0 * cur) * np.where(mag > 1e-9, 1.0, 0.0)
        dx = mu * r * diff
        # The whole batch applies at once, so average each node's moves
        # (Jacobi-style) — summing conflicting full-strength moves diverges
        # on small dense graphs.
        acc = np.zeros_like(x)
        cnt = np.zeros_like(x)
        np.add.at(acc, a, dx)
        np.subtract.at(acc, b, dx)
        np.add.at(cnt, a, 1.0)
        np.add.at(cnt, b, 1.0)
        x -= acc / np.maximum(cnt, 1.0)

    return np.asarray(sorted(range(n), key=lambda k: (x[k], k)), np.int64)


def _sgd_epochs_jax(
    x0, step_node, step_pos, pstart, pend, epochs, batch, eta_max, lam
) -> np.ndarray:
    """The annealed SGD epoch loop as ONE jitted lax.fori_loop: per epoch,
    sample batch step pairs, compute Jacobi-averaged pulls, scatter-add.
    Same math as the numpy loop (f32 on device; its own RNG stream — the
    layout is a stochastic heuristic, not a bit-exact artifact)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax import random as jrandom

    try:
        jax.devices()
    except RuntimeError:
        # Configured platform unavailable (e.g. env names a TPU plugin
        # that was never registered): auto-choose (cli.py convention).
        jax.config.update("jax_platforms", "")

    n_steps = int(step_node.size)
    sn = jnp.asarray(step_node.astype(np.int32))
    sp = jnp.asarray(step_pos.astype(np.float32))
    ps = jnp.asarray(pstart.astype(np.int32))
    pe = jnp.asarray(pend.astype(np.int32))
    x = jnp.asarray(x0.astype(np.float32))
    log_n = float(np.log(n_steps))

    @jax.jit
    def run(x):
        def epoch(t, state):
            x, key = state
            key, k1, k2, k3 = jrandom.split(key, 4)
            eta = eta_max * jnp.exp(-lam * t.astype(jnp.float32))
            i = jrandom.randint(k1, (batch,), 0, n_steps, jnp.int32)
            off = jnp.ceil(
                jnp.exp(
                    jrandom.uniform(
                        k2, (batch,), jnp.float32, 0.0, log_n
                    )
                )
            ).astype(jnp.int32)
            sign = jnp.where(
                jrandom.uniform(k3, (batch,)) < 0.5, -1, 1
            ).astype(jnp.int32)
            j = jnp.clip(i + sign * off, ps[i], pe[i] - 1)
            valid = (i != j).astype(jnp.float32)
            a, b = sn[i], sn[j]
            d = jnp.maximum(jnp.abs(sp[i] - sp[j]), 1e-9)
            w = 1.0 / (d * d)
            mu = jnp.minimum(eta * w, 1.0)
            diff = x[a] - x[b]
            mag = jnp.abs(diff)
            cur = jnp.where(mag > 1e-9, mag, 1e-9)
            r = (cur - d) / (2.0 * cur) * (mag > 1e-9)
            dx = mu * r * diff * valid
            zero = jnp.zeros_like(x)
            acc = zero.at[a].add(dx).at[b].add(-dx)
            cnt = zero.at[a].add(valid).at[b].add(valid)
            return (x - acc / jnp.maximum(cnt, 1.0), key)

        x, _ = lax.fori_loop(
            0, epochs, epoch, (x, jrandom.PRNGKey(42))
        )
        return x

    return np.asarray(run(x)).astype(np.float64)


def groom(gfa: Gfa) -> Gfa:
    """Flip segments that are majority-reverse across path steps so most
    steps read forward (gfasort 'g' role).  Path spellings are preserved
    exactly: a flipped segment stores its reverse complement and every
    step/link orientation touching it inverts."""
    from impg_tpu.io.fasta import reverse_complement

    rev_votes: dict[str, int] = {}
    fwd_votes: dict[str, int] = {}
    for _, steps in gfa.paths:
        for sid, rev in steps:
            if rev:
                rev_votes[sid] = rev_votes.get(sid, 0) + 1
            else:
                fwd_votes[sid] = fwd_votes.get(sid, 0) + 1
    flip = {
        sid
        for sid in gfa.segments
        if rev_votes.get(sid, 0) > fwd_votes.get(sid, 0)
    }
    if not flip:
        return gfa
    out = Gfa(header=gfa.header, walk_names=set(gfa.walk_names))
    for sid, seq in gfa.segments.items():
        out.segments[sid] = (
            reverse_complement(seq.encode()).decode() if sid in flip else seq
        )
    out.links = [
        (a, ar ^ (a in flip), b, br ^ (b in flip))
        for a, ar, b, br in gfa.links
    ]
    out.paths = [
        (name, [(sid, rev ^ (sid in flip)) for sid, rev in steps])
        for name, steps in gfa.paths
    ]
    return out


def _topo_priority(gfa: Gfa) -> Gfa:
    """Stable topological sort whose ties follow the CURRENT segment order
    (so a preceding path-SGD pass decides the layout inside each level),
    with 1..N renumbering."""
    import heapq

    prio = {sid: k for k, sid in enumerate(gfa.segments)}
    indeg = {sid: 0 for sid in gfa.segments}
    succs: dict[str, list[str]] = {sid: [] for sid in gfa.segments}
    for a, _, b, _ in gfa.links:
        if a in indeg and b in indeg and a != b:
            succs[a].append(b)
            indeg[b] += 1
    heap = [(prio[s], s) for s, d in indeg.items() if d == 0]
    heapq.heapify(heap)
    order: list[str] = []
    seen: set = set()
    while heap:
        _, v = heapq.heappop(heap)
        if v in seen:
            continue
        seen.add(v)
        order.append(v)
        for w in succs[v]:
            indeg[w] -= 1
            if indeg[w] == 0:
                heapq.heappush(heap, (prio[w], w))
    for sid in gfa.segments:  # cycle remnants
        if sid not in seen:
            order.append(sid)
    rename = {old: str(i + 1) for i, old in enumerate(order)}
    out = Gfa(header=gfa.header, walk_names=set(gfa.walk_names))
    for old in order:
        out.segments[rename[old]] = gfa.segments[old]
    out.links = [
        (rename[a], ar, rename[b], br)
        for a, ar, b, br in gfa.links
        if a in rename and b in rename
    ]
    out.paths = [
        (name, [(rename[s], r) for s, r in steps if s in rename])
        for name, steps in gfa.paths
    ]
    return out


def sgd_order_columns(gc, backend: str = "auto") -> np.ndarray:
    """Path-SGD segment-row order on the columnar model."""
    rows = gc.seg_row_of_name()[gc.step_name_idx]
    lens = gc.seg_lens()
    step_node = rows.astype(np.int64)
    step_len = np.where(rows >= 0, lens[np.maximum(rows, 0)], 0).astype(
        np.float64
    )
    # bp midpoint of each step along its path
    ends = np.cumsum(step_len)
    path_base = np.zeros_like(step_len)
    po = gc.path_off
    for p in range(gc.n_paths):
        lo, hi = int(po[p]), int(po[p + 1])
        if lo < hi:
            base = ends[lo - 1] if lo else 0.0
            path_base[lo:hi] = base
    step_pos = ends - path_base - step_len / 2.0
    bounds = [
        (int(po[p]), int(po[p + 1])) for p in range(gc.n_paths)
    ]
    return _sgd_order_core(
        gc.n_segs, step_node, step_pos, bounds, backend=backend
    )


def _sort_pipeline_columns(gfa_text: str, pipeline: str,
                           sgd_backend: str) -> str | None:
    """Columnar fast path for `sort_pipeline` (native tokenizer + spell /
    topo kernels); None when the tokenizer is unavailable."""
    from impg_tpu.graph import columnar_ops as co
    from impg_tpu.graph.gfa_columns import parse_gfa_columns

    try:
        gc = parse_gfa_columns(gfa_text)
    except ValueError:
        raise
    except Exception:
        return None
    if gc is None:
        return None
    if gc.n_segs <= 1:
        return gfa_text
    for c in pipeline:
        if c == "Y":
            order = sgd_order_columns(gc, backend=sgd_backend)
            gc = co.reorder_segments_columns(gc, np.asarray(order, np.int32))
        elif c == "g":
            gc = co.groom_columns(gc)
        elif c == "s":
            gc = co.topo_priority_columns(gc)
        else:
            raise ValueError(
                f"unsupported sort pipeline step '{c}' (expected Y, g, s)"
            )
    return co.write_columns(gc)


def sort_pipeline(
    gfa_text: str, pipeline: str = "Ygs", sgd_backend: str = "auto"
) -> str:
    """Apply the gfasort-style pipeline: Y = path-SGD order, g = groom,
    s = priority topological sort (+ renumber).  Unknown steps error.

    Runs on the columnar model (native tokenizer + spell/topo kernels)
    when available; the dict-model loop below is the semantics oracle and
    fallback."""
    out = _sort_pipeline_columns(gfa_text, pipeline, sgd_backend)
    if out is not None:
        return out
    gfa = Gfa.parse(gfa_text)
    if len(gfa.segments) <= 1:
        return gfa_text
    for c in pipeline:
        if c == "Y":
            order = path_sgd_order(gfa, backend=sgd_backend)
            rank = {sid: k for k, sid in enumerate(order)}
            gfa.segments = dict(
                sorted(gfa.segments.items(), key=lambda kv: rank[kv[0]])
            )
        elif c == "g":
            gfa = groom(gfa)
        elif c == "s":
            gfa = _topo_priority(gfa)
        else:
            raise ValueError(
                f"unsupported sort pipeline step '{c}' (expected Y, g, s)"
            )
    return gfa.write()
