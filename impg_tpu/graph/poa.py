"""Python facade over the native POA engine (see native/poa.cpp).

Capability parity with the reference's SPOA usage (graph.rs:158-483):
build a partial-order graph from region sequences, emit the MSA, and emit a
GFA with per-sequence paths.
"""

from __future__ import annotations

import ctypes
import os
from dataclasses import dataclass

import numpy as np

from impg_tpu.io import native

DEFAULT_SCORING = (1, 4, 6, 2, 26, 1)  # main.rs:5566 --poa-scoring default


def _bind(lib):
    if getattr(lib, "_poa_bound", False):
        return lib
    lib.impg_poa_create.restype = ctypes.c_void_p
    lib.impg_poa_create.argtypes = [ctypes.c_int] * 6
    lib.impg_poa_add.restype = None
    lib.impg_poa_add.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    for name in ("impg_poa_n_nodes", "impg_poa_n_edges", "impg_poa_n_seqs",
                 "impg_poa_msa_n_cols"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.impg_poa_msa_fill.restype = None
    lib.impg_poa_msa_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64
    ]
    lib.impg_poa_node_bases.restype = None
    lib.impg_poa_node_bases.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.impg_poa_edges_fill.restype = None
    lib.impg_poa_edges_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.impg_poa_path_len.restype = ctypes.c_int64
    lib.impg_poa_path_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.impg_poa_path_fill.restype = None
    lib.impg_poa_path_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.impg_poa_free.restype = None
    lib.impg_poa_free.argtypes = [ctypes.c_void_p]
    lib._poa_bound = True
    return lib


@dataclass
class PoaResult:
    msa: list[str]  # one gapped row per input sequence
    node_bases: bytes
    edges: np.ndarray  # int32 [n_edges, 2]
    edge_weights: np.ndarray  # int64 [n_edges]
    paths: list[np.ndarray]  # per-sequence node id arrays


def poa_align(sequences: list[bytes], scoring=DEFAULT_SCORING) -> PoaResult:
    """Build a POA graph over `sequences` and return MSA + graph structure.

    Duplicate input sequences are aligned ONCE and their result rows
    fanned back out (kill switch: IMPG_POA_DEDUP=0).  This is exact, not
    approximate: a sequence identical to an already-threaded path aligns
    onto that path's nodes (all-match is the optimum and the DP
    tie-breaks deterministically), adding no nodes or edges and changing
    only edge weights, which nothing downstream reads — so node ids,
    edges, every later sequence's alignment, and all MSA rows are
    byte-identical to the no-dedup run (fuzz-pinned in
    tests/test_poa_similarity.py).  Pangenome smoothing blocks are
    depth-heavy with few distinct haplotypes, so this cuts POA cell work
    by the duplication factor."""
    if len(sequences) > 1 and os.environ.get("IMPG_POA_DEDUP", "1") != "0":
        first_of: dict[bytes, int] = {}
        backref = []
        order: list[bytes] = []
        for s in sequences:
            i = first_of.get(s)
            if i is None:
                i = len(order)
                first_of[s] = i
                order.append(s)
            backref.append(i)
        if len(order) < len(sequences):
            r = _poa_align_raw(order, scoring)
            return PoaResult(
                msa=[r.msa[i] for i in backref],
                node_bases=r.node_bases,
                edges=r.edges,
                # Weights reflect the deduped run (unused downstream).
                edge_weights=r.edge_weights,
                paths=[r.paths[i] for i in backref],
            )
    return _poa_align_raw(sequences, scoring)


def _poa_align_raw(
    sequences: list[bytes], scoring=DEFAULT_SCORING
) -> PoaResult:
    lib = native.load()
    if lib is None:
        raise RuntimeError("native POA library unavailable (g++ build failed)")
    _bind(lib)
    m, x, go, ge, go2, ge2 = scoring
    handle = lib.impg_poa_create(m, x, go, ge, go2, ge2)
    try:
        for seq in sequences:
            lib.impg_poa_add(handle, seq, len(seq))
        n_seqs = int(lib.impg_poa_n_seqs(handle))
        n_nodes = int(lib.impg_poa_n_nodes(handle))
        n_edges = int(lib.impg_poa_n_edges(handle))
        n_cols = int(lib.impg_poa_msa_n_cols(handle))
        buf = ctypes.create_string_buffer(max(n_seqs * n_cols, 1))
        lib.impg_poa_msa_fill(handle, buf, n_cols)
        raw = buf.raw[: n_seqs * n_cols]
        msa = [
            raw[i * n_cols : (i + 1) * n_cols].decode() for i in range(n_seqs)
        ]
        bases_buf = ctypes.create_string_buffer(max(n_nodes, 1))
        lib.impg_poa_node_bases(handle, bases_buf)
        frm = (ctypes.c_int32 * max(n_edges, 1))()
        to = (ctypes.c_int32 * max(n_edges, 1))()
        wt = (ctypes.c_int64 * max(n_edges, 1))()
        lib.impg_poa_edges_fill(handle, frm, to, wt)
        edges = np.stack(
            [
                np.frombuffer(frm, np.int32, n_edges),
                np.frombuffer(to, np.int32, n_edges),
            ],
            axis=1,
        ) if n_edges else np.zeros((0, 2), np.int32)
        weights = np.frombuffer(wt, np.int64, n_edges).copy()
        paths = []
        for s in range(n_seqs):
            plen = int(lib.impg_poa_path_len(handle, s))
            pbuf = (ctypes.c_int32 * max(plen, 1))()
            lib.impg_poa_path_fill(handle, s, pbuf)
            paths.append(np.frombuffer(pbuf, np.int32, plen).copy())
        return PoaResult(
            msa=msa,
            node_bases=bases_buf.raw[:n_nodes],
            edges=edges,
            edge_weights=weights,
            paths=paths,
        )
    finally:
        lib.impg_poa_free(handle)


def poa_to_gfa(result: PoaResult, path_names: list[str]) -> str:
    """Emit a blunt GFA (S/L/P lines) from a POA result, unchopped:
    unbranched node chains are merged into single segments (reference:
    graph.rs unchop_gfa)."""
    return poa_to_block(result, path_names).write()


def poa_to_block(result: PoaResult, path_names: list[str]):
    """The POA result as a `Gfa` object directly (no text round-trip —
    crush realigns tens of thousands of tiny regions per round)."""
    from impg_tpu.graph.gfa import Gfa

    n_nodes = len(result.node_bases)
    succs: dict[int, list[int]] = {}
    preds: dict[int, list[int]] = {}
    for a, b in result.edges:
        succs.setdefault(int(a), []).append(int(b))
        preds.setdefault(int(b), []).append(int(a))

    # Unchop: merge chains where a->b with outdeg(a)==1 and indeg(b)==1,
    # breaking at path endpoints so every path covers whole segments.
    path_starts = {int(p[0]) for p in result.paths if len(p)}
    path_ends = {int(p[-1]) for p in result.paths if len(p)}

    def is_head(v: int) -> bool:
        if v in path_starts:
            return True
        ps = preds.get(v, [])
        if len(ps) != 1:
            return True
        p = ps[0]
        return len(succs.get(p, [])) != 1 or p in path_ends

    chain_id = [-1] * n_nodes
    chains: list[list[int]] = []
    for v in range(n_nodes):
        if chain_id[v] != -1 or not is_head(v):
            continue
        chain = [v]
        chain_id[v] = len(chains)
        cur = v
        while len(succs.get(cur, [])) == 1 and cur not in path_ends:
            nxt = succs[cur][0]
            if len(preds.get(nxt, [])) != 1 or nxt in path_starts:
                break
            chain.append(nxt)
            chain_id[nxt] = len(chains)
            cur = nxt
        chains.append(chain)
    # Any node not reached from a head (shouldn't happen in a DAG) gets its
    # own chain defensively.
    for v in range(n_nodes):
        if chain_id[v] == -1:
            chain_id[v] = len(chains)
            chains.append([v])

    g = Gfa()
    bases = result.node_bases
    for ci, chain in enumerate(chains):
        g.segments[str(ci + 1)] = "".join(chr(bases[v]) for v in chain)
    emitted = set()
    for a, b in result.edges:
        ca, cb = chain_id[int(a)], chain_id[int(b)]
        if ca == cb or (ca, cb) in emitted:
            continue
        emitted.add((ca, cb))
        g.links.append((str(ca + 1), False, str(cb + 1), False))
    for name, path in zip(path_names, result.paths):
        steps = []
        last = -1
        for v in path:
            c = chain_id[int(v)]
            if c != last:
                steps.append((str(c + 1), False))
                last = c
        g.paths.append((name, steps))
    return g
