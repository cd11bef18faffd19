"""Read mapping against a syng index: GAF walks and PAF projections.

The reference maps reads two ways from a syng index (main.rs:516
write_syng_map_gaf, main.rs:565 write_syng_map_paf):

  * ``map -o gaf``: each read's matched syncmers (best read orientation,
    syng.rs:2070) become one GAF row whose path is the signed syncmer node
    walk ``>id``/``<id`` with a ``qp:B:I`` query-position tag — the
    "syng-gaf-walk" read space consumed by projection bundles and infer's
    read-walk evidence.
  * ``map -o paf``: matched syncmers are projected onto indexed paths via
    the anchor chainer (syng.rs:4398 map_sequence) and written as PAF rows
    with ``an:i`` anchor counts.

Node ids here are the dense 1-based universe ranks shared with the
GBWT-lite (syng/gbwt.py), so GAF walks, MEM queries, and pack features all
speak the same id space.
"""

from __future__ import annotations

import numpy as np

from impg_tpu.io.fasta import reverse_complement
from impg_tpu.ops import syncmer as syncmer_mod
from impg_tpu.syng.index import SyngIndex, match_universe
from impg_tpu.syng.transitive import chain_occurrences


def index_universe(index: SyngIndex) -> np.ndarray:
    """Sorted distinct syncmer ids (cached; the dense node id space)."""
    cached = getattr(index, "_universe_cache", None)
    if cached is None:
        cached = np.unique(index.occ_ids)
        index._universe_cache = cached
    return cached


def matched_query_syncmers(
    index: SyngIndex, seq: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Index-matched syncmers of a read, best orientation.

    Returns (query_pos int64, ids uint64, signed_dense int32, used_rc) in
    the FORWARD read frame; only matched syncmers are kept.  Mirrors
    matched_syncmers_best_query_orientation (syng.rs:2070): closed-syncmer
    extraction of a fragment is boundary-asymmetric, so both orientations
    are tried and the richer match set wins.
    """
    universe = index_universe(index)
    syncmer_len = index.syncmer_len

    def _match(s: bytes):
        pos, ids, fwd = syncmer_mod.extract_syncmers(
            s, index.k, index.w, index.seed
        )
        if ids.size == 0:
            return pos, ids, np.zeros(0, np.int32)
        hit, idx_c = match_universe(universe, ids)
        pos, ids, fwd, idx_c = pos[hit], ids[hit], fwd[hit], idx_c[hit]
        dense = (idx_c + 1).astype(np.int32)
        return pos, ids, np.where(fwd, dense, -dense).astype(np.int32)

    pos_f, ids_f, signed_f = _match(seq)
    pos_r, ids_r, signed_r = _match(reverse_complement(seq))
    if signed_r.size > signed_f.size:
        # Flip back into the forward read frame (orient_reverse_query
        # _syncmers): position mirrors, orientation negates, order reverses.
        pos = (len(seq) - syncmer_len - pos_r)[::-1].copy()
        return pos, ids_r[::-1].copy(), (-signed_r[::-1]).copy(), True
    return pos_f, ids_f, signed_f, False


def gaf_row(
    name: str, query_len: int, syncmer_len: int,
    query_pos: np.ndarray, signed_dense: np.ndarray,
) -> str | None:
    """One syng-gaf-walk GAF row (main.rs:516 write_syng_map_gaf)."""
    if signed_dense.size == 0:
        return None
    qstart = int(query_pos.min())
    qend = min(int(query_pos.max()) + syncmer_len, query_len)
    path = "".join(
        (">" if n >= 0 else "<") + str(abs(int(n))) for n in signed_dense
    )
    qp = "qp:B:I," + ",".join(str(int(p)) for p in query_pos)
    path_len = int(signed_dense.size) * syncmer_len
    matches = min(path_len, qend - qstart)
    block_len = qend - qstart
    return (
        f"{name}\t{query_len}\t{qstart}\t{qend}\t+\t{path}\t{path_len}\t0\t"
        f"{path_len}\t{matches}\t{block_len}\t0\t"
        f"an:i:{signed_dense.size}\tsk:i:{syncmer_len}\t{qp}"
    )


def map_read(
    index: SyngIndex,
    name: str,
    seq: bytes,
    min_anchors: int = 1,
    chain_budget: int = 10_000,
) -> list[str]:
    """PAF rows projecting a read onto indexed paths (syng.rs:4398
    map_sequence: shared-anchor chaining, no base-level alignment).

    PARITY NOTE: the residue-matches column is anchors * syncmer_len with
    NO clamp and mapq is the literal 0, exactly as the reference emits
    (main.rs:570 write_syng_map_paf) — overlapping syncmer spans can make
    col 10 exceed col 11 there too."""
    pos, ids, signed, _rc = matched_query_syncmers(index, seq)
    if ids.size < max(min_anchors, 1):
        return []
    fwd = signed >= 0
    # Per-read seeds keep every occurrence (a short read's own seed set
    # is not a meaningful frequency distribution), but an absolute cap
    # guards against a single high-copy repeat seed expanding to the
    # whole index occurrence list.
    q_abs, o_seq, o_pos, rel_fwd = index.occurrences_for_syncmers(
        pos, ids, fwd, drop_top_fraction=0.0, max_occurrences=10_000
    )
    chains = chain_occurrences(
        index, q_abs, o_seq, o_pos, rel_fwd, 0, len(seq),
        scaffold_gap=chain_budget,
        min_anchors=max(min_anchors, 1),
        extend_budget=0,
    )
    syncmer_len = index.syncmer_len
    chains.sort(
        key=lambda c: (-c.n_anchors, c.genome, c.t_start)
    )
    rows = []
    for c in chains:
        tlen = index.seq_index.get_len_from_id(
            index.seq_index.get_id(c.genome)
        )
        matches = c.n_anchors * syncmer_len
        block_len = max(c.q_end - c.q_start, c.t_end - c.t_start)
        rows.append(
            f"{name}\t{len(seq)}\t{c.q_start}\t{c.q_end}\t{c.strand}\t"
            f"{c.genome}\t{tlen}\t{c.t_start}\t{c.t_end}\t{matches}\t"
            f"{block_len}\t0\tan:i:{c.n_anchors}\tsk:i:{syncmer_len}"
        )
    return rows


def map_reads_gaf(index: SyngIndex, read_files: list[str], min_anchors: int = 1):
    """GAF rows for every read with >= min_anchors matched syncmers."""
    from impg_tpu.syng.pack import read_sequences

    syncmer_len = index.syncmer_len
    for path in read_files:
        for name, seq in read_sequences(path):
            pos, _ids, signed, _rc = matched_query_syncmers(index, seq)
            if signed.size < max(min_anchors, 1):
                continue
            row = gaf_row(name, len(seq), syncmer_len, pos, signed)
            if row is not None:
                yield row


def map_reads_paf(
    index: SyngIndex,
    read_files: list[str],
    min_anchors: int = 1,
    chain_budget: int = 10_000,
    max_hits: int = 0,
):
    """PAF rows for every read's chained projections; `max_hits` caps the
    (anchor-ranked) rows per read (main.rs map --max-hits role, 0 = all)."""
    from impg_tpu.syng.pack import read_sequences

    for path in read_files:
        for name, seq in read_sequences(path):
            rows = map_read(
                index, name, seq,
                min_anchors=min_anchors,
                chain_budget=chain_budget,
            )
            if max_hits > 0:
                rows = rows[:max_hits]
            yield from rows
