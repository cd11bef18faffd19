"""Serial-walk oracle mirroring the reference semantics, for tests only.

This is a deliberately naive transcription of the behavior documented in
SURVEY.md §3 (reference: impg.rs:2760-2898 and friends).  The production code
in impg_tpu uses a vectorized closed-form reformulation; these functions exist
so randomized tests can cross-check it op by op.
"""

from __future__ import annotations

OPS = "=XIDM"


def parse_cigar(text: str):
    out = []
    num = 0
    for ch in text:
        if ch.isdigit():
            num = num * 10 + int(ch)
        else:
            out.append((num, ch))
            num = 0
    return out


def target_delta(length: int, op: str) -> int:
    return 0 if op == "I" else length


def query_delta(length: int, op: str, strand: str) -> int:
    if op == "D":
        return 0
    return length if strand == "+" else -length


def invert_ops(ops, strand: str):
    swapped = [(l, {"I": "D", "D": "I"}.get(o, o)) for l, o in ops]
    if strand == "-":
        swapped.reverse()
    return swapped


def project(requested, record, ops):
    """Oracle for project_target_range_through_alignment.

    requested: (range_start, range_end)
    record: (target_start, target_end, query_start, query_end, strand)
    ops: list of (len, op_char)
    Returns (pq_start, pq_end, clipped_ops, pt_start, pt_end) or None.
    """
    t0, te, q0, qe, strand = record
    direction = 1 if strand == "+" else -1
    query_pos = q0 if strand == "+" else qe
    target_pos = t0

    first_idx = 0
    last_idx = 0
    found = False
    pq_start = pq_end = pt_start = pt_end = -1
    first_off = 0
    last_rem = 0
    last_target = min(te, requested[1])

    for idx, (length, op) in enumerate(ops):
        if target_pos > last_target:
            break
        td = target_delta(length, op)
        qd = query_delta(length, op, strand)
        if td == 0:  # insertion in query
            if target_pos >= requested[0]:
                if not found:
                    pq_start = query_pos
                    pt_start = target_pos
                    first_idx = idx
                    found = True
                pq_end = query_pos + qd
                pt_end = target_pos
                last_idx = idx + 1
            query_pos += qd
        elif qd == 0:  # deletion in query
            ov_s = max(target_pos, requested[0])
            ov_e = min(target_pos + td, last_target)
            if ov_s < ov_e:
                if not found:
                    pq_start = query_pos
                    pt_start = ov_s
                    first_idx = idx
                    first_off = ov_s - target_pos
                    found = True
                pq_end = query_pos
                pt_end = ov_e
                last_idx = idx + 1
                last_rem = ov_e - (target_pos + td)
            target_pos += td
        else:  # match / mismatch
            ov_s = max(target_pos, requested[0])
            ov_e = min(target_pos + td, requested[1])
            if ov_s < ov_e:
                ov_len = ov_e - ov_s
                q_ov_s = query_pos + (ov_s - target_pos) * direction
                q_ov_e = q_ov_s + ov_len * direction
                if not found:
                    pq_start = q_ov_s
                    pt_start = ov_s
                    first_idx = idx
                    first_off = ov_s - target_pos
                    found = True
                pq_end = q_ov_e
                pt_end = ov_e
                last_idx = idx + 1
                last_rem = ov_e - (target_pos + td)
            target_pos += td
            query_pos += qd

    if found and pq_start != pq_end and pt_start != pt_end:
        clipped = [list(x) for x in ops[first_idx:last_idx]]
        if first_off > 0:
            clipped[0][0] -= first_off
        if last_rem < 0:
            clipped[-1][0] += last_rem
        return pq_start, pq_end, [tuple(x) for x in clipped], pt_start, pt_end
    return None


def gap_compressed_identity(ops) -> float:
    m = mm = i = d = 0
    for length, op in ops:
        if op in "M=":
            m += length
        elif op == "X":
            mm += length
        elif op == "I":
            i += 1
        elif op == "D":
            d += 1
    total = m + mm + i + d
    return (m / total) if total else 0.0


def identity_stats(ops):
    """(matches, mismatches, i_count, i_bp, d_count, d_bp, block_len)."""
    m = mm = i = ibp = d = dbp = bl = 0
    for length, op in ops:
        if op in "M=":
            m += length
            bl += length
        elif op == "X":
            mm += length
            bl += length
        elif op == "I":
            i += 1
            ibp += length
            bl += length
        elif op == "D":
            d += 1
            dbp += length
            bl += length
    return m, mm, i, ibp, d, dbp, bl
