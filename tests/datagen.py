"""Synthetic alignment generators with ground truth, for tests and benches."""

from __future__ import annotations

import random

from tests import pyref


def random_cigar(rng: random.Random, n_ops: int, max_len: int = 50):
    """Random valid CIGAR op list (no leading/trailing zero-length ops)."""
    ops = []
    prev = None
    for _ in range(n_ops):
        op = rng.choice("=XIDM=")
        # Avoid pathological all-indel CIGARs: bias toward consuming ops.
        length = rng.randint(1, max_len)
        ops.append((length, op))
        prev = op
    # Ensure at least one target-consuming and one query-consuming op.
    ops.append((rng.randint(1, max_len), "="))
    return ops


def cigar_spans(ops):
    t = sum(l for l, o in ops if o != "I")
    q = sum(l for l, o in ops if o != "D")
    return t, q


def ops_to_str(ops) -> str:
    return "".join(f"{l}{o}" for l, o in ops)


def make_paf_line(
    qname, qlen, qstart, qend, strand, tname, tlen, tstart, tend, ops
) -> str:
    m = sum(l for l, o in ops if o in "=M")
    bl = sum(l for l, o in ops)
    return (
        f"{qname}\t{qlen}\t{qstart}\t{qend}\t{strand}\t"
        f"{tname}\t{tlen}\t{tstart}\t{tend}\t{m}\t{bl}\t60\tcg:Z:{ops_to_str(ops)}"
    )


def random_alignment(rng: random.Random, seqs: dict[str, int], n_ops=20):
    """Random alignment between two sequences from `seqs` (name -> length)."""
    ops = random_cigar(rng, n_ops)
    t_span, q_span = cigar_spans(ops)
    names = list(seqs)
    qname = rng.choice(names)
    tname = rng.choice(names)
    # Grow sequences if needed.
    seqs[qname] = max(seqs[qname], q_span + 10)
    seqs[tname] = max(seqs[tname], t_span + 10)
    qstart = rng.randint(0, max(0, seqs[qname] - q_span))
    tstart = rng.randint(0, max(0, seqs[tname] - t_span))
    strand = rng.choice("+-")
    return dict(
        qname=qname,
        qstart=qstart,
        qend=qstart + q_span,
        strand=strand,
        tname=tname,
        tstart=tstart,
        tend=tstart + t_span,
        ops=ops,
    )


def random_paf(rng: random.Random, n_seqs=4, n_alns=30, n_ops=20):
    """Random PAF text + the generating records; sequences sized to fit."""
    seqs = {f"seq{i}": 200 for i in range(n_seqs)}
    alns = [random_alignment(rng, seqs, n_ops=n_ops) for _ in range(n_alns)]
    lines = [
        make_paf_line(
            a["qname"],
            seqs[a["qname"]],
            a["qstart"],
            a["qend"],
            a["strand"],
            a["tname"],
            seqs[a["tname"]],
            a["tstart"],
            a["tend"],
            a["ops"],
        )
        for a in alns
    ]
    return "\n".join(lines) + "\n", seqs, alns


BASES = "ACGT"


def apply_ops(rng: random.Random, parent_seq: str, ops) -> str:
    """Apply an edit script to a parent (target) sequence -> derived query."""
    out = []
    t = 0
    for length, op in ops:
        if op in "=M":
            out.append(parent_seq[t : t + length])
            t += length
        elif op == "X":
            for i in range(length):
                orig = parent_seq[t + i]
                out.append(rng.choice([b for b in BASES if b != orig]))
            t += length
        elif op == "I":
            out.append("".join(rng.choice(BASES) for _ in range(length)))
        elif op == "D":
            t += length
    return "".join(out)


def mutate_chain_paf(
    rng: random.Random, n_seqs=6, seq_len=5000, seed_name="ref",
    return_sequences=False,
):
    """A chain pangenome: ref <- s1 <- s2 ... with exact per-pair CIGARs.

    Each derived sequence aligns to its parent over the full length with
    random scattered SNPs and small indels, giving a transitive topology.
    Returns (paf_text, seqs dict, alignments list) and, with
    `return_sequences`, a 4th dict of actual base strings consistent with
    every CIGAR.
    """
    seqs = {seed_name: seq_len}
    seq_data = {seed_name: "".join(rng.choice(BASES) for _ in range(seq_len))}
    alns = []
    parent = seed_name
    parent_len = seq_len
    for i in range(n_seqs - 1):
        name = f"s{i}"
        ops = []
        t_pos = 0
        q_len = 0
        while t_pos < parent_len:
            kind = rng.random()
            if kind < 0.80:
                length = min(rng.randint(20, 200), parent_len - t_pos)
                ops.append((length, "="))
                t_pos += length
                q_len += length
            elif kind < 0.90:
                length = min(rng.randint(1, 5), parent_len - t_pos)
                ops.append((length, "X"))
                t_pos += length
                q_len += length
            elif kind < 0.95:
                length = rng.randint(1, 20)
                ops.append((length, "I"))
                q_len += length
            else:
                length = min(rng.randint(1, 20), parent_len - t_pos)
                ops.append((length, "D"))
                t_pos += length
        strand = rng.choice("++-")
        seqs[name] = q_len
        derived = apply_ops(rng, seq_data[parent], ops)
        assert len(derived) == q_len
        # A '-' strand PAF row means the reverse complement of the query
        # aligns to the target; store the query so that RC(query) == derived.
        if strand == "-":
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            seq_data[name] = "".join(comp[b] for b in reversed(derived))
        else:
            seq_data[name] = derived
        alns.append(
            dict(
                qname=name,
                qstart=0,
                qend=q_len,
                strand=strand,
                tname=parent,
                tstart=0,
                tend=parent_len,
                ops=ops,
            )
        )
        parent = name
        parent_len = q_len
    lines = [
        make_paf_line(
            a["qname"],
            seqs[a["qname"]],
            a["qstart"],
            a["qend"],
            a["strand"],
            a["tname"],
            seqs[a["tname"]],
            a["tstart"],
            a["tend"],
            a["ops"],
        )
        for a in alns
    ]
    text = "\n".join(lines) + "\n"
    if return_sequences:
        return text, seqs, alns, seq_data
    return text, seqs, alns


def pangenome_paf(
    rng: random.Random, n_seqs=40, seq_len=400_000, cross_links=2
):
    """A denser pangenome: a mutation chain plus `cross_links` extra
    alignments per sequence to random ancestors (composed edit scripts),
    giving realistic interval-tree fan-out for benchmarking."""
    text, seqs, alns, seq_data = mutate_chain_paf(
        rng, n_seqs=n_seqs, seq_len=seq_len, return_sequences=True
    )
    names = list(seqs)
    extra = []
    for i, name in enumerate(names):
        for _ in range(cross_links):
            j = rng.randrange(len(names))
            if j == i:
                continue
            other = names[j]
            # Align a random window of `name` to `other` approximately by
            # generating a fresh edit script from other's window.
            o_len = seqs[other]
            w = min(rng.randint(o_len // 4, o_len // 2), o_len)
            t_start = rng.randint(0, o_len - w)
            ops = []
            t_pos = 0
            q_len = 0
            while t_pos < w:
                kind = rng.random()
                if kind < 0.85:
                    length = min(rng.randint(50, 400), w - t_pos)
                    ops.append((length, "="))
                    t_pos += length
                    q_len += length
                elif kind < 0.92:
                    length = min(rng.randint(1, 4), w - t_pos)
                    ops.append((length, "X"))
                    t_pos += length
                    q_len += length
                elif kind < 0.96:
                    length = rng.randint(1, 30)
                    ops.append((length, "I"))
                    q_len += length
                else:
                    length = min(rng.randint(1, 30), w - t_pos)
                    ops.append((length, "D"))
                    t_pos += length
            n_len = seqs[name]
            if q_len >= n_len:
                continue
            q_start = rng.randint(0, n_len - q_len)
            extra.append(
                dict(
                    qname=name, qstart=q_start, qend=q_start + q_len,
                    strand=rng.choice("++-"), tname=other,
                    tstart=t_start, tend=t_start + w, ops=ops,
                )
            )
    alns = alns + extra
    lines = [
        make_paf_line(
            a["qname"], seqs[a["qname"]], a["qstart"], a["qend"], a["strand"],
            a["tname"], seqs[a["tname"]], a["tstart"], a["tend"], a["ops"],
        )
        for a in alns
    ]
    return "\n".join(lines) + "\n", seqs, alns


def write_fasta(path: str, seq_data: dict, width: int = 60) -> None:
    with open(path, "w") as fh:
        for name, seq in seq_data.items():
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def big_directed_index(
    seed: int = 1,
    n_seqs: int = 2000,
    seq_len: int = 150_000,
    n_aln: int = 2_500_000,
    match_lo: int = 20,
    match_hi: int = 120,
    edit_hi: int = 6,
    edits_lo: int = 4,
    edits_hi: int = 17,
):
    """Fully vectorized at-scale synthetic index (bench workload).

    Builds `n_aln` alignments between random sequence pairs directly as
    run arrays (no PAF text round trip — generation must stay minutes-
    fast so the driver can rebuild the gitignored cache from scratch).
    Each alignment alternates '=' runs (match_lo..match_hi bp) with
    single edit runs ('X'/'I'/'D', 1..edit_hi bp), anchored by matches
    at both ends — the realistic op mix of the reference's headline
    inputs.  Returns an ImpgIndex (bidirectional: ~2x directed records).
    """
    import numpy as np

    from impg_tpu.core import arena as arena_mod
    from impg_tpu.core import cigar
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.index.impg_index import ImpgIndex

    rng = np.random.default_rng(seed)
    # Odd run counts: match runs at even positions, edits at odd ones.
    m = rng.integers(edits_lo, edits_hi, n_aln)  # edits per alignment
    n_runs = 2 * m + 1
    run_offsets = np.zeros(n_aln + 1, np.int64)
    np.cumsum(n_runs, out=run_offsets[1:])
    total = int(run_offsets[-1])

    pos_in_aln = np.arange(total, dtype=np.int64) - np.repeat(
        run_offsets[:-1], n_runs
    )
    is_match = (pos_in_aln & 1) == 0
    lens = np.where(
        is_match,
        rng.integers(match_lo, match_hi + 1, total),
        rng.integers(1, edit_hi + 1, total),
    ).astype(np.int64)
    # Edit ops: X 50%, I 25%, D 25%.
    draw = rng.integers(0, 4, total)
    ops = np.where(
        is_match,
        cigar.OP_EQ,
        np.where(draw < 2, cigar.OP_X, np.where(draw == 2, cigar.OP_I,
                                                cigar.OP_D)),
    ).astype(np.uint32)
    runs = cigar.pack(lens, ops)

    tdelta = np.where(ops == cigar.OP_I, 0, lens)
    qdelta = np.where(ops == cigar.OP_D, 0, lens)
    t_len = np.add.reduceat(tdelta, run_offsets[:-1]).astype(np.int64)
    q_len = np.add.reduceat(qdelta, run_offsets[:-1]).astype(np.int64)

    target_id = rng.integers(0, n_seqs, n_aln).astype(np.int32)
    query_id = (
        (target_id + rng.integers(1, n_seqs, n_aln)) % n_seqs
    ).astype(np.int32)
    t_start = rng.integers(0, np.maximum(seq_len - t_len, 1)).astype(np.int64)
    q_start = rng.integers(0, np.maximum(seq_len - q_len, 1)).astype(np.int64)
    strand = (rng.random(n_aln) < 0.3).astype(np.int8)

    seq_index = SequenceIndex()
    for i in range(n_seqs):
        seq_index.get_or_insert_id(f"g{i}#1#chr1", seq_len)
    records, arena = arena_mod.build_directed(
        query_id=query_id,
        q_start=q_start.astype(np.int32),
        q_end=(q_start + q_len).astype(np.int32),
        target_id=target_id,
        t_start=t_start.astype(np.int32),
        t_end=(t_start + t_len).astype(np.int32),
        strand=strand,
        runs=runs,
        run_offsets=run_offsets,
    )
    return ImpgIndex._finalize(seq_index, records, arena, [])


def realistic_directed_index(
    seed: int = 3,
    n_seqs: int = 2000,
    seq_len: int = 150_000,
    n_aln: int = 2_500_000,
    chunks: int = 20,
    tail_frac: float = 0.2,
    log_progress=None,
):
    """At-scale index with a yeast-fitted CIGAR-shape mixture.

    Fitted (round 5) from the reference's own 7-strain yeast chrV
    all-vs-all PAF (24 MB, built by `impg-tpu align` on
    tests/test_data/yeast.chrV.fa.gz — the dataset the reference's
    test_pipeline_integration.rs:57 drives):

      * runs per kb aligned   18.4  (one run per ~54 bp: matches mean
                                     ~105 bp alternating with 1-6 bp
                                     edits)
      * alignment lengths     bimodal — median ~4.9 kb with a ~20%%
                                     near-full-length tail (p90 = 0.98x
                                     sequence length); scaled here to
                                     `seq_len`

    Unlike `big_directed_index` (fixed ~21 runs/record — fine for
    stab/visited stress, unrealistically light on CIGAR work), records
    here carry hundreds-to-thousands of runs, the shape of real
    pangenome PAFs.  Generation is chunked so temporaries stay ~1 GiB;
    the result is one bidirectional index (2x directed records).
    """
    import numpy as np

    from impg_tpu.core import arena as arena_mod
    from impg_tpu.core import cigar
    from impg_tpu.core.arena import CigarArena, DirectedRecords
    from impg_tpu.core.seqidx import SequenceIndex
    from impg_tpu.index.impg_index import ImpgIndex

    rng = np.random.default_rng(seed)
    match_lo, match_hi = 30, 180      # mean 105 bp
    edit_hi = 6                       # mean 3.5 bp
    edit_pairs_per_kb = 9.2           # -> 18.4 runs/kb aligned
    # Lognormal body scaled so the median alignment is ~1.3 kb at
    # seq_len=150k (yeast median 4.9 kb at 580 kb sequences).
    body_median = max(300.0, seq_len * (4900.0 / 580_000.0))
    body_sigma = 1.6
    max_alen = int(seq_len * 0.98)

    rec_parts: list[DirectedRecords] = []
    arena_parts: dict[str, list[np.ndarray]] = {
        f: [] for f in CigarArena.EAGER_FIELDS
    }
    seg_parts: list[np.ndarray] = [np.zeros(1, np.int64)]
    arena_base = 0
    rec_base = 0

    per = (n_aln + chunks - 1) // chunks
    for ck in range(chunks):
        nk = min(per, n_aln - ck * per)
        if nk <= 0:
            break
        # Alignment-length mixture.
        is_tail = rng.random(nk) < tail_frac
        alen = np.where(
            is_tail,
            rng.integers(int(seq_len * 0.67), max_alen + 1, nk),
            np.clip(
                rng.lognormal(np.log(body_median), body_sigma, nk),
                150, max_alen,
            ).astype(np.int64),
        ).astype(np.int64)
        m = np.maximum(1, (alen * edit_pairs_per_kb / 1000.0)).astype(
            np.int64
        )
        n_runs = 2 * m + 1
        run_offsets = np.zeros(nk + 1, np.int64)
        np.cumsum(n_runs, out=run_offsets[1:])
        total = int(run_offsets[-1])

        pos_in_aln = np.arange(total, dtype=np.int64) - np.repeat(
            run_offsets[:-1], n_runs
        )
        is_match = (pos_in_aln & 1) == 0
        lens = np.where(
            is_match,
            rng.integers(match_lo, match_hi + 1, total),
            rng.integers(1, edit_hi + 1, total),
        ).astype(np.int64)
        draw = rng.integers(0, 4, total)
        ops = np.where(
            is_match,
            cigar.OP_EQ,
            np.where(draw < 2, cigar.OP_X,
                     np.where(draw == 2, cigar.OP_I, cigar.OP_D)),
        ).astype(np.uint32)
        runs = cigar.pack(lens, ops)
        del pos_in_aln, draw

        tdelta = np.where(ops == cigar.OP_I, 0, lens)
        qdelta = np.where(ops == cigar.OP_D, 0, lens)
        t_len = np.add.reduceat(tdelta, run_offsets[:-1]).astype(np.int64)
        q_len = np.add.reduceat(qdelta, run_offsets[:-1]).astype(np.int64)
        del tdelta, qdelta, lens, ops, is_match

        target_id = rng.integers(0, n_seqs, nk).astype(np.int32)
        query_id = (
            (target_id + rng.integers(1, n_seqs, nk)) % n_seqs
        ).astype(np.int32)
        t_start = rng.integers(
            0, np.maximum(seq_len - t_len, 1)
        ).astype(np.int64)
        q_start = rng.integers(
            0, np.maximum(seq_len - q_len, 1)
        ).astype(np.int64)
        strand = (rng.random(nk) < 0.3).astype(np.int8)

        records, arena = arena_mod.build_directed(
            query_id=query_id,
            q_start=q_start.astype(np.int32),
            q_end=(q_start + q_len).astype(np.int32),
            target_id=target_id,
            t_start=t_start.astype(np.int32),
            t_end=(t_start + t_len).astype(np.int32),
            strand=strand,
            runs=runs,
            run_offsets=run_offsets,
        )
        records.op_off += arena_base
        records.rec_id += rec_base
        rec_parts.append(records)
        for f in arena_parts:
            arena_parts[f].append(getattr(arena, f))
        seg_parts.append(arena.seg_offsets[1:] + arena_base)
        arena_base += arena.n_ops
        rec_base += nk
        if log_progress is not None:
            log_progress(ck + 1, chunks, arena_base)

    records = DirectedRecords.concatenate(rec_parts)
    del rec_parts
    cols = {}
    for f in list(arena_parts):
        cols[f] = np.concatenate(arena_parts.pop(f))
    arena = CigarArena(**cols, seg_offsets=np.concatenate(seg_parts))
    del cols, seg_parts

    seq_index = SequenceIndex()
    for i in range(n_seqs):
        seq_index.get_or_insert_id(f"g{i}#1#chr1", seq_len)
    return ImpgIndex._finalize(seq_index, records, arena, [])


def big_blunt_gfa(
    seed: int = 3,
    backbone_bp: int = 6_000_000,
    seg_lo: int = 96,
    seg_hi: int = 192,
    n_paths: int = 100,
    dup_sites: int = 4000,
    snp_sites: int = 2000,
) -> str:
    """Yeast-scale crushable blunt GFA in the seqwish-output shape.

    A random backbone sequence is chopped into blunt segments.  At
    `dup_sites` positions, half of the paths route through a PRIVATE
    duplicate segment spelling the SAME sequence as the backbone segment
    — the redundant-bubble shape seqwish emits when alignments miss a
    join, i.e. exactly crush's target (reference resolution.rs role).
    At `snp_sites` positions paths split over a genuinely different
    allele, which crush must leave intact (do-no-harm).

    Defaults produce a ~50 MiB graph (~45k backbone segments, 100 paths
    x ~45k steps); scale knobs down for CI-speed variants.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, backbone_bp).astype(np.uint8)
    table = np.frombuffer(b"ACGT", np.uint8)
    seq = table[codes].tobytes().decode()

    # Chop into segments.
    bounds = [0]
    while bounds[-1] < backbone_bp:
        bounds.append(
            min(backbone_bp, bounds[-1] + int(rng.integers(seg_lo, seg_hi)))
        )
    n_back = len(bounds) - 1
    segs: list[str] = [
        seq[bounds[i]:bounds[i + 1]] for i in range(n_back)
    ]  # id i+1 = backbone segment i

    # Bubble sites: interior backbone indices, disjoint.
    n_sites = dup_sites + snp_sites
    site_idx = rng.choice(
        np.arange(1, n_back - 1), size=min(n_sites, n_back - 2),
        replace=False,
    )
    dup_at = set(site_idx[:dup_sites].tolist())
    snp_at = set(site_idx[dup_sites:].tolist())
    alt_id: dict[int, int] = {}
    next_id = n_back + 1
    for i in sorted(dup_at | snp_at):
        alt_id[i] = next_id
        next_id += 1
        if i in dup_at:
            segs.append(segs[i])  # same spelling: crushable duplicate
        else:
            s = list(segs[i])
            p = int(rng.integers(len(s)))
            s[p] = "ACGT"[(("ACGT".index(s[p])) + 1) % 4]
            segs.append("".join(s))  # true allele: must survive crush

    # Paths: even-numbered paths take the alt at every site.
    base_steps = np.arange(1, n_back + 1)
    alt_steps = base_steps.copy()
    for i, a in alt_id.items():
        alt_steps[i] = a
    out = ["H\tVN:Z:1.0"]
    for sid, s in enumerate(segs, start=1):
        out.append(f"S\t{sid}\t{s}")
    links = {(int(a), int(b))
             for a, b in zip(base_steps[:-1], base_steps[1:])}
    for i, a in alt_id.items():
        links.add((int(base_steps[i - 1]), a))
        links.add((a, int(base_steps[i + 1])))
    for a, b in sorted(links):
        out.append(f"L\t{a}\t+\t{b}\t+\t0M")
    for p in range(n_paths):
        steps = alt_steps if p % 2 == 0 else base_steps
        out.append(
            f"P\thap{p}#1#chr1\t" + ",".join(f"{s}+" for s in steps) + "\t*"
        )
    return "\n".join(out) + "\n"
