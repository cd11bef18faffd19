"""Synthetic AGC v3 archive writer (test fixture generator).

Emits the exact byte layout documented in impg_tpu/io/agc.py (derived by
format archaeology on the reference's tests/test_data/test.agc, written
by AGC v3.2.1): container footer with length-prefixed big-endian
numbers, zstd stream parts, front-coded contig names, the 5-section
collection-details block, and 0xFF-terminated segment entries in
``x{g:x}d`` group streams.  Multi-segment contigs are segmented with the
AGC overlap rule (consecutive segments share the k-long splitter), which
is what the reader's stitch path is validated against.

Test-only: the product's writable archive format is .agz (io/agz.py).
"""

from __future__ import annotations

import struct

import zstandard as zstd

_B2C = {65: 0, 67: 1, 71: 2, 84: 3}  # A C G T -> 0..3
_COMPLEMENT = bytes.maketrans(b"ACGT", b"TGCA")


def _enc(v: int) -> bytes:
    """Length-prefixed big-endian number (archive footer encoding)."""
    if v == 0:
        return b"\x00"
    payload = v.to_bytes((v.bit_length() + 7) // 8, "big")
    return bytes([len(payload)]) + payload


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _codes(seq: bytes) -> bytes:
    return bytes(_B2C[b] for b in seq)


def segment_boundaries(n: int, segment_size: int, k: int) -> list[tuple[int, int]]:
    """(start, end) spans; consecutive spans overlap by k (the splitter)."""
    if n <= segment_size:
        return [(0, n)]
    spans = []
    start = 0
    while True:
        end = min(start + segment_size, n)
        spans.append((start, end))
        if end == n:
            return spans
        start = end - k  # next segment re-includes the splitter k-mer


def write_agc_v3(path: str, samples: dict[str, dict[str, bytes]],
                 kmer_length: int = 11, segment_size: int = 60,
                 rc_orient_stride: int = 0) -> None:
    """Write ``samples[sample][contig] = seq`` as an AGC-v3-layout archive.

    ``rc_orient_stride``: if >0, every stride-th segment is stored
    reverse-complemented with orientation byte 1 (exercises the reader's
    per-segment orientation handling).
    """
    k = kmer_length
    cctx = zstd.ZstdCompressor()
    streams: list[tuple[str, list[bytes]]] = []  # (name, [payloads]) in order

    def add_stream(name: str, raw_parts: list[bytes],
                   compress: bool = True) -> None:
        parts = []
        for raw in raw_parts:
            if compress:
                parts.append((_enc(len(raw)), cctx.compress(raw)))
            else:
                parts.append((_enc(0), raw))
        streams.append((name, parts))

    # ---- semantic streams --------------------------------------------------
    fti = b"".join(f"{key}\x00{val}\x00".encode()
                   for key, val in (("producer", "impg-tpu testgen"),
                                    ("file_version_major", "3"),
                                    ("file_version_minor", "2")))
    # compressed so the zstd magic lands in the first bytes, matching the
    # real layout that fasta._looks_like_upstream_agc content-sniffs
    add_stream("file_type_info", [fti])
    add_stream("params", [struct.pack("<4I", k, 20, 50, segment_size)],
               compress=False)

    names = list(samples)
    add_stream("collection-samples",
               [_varint(len(names))
                + b"".join(s.encode() + b"\x00" for s in names)])

    # contig names: literal bytes are valid front-coding (no back-refs)
    cc = bytearray(_varint(len(names)))
    for s in names:
        cc += _varint(len(samples[s]))
        for contig in samples[s]:
            cc += contig.encode() + b"\x00"
    add_stream("collection-contigs", [bytes(cc)])

    # segmentation: each unique segment gets its own group, appended once
    tree = bytearray(_varint(len(names)))
    groups_sec = bytearray()
    deltas_sec = bytearray()
    lens_sec = bytearray()
    orients_sec = bytearray()
    group_entries: list[list[bytes]] = []  # group id -> coded entries
    seg_counter = 0
    for s in names:
        tree += _varint(len(samples[s]))
        for contig, seq in samples[s].items():
            spans = segment_boundaries(len(seq), segment_size, k)
            tree += _varint(len(spans))
            for (a, b) in spans:
                seg = seq[a:b]
                orient = 0
                seg_counter += 1
                if rc_orient_stride and seg_counter % rc_orient_stride == 0:
                    orient = 1
                    seg = seg.translate(_COMPLEMENT)[::-1]
                gid = len(group_entries)
                group_entries.append([_codes(seg)])
                groups_sec += _varint(gid)
                deltas_sec += _varint(1)
                packed = (_zigzag(len(seg) - (2 * k + 1)) << 14) | 0x0A41
                lens_sec += _varint(packed)
                orients_sec.append(orient)

    secs = [bytes(tree), bytes(groups_sec), bytes(deltas_sec),
            bytes(lens_sec), bytes(orients_sec)]
    frames = [cctx.compress(sec) for sec in secs]
    det = bytearray()
    for sec, frame in zip(secs, frames):
        det += _varint(len(sec)) + _varint(len(frame))
    for frame in frames:
        det += frame
    add_stream("collection-details", [bytes(det)], compress=False)

    for gid, entries in enumerate(group_entries):
        # entry 0 of part 0 is the one-byte 0x7f group header
        payload = b"\x7f\xff" + b"".join(e + b"\xff" for e in entries)
        add_stream(f"x{gid:x}d", [payload], compress=False)

    # ---- container ----------------------------------------------------------
    body = bytearray()
    footer = bytearray(_enc(len(streams)))
    for name, parts in streams:
        footer += name.encode() + b"\x00"
        footer += _enc(len(parts))
        footer += _enc(sum(len(p) for _, p in parts))  # raw size (unused)
        for meta, payload in parts:
            off = len(body)
            body += meta + payload
            footer += _enc(off) + _enc(len(payload))

    with open(path, "wb") as fh:
        fh.write(bytes(body))
        fh.write(bytes(footer))
        fh.write(struct.pack("<Q", len(footer)))
