"""Reader/writer for the reference's binary pack container (IMPGPKB1).

Layout transcribed field-for-field from /root/reference/src/pack.rs
(BINARY_MAGIC :5, write_binary :75-179, read_binary :243+): a 96-byte
little-endian header

    magic "IMPGPKB1" | u32 version=1 | u32 header_len=96 |
    u64 universe_nodes | u64 nonzero | u64 retained_records |
    u64 syncmer_anchors | u32 block_size | i32 compression_level |
    u64 block_count | u64 overflow_len | u64 block_index_offset |
    u64 overflow_offset | u64 data_offset

followed by (block_count+1) u64 block offsets (relative to data_offset),
an overflow table of (u32 node_id, u64 count) rows for counts > 255, and
independently-addressable zstd blocks of the dense u8 count vector
(node ids are 1-based; dense[node_id-1] = min(count, 255)).

This module exists for interop: packs produced by the reference CLI load
here and packs written here load there. The framework's own artifact
(syng/pack.py `.packt` npz) remains the native format — it covers the
uint64 syncmer-id feature space, which IMPGPKB1's u32 node ids cannot.
"""

from __future__ import annotations

import io
import struct

import numpy as np

MAGIC = b"IMPGPKB1"
VERSION = 1
HEADER_LEN = 96
DEFAULT_BLOCK_SIZE = 1 << 20

_HEADER = struct.Struct("<8sIIQQQQIiQQQQQ")
assert _HEADER.size == HEADER_LEN


def is_packbin(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(8) == MAGIC


def read_packbin(path: str):
    """-> (node_ids int64 [1-based, sorted], counts int64, meta dict).

    Only nonzero nodes are returned (the reference's Coverage counts
    map); meta carries universe_nodes / retained_records /
    syncmer_anchors."""
    import zstandard

    data = open(path, "rb").read()
    if len(data) < HEADER_LEN:
        raise ValueError(f"{path}: truncated pack header")
    (magic, version, header_len, universe, nonzero, retained, anchors,
     block_size, _level, block_count, overflow_len, bidx_off, ovf_off,
     data_off) = _HEADER.unpack_from(data, 0)
    if magic != MAGIC:
        raise ValueError(f"{path}: not an IMPGPKB1 pack")
    if version != VERSION:
        raise ValueError(f"{path}: unsupported pack version {version}")
    if header_len != HEADER_LEN:
        raise ValueError(f"{path}: unexpected header length {header_len}")
    offsets = np.frombuffer(
        data, np.uint64, int(block_count) + 1, int(bidx_off)
    )
    ovf = np.frombuffer(
        data,
        np.dtype([("node", "<u4"), ("count", "<u8")]),
        int(overflow_len),
        int(ovf_off),
    )
    dctx = zstandard.ZstdDecompressor()
    dense = np.empty(int(universe), np.uint8)
    pos = 0
    for b in range(int(block_count)):
        lo = int(data_off) + int(offsets[b])
        hi = int(data_off) + int(offsets[b + 1])
        want = min(int(block_size), int(universe) - pos)
        block = dctx.decompress(data[lo:hi], max_output_size=want)
        dense[pos:pos + len(block)] = np.frombuffer(block, np.uint8)
        pos += len(block)
    if pos != int(universe):
        raise ValueError(
            f"{path}: dense vector short ({pos} of {universe} nodes)"
        )
    nz = np.nonzero(dense)[0]
    node_ids = (nz + 1).astype(np.int64)
    counts = dense[nz].astype(np.int64)
    if ovf.size:
        # Overflow rows replace the saturated 255 entries.  Each overflow
        # node must exist in the dense nonzero set — on a corrupt or
        # inconsistent file searchsorted would return an insertion point
        # and silently overwrite (or index past) the wrong node's count.
        ovf_nodes = ovf["node"].astype(np.int64)
        idx = np.searchsorted(node_ids, ovf_nodes)
        valid = (idx < node_ids.size) & (node_ids[np.minimum(idx, node_ids.size - 1)] == ovf_nodes)
        if not np.all(valid):
            bad = ovf_nodes[~valid][:5]
            raise ValueError(
                f"{path}: overflow table references nodes absent from the "
                f"dense vector (e.g. {bad.tolist()})"
            )
        counts[idx] = ovf["count"].astype(np.int64)
    meta = dict(
        universe_nodes=int(universe),
        nonzero=int(nonzero),
        retained_records=int(retained),
        syncmer_anchors=int(anchors),
    )
    return node_ids, counts, meta


def write_packbin(
    path: str,
    node_ids,
    counts,
    universe_nodes: int,
    retained_records: int = 0,
    syncmer_anchors: int = 0,
    compression_level: int = 3,
    block_size: int = DEFAULT_BLOCK_SIZE,
) -> int:
    """Write the reference layout; returns the nonzero-node count.

    node_ids are 1-based (pack.rs rejects node 0 / > universe)."""
    import zstandard

    node_ids = np.asarray(node_ids, np.int64)
    counts = np.asarray(counts, np.int64)
    # Reference-side header guards (pack.rs write_binary): a zero or
    # >u32 block size, or a >u32 universe, would produce headers the
    # reference rejects on read.
    if not 0 < block_size <= 0xFFFFFFFF:
        raise ValueError(f"block_size must be in 1..=u32::MAX, got {block_size}")
    if not 0 <= universe_nodes <= 0xFFFFFFFF:
        raise ValueError(
            f"universe_nodes must fit in u32 (IMPGPKB1 node ids are u32), "
            f"got {universe_nodes}"
        )
    if node_ids.size and (
        int(node_ids.min()) < 1 or int(node_ids.max()) > universe_nodes
    ):
        raise ValueError(
            f"pack node ids must lie in 1..={universe_nodes}"
        )
    if not 1 <= compression_level <= 22:
        raise ValueError("compression level must be in 1..=22")
    nz = counts != 0
    node_ids, counts = node_ids[nz], counts[nz]
    order = np.argsort(node_ids)
    node_ids, counts = node_ids[order], counts[order]

    dense = np.zeros(universe_nodes, np.uint8)
    dense[node_ids - 1] = np.minimum(counts, 255).astype(np.uint8)
    over = counts > 255
    ovf_nodes = node_ids[over]
    ovf_counts = counts[over]

    cctx = zstandard.ZstdCompressor(level=compression_level)
    blocks = []
    offsets = [0]
    for lo in range(0, universe_nodes, block_size):
        blk = cctx.compress(dense[lo:lo + block_size].tobytes())
        blocks.append(blk)
        offsets.append(offsets[-1] + len(blk))
    block_count = len(blocks)

    bidx_off = HEADER_LEN
    ovf_off = bidx_off + 8 * (block_count + 1)
    data_off = ovf_off + 12 * int(ovf_nodes.size)
    buf = io.BytesIO()
    buf.write(_HEADER.pack(
        MAGIC, VERSION, HEADER_LEN, universe_nodes, int(node_ids.size),
        retained_records, syncmer_anchors, block_size, compression_level,
        block_count, int(ovf_nodes.size), bidx_off, ovf_off, data_off,
    ))
    buf.write(np.asarray(offsets, "<u8").tobytes())
    for n, c in zip(ovf_nodes.tolist(), ovf_counts.tolist()):
        buf.write(struct.pack("<IQ", n, c))
    for blk in blocks:
        buf.write(blk)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    return int(node_ids.size)
