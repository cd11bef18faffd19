"""Reader for real upstream AGC v3 archives (.agc, agc/ragc toolchain).

Role model: the reference's AGC backend (agc_index.rs:9 AgcIndex over the
ragc crate) — multi-sample archives addressed as ``contig@sample`` or bare
contig, with listing + random-access range fetch.

The AGC byte layout is not published inside the reference repo (the ragc
crate is external), so this reader was derived by format archaeology on
the reference's own fixture (/root/reference/tests/test_data/test.agc,
written by ``AGC v3.2.1``) and verified byte-for-byte against the ground
truth FASTAs (ref/a/b/c.fa).  Verified layout:

Container (the agc "archive" layer):
  * file = concatenated stream *parts*, then a footer, then a trailing
    little-endian u64 = footer byte size (footer starts at
    ``len - 8 - footer_size``).
  * numbers in the footer use a length-prefixed big-endian encoding:
    ``[n_bytes][n_bytes big-endian payload]`` (``00`` = 0).
  * footer = enc(n_streams), then per stream: ``name\\0``, enc(n_parts),
    enc(raw_size), then per part enc(offset) + enc(frame_size).
  * part at ``offset`` = enc(metadata) followed by ``frame_size`` bytes;
    the payload is either a zstd frame (metadata = uncompressed size) or
    raw bytes (metadata = 0, no zstd magic).

Collection (v3 semantic layer):
  * ``file_type_info``: raw ``key\\0value\\0`` dict (producer, versions).
  * ``params``: four LE u32 — kmer_length, min_match_len,
    pack_cardinality, segment_size (fixture: 31, 20, 50, 60000).
  * ``collection-samples``: zstd of varint(n) + ``name\\0`` * n.
  * ``collection-contigs``: zstd of varint(n_samples), then per sample
    varint(n_contigs) + n_contigs front-coded names: a ``\\0``-terminated
    byte string where a byte ``b >= 0x80`` copies ``256 - b`` characters
    from the PREVIOUS contig name at the current output position
    (verified: ``chr1``, ``\\xfd2`` -> chr2; ``chr1a``, ``\\xfd3\\xff`` ->
    chr3a); the "previous name" resets at each sample boundary.
  * ``collection-details``: raw header of 5 varint pairs
    (uncompressed, compressed sizes) + 5 concatenated zstd frames:
      0: varint tree — n_samples, per sample n_contigs, per contig
         n_segments;
      1: per-segment group id (varint);
      2: per-segment in-group-position delta (1 = appended; the in-group
         position is the running count of that group's segments, 1-based
         because slot 0 is the group's header entry);
      3: per-segment packed varint v: ``v >> 14`` = zigzag(raw_length -
         (2*kmer_length + 1)); the low 14 bits were constant 0x0A41 on
         every verified segment (meaning unconfirmed — not consumed, the
         decoded length is cross-checked against the segment data);
      4: per-segment orientation byte (0 = forward).
  * segment group ``g`` lives in stream ``x{g:x}d``; a part's payload is
    a series of 0xFF-terminated entries, entry 0 of part 0 being a
    one-byte ``0x7f`` group header; bases are coded 0..3 = ACGT.

Multi-segment contigs (every real chromosome: AGC segments at splitter
k-mers near ``segment_size``) are stitched with the AGC overlap rule:
consecutive segments share the k-long splitter, so
``contig = seg0 + seg1[k:] + seg2[k:] + ...`` and
``len(contig) = sum(seg_lens) - (n_seg - 1) * kmer_length``.  Because no
multi-segment sample archive exists in this environment, the stitch
VERIFIES the k-base overlap actually matches and raises
``AgcFormatError`` (with the conversion path) on mismatch instead of
emitting silently-wrong bases; synthetic archives written to this exact
layout round-trip in tests/test_agz.py.

Anything outside this verified envelope (file_version_major != 3,
segment reuse deltas != 1, non-ACGT symbol codes, missing group
streams) raises ``AgcFormatError`` naming the limitation and the
supported conversion path, instead of guessing.
"""

from __future__ import annotations

import os
import struct

try:  # zstandard is baked into the image; keep a precise error if not
    import zstandard as _zstd
except ImportError:  # pragma: no cover
    _zstd = None

ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_BASES = b"ACGT"
# 0..3 -> ACGT; higher codes pass through (rejected by a max() check first)
_CODE_TO_BASE = bytes.maketrans(bytes(range(4)), _BASES)
_COMPLEMENT = bytes.maketrans(b"ACGT", b"TGCA")

CONVERSION_HINT = (
    "convert with the agc binary (`agc getcol archive.agc > seqs.fa`) and "
    "repackage via `impg-tpu agz create -o seqs.agz seqs.fa`, or pass the "
    "FASTA directly"
)


class AgcFormatError(ValueError):
    """Raised when an .agc file is outside the verified v3 envelope."""


def _err(path: str, what: str) -> AgcFormatError:
    return AgcFormatError(f"{path}: unsupported AGC archive ({what}) — "
                          + CONVERSION_HINT)


def _rd_num(buf: bytes, pos: int) -> tuple[int, int]:
    """Length-prefixed big-endian number (the archive footer encoding)."""
    n = buf[pos]
    pos += 1
    v = 0
    for _ in range(n):
        v = (v << 8) | buf[pos]
        pos += 1
    return v, pos


def _rd_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """LEB128-style varint (collection streams)."""
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if b < 0x80:
            return v, pos
        shift += 7


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _rd_cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(0, pos)
    return buf[pos:end].decode("utf-8", "replace"), end + 1


class AgcArchive:
    """Random-access reader for upstream AGC v3 archives."""

    def __init__(self, path: str):
        if _zstd is None:  # pragma: no cover
            raise RuntimeError("python-zstandard unavailable; cannot read "
                               ".agc archives")
        self.path = path
        with open(path, "rb") as fh:
            self._data = fh.read()
        data = self._data
        if len(data) < 16:
            raise _err(path, "truncated: no footer trailer")
        footer_size = struct.unpack("<Q", data[-8:])[0]
        foot = len(data) - 8 - footer_size
        if foot < 0:
            raise _err(path, "footer size exceeds file")
        self._dctx = _zstd.ZstdDecompressor()
        try:
            self._streams = self._parse_footer(foot)
        except (IndexError, ValueError) as e:
            if isinstance(e, AgcFormatError):
                raise
            raise _err(path, f"footer parse failed: {e}") from e
        self._part_cache: dict[tuple[str, int], bytes] = {}
        self._group_entries: dict[int, list[bytes]] = {}
        self._contig_cache: dict[tuple[str, str], bytes] = {}
        self._load_file_type_info()
        self._load_params()
        self._load_collection()
        # contig@sample exact; bare contig + short contig ONLY when unique
        # across samples (agc_index.rs:94-120 interning / parse_query);
        # ambiguous names (bare OR short@sample, when two contigs in one
        # sample share a whitespace-truncated short name) map to None and
        # raise at lookup instead of silently picking the first.
        self._exact: dict[str, tuple[str, str] | None] = {}
        self._bare: dict[str, tuple[str, str] | None] = {}

        def note(table: dict, key: str, val: tuple[str, str]) -> None:
            cur = table.get(key, val)
            table[key] = val if cur == val else None

        for sample in self.samples:
            for contig in self._contigs[sample]:
                note(self._bare, contig, (sample, contig))
                short = contig.split()[0] if contig.split() else contig
                if short != contig:
                    note(self._exact, f"{short}@{sample}",
                         (sample, contig))
                    note(self._bare, short, (sample, contig))
        for sample in self.samples:  # full names win over short aliases
            for contig in self._contigs[sample]:
                self._exact[f"{contig}@{sample}"] = (sample, contig)

    # ---- container -------------------------------------------------------

    def _parse_footer(self, foot: int) -> dict[str, list[tuple[int, int]]]:
        buf = self._data
        pos = foot
        n_streams, pos = _rd_num(buf, pos)
        if n_streams > 1_000_000:
            raise _err(self.path, "implausible stream count")
        streams: dict[str, list[tuple[int, int]]] = {}
        for _ in range(n_streams):
            name, pos = _rd_cstr(buf, pos)
            n_parts, pos = _rd_num(buf, pos)
            _raw, pos = _rd_num(buf, pos)
            parts = []
            for _ in range(n_parts):
                off, pos = _rd_num(buf, pos)
                sz, pos = _rd_num(buf, pos)
                parts.append((off, sz))
            streams[name] = parts
        return streams

    def _part(self, name: str, idx: int = 0) -> bytes:
        """Decompressed payload of one stream part."""
        key = (name, idx)
        if key in self._part_cache:
            return self._part_cache[key]
        parts = self._streams.get(name)
        if parts is None or idx >= len(parts):
            raise _err(self.path, f"missing stream part {name}[{idx}]")
        off, sz = parts[idx]
        meta, dpos = _rd_num(self._data, off)
        payload = self._data[dpos:dpos + sz]
        if payload[:4] == ZSTD_MAGIC:
            out = self._dctx.decompress(payload,
                                        max_output_size=max(meta, 1 << 20))
            if meta and len(out) != meta:
                raise _err(self.path,
                           f"stream {name}: decompressed size {len(out)} != "
                           f"recorded {meta}")
        else:
            out = payload
        self._part_cache[key] = out
        return out

    # ---- collection metadata ----------------------------------------------

    def _load_file_type_info(self) -> None:
        raw = self._part("file_type_info")
        info: dict[str, str] = {}
        pos = 0
        while pos < len(raw):
            k, pos = _rd_cstr(raw, pos)
            if pos >= len(raw):
                break
            v, pos = _rd_cstr(raw, pos)
            info[k] = v
        self.file_type_info = info
        major = info.get("file_version_major", "")
        if major != "3":
            raise _err(self.path,
                       f"file_version_major={major or '?'}; only AGC v3 "
                       "archives are supported")

    def _load_params(self) -> None:
        raw = self._part("params")
        if len(raw) < 16:
            raise _err(self.path, "params stream too short")
        (self.kmer_length, self.min_match_len, self.pack_cardinality,
         self.segment_size) = struct.unpack("<4I", raw[:16])
        if not (0 < self.kmer_length < 64) or self.pack_cardinality == 0:
            raise _err(self.path, "implausible params "
                       f"k={self.kmer_length} pack={self.pack_cardinality}")

    def _load_collection(self) -> None:
        # samples
        raw = self._part("collection-samples")
        n, pos = _rd_varint(raw, 0)
        samples = []
        for _ in range(n):
            s, pos = _rd_cstr(raw, pos)
            samples.append(s)
        self.samples = samples
        # contig names per sample
        raw = self._part("collection-contigs")
        n_s, pos = _rd_varint(raw, 0)
        if n_s != len(samples):
            raise _err(self.path, "sample count mismatch between "
                       "collection-samples and collection-contigs")
        self._contigs: dict[str, list[str]] = {}
        for s in samples:
            n_c, pos = _rd_varint(raw, pos)
            names: list[str] = []
            prev = b""
            for _ in range(n_c):
                end = raw.index(0, pos)
                coded = raw[pos:end]
                pos = end + 1
                out = bytearray()
                for b in coded:
                    if b >= 0x80:
                        n_copy = 256 - b
                        if len(out) + n_copy > len(prev):
                            raise _err(self.path,
                                       "contig-name front-coding copies "
                                       "past the previous name")
                        out += prev[len(out):len(out) + n_copy]
                    else:
                        out.append(b)
                prev = bytes(out)
                names.append(prev.decode("utf-8", "replace"))
            self._contigs[s] = names
        # details: 5 (unc, comp) varint pairs + 5 zstd frames
        det = self._part("collection-details")
        hdr_pos = 0
        sizes = []
        for _ in range(5):
            unc, hdr_pos = _rd_varint(det, hdr_pos)
            comp, hdr_pos = _rd_varint(det, hdr_pos)
            sizes.append((unc, comp))
        secs = []
        pos = hdr_pos
        for unc, comp in sizes:
            frame = det[pos:pos + comp]
            pos += comp
            out = self._dctx.decompress(frame,
                                        max_output_size=max(unc, 1 << 20))
            if len(out) != unc:
                raise _err(self.path, "collection-details section size "
                           f"mismatch ({len(out)} != {unc})")
            secs.append(out)
        self._parse_details(secs)

    def _parse_details(self, secs: list[bytes]) -> None:
        tree, groups, ingroup_d, lens, orients = secs
        pos = 0
        n_s, pos = _rd_varint(tree, pos)
        if n_s != len(self.samples):
            raise _err(self.path, "details sample count mismatch")
        seg_counts: list[tuple[str, str, int]] = []  # (sample, contig, n_seg)
        for s in self.samples:
            n_c, pos = _rd_varint(tree, pos)
            if n_c != len(self._contigs[s]):
                raise _err(self.path, f"details contig count mismatch for "
                           f"sample {s!r}")
            for c in self._contigs[s]:
                n_seg, pos = _rd_varint(tree, pos)
                seg_counts.append((s, c, n_seg))
        # flat per-segment arrays
        gpos = ipos = lpos = 0
        opos = 0
        group_counters: dict[int, int] = {}
        two_k1 = 2 * self.kmer_length + 1
        # (sample, contig) -> list of (group, in_group, raw_len, orient)
        self._segments: dict[tuple[str, str], list[tuple[int, int, int, int]]]
        self._segments = {}
        for s, c, n_seg in seg_counts:
            segs = []
            for _ in range(n_seg):
                g, gpos = _rd_varint(groups, gpos)
                d, ipos = _rd_varint(ingroup_d, ipos)
                if d != 1:
                    raise _err(self.path,
                               f"in-group delta {d} for {c!r}@{s!r}; only "
                               "appended segments (delta 1) are in the "
                               "verified envelope")
                in_group = group_counters.get(g, 0) + 1
                group_counters[g] = in_group
                v, lpos = _rd_varint(lens, lpos)
                raw_len = two_k1 + _unzigzag(v >> 14)
                orient = orients[opos]
                opos += 1
                segs.append((g, in_group, raw_len, orient))
            self._segments[(s, c)] = segs

    # ---- segment data ------------------------------------------------------

    def _group_stream_name(self, gid: int) -> str:
        hexn = f"x{gid:x}d"
        if hexn in self._streams:
            return hexn
        decn = f"x{gid:d}d"
        if decn in self._streams:
            return decn
        raise _err(self.path, f"segment group stream for group {gid} not "
                   "found (expected a raw-group 'x..d' stream; archives "
                   "with splitter-matched segment groups store LZ diffs "
                   "against a group reference and are outside the "
                   "verified envelope — see docs/agc-envelope.md for the "
                   "exact missing byte facts)")

    def _group(self, gid: int) -> list[bytes]:
        """All 0xFF-terminated entries of a group, parts concatenated."""
        got = self._group_entries.get(gid)
        if got is not None:
            return got
        name = self._group_stream_name(gid)
        entries: list[bytes] = []
        for idx in range(len(self._streams[name])):
            payload = self._part(name, idx)
            start = 0
            while start < len(payload):
                try:
                    end = payload.index(0xFF, start)
                except ValueError:
                    raise _err(self.path, f"group {gid}: unterminated "
                               "segment entry")
                entries.append(payload[start:end])
                start = end + 1
        self._group_entries[gid] = entries
        return entries

    def _decode_segment(self, gid: int, in_group: int, raw_len: int,
                        orient: int, where: str) -> bytes:
        entries = self._group(gid)
        if in_group >= len(entries):
            raise _err(self.path, f"group {gid}: segment {in_group} out of "
                       f"range ({len(entries)} entries)")
        codes = entries[in_group]
        if len(codes) != raw_len:
            raise _err(self.path, f"{where}: segment length {len(codes)} != "
                       f"recorded {raw_len} (pack layout outside the "
                       "verified envelope)")
        if codes and max(codes) > 3:
            raise _err(self.path, f"{where}: symbol code {max(codes)} "
                       "(only A/C/G/T codes 0-3 are in the verified "
                       "envelope)")
        seq = codes.translate(_CODE_TO_BASE)
        if orient:
            seq = seq.translate(_COMPLEMENT)[::-1]
        return seq

    def _contig_seq(self, sample: str, contig: str) -> bytes:
        key = (sample, contig)
        got = self._contig_cache.get(key)
        if got is None:
            where = f"{contig}@{sample}"
            k = self.kmer_length
            buf = bytearray()
            for i, (g, in_group, raw_len, orient) in enumerate(
                    self._segments[key]):
                seg = self._decode_segment(g, in_group, raw_len, orient,
                                           where)
                if i:
                    # AGC stitch rule: consecutive segments share the
                    # k-long splitter k-mer.  Verify instead of trusting —
                    # a wrong stitch must fail loudly, not corrupt bases.
                    if len(seg) < k or seg[:k] != bytes(buf[-k:]):
                        raise _err(self.path,
                                   f"{where}: segment {i} does not overlap "
                                   "the previous segment by kmer_length "
                                   "(stitch layout outside the verified "
                                   "envelope)")
                    buf += seg[k:]
                else:
                    buf += seg
            got = bytes(buf)
            self._contig_cache[key] = got
        return got

    def close(self) -> None:  # parity with AgzArchive
        pass

    # ---- listing (AgzArchive-compatible surface) ---------------------------

    def list_samples(self) -> list[str]:
        return list(self.samples)

    def list_contigs(self, sample: str) -> list[str]:
        return list(self._contigs.get(sample, []))

    def sequence_names(self):
        for sample in self.samples:
            for contig in self._contigs[sample]:
                yield f"{contig}@{sample}"

    # ---- access -------------------------------------------------------------

    def _resolve(self, name: str) -> tuple[str, str]:
        for table, how in ((self._exact, "as a short name within the "
                            "sample — use the full contig name"),
                           (self._bare, "present in multiple samples — "
                            "use contig@sample")):
            if name in table:
                hit = table[name]
                if hit is None:
                    raise KeyError(f"sequence '{name}' is ambiguous in "
                                   f"{self.path} ({how})")
                return hit
        raise KeyError(f"sequence '{name}' not found in {self.path}")

    def get_sequence_length(self, name: str) -> int:
        sample, contig = self._resolve(name)
        # O(1) from the recorded raw_lengths: consecutive segments share
        # the k-long splitter, so the stitched length drops (n-1)*k.
        segs = self._segments[(sample, contig)]
        total = sum(raw_len for _, _, raw_len, _ in segs)
        return total - (len(segs) - 1) * self.kmer_length

    def fetch_sequence(self, name: str, start: int, end: int) -> bytes:
        sample, contig = self._resolve(name)
        seq = self._contig_seq(sample, contig)
        start = max(0, min(start, len(seq)))
        end = max(start, min(end, len(seq)))
        return seq[start:end]
