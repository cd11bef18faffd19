"""FASTA random access with .fai indexing (reference: faidx.rs:71-198).

Builds a samtools-compatible .fai sidecar when missing and fetches
subsequences by (name, start, end), uppercased like the reference.  Gzipped
FASTA files are decompressed into memory on open (the reference relies on
htslib BGZF virtual offsets; resident bytes are simpler and the arena-style
design keeps whole-genome scale data in RAM anyway).
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass

_COMPLEMENT = bytes.maketrans(
    b"ACGTUNacgtunRYSWKMBDHVryswkmbdhv",
    b"TGCAANtgcaanYRSWMKVHDByrswmkvhdb",
)


def reverse_complement(seq: bytes) -> bytes:
    """Reverse complement (reference: graph.rs:814)."""
    return seq.translate(_COMPLEMENT)[::-1]


@dataclass
class _FaiEntry:
    length: int
    offset: int
    linebases: int
    linewidth: int
    file_idx: int


def _build_fai(path: str) -> str:
    """Create `<path>.fai` (name, length, offset, linebases, linewidth)."""
    entries = []
    with open(path, "rb") as fh:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        first_line = True
        while True:
            line_start = fh.tell()
            line = fh.readline()
            if not line:
                break
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                length = 0
                offset = fh.tell()
                linebases = 0
                linewidth = 0
                first_line = True
            else:
                stripped = line.rstrip(b"\r\n")
                if first_line and stripped:
                    linebases = len(stripped)
                    linewidth = len(line)
                    first_line = False
                length += len(stripped)
        if name is not None:
            entries.append((name, length, offset, linebases, linewidth))
    fai_path = path + ".fai"
    with open(fai_path, "w") as out:
        for name, length, offset, linebases, linewidth in entries:
            out.write(f"{name}\t{length}\t{offset}\t{linebases}\t{linewidth}\n")
    return fai_path


class FastaIndex:
    """Multi-FASTA random access via .fai sidecars."""

    def __init__(self) -> None:
        self.fasta_paths: list[str] = []
        self.entries: dict[str, _FaiEntry] = {}
        self._handles: dict[int, object] = {}
        self._gz_data: dict[int, bytes] = {}

    @classmethod
    def build_from_files(cls, fasta_files: list[str]) -> "FastaIndex":
        index = cls()
        for file_idx, path in enumerate(fasta_files):
            index.fasta_paths.append(path)
            if path.endswith((".gz", ".bgz")):
                with gzip.open(path, "rb") as fh:
                    data = fh.read()
                index._gz_data[file_idx] = data
                # Index the decompressed bytes in memory.
                import io as _io

                tmp = _io.BytesIO(data)
                name = None
                length = 0
                offset = 0
                linebases = linewidth = 0
                first = True
                while True:
                    line = tmp.readline()
                    if not line:
                        break
                    if line.startswith(b">"):
                        if name is not None:
                            index.entries[name] = _FaiEntry(
                                length, offset, linebases, linewidth, file_idx
                            )
                        name = line[1:].split()[0].decode() if len(line) > 1 else ""
                        length = 0
                        offset = tmp.tell()
                        linebases = linewidth = 0
                        first = True
                    else:
                        stripped = line.rstrip(b"\r\n")
                        if first and stripped:
                            linebases = len(stripped)
                            linewidth = len(line)
                            first = False
                        length += len(stripped)
                if name is not None:
                    index.entries[name] = _FaiEntry(
                        length, offset, linebases, linewidth, file_idx
                    )
            else:
                fai_path = path + ".fai"
                if not os.path.exists(fai_path):
                    _build_fai(path)
                with open(fai_path) as fh:
                    for line in fh:
                        fields = line.rstrip("\n").split("\t")
                        if len(fields) >= 5 and fields[0]:
                            index.entries[fields[0]] = _FaiEntry(
                                int(fields[1]),
                                int(fields[2]),
                                int(fields[3]),
                                int(fields[4]),
                                file_idx,
                            )
        return index

    def sequence_names(self):
        return self.entries.keys()

    def get_sequence_length(self, name: str) -> int:
        entry = self.entries.get(name)
        if entry is None:
            raise KeyError(f"Sequence '{name}' not found in FASTA index")
        return entry.length

    def fetch_sequence(self, name: str, start: int, end: int) -> bytes:
        """Fetch [start, end) on the forward strand, uppercased."""
        entry = self.entries.get(name)
        if entry is None:
            raise KeyError(f"Sequence '{name}' not found in FASTA index")
        if start < 0 or end > entry.length or start > end:
            raise ValueError(
                f"Range {start}-{end} out of bounds for '{name}' "
                f"(length {entry.length})"
            )
        if entry.linebases <= 0:
            return b""
        byte_start = entry.offset + (start // entry.linebases) * entry.linewidth + (
            start % entry.linebases
        )
        byte_end = entry.offset + ((end - 1) // entry.linebases) * entry.linewidth + (
            (end - 1) % entry.linebases
        ) + 1 if end > start else byte_start
        if entry.file_idx in self._gz_data:
            raw = self._gz_data[entry.file_idx][byte_start:byte_end]
        else:
            fh = self._handles.get(entry.file_idx)
            if fh is None:
                fh = open(self.fasta_paths[entry.file_idx], "rb")
                self._handles[entry.file_idx] = fh
            fh.seek(byte_start)
            raw = fh.read(byte_end - byte_start)
        return raw.replace(b"\n", b"").replace(b"\r", b"").upper()


def _looks_like_upstream_agc(path: str) -> bool:
    """Content sniff for real AGC archives (agc/ragc): a version byte pair
    followed by a zstd frame magic (0x28 0xB5 0x2F 0xFD) in the first few
    bytes, and not this framework's own .agz magic."""
    try:
        with open(path, "rb") as fh:
            head = fh.read(16)
    except OSError:
        return False
    if head[:8] == b"IAGZ\x01\x00\x00\x00":  # our own .agz
        return False
    return b"\x28\xb5\x2f\xfd" in head[:8]


class UnifiedSequenceIndex:
    """Sequence access over FASTA files or .agz archives (reference:
    sequence_index.rs UnifiedSequenceIndex over faidx/AGC backends; mixed
    file types are rejected like sequence_index.rs:56)."""

    def __init__(self, backends: list) -> None:
        self._backends = backends

    @classmethod
    def from_files(cls, files: list[str]) -> "UnifiedSequenceIndex":
        is_agz = [f.endswith(".agz") for f in files]
        is_agc = [f.endswith(".agc") or _looks_like_upstream_agc(f)
                  for f in files]
        kinds = {("agz" if z else "agc" if c else "fasta")
                 for z, c in zip(is_agz, is_agc)}
        if len(kinds) > 1:
            raise ValueError(
                "Mixed file types not supported. All files must be either "
                "FASTA, .agz, or .agc (sequence_index.rs:56)"
            )
        if kinds == {"agc"}:
            # Real upstream AGC v3 archives (agc/ragc toolchain): parsed by
            # the archaeology-derived reader; outside-envelope files raise
            # AgcFormatError with the documented conversion path.
            from impg_tpu.io.agc import AgcArchive

            return cls([AgcArchive(f) for f in files])
        if kinds == {"agz"}:
            from impg_tpu.io.agz import AgzArchive

            return cls([AgzArchive(f) for f in files])
        return cls([FastaIndex.build_from_files(files)])

    def _first_with(self, name: str):
        err = None
        for b in self._backends:
            try:
                b.get_sequence_length(name)
                return b
            except KeyError as e:
                err = e
        raise err if err else KeyError(name)

    def fetch_sequence(self, name: str, start: int, end: int) -> bytes:
        return self._first_with(name).fetch_sequence(name, start, end)

    def get_sequence_length(self, name: str) -> int:
        return self._first_with(name).get_sequence_length(name)

    def sequence_names(self):
        for b in self._backends:
            yield from b.sequence_names()
