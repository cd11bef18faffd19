"""ONEcode-style binary container: generic writer/reader with O(1) seek.

The reference consumes binary ``.1aln`` through the onecode crate
(onealn.rs:49 ``OneFile::open_read``, onealn.rs:93
``fetch_alignment_from_reader`` → ``file.goto('A', i+1)``): a ONEcode file
is a sequence of typed lines (one-char linetype + typed fields), with an
ASCII header carrying the filetype/version, per-linetype counts and an
embedded schema, and — in binary mode — a compressed line stream plus a
footer object index that makes ``goto`` O(1).

This module realizes that structural model natively:

  * ASCII header: ``1 <len> <type> <major> <minor>``, ``!`` provenance,
    ``~ <linetype> <N> <TYPE>...`` embedded schema, ``# <lt> <count>`` /
    ``@ <lt> <max-list>`` / ``+ <lt> <total-list>`` count lines.
  * ``$ 1`` marks the switch to the binary line stream: each line is one
    linetype byte followed by its fields — zigzag varints for INT,
    length-prefixed bytes for STRING, count-prefixed delta-zigzag varints
    for INT_LIST.
  * ``^`` marks the footer: per indexed linetype, the absolute byte
    offset of every such line (delta varints), then an 8-byte footer
    pointer and the trailing magic ``1BIN``.

The upstream ONElib byte encoding (its per-field Huffman codecs and
footer serialization) is not published in this environment, so the line
stream here is an equivalent varint encoding rather than a byte-for-byte
clone; the container is self-describing (schema in header) and round-trips
through this module.  ASCII ONEcode files are handled by ``io/onealn.py``
directly.
"""

from __future__ import annotations

import io
import os
import struct

MAGIC = b"1BIN"
T_INT = "INT"
T_STRING = "STRING"
T_INT_LIST = "INT_LIST"
_FOOTER_FIXED = struct.Struct("<Q")  # footer byte offset


def _zigzag(v: int) -> int:
    if not (-(2**63) <= v < 2**63):
        # Outside int64 the arithmetic-shift trick yields a NEGATIVE u,
        # which would spin _write_varint forever (Python >> never
        # reaches 0 for negatives).
        raise OverflowError(f"INT field out of int64 range: {v}")
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_varint(buf: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_varint(mv, pos: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = mv[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not (b & 0x80):
            return out, pos
        shift += 7


def is_onecode_binary(path: str) -> bool:
    """True when `path` ends with this container's footer magic."""
    try:
        with open(path, "rb") as fh:
            fh.seek(0, os.SEEK_END)
            size = fh.tell()
            if size < len(MAGIC) + _FOOTER_FIXED.size:
                return False
            fh.seek(size - len(MAGIC))
            return fh.read(len(MAGIC)) == MAGIC
    except OSError:
        return False


def describe_onecode_header(path: str, max_bytes: int = 65536) -> dict | None:
    """Header-first probe of a ONEcode file (ours OR upstream ONElib).

    Every ONEcode file — ASCII or binary, ONElib-written or ours — begins
    with an ASCII header (onealn.rs:50 reads it via OneFile::open_read;
    the grammar is shared with this module's writer): a ``1`` first line
    with the filetype + version, optional ``2`` subtype, ``!`` provenance,
    ``#``/``@``/``+``/``%`` count lines, ``~`` embedded schema, and a
    ``$`` line switching to the binary stream.  This parses exactly that
    shared ASCII prefix and stops at the first binary byte, so upstream
    ONElib binaries are RECOGNIZED AND DESCRIBED even though their line
    stream cannot be decoded here.

    Returns None when the file does not start with a ONEcode ``1`` line.
    The dict carries: filetype, version, subtype, provenance (list of
    ``!`` field tuples), counts (linetype -> declared total from ``#``),
    schema (linetype -> raw schema tokens), binary (bool: saw ``$`` or
    non-ASCII payload), header_lines (count parsed), and missing — the
    codec facts still required for a byte-level upstream decode, kept
    explicit per the interop contract:
      * ONElib's per-field compression codecs (its vcEncode tables for
        INT_LIST/DNA payloads) — no spec or sample in this environment;
      * the binary line-record byte layout (linetype byte flag bits);
      * the footer serialization behind ``goto`` (object index layout).
    """
    try:
        with open(path, "rb") as fh:
            head = fh.read(max_bytes)
    except OSError:
        return None
    if not head.startswith(b"1 "):
        return None
    info: dict = {
        "filetype": None, "version": None, "subtype": None,
        "provenance": [], "counts": {}, "max_list": {}, "totals": {},
        "schema": {}, "binary": False, "header_lines": 0,
        "missing": [
            "ONElib per-field compression codec tables",
            "binary line-record byte layout (flag bits per linetype byte)",
            "footer object-index serialization (goto index)",
        ],
    }

    def _fields(rest: str) -> list[str]:
        """ONEcode header tokens: `<len> <string>` pairs and bare ints."""
        toks = rest.split()
        out = []
        i = 0
        while i < len(toks):
            if toks[i].isdigit() and i + 1 < len(toks) and not (
                toks[i + 1].isdigit()
            ):
                out.append(toks[i + 1])
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    pos = 0
    while pos < len(head):
        nl = head.find(b"\n", pos)
        raw = head[pos:nl] if nl >= 0 else head[pos:]
        if any(b < 0x09 or b > 0x7E for b in raw):
            info["binary"] = True  # reached the binary line stream
            break
        line = raw.decode("ascii", "replace").rstrip()
        pos = (nl + 1) if nl >= 0 else len(head)
        if not line:
            continue
        tag, _, rest = line.partition(" ")
        info["header_lines"] += 1
        if tag == "1":
            f = _fields(rest)
            info["filetype"] = f[0] if f else None
            if len(f) >= 3:
                info["version"] = f"{f[1]}.{f[2]}"
        elif tag == "2":
            f = _fields(rest)
            info["subtype"] = f[0] if f else None
        elif tag == "!":
            info["provenance"].append(tuple(_fields(rest)))
        elif tag == "#":
            t = rest.split()
            if len(t) >= 2:
                info["counts"][t[0]] = int(t[1])
        elif tag == "@":
            t = rest.split()
            if len(t) >= 2:
                info["max_list"][t[0]] = int(t[1])
        elif tag == "+":
            t = rest.split()
            if len(t) >= 2:
                info["totals"][t[0]] = int(t[1])
        elif tag == "~":
            t = rest.split()
            if len(t) >= 2:
                info["schema"].setdefault(t[1] if t[0] in "ODG" else t[0],
                                          t)
        elif tag == "$":
            info["binary"] = True
            break
        # other tags (%, <, >, .) are legal; counted but not interpreted
    return info


def describe_onecode_summary(path: str) -> str | None:
    """One-line human description used in ingest error messages."""
    info = describe_onecode_header(path)
    if info is None:
        return None
    prog = info["provenance"][0][0] if info["provenance"] else "unknown tool"
    counts = ", ".join(
        f"{v} '{k}'" for k, v in sorted(info["counts"].items())
    ) or "no declared counts"
    return (
        f"ONEcode {'binary' if info['binary'] else 'ASCII'} file, "
        f"type '{info['filetype']}' v{info['version']}"
        + (f" subtype '{info['subtype']}'" if info["subtype"] else "")
        + f", written by {prog}; {counts}"
    )


class OneBinaryWriter:
    """Write a ONEcode-structured binary file.

    `schema` maps linetype -> tuple of field types (T_INT/T_STRING/
    T_INT_LIST).  Linetypes listed in `indexed` get a footer offset
    index (the onecode object index behind ``goto``, onealn.rs:101).
    """

    def __init__(
        self,
        path: str,
        file_type: str,
        major: int = 1,
        minor: int = 1,
        schema: dict[str, tuple[str, ...]] | None = None,
        indexed: tuple[str, ...] = (),
        provenance: str | None = None,
    ):
        self.path = path
        self.file_type = file_type
        self.major, self.minor = major, minor
        self.schema: dict[str, tuple[str, ...]] = dict(schema or {})
        self.indexed = tuple(indexed)
        self.provenance = provenance
        self._body = bytearray()
        # Large bodies spill to an anonymous temp file so writing a big
        # binary container costs O(buffer) RAM, not O(file size).
        self._spill = None
        self._spilled_len = 0
        self._spill_limit = 32 << 20
        self._offsets: dict[str, list[int]] = {lt: [] for lt in indexed}
        self._counts: dict[str, int] = {}
        self._list_max: dict[str, int] = {}
        self._list_total: dict[str, int] = {}
        self._closed = False

    def write(self, linetype: str, *fields) -> None:
        if self._closed:
            raise ValueError("writer is closed")
        spec = self.schema[linetype]
        if len(fields) != len(spec):
            raise ValueError(
                f"line '{linetype}' expects {len(spec)} fields, got "
                f"{len(fields)}"
            )
        if linetype in self._offsets:
            self._offsets[linetype].append(
                self._spilled_len + len(self._body)
            )
        self._counts[linetype] = self._counts.get(linetype, 0) + 1
        buf = self._body
        buf.append(ord(linetype))
        for ftype, val in zip(spec, fields):
            if ftype == T_INT:
                _write_varint(buf, _zigzag(int(val)))
            elif ftype == T_STRING:
                data = val.encode() if isinstance(val, str) else bytes(val)
                _write_varint(buf, len(data))
                buf.extend(data)
            elif ftype == T_INT_LIST:
                vals = [int(x) for x in val]
                _write_varint(buf, len(vals))
                prev = 0
                for x in vals:
                    _write_varint(buf, _zigzag(x - prev))
                    prev = x
                self._list_max[linetype] = max(
                    self._list_max.get(linetype, 0), len(vals)
                )
                self._list_total[linetype] = (
                    self._list_total.get(linetype, 0) + len(vals)
                )
            else:
                raise ValueError(f"unknown field type {ftype}")
        if len(buf) >= self._spill_limit:
            if self._spill is None:
                import tempfile

                self._spill = tempfile.TemporaryFile()
            self._spill.write(buf)
            self._spilled_len += len(buf)
            buf.clear()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        hdr = io.StringIO()
        hdr.write(
            f"1 {len(self.file_type)} {self.file_type} "
            f"{self.major} {self.minor}\n"
        )
        if self.provenance:
            hdr.write(f"! {self.provenance}\n")
        for lt, spec in self.schema.items():
            hdr.write(f"~ {lt} {len(spec)} " + " ".join(spec) + "\n")
        for lt, n in sorted(self._counts.items()):
            hdr.write(f"# {lt} {n}\n")
        for lt, n in sorted(self._list_max.items()):
            hdr.write(f"@ {lt} {n}\n")
        for lt, n in sorted(self._list_total.items()):
            hdr.write(f"+ {lt} {n}\n")
        hdr.write("$ 1\n")
        header = hdr.getvalue().encode()

        with open(self.path, "wb") as fh:
            fh.write(header)
            if self._spill is not None:
                import shutil

                self._spill.seek(0)
                shutil.copyfileobj(self._spill, fh, 8 << 20)
                self._spill.close()
                self._spill = None
            fh.write(self._body)
            footer_off = fh.tell()
            foot = bytearray()
            foot.append(ord("^"))
            _write_varint(foot, len(self._offsets))
            for lt, offs in self._offsets.items():
                foot.append(ord(lt))
                _write_varint(foot, len(offs))
                prev = 0
                for o in offs:
                    # offsets are relative to the body start
                    _write_varint(foot, o - prev)
                    prev = o
            fh.write(foot)
            fh.write(_FOOTER_FIXED.pack(footer_off))
            fh.write(MAGIC)
        self._header_len = len(header)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class OneBinaryReader:
    """Read a ONEcode-structured binary file with O(1) ``goto``.

    API mirrors what onealn.rs uses from the onecode crate: iterate
    ``read_line()`` → ``(linetype, fields)``; ``goto(lt, i)`` seeks the
    cursor to the i-th (0-based) line of an indexed type via the footer
    object index; header ``counts`` expose the ``#`` lines.
    """

    def __init__(self, path: str):
        import mmap

        with open(path, "rb") as fh:
            try:
                data = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
            except (ValueError, OSError):  # empty file / exotic fs
                data = fh.read()
        if data[-len(MAGIC):] != MAGIC:
            raise ValueError(f"{path}: not a ONEcode binary container")
        (footer_off,) = _FOOTER_FIXED.unpack(
            data[-len(MAGIC) - _FOOTER_FIXED.size : -len(MAGIC)]
        )
        self._data = memoryview(data)
        # --- header (ASCII up to the `$` line) ---
        self.file_type = ""
        self.schema: dict[str, tuple[str, ...]] = {}
        self.counts: dict[str, int] = {}
        self.list_max: dict[str, int] = {}
        self.list_total: dict[str, int] = {}
        self.provenance: list[str] = []
        pos = 0
        while True:
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError(f"{path}: truncated header")
            line = data[pos:nl].decode()
            pos = nl + 1
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "1":
                self.file_type = parts[2]
                self.major, self.minor = int(parts[3]), int(parts[4])
            elif tag == "!":
                self.provenance.append(line[2:])
            elif tag == "~":
                self.schema[parts[1]] = tuple(parts[3 : 3 + int(parts[2])])
            elif tag == "#":
                self.counts[parts[1]] = int(parts[2])
            elif tag == "@":
                self.list_max[parts[1]] = int(parts[2])
            elif tag == "+":
                self.list_total[parts[1]] = int(parts[2])
            elif tag == "$":
                break
        self._body_start = pos
        self._footer_off = footer_off
        self._pos = pos
        # --- footer object index ---
        mv = self._data
        fpos = footer_off
        if mv[fpos] != ord("^"):
            raise ValueError(f"{path}: corrupt footer")
        fpos += 1
        n_types, fpos = _read_varint(mv, fpos)
        self.index: dict[str, list[int]] = {}
        for _ in range(n_types):
            lt = chr(mv[fpos])
            fpos += 1
            n, fpos = _read_varint(mv, fpos)
            offs = []
            prev = 0
            for _ in range(n):
                d, fpos = _read_varint(mv, fpos)
                prev += d
                offs.append(prev)
            self.index[lt] = offs

    def goto(self, linetype: str, i: int) -> None:
        """Seek so the next ``read_line`` returns the i-th `linetype`."""
        offs = self.index.get(linetype)
        if offs is None:
            raise KeyError(f"linetype '{linetype}' is not indexed")
        if not 0 <= i < len(offs):
            raise IndexError(
                f"object index {i} out of range (0..{len(offs) - 1})"
            )
        self._pos = self._body_start + offs[i]

    def read_line(self):
        """Next ``(linetype, [fields...])`` or None at end of body."""
        mv = self._data
        pos = self._pos
        if pos >= self._footer_off:
            return None
        lt = chr(mv[pos])
        pos += 1
        spec = self.schema.get(lt)
        if spec is None:
            raise ValueError(f"line type '{lt}' missing from schema")
        fields = []
        for ftype in spec:
            if ftype == T_INT:
                u, pos = _read_varint(mv, pos)
                fields.append(_unzigzag(u))
            elif ftype == T_STRING:
                n, pos = _read_varint(mv, pos)
                fields.append(bytes(mv[pos : pos + n]).decode())
                pos += n
            elif ftype == T_INT_LIST:
                n, pos = _read_varint(mv, pos)
                vals = []
                prev = 0
                for _ in range(n):
                    u, pos = _read_varint(mv, pos)
                    prev += _unzigzag(u)
                    vals.append(prev)
                fields.append(vals)
            else:
                raise ValueError(f"unknown field type {ftype}")
        self._pos = pos
        return lt, fields

    def __iter__(self):
        while True:
            line = self.read_line()
            if line is None:
                return
            yield line
