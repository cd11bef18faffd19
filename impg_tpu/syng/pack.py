"""Pack coverage vectors over syncmer features (reference: pack.rs).

A pack is a count vector over a feature space — here the distinct canonical
syncmer ids of a syng index ("syng-syncmer-node" space without the GBWT node
numbering yet).  Binary artifact `.packt` (npz: sorted feature ids + counts
+ metadata), plus a TSV form (pack.rs TSV variant).

Read mapping (`map_reads`): every read's syncmers are looked up in the index
universe and their counts accumulated — the round-1 slice of the reference
`impg map -o pack` path (main.rs:1182-1427).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass

import numpy as np

from impg_tpu.ops import syncmer as syncmer_mod
from impg_tpu.syng.index import SyngIndex, match_universe

PACK_VERSION = 1


@dataclass
class Pack:
    feature_ids: np.ndarray  # uint64, sorted — the feature universe
    counts: np.ndarray  # int64
    feature_space: str = "syng-syncmer-id"
    backend: str = "syncmer-walk"

    def save(self, path: str) -> None:
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            version=np.int64(PACK_VERSION),
            feature_ids=self.feature_ids,
            counts=self.counts,
            feature_space=np.array(self.feature_space),
            backend=np.array(self.backend),
        )
        import os

        if not path.endswith(".npz") and os.path.exists(path + ".npz"):
            os.replace(path + ".npz", path)

    @classmethod
    def load(cls, path: str) -> "Pack":
        with np.load(path, allow_pickle=False) as z:
            return cls(
                feature_ids=z["feature_ids"],
                counts=z["counts"],
                feature_space=str(z["feature_space"]),
                backend=str(z["backend"]),
            )

    def write_tsv(self, out) -> None:
        out.write("feature.id\tcount\n")
        for fid, c in zip(self.feature_ids.tolist(), self.counts.tolist()):
            if c:
                out.write(f"{fid}\t{c}\n")

    def counts_for(self, ids: np.ndarray) -> np.ndarray:
        """Counts for arbitrary feature ids (0 when absent)."""
        idx = np.searchsorted(self.feature_ids, ids)
        idx_c = np.clip(idx, 0, max(self.feature_ids.size - 1, 0))
        hit = (
            (idx < self.feature_ids.size)
            & (self.feature_ids[idx_c] == ids)
            if self.feature_ids.size
            else np.zeros(ids.size, bool)
        )
        return np.where(hit, self.counts[idx_c], 0)


def read_sequences(path: str):
    """Yield (name, bytes) from FASTA or FASTQ (optionally gzipped)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        first = fh.read(1)
        fh.seek(0)
        if first == b">":
            name, parts = None, []
            for line in fh:
                line = line.rstrip(b"\r\n")
                if line.startswith(b">"):
                    if name is not None:
                        yield name, b"".join(parts)
                    name = line[1:].split()[0].decode() if len(line) > 1 else ""
                    parts = []
                else:
                    parts.append(line)
            if name is not None:
                yield name, b"".join(parts)
        elif first == b"@":
            while True:
                header = fh.readline()
                if not header:
                    break
                seq = fh.readline().rstrip(b"\r\n")
                fh.readline()  # +
                fh.readline()  # quals
                yield header[1:].split()[0].decode(), seq
        else:
            raise ValueError(f"{path}: not FASTA or FASTQ")


def universe_from_index(index: SyngIndex) -> np.ndarray:
    """Sorted distinct syncmer ids (cached on the index)."""
    cached = getattr(index, "_universe_cache", None)
    if cached is None:
        cached = np.unique(index.occ_ids)
        index._universe_cache = cached
    return cached


def map_reads(
    index: SyngIndex, read_files: list[str], batch: int = 8192
) -> tuple[Pack, int, int]:
    """Accumulate read syncmer matches into a pack over the index universe.

    Returns (pack, n_reads, n_matched_syncmers).  Reads are extracted in
    native thread-parallel batches (syncmer.cpp sx_extract_batch —
    bit-exact vs per-read extraction) with one vectorized universe match
    per batch; per-read numpy calls cost ~100 us of dispatch each, which
    dominated million-read runs.  Falls back to the per-read numpy
    pipeline when the native library is unavailable."""
    from impg_tpu.io.native import extract_syncmers_batch_native

    universe = universe_from_index(index)
    counts = np.zeros(universe.size, np.int64)
    n_reads = 0
    n_matched = 0

    native_probe = extract_syncmers_batch_native(
        [b"ACGT" * 8], index.k, index.w, index.seed
    )
    use_native = native_probe is not None

    def flush(seqs: list[bytes]) -> None:
        nonlocal n_matched
        if not seqs:
            return
        if use_native:
            _pos, ids, _fwd, _cnt = extract_syncmers_batch_native(
                seqs, index.k, index.w, index.seed
            )
        else:
            parts = [
                syncmer_mod.extract_syncmers(
                    s, index.k, index.w, index.seed
                )[1]
                for s in seqs
            ]
            ids = (
                np.concatenate(parts) if parts else np.zeros(0, np.uint64)
            )
        if ids.size == 0:
            return
        hit, idx_c = match_universe(universe, ids)
        np.add.at(counts, idx_c[hit], 1)
        n_matched += int(hit.sum())

    pending: list[bytes] = []
    for path in read_files:
        for _name, seq in read_sequences(path):
            n_reads += 1
            pending.append(seq)
            if len(pending) >= batch:
                flush(pending)
                pending = []
    flush(pending)
    return Pack(feature_ids=universe, counts=counts), n_reads, n_matched
