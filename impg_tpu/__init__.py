"""impg_tpu — a TPU-native implicit-pangenome query engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of pangenome/impg:
all-vs-all pairwise alignments are treated as an implicit pangenome graph, and
target ranges are lifted through an interval-indexed alignment set (projecting
coordinates through CIGARs), optionally transitively, and emitted as
BED/BEDPE/PAF (and higher-level outputs).

Architecture (TPU-first, not a port):
  - Alignments are ingested once into dense struct-of-array tensors
    (`core.arena.CigarArena`): the CIGAR of every (directed) alignment is a
    flat run tensor with per-record exclusive prefix sums of target/query
    deltas and identity statistics.  Coordinate projection through an
    alignment then becomes two segmented binary searches plus closed-form
    arithmetic — no serial CIGAR walk (reference: impg.rs:2760-2898 walks op
    by op per projection).
  - Interval stabbing is a vectorized scan/search over per-target sorted
    interval arrays (reference uses coitrees, impg.rs:394).
  - Transitive closure is an iterative frontier expansion with sorted-range
    dedup (reference: impg.rs:2311 BFS).
  - The batched hot path (stab + project + filter) runs under `jax.jit` on
    TPU, sharded over a device mesh for multi-chip scale-out.
"""

from impg_tpu.version import __version__

__all__ = ["__version__"]
