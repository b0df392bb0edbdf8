"""Device-mesh pipeline step: sharded COLLECT + signature merge collectives.

The scaling recipe (per BASELINE north star): sorted read batches stream
data-parallel per device; each shard scans its CIGARs locally; per-shard
signature events are compacted to a fixed-size table and all-gathered over
the 'data' axis (ICI); the replicated table feeds the pairwise
span-position distance kernel; per-locus depth counts are psum-reduced for
genotyping.  The reference defines only the merge semantics (signatures are
per-read independent; clustering needs co-located (type, contig) partitions —
SVIM_clustering.py:17-29); the collectives are new capability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svim_tpu.ops.cigar_kernel import cigar_indel_scan

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

EVENTS_PER_SHARD = 128  # fixed-size per-shard signature table (compacted)
PARTITION_TILE = 128    # distance-matrix tile width


def make_mesh(n_devices: int = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def _local_collect(cigar_words, ref_start, min_sv_size):
    """Per-shard COLLECT: scan CIGARs, compact events into a fixed-size local
    signature table (is_ins, start, length, row)."""
    cigar_lens = cigar_words >> 4
    del_mask, ins_mask, pos_ref, _pos_read = cigar_indel_scan(
        cigar_words, min_sv_size)
    k = cigar_words.shape[1]
    event = (del_mask | ins_mask).ravel()
    (flat_idx,) = jnp.nonzero(event, size=EVENTS_PER_SHARD, fill_value=-1)
    present = flat_idx >= 0
    rows = jnp.maximum(flat_idx, 0) // k
    cols = jnp.maximum(flat_idx, 0) % k
    start = ref_start[rows] + pos_ref[rows, cols]
    length = cigar_lens[rows, cols]
    is_ins = ins_mask[rows, cols]
    return (jnp.where(present, start, -1),
            jnp.where(present, length, 0),
            jnp.where(present, is_ins, False),
            jnp.where(present, rows, -1),
            jnp.sum(event, dtype=jnp.int32))


def build_pipeline_step(mesh: Mesh, min_sv_size: int = 40,
                        position_distance_normalizer: float = 900.0):
    """A jitted full pipeline step over the mesh.

    Inputs (global shapes, sharded over 'data' on the leading axis):
      cigar_words (N, K) int32 (raw BAM encoding), ref_start (N,) int32,
      loci (L, 2) int32 (replicated candidate windows for depth counting).
    Returns (gathered signature starts/lengths, distance matrix over the
    first PARTITION_TILE gathered DEL events, depth counts per locus).
    """

    def step(cigar_words, ref_start, ref_end_pad, loci):
        starts, lengths, is_ins, rows, _count = _local_collect(
            cigar_words, ref_start, min_sv_size)
        # merge per-shard signature tables across the mesh (rides ICI)
        all_starts = jax.lax.all_gather(starts, "data", tiled=True)
        all_lengths = jax.lax.all_gather(lengths, "data", tiled=True)
        all_is_ins = jax.lax.all_gather(is_ins, "data", tiled=True)

        # distance matrix over the first tile of gathered deletion events
        del_starts = jnp.where(all_is_ins, -1, all_starts)[:PARTITION_TILE]
        del_ends = del_starts + jnp.where(all_is_ins, 0, all_lengths)[:PARTITION_TILE]
        valid = del_starts >= 0
        centers = (del_starts + del_ends) // 2
        spans = del_ends - del_starts
        delta_center = jnp.abs(centers[:, None] - centers[None, :]).astype(jnp.float32)
        delta_span = jnp.abs(spans[:, None] - spans[None, :]).astype(jnp.float32)
        max_span = jnp.maximum(jnp.maximum(spans[:, None], spans[None, :]), 1)
        distance = (delta_center / position_distance_normalizer
                    + delta_span / max_span.astype(jnp.float32))
        distance = jnp.where(valid[:, None] & valid[None, :], distance, 99999.0)

        # genotyping depth: local interval-overlap counts, psum over the mesh
        locus_start = loci[:, 0]
        locus_end = loci[:, 1]
        overlaps = ((ref_start[None, :] < locus_end[:, None])
                    & (ref_end_pad[None, :] > locus_start[:, None]))
        local_depth = jnp.sum(overlaps, axis=1, dtype=jnp.int32)
        depth = jax.lax.psum(local_depth, "data")
        return all_starts, all_lengths, distance, depth

    data = P("data")
    replicated = P()
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P("data", None), data, data, replicated),
        out_specs=(replicated, replicated, replicated, replicated),
        check_vma=False))


def sharded_collect(mesh: Mesh, packed, options):
    """Run the fused single-device COLLECT scan with inputs sharded over the
    mesh (jit inserts the gather of the compacted outputs)."""
    from svim_tpu.ops.cigar_kernel import collect_scan

    sharding = NamedSharding(mesh, P("data", None))
    words = jax.device_put(packed.cigar_words, sharding)
    ref_start = jax.device_put(np.asarray(packed.ref_start, dtype=np.int32),
                               NamedSharding(mesh, P("data")))
    max_events = max(1024, packed.n * 4)
    return collect_scan(words, ref_start,
                        jnp.int32(options.min_sv_size), max_events)
