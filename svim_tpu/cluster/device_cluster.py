"""Device clustering: batched on-device agglomeration with exact host parity.

The default CLUSTER backend.  Partitions of 3..128 signatures are batched
into padded arrays and agglomerated on device (ops.linkage_kernel); the host
reconstructs a scipy-format Z from each returned merge sequence and calls
scipy's fcluster on it, which reproduces the reference's flat-cluster
numbering (and therefore cluster ORDER) exactly — see ops/linkage_kernel.py.

Exactness: the device computes in float32 while the reference (scipy) uses
float64.  Every comparison the dendrogram depends on is guarded: the kernel
reports the minimum relative gap between the best and second-best pair over
all merge steps, near-threshold dedup comparisons, and surviving same-read
walls; any partition where float32 could arbitrate differently than float64
returns None and the caller re-runs it on the exact host path
(cluster/cluster.py).  On tie-free data no fallback occurs and results are
bit-identical to the reference (scipy linkage+fcluster over float64 —
SVIM_clustering.py:159-171).

Two routes:
  * fused (DEL / INV / DUP_TAN): coordinates ship to the device; distance
    matrix, same-read dedup (SVIM_clustering.py:145-151) and agglomeration
    all happen in one batched call.
  * matrix (INS / DUP_INT / BND and the DUP_INT candidate round): the exact
    float64 matrix is built on host (cluster/accel.py — edit distances,
    destination terms, direction walls), dedup happens on host in float64,
    and the device performs the agglomeration.  Partitions whose surviving
    matrix contains a 99999 wall (same-read survivors, BND direction
    mismatches) fall back to host.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
from svim_tpu.cluster.scipy_fast import average_linkage, fcluster_distance

from svim_tpu.cluster import accel
from svim_tpu.cluster.distance import SAME_READ_WALL
from svim_tpu.ops.linkage_kernel import (
    MERGE_CUTOFF,
    TIE_EPS,
    agglomerate_batched,
    span_position_agglomerate_batched,
)

FUSED_TYPES = ("DEL", "INV", "DUP_TAN")
MATRIX_TYPES = ("INS", "DUP_INT", "BND")
DEVICE_TYPES = FUSED_TYPES + MATRIX_TYPES
PARTITION_BUCKETS = (32, 128)


def _bucket(n: int) -> int:
    for bucket in PARTITION_BUCKETS:
        if n <= bucket:
            return bucket
    raise ValueError("partition of {0} exceeds the device pad".format(n))


def _round_up_pow2(value: int, floor: int = 8) -> int:
    result = floor
    while result < value:
        result *= 2
    return result


def labels_from_merges(merge_lo, merge_hi, heights, n_survivors: int,
                       threshold: float,
                       slot_rank=None) -> Optional[np.ndarray]:
    """Reconstruct scipy's linkage matrix Z from a kernel merge sequence and
    cut it with scipy's fcluster — identical flat-cluster numbering to the
    host path.  `slot_rank` maps kernel slot indices to survivor ranks
    (identity when the matrix was pre-compacted).  Returns None when a merge
    height sits too close to the cut threshold for float32 to arbitrate
    (caller falls back to host)."""
    m = n_survivors
    if m == 1:
        return np.ones(1, dtype=np.int64)
    ids = {}
    sizes = {}
    z = np.zeros((m - 1, 4), dtype=np.float64)
    rows = 0
    for k in range(len(heights)):
        height = float(heights[k])
        if height >= MERGE_CUTOFF:
            break
        if abs(height - threshold) < TIE_EPS * max(height, 1.0):
            return None
        a = int(merge_lo[k])
        b = int(merge_hi[k])
        id_a = ids.get(a, slot_rank[a] if slot_rank is not None else a)
        id_b = ids.get(b, slot_rank[b] if slot_rank is not None else b)
        size_a = sizes.get(a, 1)
        size_b = sizes.get(b, 1)
        z[rows, 0] = min(id_a, id_b)
        z[rows, 1] = max(id_a, id_b)
        z[rows, 2] = height
        z[rows, 3] = size_a + size_b
        ids[a] = m + rows
        sizes[a] = size_a + size_b
        rows += 1
    if rows != m - 1:
        return None
    return fcluster_distance(z, threshold)


def _group_survivors(survivors, labels):
    """Group surviving elements by fcluster label (same regrouping as the
    host path's _group_by_labels)."""
    groups = [[] for _ in range(int(max(labels)))]
    for element, label in zip(survivors, labels):
        groups[int(label) - 1].append(element)
    return groups


class DeviceClusterResult:
    """Per-partition outcome of a batched device pass."""

    __slots__ = ("clusters", "dropped_count")

    def __init__(self, clusters, dropped_count):
        self.clusters = clusters          # list of clusters, or None => fallback
        self.dropped_count = dropped_count


class PendingDeviceClusters:
    """In-flight device agglomerations for one signature type.

    Dispatch and consumption are split so the driver can launch every type's
    kernels before blocking on any result — jax dispatch is asynchronous, so
    the per-call latency (tunnel RPC on this environment's TPU) overlaps
    across the six types instead of serializing."""

    __slots__ = ("samples", "threshold", "fused", "matrix", "ready")

    def __init__(self, samples, threshold):
        self.samples = samples
        self.threshold = threshold
        self.fused = []    # (indices, device outputs) per bucket
        self.matrix = []   # (positions, prepared, device outputs) per bucket
        self.ready = {}    # index -> DeviceClusterResult decided at dispatch


def _dispatch_fused(samples, element_type, options):
    """DEL / INV / DUP_TAN: coordinates -> device matrix+dedup+agglomerate
    (kernels dispatched, results not yet fetched)."""
    wall_same_read = element_type != "INV"
    threshold = float(options.cluster_max_distance)
    pending = PendingDeviceClusters(samples, threshold)
    by_bucket = {}
    for index, sample in enumerate(samples):
        by_bucket.setdefault(_bucket(len(sample)), []).append(index)

    for pad, indices in sorted(by_bucket.items()):
        batch = _round_up_pow2(len(indices))
        starts = np.zeros((batch, pad), dtype=np.int32)
        ends = np.zeros((batch, pad), dtype=np.int32)
        reads = np.full((batch, pad), -1, dtype=np.int32)
        valid = np.zeros((batch, pad), dtype=bool)
        for row, index in enumerate(indices):
            sample = samples[index]
            n = len(sample)
            starts[row, :n] = [e.get_source()[1] for e in sample]
            ends[row, :n] = [e.get_source()[2] for e in sample]
            # distinct negative ids per padded slot would still compare equal
            # across rows of padding; keep padding invalid instead
            reads[row, :n] = accel.read_index_array(sample)
            valid[row, :n] = True
        num_shards = getattr(options, "num_shards", 1)
        if num_shards > 1:
            # lay the partition batch out over the data mesh: GSPMD splits
            # the vmapped agglomeration across devices
            from svim_tpu.parallel.mesh import shard_batch
            starts, ends, reads, valid = shard_batch(
                num_shards, starts, ends, reads, valid)
        outputs = span_position_agglomerate_batched(
            starts, ends, reads, valid,
            np.float32(options.position_distance_normalizer),
            np.float32(threshold), wall_same_read)
        pending.fused.append((indices, outputs))
    return pending


def _consume_fused(pending, fetched=None):
    results = dict(pending.ready)
    samples = pending.samples
    threshold = pending.threshold
    for entry, (indices, outputs) in enumerate(pending.fused):
        if fetched is not None:
            fetched_outputs = fetched[entry]
        else:
            import jax

            # one batched fetch: per-array np.asarray pays a full RPC round
            # trip each over the tunneled TPU (measured ~10x slower)
            fetched_outputs = jax.device_get(outputs)
        (merges_lo, merges_hi, heights, min_gap, dropped, has_wall,
         dedup_ambiguous) = fetched_outputs
        for row, index in enumerate(indices):
            sample = samples[index]
            n = len(sample)
            if bool(has_wall[row]) or bool(dedup_ambiguous[row]) \
                    or float(min_gap[row]) < TIE_EPS:
                results[index] = DeviceClusterResult(None, 0)
                continue
            drop_mask = dropped[row, :n]
            survivors = [sample[i] for i in range(n) if not drop_mask[i]]
            # kernel merges reference slot indices; scipy ids need survivor
            # ranks (dropped slots leave gaps in the fused route)
            slot_rank = np.cumsum(~dropped[row]) - 1
            labels = labels_from_merges(merges_lo[row], merges_hi[row],
                                        heights[row], len(survivors), threshold,
                                        slot_rank=slot_rank)
            if labels is None:
                results[index] = DeviceClusterResult(None, 0)
                continue
            results[index] = DeviceClusterResult(
                _group_survivors(survivors, labels), int(drop_mask.sum()))
    return results


def _host_linkage_clusters(matrix, reads, survivors, threshold, wall_same_read):
    """Exact float64 host linkage over an already-built (deduped) matrix —
    identical math/order to the fallback path in cluster/cluster.py, reusing
    the matrix instead of recomputing every pair distance."""
    if wall_same_read:
        distances = accel.condensed_with_wall(matrix, reads, wall_same_read=True)
    else:
        distances = matrix[np.triu_indices(matrix.shape[0], k=1)]
    dendrogram = average_linkage(distances)
    labels = fcluster_distance(dendrogram, threshold)
    return _group_survivors(survivors, labels)


def _dispatch_matrix(samples, element_type, reference, options, ed_cache,
                     dedup_same_read=True):
    """INS / DUP_INT / BND (and the candidate round): host float64 matrix +
    exact dedup, device agglomeration (kernels dispatched, not fetched).

    Partitions the device cannot arbitrate — walls surviving into linkage at
    dispatch time, float32 ties at consume time — are resolved by exact host
    linkage over the SAME float64 matrix (never rebuilt)."""
    threshold = float(options.cluster_max_distance)
    pending = PendingDeviceClusters(samples, threshold)
    # (index, survivors, matrix_f64, reads, dropped_count) per partition
    prepared = []
    fallback = pending.ready
    for index, sample in enumerate(samples):
        matrix = accel.distance_matrix(sample, element_type, reference,
                                       options, ed_cache=ed_cache)
        dropped_count = 0
        survivors = sample
        reads = None
        if dedup_same_read:
            reads = accel.read_index_array(sample)
            drop = accel.dedup_same_read(matrix, reads, threshold)
            dropped_count = len(drop)
            if drop:
                keep = [i for i in range(len(sample)) if i not in drop]
                survivors = [sample[i] for i in keep]
                matrix = matrix[np.ix_(keep, keep)]
                reads = reads[keep]
            if len(survivors) > 1:
                same = reads[:, None] == reads[None, :]
                np.fill_diagonal(same, False)
                if same.any():
                    fallback[index] = DeviceClusterResult(_host_linkage_clusters(
                        matrix, reads, survivors, threshold, True), dropped_count)
                    continue
        if len(survivors) == 1:
            fallback[index] = DeviceClusterResult([[survivors[0]]], dropped_count)
            continue
        off_diagonal = ~np.eye(len(survivors), dtype=bool)
        if (matrix[off_diagonal] >= SAME_READ_WALL).any():
            # direction walls (BND) participate in above-cut averages that
            # float32 cannot order safely — host arbitrates those partitions
            fallback[index] = DeviceClusterResult(_host_linkage_clusters(
                matrix, reads, survivors, threshold, dedup_same_read),
                dropped_count)
            continue
        condensed = matrix[np.triu_indices(len(survivors), k=1)]
        if len(np.unique(condensed)) != len(condensed):
            # exactly-tied pair distances (common for deep-coverage INS
            # pileups with identical inserts): the kernel would flag the tie
            # (min_gap 0) and fall back anyway — skip the wasted dispatch and
            # the fetch round trip, resolve on the exact host path now
            fallback[index] = DeviceClusterResult(_host_linkage_clusters(
                matrix, reads, survivors, threshold, dedup_same_read),
                dropped_count)
            continue
        prepared.append((index, survivors, matrix, reads, dropped_count))

    by_bucket = {}
    for position, entry in enumerate(prepared):
        by_bucket.setdefault(_bucket(len(entry[1])), []).append(position)
    for pad, positions in sorted(by_bucket.items()):
        batch = _round_up_pow2(len(positions))
        matrices = np.full((batch, pad, pad), 3.0e38, dtype=np.float32)
        valid = np.zeros((batch, pad), dtype=bool)
        for row, position in enumerate(positions):
            _, survivors, matrix, _, _ = prepared[position]
            n = len(survivors)
            matrices[row, :n, :n] = matrix
            valid[row, :n] = True
        num_shards = getattr(options, "num_shards", 1)
        if num_shards > 1:
            from svim_tpu.parallel.mesh import shard_batch
            matrices, valid = shard_batch(num_shards, matrices, valid)
        outputs = agglomerate_batched(matrices, valid)
        pending.matrix.append((positions, prepared, outputs))
    return pending


def _consume_matrix(pending, wall_same_read=True, fetched=None):
    results = dict(pending.ready)
    threshold = pending.threshold
    for entry, (positions, prepared, outputs) in enumerate(pending.matrix):
        if fetched is not None:
            fetched_outputs = fetched[entry]
        else:
            import jax

            fetched_outputs = jax.device_get(outputs)
        merges_lo, merges_hi, heights, min_gap = fetched_outputs
        for row, position in enumerate(positions):
            index, survivors, matrix, reads, dropped_count = prepared[position]
            if float(min_gap[row]) < TIE_EPS:
                labels = None
            else:
                labels = labels_from_merges(merges_lo[row], merges_hi[row],
                                            heights[row], len(survivors),
                                            threshold)
            if labels is None:
                # float32 could not arbitrate: exact host linkage over the
                # float64 matrix built at dispatch (no recomputation)
                clusters = _host_linkage_clusters(
                    matrix, reads, survivors, threshold,
                    wall_same_read and reads is not None)
                results[index] = DeviceClusterResult(clusters, dropped_count)
                continue
            results[index] = DeviceClusterResult(
                _group_survivors(survivors, labels), dropped_count)
    return results


def dispatch_partitions_device(samples: List[list], element_type: str,
                               reference, options, ed_cache=None):
    """Launch the device agglomerations for same-type partitions (each 3..128
    elements) WITHOUT waiting for the results (jax async dispatch); pair with
    consume_partitions_device.  Lets the driver overlap all six types'
    kernels."""
    if element_type in FUSED_TYPES:
        pending = _dispatch_fused(samples, element_type, options)
        pending.samples = samples
        return pending
    if element_type in MATRIX_TYPES:
        return _dispatch_matrix(samples, element_type, reference, options,
                                ed_cache)
    raise ValueError("unknown signature type {0}".format(element_type))


def pending_device_outputs(pending: PendingDeviceClusters):
    """The in-flight device output trees of this pending batch, in entry
    order — lets a driver fetch MANY types' results in one jax.device_get
    (each device_get pays a full RPC round trip over the tunneled TPU, so
    the six types' per-bucket fetches batch into a single round trip)."""
    if pending.fused:
        return [outputs for _indices, outputs in pending.fused]
    return [outputs for _positions, _prepared, outputs in pending.matrix]


def consume_partitions_device(pending: PendingDeviceClusters, fetched=None):
    """Fetch dispatched results and reconstruct clusters.

    `fetched` optionally supplies already-fetched output trees (matching
    pending_device_outputs order) so a driver can batch the fetch across
    types; when None each entry is fetched here.

    Returns {index: DeviceClusterResult}; a result with clusters=None means
    float32 could not safely arbitrate that partition and the caller must
    re-run it through the exact host path."""
    if pending.fused:
        return _consume_fused(pending, fetched=fetched)
    return _consume_matrix(pending, fetched=fetched)


def cluster_partitions_device(samples: List[list], element_type: str,
                              reference, options, ed_cache=None):
    """Dispatch + consume in one call (single-type callers)."""
    return consume_partitions_device(dispatch_partitions_device(
        samples, element_type, reference, options, ed_cache=ed_cache))


def cluster_candidates_device(samples: List[list], options):
    """Device agglomeration for the second DUP_INT candidate round
    (reference: SVIM_clustering.py:306-372 — no dedup, no walls)."""
    return _consume_matrix(_dispatch_matrix(samples, "DUP_INT", None, options,
                                            None, dedup_same_read=False),
                           wall_same_read=False)
