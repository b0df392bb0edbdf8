"""Opt-in device clustering: batched distance matrices + on-device linkage.

`--cluster_backend device` routes DEL/INV/DUP_TAN partitions (span-position
distance only; no edit distance, no direction walls) through one batched
device pass: (B, 128) padded partitions -> (B, 128, 128) float32 distance
matrices -> same-read dedup on the fetched matrices -> batched agglomerative
average linkage cut at the threshold (ops.linkage_kernel).

The default backend stays the exact host path: device distances are float32,
so dendrogram ties could in principle resolve differently than the
reference's float64 scipy.  On tie-free data the groupings are identical
(tests/test_device_cluster.py).
"""

from __future__ import annotations

from typing import List

import numpy as np

from svim_tpu.cluster.accel import read_index_array
from svim_tpu.ops.distance_kernel import span_position_matrix
from svim_tpu.ops.linkage_kernel import average_linkage_labels_batched

PARTITION_PAD = 128
DEVICE_TYPES = ("DEL", "INV", "DUP_TAN")


def cluster_partitions_device(samples: List[list], element_type: str, options):
    """Cluster same-type partitions (each 3..128 elements) on device.

    Returns one list of clusters per input partition (cluster order inside a
    partition follows first occurrence)."""
    batch = len(samples)
    starts = np.zeros((batch, PARTITION_PAD), dtype=np.int32)
    ends = np.zeros((batch, PARTITION_PAD), dtype=np.int32)
    reads = np.zeros((batch, PARTITION_PAD), dtype=np.int32)
    valid = np.zeros((batch, PARTITION_PAD), dtype=bool)
    for b, sample in enumerate(samples):
        n = len(sample)
        starts[b, :n] = [e.get_source()[1] for e in sample]
        ends[b, :n] = [e.get_source()[2] for e in sample]
        reads[b, :n] = read_index_array(sample)
        valid[b, :n] = True

    wall_same_read = element_type != "INV"
    # raw distances (no wall): dedup needs true same-read pair values
    matrices = np.asarray(span_position_matrix(
        starts, ends, reads, valid,
        np.float32(options.position_distance_normalizer),
        wall_same_read=False))

    # same-read dedup on the fetched matrices (reference rule:
    # SVIM_clustering.py:145-151), then re-pad the survivors
    survivors: List[list] = []
    kept_matrices = np.full((batch, PARTITION_PAD, PARTITION_PAD), 3.0e38,
                            dtype=np.float32)
    kept_valid = np.zeros((batch, PARTITION_PAD), dtype=bool)
    for b, sample in enumerate(samples):
        n = len(sample)
        keep = list(range(n))
        if wall_same_read:
            drop = set()
            for j in range(1, n):
                for i in range(j):
                    if (reads[b, i] == reads[b, j]
                            and matrices[b, i, j] <= options.cluster_max_distance):
                        drop.add(j)
                        break
            keep = [i for i in range(n) if i not in drop]
        kept = [sample[i] for i in keep]
        survivors.append(kept)
        index = np.asarray(keep, dtype=np.int64)
        block = matrices[b][np.ix_(index, index)].copy()
        if wall_same_read:
            block_reads = reads[b][index]
            same = block_reads[:, None] == block_reads[None, :]
            np.fill_diagonal(same, False)
            block[same] = 99999.0
        kept_matrices[b, :len(keep), :len(keep)] = block
        kept_valid[b, :len(keep)] = True

    labels = np.asarray(average_linkage_labels_batched(
        kept_matrices, kept_valid, np.float32(options.cluster_max_distance)))

    per_partition: List[List[list]] = []
    for b, kept in enumerate(survivors):
        if len(kept) == 1:
            per_partition.append([[kept[0]]])
            continue
        groups = {}
        order = []
        for position, element in enumerate(kept):
            label = int(labels[b, position])
            if label not in groups:
                groups[label] = []
                order.append(label)
            groups[label].append(element)
        per_partition.append([groups[label] for label in order])
    return per_partition
