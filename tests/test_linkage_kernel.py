"""On-device average-linkage kernel vs scipy grouping (tie-free inputs)."""

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage

from svim_tpu.ops.linkage_kernel import average_linkage_labels_batched


def _groups(labels):
    groups = {}
    for idx, label in enumerate(labels):
        groups.setdefault(label, frozenset()).union
        groups[label] = groups.get(label, frozenset()) | {idx}
    return set(map(frozenset, groups.values()))


def test_batched_linkage_matches_scipy():
    rng = np.random.default_rng(17)
    pad = 32
    batch = 6
    sizes = [2, 5, 9, 17, 24, 32]
    distances = np.zeros((batch, pad, pad), dtype=np.float32)
    valid = np.zeros((batch, pad), dtype=bool)
    scipy_groupings = []
    threshold = 0.5
    for b, n in enumerate(sizes):
        condensed = rng.random(n * (n - 1) // 2) * 1.4
        matrix = np.zeros((n, n))
        iu = np.triu_indices(n, k=1)
        matrix[iu] = condensed
        matrix += matrix.T
        distances[b, :n, :n] = matrix
        valid[b, :n] = True
        labels = fcluster(linkage(condensed, method="average"), threshold,
                          criterion="distance")
        groups = {}
        for idx, label in enumerate(labels):
            groups.setdefault(label, set()).add(idx)
        scipy_groupings.append(set(map(frozenset, groups.values())))

    device_labels = np.asarray(average_linkage_labels_batched(
        distances, valid, np.float32(threshold)))
    for b, n in enumerate(sizes):
        groups = {}
        for idx in range(n):
            groups.setdefault(int(device_labels[b, idx]), set()).add(idx)
        assert set(map(frozenset, groups.values())) == scipy_groupings[b], b
        # padded entries label themselves
        for idx in range(n, pad):
            assert device_labels[b, idx] == idx
