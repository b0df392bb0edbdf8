"""Bit-identity of the consolidation/linkage fast paths.

utils/exactstats must reproduce statistics.stdev exactly (the reference's
float contract, SVIM_clustering.py:223-227), and cluster/scipy_fast must
reproduce scipy's public linkage/fcluster exactly — including on tie-heavy
integer inputs where tie-breaking order matters.
"""

import random
import statistics

import numpy as np

from svim_tpu.cluster.scipy_fast import average_linkage, fcluster_distance
from svim_tpu.utils.exactstats import stdev_half_ints, stdev_ints


def test_stdev_ints_bit_identical():
    rng = random.Random(7)
    for _ in range(400):
        n = rng.randint(2, 120)
        scale = rng.choice([5, 800, 100_000, 2_000_000_000])
        values = [rng.randint(0, scale) for _ in range(n)]
        assert stdev_ints(values) == statistics.stdev(values)


def test_stdev_half_ints_bit_identical():
    rng = random.Random(8)
    for _ in range(400):
        n = rng.randint(2, 120)
        scale = rng.choice([5, 800, 100_000, 2_000_000_000])
        doubled = [rng.randint(0, 2 * scale) for _ in range(n)]
        expected = statistics.stdev([value / 2 for value in doubled])
        assert stdev_half_ints(doubled) == expected


def test_fast_linkage_and_fcluster_bit_identical():
    from scipy.cluster.hierarchy import fcluster, linkage

    rng = np.random.default_rng(9)
    for trial in range(120):
        n = int(rng.integers(2, 100))
        if trial % 3 == 0:
            # tie-heavy: small-integer coordinates -> exactly equal distances
            values = rng.integers(0, 5, size=n).astype(np.float64)
        else:
            values = rng.normal(size=n) * float(rng.uniform(0.01, 100))
        delta = np.abs(values[:, None] - values[None, :])
        y = delta[np.triu_indices(n, k=1)]
        z_fast = average_linkage(y)
        z_public = linkage(y, method="average")
        assert np.array_equal(z_fast, z_public)
        for threshold in (0.1, 0.5, 1.0, 3.0):
            labels_fast = fcluster_distance(z_fast, threshold)
            labels_public = fcluster(z_public, threshold, criterion="distance")
            assert np.array_equal(np.asarray(labels_fast, dtype=np.int64),
                                  np.asarray(labels_public, dtype=np.int64))
