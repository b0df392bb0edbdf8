"""Differential tests for the indexed-pair INS edit-distance route.

The native edit_distance_pairs_indexed call assembles reference-padded
haplotypes (SVIM_clustering.py:32-45 semantics) in C++ worker scratch from
indices; it must produce bit-identical caches and distance matrices to the
explicit string-pair route through batch_edit_distances.
"""

import random

import numpy as np
import pytest

from svim_tpu.cluster import accel


class FakeSig:
    def __init__(self, contig, start, seq, read):
        self.contig = contig
        self.start = start
        self.sequence = seq
        self.read = read
        self.type = "INS"

    def get_source(self):
        return (self.contig, self.start, self.start + len(self.sequence))


class FakeRef:
    def __init__(self, genome):
        self.genome = genome

    def fetch(self, contig, start, end):
        return self.genome[start:end]


class Opts:
    position_distance_normalizer = 900
    cluster_max_distance = 0.5
    edit_distance_normalizer = 1.0
    edit_backend = "auto"


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _make_partitions(rng, n_partitions=12):
    genome = _rand_seq(rng, 100000)
    samples = []
    for _ in range(n_partitions):
        # include loci near position 0 to exercise window clamping
        locus = rng.choice([rng.randint(0, 80), rng.randint(200, 90000)])
        motif = _rand_seq(rng, rng.randint(5, 400))
        part = []
        for k in range(rng.randint(2, 12)):
            noisy = list(motif)
            for _ in range(rng.randint(0, 5)):
                if noisy:
                    noisy[rng.randrange(len(noisy))] = rng.choice("acgt")
            seq = ("".join(noisy) if rng.random() < 0.8
                   else _rand_seq(rng, rng.randint(1, 500)))
            part.append(FakeSig("chr1", max(0, locus + rng.randint(-400, 400)),
                                seq, "r{0}".format(k)))
        samples.append(part)
    return FakeRef(genome), samples


def _string_route_cache(samples, ref, opts, monkeypatch):
    monkeypatch.setattr(accel, "_native_indexed_ed", lambda: None)
    cache = accel.precompute_ins_edit_distances(samples, ref, opts)
    monkeypatch.undo()
    return cache


def test_indexed_matches_string_route(monkeypatch):
    if accel._native_indexed_ed() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(11)
    ref, samples = _make_partitions(rng)
    cache_auto = accel.precompute_ins_edit_distances(samples, ref, Opts())
    cache_str = _string_route_cache(samples, ref, Opts(), monkeypatch)

    assert set(cache_auto.pairs.keys()) == set(cache_str.pairs.keys())
    assert all(cache_auto.pairs[key] == cache_str.pairs[key]
               for key in cache_str.pairs)
    for sample in samples:
        arrays_a = cache_auto.partition_arrays(sample)
        arrays_b = cache_str.partition_arrays(sample)
        assert (arrays_a is None) == (arrays_b is None)
        if arrays_a is not None:
            for left, right in zip(arrays_a, arrays_b):
                assert np.array_equal(left, right)


def test_vectorized_matrix_fill_bitwise(monkeypatch):
    if accel._native_indexed_ed() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(23)
    ref, samples = _make_partitions(rng)
    opts = Opts()
    cache = accel.precompute_ins_edit_distances(samples, ref, opts)
    for sample in samples:
        if len(sample) < 3:
            continue
        arrays = cache.partition_arrays(sample)
        assert arrays is not None
        pairs_i, pairs_j, values = arrays
        scalar_dict = {}
        for i, j, value in zip(pairs_i.tolist(), pairs_j.tolist(),
                               values.tolist()):
            scalar_dict[(id(sample[i]), id(sample[j]))] = value
            scalar_dict[(id(sample[j]), id(sample[i]))] = value
        vectorized = accel.distance_matrix(sample, "INS", ref, opts,
                                           ed_cache=cache)
        scalar = accel.distance_matrix(sample, "INS", ref, opts,
                                       ed_cache=scalar_dict)
        assert np.array_equal(vectorized, scalar)
