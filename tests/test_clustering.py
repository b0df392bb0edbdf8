"""CLUSTER stage tests (mirrors reference tests/test_clustering.py: synthetic
gaussian-ish signature populations, options from the real parser)."""

import random

import numpy as np
import pytest
from scipy.cluster.hierarchy import fcluster, linkage

from svim_tpu.cluster import form_partitions, partition_and_cluster
from svim_tpu.cluster.edit_distance import edit_distance, edit_distance_dp
from svim_tpu.cluster.linkage import condensed_to_square, fcluster_by_distance
from svim_tpu.signatures import SignatureDeletion


@pytest.fixture
def deletion_groups():
    rng = random.Random(42)
    signatures = []
    # three well-separated groups of 10 deletions each
    for group, (center, span) in enumerate([(10000, 500), (50000, 800), (90000, 300)]):
        for i in range(10):
            start = center + rng.randint(-20, 20)
            end = start + span + rng.randint(-10, 10)
            signatures.append(SignatureDeletion(
                "chr1", start, end, "cigar", "read_{0}_{1}".format(group, i)))
    return signatures


def test_form_partitions(deletion_groups):
    partitions = form_partitions(deletion_groups, 1000)
    assert len(partitions) == 3
    assert sorted(len(p) for p in partitions) == [10, 10, 10]
    # each partition is pure: one group of reads
    for partition in partitions:
        groups = set(sig.read.split("_")[1] for sig in partition)
        assert len(groups) == 1


def test_partition_and_cluster_scores(deletion_groups, default_options):
    clusters = partition_and_cluster(deletion_groups, default_options, "deleted regions")
    assert len(clusters) == 3
    for cluster in clusters:
        assert cluster.size == 10
        # support 10 plus at most 2 * 10/8 deviation bonus (reference bound,
        # tests/test_clustering.py:39-62)
        assert 10 <= cluster.score <= 10 + 20 / 8
        assert cluster.type == "DEL"
    # sorted by (contig, center)
    centers = [(c.start + c.end) / 2 for c in clusters]
    assert centers == sorted(centers)


def test_same_read_signatures_not_clustered(default_options):
    # two distant signatures from the same read in one partition must not be
    # merged (distance wall 99999) but duplicates (close pairs) are dropped
    sigs = [
        SignatureDeletion("chr1", 1000, 1500, "cigar", "readA"),
        SignatureDeletion("chr1", 1002, 1498, "cigar", "readA"),  # dup of first
        SignatureDeletion("chr1", 1001, 1499, "cigar", "readB"),
    ]
    clusters = partition_and_cluster(sigs, default_options, "deleted regions")
    assert len(clusters) == 1
    assert clusters[0].size == 2  # the same-read duplicate was removed


def test_edit_distance_matches_dp():
    rng = random.Random(11)
    for _ in range(50):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 80)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 80)))
        assert edit_distance(a, b) == edit_distance_dp(a, b)


def test_edit_distance_known_cases():
    assert edit_distance("", "") == 0
    assert edit_distance("ACGT", "ACGT") == 0
    assert edit_distance("ACGT", "") == 4
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("A" * 1000, "A" * 995 + "C" * 5) == 5


def test_average_linkage_matches_scipy():
    rng = np.random.default_rng(3)
    for n in (2, 5, 17, 40):
        condensed = rng.random(n * (n - 1) // 2) * 2.0
        labels_scipy = fcluster(linkage(condensed, method="average"), 0.5,
                                criterion="distance")
        labels_ours = fcluster_by_distance(condensed_to_square(condensed, n), 0.5)
        # same grouping (label values may differ)
        groups_scipy = {}
        groups_ours = {}
        for idx, (ls, lo) in enumerate(zip(labels_scipy, labels_ours)):
            groups_scipy.setdefault(ls, set()).add(idx)
            groups_ours.setdefault(lo, set()).add(idx)
        assert set(map(frozenset, groups_scipy.values())) == \
            set(map(frozenset, groups_ours.values()))
