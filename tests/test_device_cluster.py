"""Opt-in device clustering backend: identical groupings to the exact host
path on tie-free data (DEL/INV/DUP_TAN)."""

import random

from svim_tpu.cluster import partition_and_cluster
from svim_tpu.signatures import SignatureDeletion, SignatureInversion


def _clusters_key(clusters):
    return [(c.contig, c.start, c.end, c.size, round(c.score, 6),
             tuple(sorted(m.read for m in c.members))) for c in clusters]


def test_device_backend_matches_exact_deletions(default_options):
    rng = random.Random(23)
    signatures = []
    for group in range(6):
        center = 20000 * (group + 1)
        span = rng.randint(100, 700)
        for i in range(rng.randint(3, 40)):
            start = center + rng.randint(-40, 40)
            end = start + span + rng.randint(-12, 12)
            signatures.append(SignatureDeletion(
                "chr1", start, end, "cigar", "read_{0}_{1}".format(group, i)))
    # include same-read duplicates to exercise dedup on device
    signatures.append(SignatureDeletion("chr1", 20010, 20310, "cigar", "read_0_0"))

    exact = partition_and_cluster(signatures, default_options, "deleted regions")
    device = partition_and_cluster(
        signatures, default_options.replace(cluster_backend="device"),
        "deleted regions")
    assert _clusters_key(exact) == _clusters_key(device)


def test_device_backend_matches_exact_inversions(default_options):
    rng = random.Random(5)
    signatures = []
    for group in range(4):
        center = 50000 * (group + 1)
        span = rng.randint(300, 1500)
        for i in range(8):
            direction = rng.choice(["left_fwd", "left_rev", "right_fwd", "right_rev"])
            signatures.append(SignatureInversion(
                "chr1", center + rng.randint(-30, 30),
                center + span + rng.randint(-30, 30), "suppl",
                "read_{0}_{1}".format(group, i % 5), direction))
    exact = partition_and_cluster(signatures, default_options, "inverted regions")
    device = partition_and_cluster(
        signatures, default_options.replace(cluster_backend="device"),
        "inverted regions")
    assert _clusters_key(exact) == _clusters_key(device)
