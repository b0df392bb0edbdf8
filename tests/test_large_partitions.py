"""Oversized partitions: the fixed-seed subsampling path (>100 signatures,
reference: SVIM_clustering.py:129-134) and scale smoke."""

import random

from svim_tpu.cluster import partition_and_cluster
from svim_tpu.cluster.reference_path import partition_and_cluster_reference
from svim_tpu.signatures import SignatureDeletion, SignatureInsertion


def _dense_del_partition(n=180):
    rng = random.Random(2)
    return [SignatureDeletion("chr1", 50000 + rng.randint(-40, 40),
                              50400 + rng.randint(-40, 40), "cigar",
                              "read{0}".format(i))
            for i in range(n)]


def test_subsampling_is_deterministic(default_options):
    signatures = _dense_del_partition()
    first = partition_and_cluster(list(signatures), default_options, "deleted regions")
    second = partition_and_cluster(list(signatures), default_options, "deleted regions")
    assert [(c.start, c.end, c.size, c.score) for c in first] == \
        [(c.start, c.end, c.size, c.score) for c in second]
    # the sample cap bounds every cluster's membership
    assert sum(c.size for c in first) <= 100
    assert max(c.size for c in first) >= 50  # a dominant cluster emerged


def test_subsampling_matches_reference_path(default_options):
    """The vectorized path consumes the RNG exactly like the scalar reference
    path, so both sample the same 100 signatures."""
    signatures = _dense_del_partition()
    fast = partition_and_cluster(list(signatures), default_options, "deleted regions")
    slow = partition_and_cluster_reference(list(signatures), default_options,
                                           "deleted regions")
    assert [(c.start, c.end, c.size,
             tuple(sorted(m.read for m in c.members))) for c in fast] == \
        [(c.start, c.end, c.size,
          tuple(sorted(m.read for m in c.members))) for c in slow]


def test_large_ins_partition_with_edit_distances(tmp_path, default_options):
    rng = random.Random(9)
    genome = "".join(rng.choice("ACGT") for _ in range(4000))
    genome_path = tmp_path / "g.fa"
    genome_path.write_text(">chr1\n" + genome + "\n")
    options = default_options.replace(genome=str(genome_path))
    motif = "".join(rng.choice("ACGT") for _ in range(120))
    signatures = []
    for i in range(130):
        noisy = list(motif)
        for _ in range(rng.randint(0, 3)):
            noisy[rng.randrange(len(noisy))] = rng.choice("ACGT")
        signatures.append(SignatureInsertion(
            "chr1", 2000 + rng.randint(-25, 25), 2120 + rng.randint(-25, 25),
            "cigar", "r{0}".format(i), "".join(noisy)))
    clusters = partition_and_cluster(signatures, options, "inserted regions")
    assert len(clusters) >= 1
    assert max(c.size for c in clusters) >= 80  # one dominant sampled cluster
