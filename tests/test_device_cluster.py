"""Device clustering backend (the default): identical clusters — including
cluster ORDER, which follows scipy's fcluster numbering — to the exact host
path across all six signature types."""

import random

import pytest

from svim_tpu.cluster import partition_and_cluster
from svim_tpu.cluster.cluster import partition_and_cluster_candidates
from svim_tpu.config import parse_arguments
from svim_tpu.signatures import (
    SignatureDeletion,
    SignatureDuplicationTandem,
    SignatureInsertion,
    SignatureInsertionFrom,
    SignatureInversion,
    SignatureTranslocation,
)


def _clusters_key(clusters):
    """Order-sensitive cluster fingerprint (member identity order included)."""
    return [(c.contig, c.start, c.end, c.size, round(c.score, 6),
             tuple(m.read for m in c.members)) for c in clusters]


@pytest.fixture
def wide_options(tmp_path):
    """Options with a genome long enough for INS haplotype windows."""
    rng = random.Random(9)
    genome = tmp_path / "genome.fa"
    sequence = "".join(rng.choice("ACGT") for _ in range(400_000))
    genome.write_text(">chr1\n" + sequence + "\n>chr2\n" + sequence[:1000] + "\n")
    return parse_arguments(arguments=[
        "alignment", str(tmp_path), str(tmp_path / "reads.bam"), str(genome)])


def _compare(signatures, options, label):
    exact = partition_and_cluster(
        signatures, options.replace(cluster_backend="exact"), label)
    device = partition_and_cluster(
        signatures, options.replace(cluster_backend="device"), label)
    assert _clusters_key(exact) == _clusters_key(device)


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
    _compare(signatures, default_options, "deleted regions")


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
    _compare(signatures, default_options, "inverted regions")


def test_device_backend_matches_exact_tandem_duplications(default_options):
    rng = random.Random(77)
    signatures = []
    for group in range(5):
        start = 30000 * (group + 1)
        span = rng.randint(80, 400)
        for i in range(rng.randint(3, 25)):
            s = start + rng.randint(-25, 25)
            signatures.append(SignatureDuplicationTandem(
                "chr1", s, s + span + rng.randint(-10, 10), rng.randint(1, 3),
                True, "suppl", "read_{0}_{1}".format(group, i)))
    _compare(signatures, default_options, "tandem duplicated regions")


def test_device_backend_matches_exact_insertions(wide_options):
    rng = random.Random(31)
    signatures = []
    for group in range(5):
        start = 40000 * (group + 1)
        motif = "".join(rng.choice("ACGT") for _ in range(rng.randint(60, 220)))
        for i in range(rng.randint(3, 20)):
            noisy = list(motif)
            for _ in range(rng.randint(0, 5)):
                noisy[rng.randrange(len(noisy))] = rng.choice("ACGT")
            s = start + rng.randint(-35, 35)
            signatures.append(SignatureInsertion(
                "chr1", s, s + len(noisy), "cigar",
                "read_{0}_{1}".format(group, i), "".join(noisy)))
    _compare(signatures, wide_options, "inserted regions")


def test_device_backend_matches_exact_interspersed_duplications(wide_options):
    rng = random.Random(13)
    signatures = []
    for group in range(4):
        start = 25000 * (group + 1)
        span = rng.randint(100, 500)
        dest = 200000 + 3000 * group
        for i in range(rng.randint(3, 18)):
            s = start + rng.randint(-30, 30)
            signatures.append(SignatureInsertionFrom(
                "chr1", s, s + span + rng.randint(-8, 8), "chr1",
                dest + rng.randint(-20, 20), "suppl",
                "read_{0}_{1}".format(group, i)))
    _compare(signatures, wide_options,
             "inserted regions with detected region of origin")


def test_device_backend_matches_exact_translocations(wide_options):
    rng = random.Random(3)
    signatures = []
    for group in range(4):
        pos1 = 20000 * (group + 1)
        pos2 = 150000 + 5000 * group
        # mix direction pairs inside one partition: direction walls force the
        # host fallback for those partitions — results must still be identical
        for i in range(rng.randint(4, 16)):
            d1 = rng.choice(["fwd", "rev"])
            d2 = rng.choice(["fwd", "rev"])
            signatures.append(SignatureTranslocation(
                "chr1", pos1 + rng.randint(-40, 40), d1,
                "chr2", pos2 + rng.randint(-40, 40), d2, "suppl",
                "read_{0}_{1}".format(group, i)))
    _compare(signatures, wide_options, "translocation breakpoints")


def test_device_backend_candidate_round_matches(wide_options):
    """Second DUP_INT candidate clustering round through the device path."""
    from svim_tpu.candidates import CandidateDuplicationInterspersed

    rng = random.Random(8)
    candidates = []
    for group in range(3):
        start = 30000 * (group + 1)
        span = rng.randint(150, 400)
        dest = 250000 + 4000 * group
        for i in range(rng.randint(3, 12)):
            s = start + rng.randint(-25, 25)
            members = [SignatureInsertionFrom(
                "chr1", s, s + span, "chr1", dest, "suppl",
                "read_{0}_{1}_{2}".format(group, i, j)) for j in range(2)]
            candidates.append(CandidateDuplicationInterspersed(
                "chr1", s, s + span + rng.randint(-10, 10), "chr1",
                dest + rng.randint(-15, 15), dest + span,
                members, 5 + rng.random(), None, None, False))

    def key(cands):
        return [(c.get_source(), c.get_destination(), round(c.score, 6),
                 tuple(m.read for m in c.members)) for c in cands]

    exact = partition_and_cluster_candidates(
        candidates, wide_options.replace(cluster_backend="exact"),
        "interspersed duplication candidates")
    device = partition_and_cluster_candidates(
        candidates, wide_options.replace(cluster_backend="device"),
        "interspersed duplication candidates")
    assert key(exact) == key(device)


def test_device_backend_fuzz_matches_exact(default_options):
    """Randomized DEL fuzz across many partition shapes and same-read dups;
    cluster lists (with order) must match the exact backend."""
    rng = random.Random(1001)
    for trial in range(6):
        signatures = []
        for group in range(rng.randint(2, 8)):
            center = rng.randint(10_000, 5_000_000)
            span = rng.randint(50, 2000)
            n = rng.randint(3, 60)
            for i in range(n):
                start = center + rng.randint(-400, 400)
                end = start + span + rng.randint(-30, 30)
                read = "r{0}_{1}".format(group, rng.randint(0, n // 2))
                signatures.append(SignatureDeletion(
                    "chr1", start, end, "cigar", read))
        _compare(signatures, default_options, "deleted regions")


def test_device_backend_exact_on_tie_grids(default_options):
    """Quantized coordinates force EXACT distance ties — the kernel's gap
    diagnostic must route those partitions to the host path and results must
    stay identical to the exact backend."""
    from svim_tpu.signatures import SignatureDuplicationTandem

    for trial in range(6):
        rng = random.Random(trial)
        dels, tans = [], []
        for group in range(rng.randint(2, 5)):
            center = 10000 * (group + 1)
            span = rng.choice([100, 200, 400])
            for i in range(rng.randint(3, 40)):
                start = center + rng.choice([-100, -50, 0, 50, 100])
                end = start + span + rng.choice([-10, 0, 10])
                read = "r{0}_{1}".format(group, rng.randint(0, 15))
                if rng.random() < 0.5:
                    dels.append(SignatureDeletion("chr1", start, end, "cigar", read))
                else:
                    tans.append(SignatureDuplicationTandem(
                        "chr1", start, end, 1, True, "suppl", read))
        _compare(dels, default_options, "deleted regions")
        _compare(tans, default_options, "tandem duplicated regions")


def test_coordinate_route_dispatches_dup_int_and_bnd(wide_options):
    """DUP_INT and BND ride the coordinate (fused) route: tie-free
    partitions must actually agglomerate ON DEVICE (telemetry device > 0),
    not silently fall back — the parity tests above would pass either way."""
    from svim_tpu.cluster.device_cluster import (
        FUSED_TYPES,
        TELEMETRY,
        cluster_partitions_device,
    )

    assert "DUP_INT" in FUSED_TYPES and "BND" in FUSED_TYPES
    rng = random.Random(41)
    dup_parts = []
    for locus in range(4):
        base = 100_000 + locus * 50_000
        size = 300 + locus * 13
        part = []
        for member in range(6):
            j = rng.randint(-200, 200)
            part.append(SignatureInsertionFrom(
                "chr2", base + j, base + j + size + member * 7, "chr1",
                5_000 + locus * 1_000 + rng.randint(-200, 200), "suppl",
                "rd{0}_{1}".format(locus, member)))
        dup_parts.append(part)
    TELEMETRY.reset()
    results = cluster_partitions_device(dup_parts, "DUP_INT", None, wide_options)
    assert all(entry.clusters is not None for entry in results.values())
    assert TELEMETRY.device >= 3

    bnd_parts = []
    for locus in range(4):
        base = 100_000 + locus * 50_000
        part = [SignatureTranslocation(
            "chr1", base + rng.randint(-300, 300), "fwd",
            "chr2", 7_000 + locus * 900 + rng.randint(-300, 300), "rev",
            "suppl", "rb{0}_{1}".format(locus, member))
            for member in range(6)]
        bnd_parts.append(part)
    TELEMETRY.reset()
    results = cluster_partitions_device(bnd_parts, "BND", None, wide_options)
    assert all(entry.clusters is not None for entry in results.values())
    assert TELEMETRY.device >= 3
