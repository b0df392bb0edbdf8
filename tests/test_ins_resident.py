"""Device-resident INS clustering (--edit_backend wavefront): on-device
wavefront edit distances -> on-device matrix assembly -> batched
agglomeration, with flat clusters bit-identical to the exact host path
(contract: SVIM_clustering.py:64-77).
"""

import random

import numpy as np

from svim_tpu.cluster import accel
from svim_tpu.cluster.device_cluster import (
    DeviceBatcher,
    TELEMETRY,
    consume_partitions_device,
    dispatch_ins_resident,
)
from svim_tpu.signatures import SignatureInsertion


class _Reference:
    """Deterministic fake genome: fetch is a pure function of coordinates."""

    def fetch(self, contig, start, end):
        rng = random.Random(hash((contig, 9)) & 0xFFFF)
        block = "".join(rng.choice("ACGT") for _ in range(512))
        out = []
        for pos in range(start, end):
            out.append(block[pos % len(block)])
        return "".join(out)


def _options(**overrides):
    from svim_tpu.config import parse_arguments
    options = parse_arguments(
        arguments=["alignment", "/tmp", "/tmp/x.bam", "/tmp/g.fa"])
    for key, value in overrides.items():
        object.__setattr__(options, key, value)
    return options


def _partition(rng, n, base, motif_len, read_offset=0, jitter=6,
               same_read_dup=False):
    motif = "".join(rng.choice("ACGT") for _ in range(motif_len))
    elements = []
    for k in range(n):
        seq = list(motif)
        for _ in range(rng.randint(0, 3)):
            seq[rng.randrange(len(seq))] = rng.choice("ACGT")
        start = base + rng.randint(-jitter, jitter)
        elements.append(SignatureInsertion(
            "chr1", start, start + len(seq), "cigar",
            "read{0}".format(read_offset + k), "".join(seq)))
    if same_read_dup:
        first = elements[0]
        elements.append(SignatureInsertion(
            "chr1", first.start + 1, first.start + 1 + motif_len, "cigar",
            first.read, first.sequence))
    return elements


def _flatten(results, count):
    out = []
    for index in range(count):
        result = results[index]
        assert result.clusters is not None
        out.append([[(e.read, e.start, e.end) for e in cluster]
                    for cluster in result.clusters])
    return out


def test_resident_matches_exact_host():
    rng = random.Random(77)
    reference = _Reference()
    options = _options(edit_backend="wavefront")
    samples = [
        _partition(rng, 8, 50_000, 120, read_offset=0),
        _partition(rng, 5, 90_000, 60, read_offset=100),
        # far-apart subgroups: far pairs exercise the span-distance branch
        (_partition(rng, 4, 140_000, 90, read_offset=200)
         + _partition(rng, 4, 141_500, 90, read_offset=300)),
        # a same-read duplicate routes the partition to the classic path
        _partition(rng, 6, 200_000, 80, read_offset=400,
                   same_read_dup=True),
    ]
    TELEMETRY.reset()
    pending = dispatch_ins_resident(samples, reference, options,
                                    DeviceBatcher(options))
    resident_results = consume_partitions_device(pending)
    got = _flatten(resident_results, len(samples))

    exact = _options(cluster_backend="exact")
    from svim_tpu.cluster.device_cluster import _host_linkage_clusters
    expected = []
    for sample in samples:
        reads = accel.read_index_array(sample)
        matrix = accel.distance_matrix(sample, "INS", reference, exact)
        drop = accel.dedup_same_read(matrix, reads,
                                     float(exact.cluster_max_distance))
        keep = [i for i in range(len(sample)) if i not in drop]
        survivors = [sample[i] for i in keep]
        sub_matrix = matrix[np.ix_(keep, keep)]
        sub_reads = reads[keep]
        clusters = _host_linkage_clusters(
            sub_matrix, sub_reads, survivors,
            float(exact.cluster_max_distance), True)
        expected.append([[(e.read, e.start, e.end) for e in cluster]
                         for cluster in clusters])
    assert got == expected
    # the three clean partitions ran on device (or exact-tied and fell back
    # correctly); the dup partition went through the classic matrix route
    assert TELEMETRY.eligible >= 4


def test_resident_tie_falls_back_exactly():
    """Identical inserts at identical positions: exact f64 ties.  The kernel
    min_gap guard must route them to the exact host rebuild (from fetched
    integer eds), not emit an arbitrary labeling."""
    reference = _Reference()
    options = _options(edit_backend="wavefront")
    motif = "ACGTACGTAA" * 8
    elements = [SignatureInsertion("chr1", 70_000, 70_000 + len(motif),
                                   "cigar", "read{0}".format(k), motif)
                for k in range(6)]
    TELEMETRY.reset()
    pending = dispatch_ins_resident([elements], reference, options,
                                    DeviceBatcher(options))
    results = consume_partitions_device(pending)
    exact = _options(cluster_backend="exact")
    from svim_tpu.cluster.device_cluster import _host_linkage_clusters
    reads = accel.read_index_array(elements)
    matrix = accel.distance_matrix(elements, "INS", reference, exact)
    expected = _host_linkage_clusters(matrix, reads, elements,
                                      float(exact.cluster_max_distance), True)
    got = [[(e.read, e.start) for e in c] for c in results[0].clusters]
    want = [[(e.read, e.start) for e in c] for c in expected]
    assert got == want


def test_resident_pipeline_vcf_parity(tmp_path):
    """Full pipeline under --edit_backend wavefront produces a byte-equal
    VCF to the default (native host ed) run."""
    from svim_tpu.cli import main
    from svim_tpu.sim import SimConfig, simulate

    genome, bam, _truth = simulate(str(tmp_path), SimConfig(
        seed=13, genome_length=900_000, second_contig_length=200_000,
        coverage=9, n_del=2, n_ins=5, n_inv=1, n_tan=1, n_dup_int=1,
        n_bnd=1, n_background=40))
    wd_default = tmp_path / "wd_default"
    wd_resident = tmp_path / "wd_resident"
    assert main(["alignment", str(wd_default), bam, genome]) == 0
    assert main(["alignment", str(wd_resident), bam, genome,
                 "--edit_backend", "wavefront"]) == 0

    def normalized(path):
        with open(path) as handle:
            return [line for line in handle
                    if not line.startswith("##fileDate")]

    assert (normalized(wd_resident / "variants.vcf")
            == normalized(wd_default / "variants.vcf"))


def test_resident_no_near_pairs():
    """Partitions whose members are all beyond the position gate have no
    haplotype pairs at all — pure span-position matrices."""
    reference = _Reference()
    options = _options(edit_backend="wavefront")
    rng = random.Random(3)
    elements = []
    for k in range(4):
        motif = "".join(rng.choice("ACGT") for _ in range(70))
        start = 40_000 + k * 5_000   # far beyond 2 * cluster_max_distance
        elements.append(SignatureInsertion(
            "chr1", start, start + 70, "cigar", "r{0}".format(k), motif))
    pending = dispatch_ins_resident([elements], reference, options,
                                    DeviceBatcher(options))
    results = consume_partitions_device(pending)
    assert results[0].clusters is not None
    assert sum(len(c) for c in results[0].clusters) == 4
