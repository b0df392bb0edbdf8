"""Differential test: vectorized distance matrices vs the scalar oracle
(bit-identical float64, including INS haplotype edit distances)."""

import random

import numpy as np
import pytest

from svim_tpu.cluster import accel
from svim_tpu.cluster.cluster import _pairwise_condensed
from svim_tpu.signatures import (
    SignatureDeletion,
    SignatureDuplicationTandem,
    SignatureInsertion,
    SignatureInsertionFrom,
    SignatureTranslocation,
)


class _MockReference:
    def __init__(self, genome):
        self.genome = genome

    def fetch(self, contig, start, end):
        return self.genome[start:end]


@pytest.mark.parametrize("sv_type", ["DEL", "DUP_TAN", "INS", "DUP_INT", "BND"])
def test_accel_matches_scalar(default_options, sv_type):
    rng = random.Random(hash(sv_type) & 0xFFFF)
    genome = "".join(rng.choice("ACGT") for _ in range(6000))
    reference = _MockReference(genome)
    elements = []
    for i in range(14):
        start = rng.randint(1000, 2500)
        span = rng.randint(40, 400)
        read = "read{0}".format(i % 10)  # some same-read pairs
        if sv_type == "DEL":
            elements.append(SignatureDeletion("chr1", start, start + span, "cigar", read))
        elif sv_type == "DUP_TAN":
            elements.append(SignatureDuplicationTandem(
                "chr1", start, start + span, rng.randint(1, 3), True, "suppl", read))
        elif sv_type == "INS":
            seq = "".join(rng.choice("ACGT") for _ in range(span))
            elements.append(SignatureInsertion("chr1", start, start + span,
                                               "cigar", read, seq))
        elif sv_type == "DUP_INT":
            elements.append(SignatureInsertionFrom(
                "chr1", start, start + span, "chr1", rng.randint(3000, 3500),
                "suppl", read))
        else:
            elements.append(SignatureTranslocation(
                "chr1", start, rng.choice(["fwd", "rev"]), "chr2",
                rng.randint(100, 700), rng.choice(["fwd", "rev"]), "suppl", read))

    scalar = _pairwise_condensed(elements, sv_type, reference, default_options)
    matrix = accel.distance_matrix(elements, sv_type, reference, default_options)
    reads = accel.read_index_array(elements)
    fast = accel.condensed_with_wall(matrix, reads, wall_same_read=True)
    np.testing.assert_array_equal(np.asarray(scalar, dtype=np.float64), fast)
