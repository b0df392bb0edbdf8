"""Consensus quality on noisy (ONT-like) reads: the star MSA + refinement
must recover the underlying sequence to within ~1% of its length."""

import random

from svim_tpu.cluster.edit_distance import edit_distance
from svim_tpu.combine.consensus import poa_consensus


def _noisy(rng, sequence, error_rate):
    out = []
    for base in sequence:
        roll = rng.random()
        if roll < error_rate * 0.4:
            out.append(rng.choice("ACGT"))
        elif roll < error_rate * 0.7:
            out.append(base)
            out.append(rng.choice("ACGT"))
        elif roll < error_rate:
            continue
        else:
            out.append(base)
    return "".join(out)


def test_consensus_recovers_under_noise():
    rng = random.Random(3)
    for error_rate, n_reads, length, tolerance in (
            (0.05, 10, 300, 0.01),
            (0.10, 10, 300, 0.01),
            (0.15, 20, 500, 0.01)):
        truth = "".join(rng.choice("ACGT") for _ in range(length))
        reads = [_noisy(rng, truth, error_rate) for _ in range(n_reads)]
        consensus = poa_consensus(reads)
        residual = edit_distance(consensus, truth)
        assert residual <= tolerance * length, (error_rate, n_reads, residual)
