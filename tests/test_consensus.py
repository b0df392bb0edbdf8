"""Insertion consensus tests (mirrors reference tests/test_consensus.py:
mocked reference fetch over a synthetic genome, skip for >10 kb haplotypes,
exact recovery from identical signatures)."""

import random

import pytest

from svim_tpu.combine.consensus import (
    align_global,
    generate_insertion_consensus,
    poa_consensus,
)
from svim_tpu.signatures import SignatureClusterUniLocal, SignatureInsertion


class _MockReference:
    """Cheap fetch lambda over a synthetic genome (reference test pattern,
    tests/test_consensus.py:12-14)."""

    def __init__(self, genome):
        self.genome = genome

    def fetch(self, contig, start, end):
        return self.genome[start:end]


def _cluster(members):
    return SignatureClusterUniLocal(
        members[0].contig, members[0].start, members[0].end, 10, len(members),
        members, "INS", 0.0, 0.0)


def test_skip_too_long_haplotypes():
    genome = "A" * 100 + "C" * 100
    reference = _MockReference(genome)
    members = [SignatureInsertion("chr1", 100, 100 + 20000, "cigar",
                                  "read{0}".format(i), "T" * 20000)
               for i in range(5)]
    status, result = generate_insertion_consensus(_cluster(members), reference)
    assert status == 1
    assert result == ()


def test_exact_recovery_from_identical_signatures():
    rng = random.Random(5)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reference = _MockReference(genome)
    insertion = "".join(rng.choice("ACGT") for _ in range(60))
    members = [SignatureInsertion("chr1", 200, 260, "cigar",
                                  "read{0}".format(i), insertion)
               for i in range(10)]
    status, result = generate_insertion_consensus(_cluster(members), reference)
    assert status == 0
    start, size, consensus = result
    assert start == 200
    assert size == 60
    assert consensus == insertion


def test_consensus_robust_to_minority_errors():
    rng = random.Random(6)
    genome = "".join(rng.choice("ACGT") for _ in range(400))
    reference = _MockReference(genome)
    insertion = "".join(rng.choice("ACGT") for _ in range(50))
    # 8 clean copies + 2 with point errors: majority restores the truth
    noisy1 = insertion[:20] + ("A" if insertion[20] != "A" else "C") + insertion[21:]
    noisy2 = insertion[:35] + insertion[36:]  # one deletion
    members = [SignatureInsertion("chr1", 200, 250, "cigar", "r{0}".format(i), seq)
               for i, seq in enumerate([insertion] * 8 + [noisy1, noisy2])]
    status, result = generate_insertion_consensus(_cluster(members), reference)
    assert status == 0
    assert result[2] == insertion


def test_align_global_places_single_gap_run():
    rng = random.Random(7)
    left = "".join(rng.choice("ACGT") for _ in range(120))
    right = "".join(rng.choice("ACGT") for _ in range(120))
    insert = "".join(rng.choice("ACGT") for _ in range(40))
    row_a, row_b = align_global(left + insert + right, left + right)
    assert row_a.replace("-", "") == left + insert + right
    assert row_b.replace("-", "") == left + right
    # the reference row must contain exactly one 40-wide gap run
    import re
    runs = [m.end() - m.start() for m in re.finditer(r"-+", row_b)]
    assert runs == [40]


def test_poa_consensus_identical_inputs():
    seq = "ACGTACGTACGTTTTGGGACGT"
    assert poa_consensus([seq] * 7) == seq
    assert poa_consensus([seq]) == seq


@pytest.mark.slow
def test_long_insertion_cluster_banded_poa():
    """An 8 kb insertion with 20 noisy members succeeds (status 0) through
    the banded graph POA — this used to exceed the full-DP cell budget and
    drop to the star-MSA fallback (reference capability: 10 kb haplotypes,
    SVIM_COMBINE.py:202)."""
    rng = random.Random(11)
    genome = "".join(rng.choice("ACGT") for _ in range(2000))
    reference = _MockReference(genome)
    motif = "".join(rng.choice("ACGT") for _ in range(8000))
    members = []
    for i in range(20):
        noisy = list(motif)
        for _ in range(100):  # ~1.2% mixed noise per member
            op = rng.random()
            pos = rng.randrange(len(noisy))
            if op < 0.5:
                noisy[pos] = rng.choice("ACGT")
            elif op < 0.75:
                noisy.insert(pos, rng.choice("ACGT"))
            else:
                del noisy[pos]
        members.append(SignatureInsertion("chr1", 1000, 1000 + len(noisy),
                                          "cigar", "read{0}".format(i),
                                          "".join(noisy)))
    cluster = SignatureClusterUniLocal("chr1", 1000, 9000, 10, len(members),
                                       members, "INS", 0.0, 0.0)
    status, result = generate_insertion_consensus(cluster, reference)
    assert status == 0
    start, size, consensus = result
    assert start == 1000
    assert abs(size - 8000) < 40
    from svim_tpu.native import aligner
    assert aligner.edit_distance(consensus, motif) < 40  # <0.5% residual


def test_native_star_polish_matches_python_oracle():
    """The C++ star_polish round must be byte-identical to the Python
    _star_consensus(center=...) oracle, including vote tie semantics
    (count, non-dash preference, first-occurrence order) and empty/short
    sequences."""
    import random

    from svim_tpu import native
    from svim_tpu.combine.consensus import _star_consensus

    if native.get_library() is None:
        import pytest
        pytest.skip("native library unavailable")

    rng = random.Random(91)
    for trial in range(60):
        base = "".join(rng.choice("ACGT") for _ in range(rng.randint(2, 300)))
        sequences = []
        for _ in range(rng.randint(1, 15)):
            chars = list(base)
            for _ in range(rng.randint(0, 8)):
                op = rng.choice("sid")
                pos = rng.randrange(max(1, len(chars)))
                if op == "s" and chars:
                    chars[pos] = rng.choice("ACGT")
                elif op == "i":
                    chars.insert(pos, rng.choice("ACGT"))
                elif chars:
                    del chars[pos]
            sequences.append("".join(chars))
        if rng.random() < 0.2:
            sequences.append("")  # empty row: all-dash column votes
        center = base if rng.random() < 0.5 else sequences[0] or base
        native_result = native.star_polish_native(sequences, center)
        oracle = _star_consensus(sequences, center=center)
        assert native_result == oracle, (trial, center, sequences)


def _mutate(rng, base, n_ops, indel_max=8):
    chars = list(base)
    for _ in range(n_ops):
        op = rng.choice("sid")
        pos = rng.randrange(max(1, len(chars)))
        if op == "s" and chars:
            chars[pos] = rng.choice("ACGT")
        elif op == "i":
            for _ in range(rng.randint(1, indel_max)):
                chars.insert(pos, rng.choice("ACGT"))
        elif chars:
            del chars[pos:pos + rng.randint(1, indel_max)]
    return "".join(chars)


def test_banded_gotoh_matches_full_dp():
    """The banded-with-doubling aligner (forced via full_dp_cells=0) must
    reproduce the full DP exactly on realistic noisy pairs — in the native
    kernel AND the Python twin — and native must equal Python."""
    from svim_tpu import native
    from svim_tpu.combine.consensus import (
        _align_global_py,
        _align_global_py_auto,
    )

    rng = random.Random(417)
    for trial in range(30):
        base = "".join(rng.choice("ACGT") for _ in range(rng.randint(80, 900)))
        other = _mutate(rng, base, rng.randint(0, 20))
        full = _align_global_py(base, other)
        banded_py = _align_global_py_auto(base, other, full_dp_cells=0)
        assert banded_py == full, (trial, base, other)
        if native.get_library() is not None:
            banded_native = native.aligner.align_global(base, other,
                                                        full_dp_cells=0)
            assert banded_native == full, (trial, base, other)


def test_banded_gotoh_band_doubling_on_distant_pair():
    """Pairs whose optimal path leaves the starting corridor (a large
    internal rearrangement) must be retried at wider bands and still end
    exactly equal to the full DP."""
    from svim_tpu import native
    from svim_tpu.combine.consensus import (
        _align_global_py,
        _align_global_py_auto,
    )

    rng = random.Random(31)
    left = "".join(rng.choice("ACGT") for _ in range(400))
    mid = "".join(rng.choice("ACGT") for _ in range(300))
    right = "".join(rng.choice("ACGT") for _ in range(400))
    a = left + mid + right
    b = left + mid[::-1] + right   # reversed middle: path wanders off-diag
    full = _align_global_py(a, b)
    assert _align_global_py_auto(a, b, full_dp_cells=0) == full
    if native.get_library() is not None:
        assert native.aligner.align_global(a, b, full_dp_cells=0) == full


def test_banded_gotoh_length_skew_pair():
    """A long one-sided gap (consensus-vs-reference realignment shape: the
    insertion appears as a giant gap run) stays exact — the corridor covers
    the length difference by construction."""
    from svim_tpu import native
    from svim_tpu.combine.consensus import (
        _align_global_py,
        _align_global_py_auto,
    )

    rng = random.Random(77)
    window = "".join(rng.choice("ACGT") for _ in range(240))
    insertion = "".join(rng.choice("ACGT") for _ in range(1500))
    a = window[:120] + insertion + window[120:]
    full = _align_global_py(a, window)
    assert _align_global_py_auto(a, window, full_dp_cells=0) == full
    if native.get_library() is not None:
        assert native.aligner.align_global(a, window, full_dp_cells=0) == full
