"""Output equivalence on the reference's OWN test alignment
(/root/reference/src/tests/chimeric_read.sam — a real 7.7 kb chimeric ONT
read, queryname-sorted): the unmodified reference (via shims) and this
pipeline must produce identical outputs (BASELINE.md: "VCF-identical calls
... on its src/tests alignments")."""

import os
import shutil

import numpy as np
import pytest

from svim_tpu.cli import main

from tests.test_reference_diff import _diff_tree, _run_reference

FIXTURE = "/root/reference/src/tests/chimeric_read.sam"
CHR21_LENGTH = 48_129_895  # @SQ LN in the fixture header

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="reference fixture not available")]


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("reffixture")
    sam = str(out / "chimeric_read.sam")
    shutil.copy(FIXTURE, sam)
    # synthesize a full-length chr21 so reference fetches (INS haplotype
    # windows near 35.3 Mb, consensus, symbolic-allele fallbacks) behave
    # identically in both pipelines
    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, size=CHR21_LENGTH)]
    genome = str(out / "chr21.fa")
    with open(genome, "wb") as handle:
        handle.write(b">chr21\n")
        full = (len(seq) // 80) * 80
        rows = seq[:full].reshape(-1, 80)
        body = np.concatenate(
            [rows, np.full((rows.shape[0], 1), ord("\n"), dtype=np.uint8)],
            axis=1)
        handle.write(body.tobytes())
        tail = seq[full:]
        if len(tail):
            handle.write(tail.tobytes() + b"\n")
    return str(out), sam, genome


def test_chimeric_fixture_parity(fixture_dataset):
    out, sam, genome = fixture_dataset
    wd_ref = os.path.join(out, "wd_ref")
    wd_ours = os.path.join(out, "wd_ours")
    _run_reference(wd_ref, sam, genome)
    assert main(["alignment", wd_ours, sam, genome]) == 0
    checked = _diff_tree(wd_ref, wd_ours)
    assert checked >= 15
    # the chimeric read must actually produce signatures (not a vacuous diff)
    with open(os.path.join(wd_ours, "signatures", "all.vcf")) as handle:
        records = [line for line in handle if not line.startswith("#")]
    assert records
