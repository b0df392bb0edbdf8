"""Accuracy regression: all six SV classes recovered from simulation
(BASELINE config 2 shape)."""

import os

import pytest

from svim_tpu.cli import main
from svim_tpu.sim import (
    SimConfig,
    evaluate_vcf,
    f1,
    simulate,
    truth_collisions,
)


def test_stress_harness_f1(tmp_path):
    """Repeat-rich, 12%-noise, multi-contig stress sim: all six classes
    plus cut&paste DUP:INT (matched only when the call carries the
    CUTPASTE flag) must stay above F1 0.9 per class."""
    config = SimConfig(seed=5, genome_length=3_000_000,
                       second_contig_length=800_000,
                       extra_contigs=(2_000_000,), coverage=10,
                       n_del=6, n_ins=6, n_inv=5, n_tan=5, n_dup_int=3,
                       n_dup_int_cutpaste=3, n_bnd=4, n_background=300,
                       error_rate=0.12, repeat_fraction=0.15)
    genome_path, bam_path, truth = simulate(str(tmp_path), config)
    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), bam_path, genome_path]) == 0
    results = evaluate_vcf(str(workdir / "variants.vcf"), truth)
    for svtype, (tp, fp, fn) in results.items():
        assert f1(tp, fp, fn) >= 0.9, (svtype, tp, fp, fn)
    # every miss must be accountable to a truth-set collision (independent
    # placements can land close enough for reference merge semantics to
    # absorb one call into another; round-4 344/345 root cause)
    _tp, _fp, fn_all = results["ALL"]
    collisions = truth_collisions(truth)
    assert fn_all <= len(collisions), (fn_all, collisions)
    flagged = sum(1 for entry in open(workdir / "variants.vcf")
                  if "CUTPASTE" in entry)
    assert flagged >= config.n_dup_int_cutpaste


@pytest.mark.parametrize("seed", [1, 7])
def test_all_classes_f1(tmp_path, seed):
    config = SimConfig(seed=seed, genome_length=2_000_000,
                       second_contig_length=500_000, coverage=10,
                       n_del=6, n_ins=6, n_inv=5, n_tan=5, n_dup_int=4,
                       n_bnd=4, n_background=80)
    genome_path, bam_path, truth = simulate(str(tmp_path), config)
    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), bam_path, genome_path]) == 0
    results = evaluate_vcf(str(workdir / "variants.vcf"), truth)
    for svtype, (tp, fp, fn) in results.items():
        assert f1(tp, fp, fn) >= 0.9, (seed, svtype, tp, fp, fn)
    assert f1(*results["ALL"]) >= 0.95, results["ALL"]
