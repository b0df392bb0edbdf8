"""Sharded COLLECT over the virtual device mesh must match single-device
results exactly, and the aligner wrapper surfaces missing tools cleanly."""

import random

import pytest

from svim_tpu.align import ToolMissingError, run_alignment
from svim_tpu.collect.packed import collect_signatures_packed
from svim_tpu.io.sam import AlignmentFile


def _sam(tmp_path, n_reads=64):
    rng = random.Random(12)
    lines = []
    for i in range(n_reads):
        start = rng.randint(0, 100000)
        lines.append("r{0}\t0\tchr1\t{1}\t60\t500M{2}D500M\t*\t0\t0\t{3}\t*".format(
            i, start + 1, rng.randint(50, 200), "A" * 1000))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    path = tmp_path / "shard.sam"
    path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n"
                    + "\n".join(lines) + "\n")
    return str(path)


def test_sharded_collect_matches_single_device(tmp_path, default_options):
    sam_path = _sam(tmp_path, n_reads=64)  # divisible by 8 shards
    single = collect_signatures_packed(AlignmentFile(sam_path), default_options)
    sharded = collect_signatures_packed(AlignmentFile(sam_path),
                                        default_options.replace(num_shards=8))
    assert [s.as_string() for s in single[0]] == [s.as_string() for s in sharded[0]]
    assert len(single[0]) == 64


def test_run_alignment_missing_tool(tmp_path):
    with pytest.raises(ToolMissingError):
        run_alignment(str(tmp_path), "genome.fa", "reads.fq", "fastq", 1,
                      "definitely-not-an-aligner", False)


def test_reads_mode_with_cached_alignment(tmp_path, default_options):
    """reads mode reuses an existing <prefix>.<aligner>.coordsorted.bam
    (reference: SVIM_alignment.py:29,58-60), which lets the full reads-mode
    dispatch run without external aligners."""
    from unittest import mock

    from svim_tpu.cli import main
    from svim_tpu.io import bam as bamio

    sam_path = _sam(tmp_path, n_reads=24)
    af = AlignmentFile(sam_path)
    workdir = tmp_path / "wd"
    workdir.mkdir()
    cached_bam = workdir / "reads.ngmlr.coordsorted.bam"
    bamio.write_bam(str(cached_bam), af.header, list(af.fetch(until_eof=True)))
    (workdir / "reads.ngmlr.coordsorted.bam.bai").write_bytes(b"")
    reads_path = tmp_path / "reads.fq"
    reads_path.write_text("@r\nACGT\n+\n!!!!\n")
    genome_path = tmp_path / "g.fa"
    genome_path.write_text(">chr1\n" + "ACGT" * 300000 + "\n")

    # prerequisites probe would fail (no aligners in this image); the cache
    # branch must not invoke the aligner itself
    with mock.patch("svim_tpu.align.check_prerequisites"):
        assert main(["reads", str(workdir), str(reads_path), str(genome_path),
                     "--skip_genotyping", "--symbolic_alleles"]) == 0
    body = [line for line in open(workdir / "variants.vcf")
            if not line.startswith("#")]
    assert len(body) == 24  # one DEL per simulated read (no shared loci)
