"""Whole-pipeline parity: the packed array path must produce a byte-identical
VCF to the sequential host path on BAM input (only the fileDate line may
differ)."""

import random

from svim_tpu.cli import main
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentFile


def _strip_date(path):
    with open(path) as handle:
        return [line for line in handle if not line.startswith("##fileDate")]


def _make_bam(tmp_path):
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from tests.test_packed_collect import _random_sam

    rng = random.Random(21)
    sam_path = tmp_path / "mix.sam"
    sam_path.write_text(_random_sam(rng, 150))
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "mix.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))
    genome_path = tmp_path / "genome.fa"
    rng2 = random.Random(5)
    with open(genome_path, "w") as handle:
        for contig, length in (("chr1", 600000), ("chr2", 600000)):
            handle.write(">{0}\n".format(contig))
            for _ in range(length // 60):
                handle.write("".join(rng2.choice("ACGT") for _ in range(60)) + "\n")
    return str(bam_path), str(genome_path)


def test_packed_and_host_pipelines_agree(tmp_path):
    bam_path, genome_path = _make_bam(tmp_path)
    wd_packed = tmp_path / "wd_packed"
    wd_host = tmp_path / "wd_host"
    assert main(["alignment", str(wd_packed), bam_path, genome_path]) == 0
    assert main(["alignment", str(wd_host), bam_path, genome_path,
                 "--device_backend", "host"]) == 0
    packed_vcf = _strip_date(wd_packed / "variants.vcf")
    host_vcf = _strip_date(wd_host / "variants.vcf")
    assert packed_vcf == host_vcf
    assert len(packed_vcf) > 30  # header + records actually present
    # intermediate signature clusters also match
    for name in ("del.bed", "ins.bed", "inv.bed", "trans.bed"):
        assert (wd_packed / "signatures" / name).read_text() == \
            (wd_host / "signatures" / name).read_text()


import pytest


@pytest.mark.parametrize("seed,extra_flags", [
    (33, ["--all_bnds"]),
    (44, ["--read_names", "--insertion_sequences", "--zmws"]),
    (55, ["--tandem_duplications_as_insertions",
          "--interspersed_duplications_as_insertions"]),
])
def test_parity_fuzz_flag_combinations(tmp_path, seed, extra_flags):
    """Whole-pipeline byte parity holds across randomized inputs and the
    output-shaping flag combinations."""
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from tests.test_packed_collect import _random_sam

    rng = random.Random(seed)
    sam_path = tmp_path / "fuzz.sam"
    sam_path.write_text(_random_sam(rng, 90))
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "fuzz.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))
    genome_path = tmp_path / "genome.fa"
    rng2 = random.Random(seed + 1)
    with open(genome_path, "w") as handle:
        for contig in ("chr1", "chr2"):
            handle.write(">{0}\n".format(contig))
            for _ in range(600000 // 60):
                handle.write("".join(rng2.choice("ACGT") for _ in range(60)) + "\n")

    wd_packed = tmp_path / "wp"
    wd_host = tmp_path / "wh"
    assert main(["alignment", str(wd_packed), str(bam_path), str(genome_path)]
                + extra_flags) == 0
    assert main(["alignment", str(wd_host), str(bam_path), str(genome_path),
                 "--device_backend", "host"] + extra_flags) == 0
    assert _strip_date(wd_packed / "variants.vcf") == \
        _strip_date(wd_host / "variants.vcf")
