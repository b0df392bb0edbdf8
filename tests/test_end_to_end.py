"""End-to-end pipeline tests: synthetic genome + reads -> variants.vcf."""

import random

import pytest

from svim_tpu.cli import main


@pytest.fixture
def synthetic_dataset(tmp_path):
    """100 kb genome with a homozygous 300 bp DEL, a heterozygous 150 bp INS,
    and an inversion supported by split reads."""
    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(100000))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n")
        for i in range(0, len(genome), 60):
            handle.write(genome[i:i + 60] + "\n")

    ins_seq = "".join(rng.choice("ACGT") for _ in range(150))
    lines = []

    def add(name, start, cigar, seq, tags=""):
        lines.append("{0}\t0\tchr1\t{1}\t60\t{2}\t*\t0\t0\t{3}\t*{4}".format(
            name, start + 1, cigar, seq, tags))

    for i in range(8):
        s = 19000 - i * 37
        left = genome[s:20000]
        right = genome[20300:20300 + 1500]
        add("delread{0}".format(i), s, "{0}M300D{1}M".format(len(left), len(right)),
            left + right)
    for i in range(5):
        s = 49000 - i * 23
        left = genome[s:50000]
        right = genome[50000:50000 + 1400]
        add("insread{0}".format(i), s, "{0}M150I{1}M".format(len(left), len(right)),
            left + ins_seq + right)
    for i in range(5):
        s = 49100 - i * 31
        add("refread{0}".format(i), s, "2400M", genome[s:s + 2400])

    lines.sort(key=lambda line: int(line.split("\t")[3]))
    sam_path = tmp_path / "aln.sam"
    with open(sam_path, "w") as handle:
        handle.write("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n")
        handle.write("\n".join(lines) + "\n")
    return tmp_path, str(sam_path), str(genome_path), genome, ins_seq


def _read_vcf_records(workdir):
    records = []
    with open(workdir / "variants.vcf") as handle:
        for line in handle:
            if not line.startswith("#"):
                records.append(line.rstrip("\n").split("\t"))
    return records


def test_full_pipeline(synthetic_dataset):
    tmp_path, sam_path, genome_path, genome, ins_seq = synthetic_dataset
    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), sam_path, genome_path]) == 0

    records = _read_vcf_records(workdir)
    assert len(records) == 2
    deletion, insertion = records

    assert deletion[0] == "chr1" and deletion[1] == "20000"
    assert deletion[2] == "svim.DEL.1"
    assert "SVLEN=-300" in deletion[7]
    assert deletion[9].startswith("1/1:8:0,8")
    # sequence alleles: REF = base before + deleted run, ALT = that base
    assert deletion[3] == genome[19999:20300]
    assert deletion[4] == genome[19999]

    assert insertion[0] == "chr1" and insertion[1] == "50000"
    assert insertion[2] == "svim.INS.1"
    assert "SVLEN=150" in insertion[7]
    assert insertion[9].startswith("0/1:10:5,5")
    # consensus recovered the exact inserted sequence
    assert insertion[4] == genome[49999] + ins_seq

    # intermediate outputs exist
    assert (workdir / "signatures" / "del.bed").exists()
    assert (workdir / "signatures" / "all.vcf").exists()
    assert (workdir / "candidates" / "candidates_deletions.bed").exists()
    assert (workdir / "sv-lengths-q5.png").exists()
    assert (workdir / "sv-genotypes-q5.png").exists()


def test_full_pipeline_symbolic_and_skip(synthetic_dataset):
    tmp_path, sam_path, genome_path, _genome, _ins_seq = synthetic_dataset
    workdir = tmp_path / "wd2"
    assert main(["alignment", str(workdir), sam_path, genome_path,
                 "--symbolic_alleles", "--skip_genotyping", "--skip_consensus"]) == 0
    records = _read_vcf_records(workdir)
    assert [record[4] for record in records] == ["<DEL>", "<INS>"]
    # without genotyping all samples are ./.
    assert all(record[9].startswith("./.") for record in records)


def test_full_pipeline_types_filter(synthetic_dataset):
    tmp_path, sam_path, genome_path, _genome, _ins_seq = synthetic_dataset
    workdir = tmp_path / "wd3"
    assert main(["alignment", str(workdir), sam_path, genome_path,
                 "--types", "DEL"]) == 0
    records = _read_vcf_records(workdir)
    assert len(records) == 1
    assert "SVTYPE=DEL" in records[0][7]


def test_full_pipeline_empty_input(tmp_path):
    """A BAM with zero passing records must run the whole pipeline cleanly:
    header-only variants.vcf, all artifacts, exit 0 (no device dispatch of a
    zero-row batch)."""
    from svim_tpu.io import bam as bamio
    from svim_tpu.io.sam import AlignmentFile

    sam_path = tmp_path / "empty.sam"
    sam_path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n")
    genome_path = tmp_path / "g.fa"
    genome_path.write_text(">chr1\n" + "ACGT" * 2500 + "\n")
    bam_path = tmp_path / "empty.bam"
    af = AlignmentFile(str(sam_path))
    bamio.write_bam(str(bam_path), af.header, [])

    workdir = tmp_path / "wd_empty"
    assert main(["alignment", str(workdir), str(bam_path), str(genome_path)]) == 0
    assert _read_vcf_records(workdir) == []
    assert (workdir / "variants.vcf").read_text().startswith("##fileformat=VCF")


def test_profile_untraced_and_trace_optin(synthetic_dataset, caplog):
    """--profile logs accurate (untraced) stage timings and writes NO jax
    trace; --profile_trace opts into the trace with an inflation warning
    (round-4 finding: the trace ~3x-inflates host-bound stage wall time)."""
    import logging as _logging

    tmp_path, sam_path, genome_path, _genome, _ins_seq = synthetic_dataset
    workdir = tmp_path / "wd_profile"
    with caplog.at_level(_logging.INFO):
        assert main(["alignment", str(workdir), sam_path, genome_path,
                     "--profile", "--skip_genotyping"]) == 0
    text = caplog.text
    assert "Stage timings" in text
    assert not (workdir / "traces").exists()
    assert "inflate" not in text  # no trace, no inflation caveat

    caplog.clear()
    workdir2 = tmp_path / "wd_trace"
    with caplog.at_level(_logging.INFO):
        assert main(["alignment", str(workdir2), sam_path, genome_path,
                     "--profile_trace", "--skip_genotyping"]) == 0
    text = caplog.text
    assert "host-bound stage wall times" in text  # upfront warning
    assert "Stage timings" in text                # timer auto-enabled
    assert (workdir2 / "traces").exists()         # trace actually captured
