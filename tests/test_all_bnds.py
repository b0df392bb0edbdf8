"""--all_bnds end-to-end: DEL calls gain BND twin records in the final VCF
(reference flow: svim:127-159,181-194)."""

import random

from svim_tpu.cli import main


def test_all_bnds_emits_twin_breakends(tmp_path):
    rng = random.Random(44)
    genome = "".join(rng.choice("ACGT") for _ in range(50000))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n")
        for i in range(0, len(genome), 60):
            handle.write(genome[i:i + 60] + "\n")
    lines = []
    for i in range(5):
        start = 9000 - 19 * i
        left = genome[start:10000]
        right = genome[10400:10400 + 1100]
        lines.append("del{0}\t0\tchr1\t{1}\t60\t{2}M400D{3}M\t*\t0\t0\t{4}\t*".format(
            i, start + 1, len(left), len(right), left + right))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    sam_path = tmp_path / "dels.sam"
    sam_path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:50000\n"
                        + "\n".join(lines) + "\n")

    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), str(sam_path), str(genome_path),
                 "--all_bnds", "--skip_genotyping", "--symbolic_alleles"]) == 0
    svtypes = []
    bnd_positions = []
    with open(workdir / "variants.vcf") as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            fields = line.split("\t")
            svtype = [e for e in fields[7].split(";") if e.startswith("SVTYPE=")][0][7:]
            svtypes.append(svtype)
            if svtype == "BND":
                bnd_positions.append(int(fields[1]))
    assert svtypes.count("DEL") == 1
    # the deletion's twin breakend pair: one record per side
    assert svtypes.count("BND") == 2
    # cigar-DEL twins anchor at (del_start, del_end) 0-based -> +1 in VCF
    # (SVIM_intra.py:44)
    assert sorted(bnd_positions) == [10001, 10401]


def test_without_all_bnds_no_twins(tmp_path):
    test_dir = tmp_path / "plain"
    test_dir.mkdir()
    # reuse the same construction minus the flag
    rng = random.Random(44)
    genome = "".join(rng.choice("ACGT") for _ in range(50000))
    genome_path = test_dir / "genome.fa"
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n" + genome + "\n")
    lines = []
    for i in range(5):
        start = 9000 - 19 * i
        left = genome[start:10000]
        right = genome[10400:10400 + 1100]
        lines.append("del{0}\t0\tchr1\t{1}\t60\t{2}M400D{3}M\t*\t0\t0\t{4}\t*".format(
            i, start + 1, len(left), len(right), left + right))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    sam_path = test_dir / "dels.sam"
    sam_path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:50000\n"
                        + "\n".join(lines) + "\n")
    workdir = test_dir / "wd"
    assert main(["alignment", str(workdir), str(sam_path), str(genome_path),
                 "--skip_genotyping", "--symbolic_alleles"]) == 0
    with open(workdir / "variants.vcf") as handle:
        body = [line for line in handle if not line.startswith("#")]
    assert all("SVTYPE=BND" not in line for line in body)
