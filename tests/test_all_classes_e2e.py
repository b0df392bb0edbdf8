"""End-to-end detection of the split-read SV classes: INV (both flank
directions), DUP:TANDEM, cross-contig BND, and DUP:INT assembled from paired
translocations — through the packed array pipeline on BAM input."""

import random

from svim_tpu.cli import main
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentFile

HEADER = ("@HD\tVN:1.6\tSO:coordinate\n"
          "@SQ\tSN:chr1\tLN:400000\n@SQ\tSN:chr2\tLN:200000\n")


def _build_sam(tmp_path):
    lines = []

    def add(name, flag, contig, pos0, cigar, sa=None):
        tags = "\tSA:Z:{0}".format(sa) if sa else ""
        lines.append("{0}\t{1}\t{2}\t{3}\t60\t{4}\t*\t0\t0\t*\t*{5}".format(
            name, flag, contig, pos0 + 1, cigar, tags))

    # inversion chr1:[60000,60500): left-flank reads (fwd -> rev)
    for i in range(4):
        add("invL{0}".format(i), 0, "chr1", 59500 - 7 * i,
            "{0}M500S".format(500 + 7 * i),
            "chr1,60001,-,500M{0}S,60,0;".format(500 + 7 * i))
    # right-flank reads (rev -> fwd)
    for i in range(4):
        add("invR{0}".format(i), 16, "chr1", 60000, "500S500M",
            "chr1,60501,+,500S{0}M,60,0;".format(500 + 5 * i))
    # tandem duplication chr1:[100000,100500), one extra copy
    for i in range(5):
        add("tan{0}".format(i), 0, "chr1", 99500 - 11 * i,
            "{0}M1000S".format(1000 + 11 * i),
            "chr1,100001,+,{0}S1000M,60,0;".format(1000 + 11 * i))
    # cross-contig breakend chr1:149999 -> chr2:50000
    for i in range(4):
        add("bnd{0}".format(i), 0, "chr1", 149500 - 13 * i,
            "{0}M500S".format(500 + 13 * i),
            "chr2,50001,+,{0}S500M,60,0;".format(500 + 13 * i))
    # interspersed duplication: chr2:[70000,70500) inserted at chr1:20500
    for i in range(4):
        add("dupint{0}".format(i), 0, "chr1", 20000 - 3 * i,
            "{0}M1000S".format(500 + 3 * i),
            "chr2,70001,+,{0}S500M500S,60,0;chr1,20501,+,{1}S500M,60,0;".format(
                500 + 3 * i, 1000 + 3 * i))

    lines.sort(key=lambda line: (line.split("\t")[2], int(line.split("\t")[3])))
    sam_path = tmp_path / "classes.sam"
    sam_path.write_text(HEADER + "\n".join(lines) + "\n")
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "classes.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))

    rng = random.Random(8)
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as handle:
        for contig, length in (("chr1", 400000), ("chr2", 200000)):
            handle.write(">{0}\n".format(contig))
            for _ in range(length // 80):
                handle.write("".join(rng.choice("ACGT") for _ in range(80)) + "\n")
    return str(bam_path), str(genome_path)


def test_all_split_read_classes(tmp_path):
    bam_path, genome_path = _build_sam(tmp_path)
    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), bam_path, genome_path,
                 "--skip_genotyping", "--symbolic_alleles"]) == 0

    records = {}
    with open(workdir / "variants.vcf") as handle:
        for line in handle:
            if line.startswith("#"):
                continue
            fields = line.rstrip("\n").split("\t")
            svtype = [e for e in fields[7].split(";") if e.startswith("SVTYPE=")][0][7:]
            records.setdefault(svtype, []).append(fields)

    # inversion: both flank directions merged into one cluster, support 8
    (inv,) = records["INV"]
    assert inv[0] == "chr1" and inv[1] == "60001"
    assert "END=60500" in inv[7] and "SUPPORT=8" in inv[7]
    assert int(inv[5]) >= 4  # min(left,right)=4 plus deviation bonuses

    # tandem duplication: source locus, copy number 2 in the CN field
    (tan,) = records["DUP:TANDEM"]
    assert tan[0] == "chr1" and tan[1] == "100001"
    assert "END=100500" in tan[7] and "SUPPORT=5" in tan[7]
    assert tan[8] == "GT:CN:DP:AD" and tan[9].split(":")[1] == "2"

    # interspersed duplication: source on chr2, CUTPASTE not flagged
    (dup_int,) = records["DUP:INT"]
    assert dup_int[0] == "chr2" and dup_int[1] == "70001"
    assert "SUPPORT=4" in dup_int[7] and "CUTPASTE" not in dup_int[7]

    # breakends: 3 clusters (the explicit one + 2 from dupint reads) x 2 records
    bnds = records["BND"]
    assert len(bnds) == 6
    alts = {fields[4] for fields in bnds}
    assert "N[chr2:50001[" in alts  # chr1:149999 fwd -> chr2:50000 fwd
    cross = [fields for fields in bnds if fields[1] == "150000"]
    assert cross and "SUPPORT=4" in cross[0][7]

    # signature BEDs for each class were written
    signatures_dir = workdir / "signatures"
    assert (signatures_dir / "inv.bed").read_text().count("\n") == 1
    assert (signatures_dir / "dup_tan_source.bed").read_text().count("\n") == 1
    assert (signatures_dir / "dup_int.bed").read_text().count("\n") == 2
