"""Output-flag behavior in the final VCF: READS/SEQS/ZMWS tags, duplications
as insertions, and the insertion-removal sweep in COMBINE."""

import random

import pytest

from svim_tpu.candidates import (
    CandidateDuplicationInterspersed,
    CandidateDuplicationTandem,
)
from svim_tpu.cli import main
from svim_tpu.combine.combine import _remove_insertions_at_duplications
from svim_tpu.signatures import SignatureClusterUniLocal, SignatureInsertion


@pytest.fixture
def insertion_dataset(tmp_path):
    rng = random.Random(31)
    genome = "".join(rng.choice("ACGT") for _ in range(60000))
    genome_path = tmp_path / "genome.fa"
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n")
        for i in range(0, len(genome), 60):
            handle.write(genome[i:i + 60] + "\n")
    ins_seq = "".join(rng.choice("ACGT") for _ in range(80))
    lines = []
    for i in range(4):
        start = 19000 - 17 * i
        left = genome[start:20000]
        right = genome[20000:20000 + 1200]
        # PacBio-style movie/zmw/range names; reads pairwise share a ZMW but
        # keep distinct full names (different subread ranges)
        name = "m54238_1/{0}/{1}_5000".format(100 + i // 2, i)
        lines.append("{0}\t0\tchr1\t{1}\t60\t{2}M80I{3}M\t*\t0\t0\t{4}\t*".format(
            name, start + 1, len(left), len(right), left + ins_seq + right))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    sam_path = tmp_path / "ins.sam"
    sam_path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:60000\n"
                        + "\n".join(lines) + "\n")
    return str(sam_path), str(genome_path), ins_seq


def _records(workdir):
    with open(workdir / "variants.vcf") as handle:
        return [line.rstrip("\n").split("\t") for line in handle
                if not line.startswith("#")]


def test_reads_seqs_zmws_tags(insertion_dataset, tmp_path):
    sam_path, genome_path, ins_seq = insertion_dataset
    workdir = tmp_path / "wd"
    assert main(["alignment", str(workdir), sam_path, genome_path,
                 "--read_names", "--insertion_sequences", "--zmws",
                 "--skip_genotyping"]) == 0
    (record,) = _records(workdir)
    info = record[7]
    assert "READS=" in info
    assert info.count("m54238_1/") >= 4
    assert "SEQS=" in info
    assert ins_seq in info
    assert "ZMWS=2" in info  # 4 reads, 2 distinct wells


def test_duplications_as_insertions_representation():
    members = [SignatureInsertion("chr1", 100, 150, "suppl", "r1", "A" * 50)]
    tan = CandidateDuplicationTandem("chr1", 100, 150, 1, True, members, 5, None, None)
    entry_dup = tan.get_vcf_entry_as_dup()
    assert "SVTYPE=DUP:TANDEM" in entry_dup and "\tGT:CN:DP:AD\t" in entry_dup
    entry_ins = tan.get_vcf_entry_as_ins()
    assert "SVTYPE=INS" in entry_ins and "SVLEN=50" in entry_ins

    dup_int = CandidateDuplicationInterspersed("chr1", 100, 150, "chr2", 900,
                                               950, members, 5, None, None,
                                               cutpaste=True)
    entry = dup_int.get_vcf_entry_as_ins()
    assert "SVTYPE=INS;CUTPASTE;" in entry
    assert entry.split("\t")[0] == "chr2"


def _ins_cluster(contig, start, length):
    return SignatureClusterUniLocal(contig, start, start + length, 10, 3, [],
                                    "INS", None, None)


def test_insertion_removal_sweep():
    # an insertion whose locus and length match a DUP_INT destination is
    # dropped; a distant one survives (reference: SVIM_COMBINE.py:404-457)
    explained = _ins_cluster("chr1", 5000, 100)
    unrelated = _ins_cluster("chr1", 40000, 100)
    members = [SignatureInsertion("chr1", 5000, 5100, "suppl", "r", "A" * 100)]
    dup = CandidateDuplicationInterspersed("chr2", 100, 200, "chr1", 4990,
                                           5090, members, 8, None, None)
    to_remove = _remove_insertions_at_duplications([explained, unrelated], [dup], [])
    assert to_remove == [0]

    # length mismatch >= 20% is kept
    short_dup = CandidateDuplicationInterspersed("chr2", 100, 160, "chr1", 4990,
                                                 5050, members, 8, None, None)
    assert _remove_insertions_at_duplications([explained], [short_dup], []) == []


def test_plot_histtype_bar(tmp_path):
    """--plot_histtype bar reproduces the reference renderer's exact
    hist/legend calls (SVIM_plot.py:41-63) without error."""
    from svim_tpu.plots import plot_sv_lengths

    class _Stub:
        def __init__(self, length, score=8):
            self.score = score
            self._length = length

        def get_source(self):
            return ("chr1", 1000, 1000 + self._length)

        def get_destination(self):
            return ("chr1", 1000, 1000 + self._length)

    class _Options:
        working_dir = str(tmp_path)
        plot_histtype = "bar"

    candidates = [_Stub(60), _Stub(300), _Stub(1500), _Stub(12000)]
    plot_sv_lengths(candidates, candidates[:2], candidates[:1],
                    candidates[:3], candidates, _Options())
    import os
    assert os.path.exists(str(tmp_path) + "/sv-lengths-q5.png")
    assert os.path.exists(str(tmp_path) + "/sv-lengths-q10.png")
