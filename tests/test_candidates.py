"""Exact VCF record strings for candidates (mirrors reference
tests/test_SVCandidate.py, including mocked reference sequence alleles)."""

from svim_tpu.candidates import (
    CandidateBreakend,
    CandidateDeletion,
    CandidateInversion,
    CandidateNovelInsertion,
)
from svim_tpu.signatures import SignatureDeletion, SignatureInversion


class _MockReference:
    def __init__(self, genome):
        self.genome = genome

    def fetch(self, contig, start, end):
        return self.genome[start:end]


def _del_candidate():
    members = [SignatureDeletion("chr1", 1000, 1300, "cigar", "read{0}".format(i))
               for i in range(4)]
    return CandidateDeletion("chr1", 1000, 1300, members, 4.5, 12.0, 4.0)


def test_deletion_vcf_entry_symbolic():
    entry = _del_candidate().get_vcf_entry(sequence_alleles=False)
    assert entry == ("chr1\t1000\tPLACEHOLDERFORID\tN\t<DEL>\t4\tPASS\t"
                     "SVTYPE=DEL;END=1300;SVLEN=-300;SUPPORT=4;STD_SPAN=12.0;"
                     "STD_POS=4.0\tGT:DP:AD\t./.:.:.,.")


def test_deletion_vcf_entry_sequence_alleles():
    genome = "A" * 999 + "G" + "C" * 300 + "T" * 100
    entry = _del_candidate().get_vcf_entry(sequence_alleles=True,
                                           reference=_MockReference(genome))
    fields = entry.split("\t")
    assert fields[3] == "G" + "C" * 300  # base before + deleted run
    assert fields[4] == "G"


def test_deletion_hom_ref_filter():
    candidate = _del_candidate()
    candidate.genotype = "0/0"
    candidate.ref_reads = 20
    candidate.alt_reads = 1
    entry = candidate.get_vcf_entry()
    fields = entry.split("\t")
    assert fields[6] == "hom_ref"
    assert fields[9] == "0/0:21:20,1"


def test_deletion_zmws():
    members = [SignatureDeletion("chr1", 1000, 1300, "cigar",
                                 "movie1/{0}/0_5000".format(zmw))
               for zmw in (7, 7, 9)]
    candidate = CandidateDeletion("chr1", 1000, 1300, members, 4, None, None)
    entry = candidate.get_vcf_entry(zmws=True)
    assert "ZMWS=2" in entry
    # non-PacBio names suppress the tag
    members.append(SignatureDeletion("chr1", 1000, 1300, "cigar", "plainname"))
    candidate = CandidateDeletion("chr1", 1000, 1300, members, 4, None, None)
    assert "ZMWS" not in candidate.get_vcf_entry(zmws=True)


def test_inversion_vcf_entry_revcomp_alt():
    members = [SignatureInversion("chr1", 10, 20, "suppl", "r1", "left_fwd")]
    candidate = CandidateInversion("chr1", 10, 20, members, 7, None, None)
    genome = "N" * 10 + "ACGTTTTGGA" + "N" * 10
    entry = candidate.get_vcf_entry(sequence_alleles=True,
                                    reference=_MockReference(genome))
    fields = entry.split("\t")
    assert fields[1] == "11"
    assert fields[3] == "ACGTTTTGGA"
    assert fields[4] == "TCCAAAACGT"


def test_insertion_vcf_entry():
    members = [SignatureDeletion("chr1", 500, 540, "cigar", "r1")]
    candidate = CandidateNovelInsertion("chr1", 500, 540, "A" * 40, members, 3, None, None)
    genome = "G" * 1000
    entry = candidate.get_vcf_entry(sequence_alleles=True,
                                    reference=_MockReference(genome))
    fields = entry.split("\t")
    assert fields[1] == "500"
    assert fields[3] == "G"
    assert fields[4] == "G" + "A" * 40
    assert "SVLEN=40" in fields[7]
    assert "END=500" in fields[7]  # INS END equals POS (reference quirk)


def test_breakend_bracket_notations():
    members = [SignatureDeletion("chr1", 100, 101, "suppl", "r1")]

    def bnd(src_dir, dst_dir):
        return CandidateBreakend("chr1", 99, src_dir, "chr2", 200, dst_dir,
                                 members, 5, None, None)

    assert bnd("fwd", "fwd").get_vcf_entry().split("\t")[4] == "N[chr2:201["
    assert bnd("fwd", "rev").get_vcf_entry().split("\t")[4] == "N]chr2:201]"
    assert bnd("rev", "rev").get_vcf_entry().split("\t")[4] == "]chr2:201]N"
    assert bnd("rev", "fwd").get_vcf_entry().split("\t")[4] == "[chr2:201[N"
    # reverse records mirror the pair (reference: SVCandidate.py:693-700)
    assert bnd("fwd", "fwd").get_vcf_entry_reverse().split("\t")[4] == "]chr1:100]N"
    assert bnd("rev", "rev").get_vcf_entry_reverse().split("\t")[4] == "N[chr1:100["
    assert bnd("fwd", "rev").get_vcf_entry_reverse().split("\t")[4] == "N]chr1:100]"
    assert bnd("rev", "fwd").get_vcf_entry_reverse().split("\t")[4] == "[chr1:100[N"
