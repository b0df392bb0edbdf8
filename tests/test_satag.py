"""SA-tag reconstruction tests: supplementary alignments rebuilt from the
primary's SA tag must match the real supplementary records (mirrors the
reference test intent, tests/test_satag.py, on a synthetic chimeric read)."""

import random

from svim_tpu.io.sam import AlignmentFile, AlignmentHeader, parse_sam_line
from svim_tpu.collect.collect import retrieve_other_alignments

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n@SQ\tSN:chr2\tLN:800000\n"


def _make_chimeric_sam(tmp_path):
    """One read split into a primary + two supplementary alignments with
    mutually consistent SA tags."""
    rng = random.Random(7)
    seq = "".join(rng.choice("ACGT") for _ in range(3000))
    # primary: first 1000 bases align at chr1:10000, rest soft-clipped
    prim_cigar = "1000M2000S"
    # suppl 1: middle 1000 bases at chr1:50000 forward
    sup1_cigar = "1000S1000M1000S"
    # suppl 2: last 1000 bases at chr2:70000 forward
    sup2_cigar = "2000S1000M"
    sa_of_primary = "chr1,50001,+,{0},60,5;chr2,70001,+,{1},55,3;".format(sup1_cigar, sup2_cigar)
    lines = [
        "read1\t0\tchr1\t10001\t60\t{0}\t*\t0\t0\t{1}\t*\tSA:Z:{2}".format(
            prim_cigar, seq, sa_of_primary),
        "read1\t2048\tchr1\t50001\t60\t{0}\t*\t0\t0\t{1}\t*\tNM:i:5".format(sup1_cigar, seq),
        "read1\t2048\tchr2\t70001\t55\t{0}\t*\t0\t0\t{1}\t*\tNM:i:3".format(sup2_cigar, seq),
    ]
    path = tmp_path / "chimeric.sam"
    path.write_text(HEADER + "\n".join(lines) + "\n")
    return str(path)


def test_sa_reconstruction_matches_real_supplementaries(tmp_path):
    bam = AlignmentFile(_make_chimeric_sam(tmp_path))
    alignments = list(bam.fetch(until_eof=True))
    primary = [aln for aln in alignments if not aln.is_supplementary and not aln.is_secondary]
    supplementary = [aln for aln in alignments if aln.is_supplementary]
    assert len(primary) == 1 and len(supplementary) == 2
    reconstructed = retrieve_other_alignments(primary[0], bam)
    assert len(reconstructed) == 2
    for rec, actual in zip(
            sorted(reconstructed, key=lambda a: (a.reference_id, a.reference_start)),
            sorted(supplementary, key=lambda a: (a.reference_id, a.reference_start))):
        assert rec.query_name == actual.query_name
        assert rec.is_supplementary and not rec.is_reverse
        assert rec.reference_id == actual.reference_id
        assert rec.reference_start == actual.reference_start
        assert rec.mapping_quality in (60, 55)
        assert rec.cigarstring == actual.cigarstring
        assert rec.get_tag("NM") == actual.get_tag("NM")


def test_hard_clipped_primary_returns_nothing():
    header = AlignmentHeader.from_text(HEADER)

    class _Bam:
        def get_tid(self, name):
            return header.get_tid(name)

    rec = parse_sam_line(
        "read2\t0\tchr1\t100\t60\t10H100M\t*\t0\t0\t*\t*\tSA:Z:chr1,500,+,100M,60,0;",
        header)
    assert retrieve_other_alignments(rec, _Bam()) == []


def test_missing_sa_tag_returns_nothing():
    header = AlignmentHeader.from_text(HEADER)
    rec = parse_sam_line("read3\t0\tchr1\t100\t60\t100M\t*\t0\t0\t*\t*", header)
    assert retrieve_other_alignments(rec, None) == []
