"""Split-read classification tests (superset of reference tests/test_inter.py)."""

from svim_tpu.collect.inter import (
    Segment,
    analyze_read_segments,
    is_similar,
    segments_from_alignments,
)
from svim_tpu.io.sam import AlignmentHeader, parse_sam_line

HEADER = AlignmentHeader.from_text(
    "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n@SQ\tSN:chr2\tLN:800000")


class _Bam:
    def getrname(self, tid):
        return HEADER.get_reference_name(tid)


def test_is_similar():
    # mirrors the reference cases (tests/test_inter.py:7-11)
    assert is_similar("chr1", 100, 200, "chr1", 100, 200)
    assert is_similar("chr1", 100, 200, "chr1", 110, 210)
    assert not is_similar("chr1", 100, 200, "chr2", 100, 200)
    assert not is_similar("chr1", 100, 200, "chr1", 1000, 1100)


def _aln(flag, rname, pos_1based, cigar, seq="*", tags=""):
    line = "read1\t{0}\t{1}\t{2}\t60\t{3}\t*\t0\t0\t{4}\t*{5}".format(
        flag, rname, pos_1based, cigar, seq, tags)
    return parse_sam_line(line, HEADER)


def test_segment_strand_correction():
    fwd = _aln(0, "chr1", 1001, "100S500M400S")
    rev = _aln(16, "chr1", 2001, "100S500M400S")
    segs = segments_from_alignments([fwd, rev])
    by_start = {s.ref_start: s for s in segs}
    assert by_start[1000] == Segment(100, 600, 0, 1000, 1500, False)
    # reverse: q coords flipped through the inferred read length (1000)
    assert by_start[2000] == Segment(400, 900, 0, 2000, 2500, True)


def test_split_read_deletion(default_options):
    # primary covers read[0:500) at ref 1000, supplementary read[500:1000)
    # at ref 2500 -> 1000 bp deletion at ref_end of the primary
    seq = "A" * 1000
    primary = _aln(0, "chr1", 1001, "500M500S", seq=seq)
    suppl = _aln(2048, "chr1", 2501, "500S500M", seq=seq)
    sigs, _ = analyze_read_segments(primary, [suppl], _Bam(), default_options)
    assert len(sigs) == 1
    sig = sigs[0]
    assert sig.type == "DEL"
    assert sig.get_source() == ("chr1", 1500, 2500)


def test_split_read_insertion(default_options):
    # 200 extra read bases between colinear segments -> INS at primary ref_end
    seq = "A" * 500 + "G" * 200 + "C" * 500
    primary = _aln(0, "chr1", 1001, "500M700S", seq=seq)
    suppl = _aln(2048, "chr1", 1501, "700S500M", seq=seq)
    sigs, _ = analyze_read_segments(primary, [suppl], _Bam(), default_options)
    assert len(sigs) == 1
    sig = sigs[0]
    assert sig.type == "INS"
    assert sig.get_source() == ("chr1", 1500, 1700)
    assert sig.sequence == "G" * 200


def test_split_read_inversion_left_fwd(default_options):
    seq = "A" * 1000
    primary = _aln(0, "chr1", 1001, "500M500S", seq=seq)
    # next segment in read order maps reversed; its reverse-strand q range
    # [500,1000) requires leading soft clip 0 and trailing 500 on rev strand
    suppl = _aln(2064, "chr1", 1501, "500M500S", seq=seq)
    sigs, _ = analyze_read_segments(primary, [suppl], _Bam(), default_options)
    assert len(sigs) == 1
    sig = sigs[0]
    assert sig.type == "INV"
    assert sig.direction == "left_fwd"
    assert sig.get_source() == ("chr1", 1500, 2000)


def test_split_read_cross_contig_bnd(default_options):
    seq = "A" * 1000
    primary = _aln(0, "chr1", 1001, "500M500S", seq=seq)
    suppl = _aln(2048, "chr2", 5001, "500S500M", seq=seq)
    sigs, _ = analyze_read_segments(primary, [suppl], _Bam(), default_options)
    assert len(sigs) == 1
    sig = sigs[0]
    assert sig.type == "BND"
    assert sig.get_source() == ("chr1", 1499, 1500)
    assert sig.get_destination() == ("chr2", 5000, 5001)
    assert (sig.direction1, sig.direction2) == ("fwd", "fwd")


def test_split_read_tandem_duplication(default_options):
    # supplementary restarts behind the primary end -> ref overlap -> DUP_TAN
    seq = "A" * 1000
    primary = _aln(0, "chr1", 1001, "500M500S", seq=seq)
    suppl = _aln(2048, "chr1", 801, "500S500M", seq=seq)
    sigs, _ = analyze_read_segments(primary, [suppl], _Bam(), default_options)
    assert len(sigs) == 1
    sig = sigs[0]
    assert sig.type == "DUP_TAN"
    assert sig.get_source() == ("chr1", 800, 1500)
    assert sig.copies == 1
    assert sig.fully_covered
