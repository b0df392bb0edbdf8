"""Differential test: the packed array-path COLLECT must reproduce the
sequential host path signature-for-signature on randomized inputs."""

import random

import pytest

from svim_tpu.collect import analyze_alignment_file_coordsorted
from svim_tpu.collect.packed import collect_signatures_packed
from svim_tpu.io.sam import AlignmentFile

HEADER = ("@HD\tVN:1.6\tSO:coordinate\n"
          "@SQ\tSN:chr1\tLN:1000000\n@SQ\tSN:chr2\tLN:800000\n")


def _random_sam(rng, n_reads=120, all_split=False):
    """Reads with random indel-rich CIGARs plus split reads with SA tags in
    all strand combinations."""
    lines = []
    for i in range(n_reads):
        kind = rng.random()
        start = rng.randint(0, 500000)
        contig = rng.choice(["chr1", "chr2"])
        if kind < 0.5 and not all_split:
            # CIGAR with random indels (some above the 40 bp threshold)
            parts = []
            seq_parts = []
            n_ops = rng.randint(3, 9)
            for _ in range(n_ops):
                op = rng.choice("MID")
                length = rng.choice([rng.randint(1, 39), rng.randint(40, 400)])
                parts.append("{0}{1}".format(length, op))
                if op in "MI":
                    seq_parts.append("".join(rng.choice("ACGT") for _ in range(length)))
            cigar = "10M" + "".join(parts) + "10M"
            seq = "A" * 10 + "".join(seq_parts) + "A" * 10
            lines.append("read{0}\t{1}\t{2}\t{3}\t60\t{4}\t*\t0\t0\t{5}\t*".format(
                i, rng.choice([0, 16]), contig, start + 1, cigar, seq))
        else:
            # split read: primary + 1-3 SA segments
            read_length = 4000
            seq = "".join(rng.choice("ACGT") for _ in range(read_length))
            prim_strand = rng.choice("+-")
            prim_flag = 0 if prim_strand == "+" else 16
            prim_cigar = "1000M3000S" if prim_strand == "+" else "3000S1000M"
            sa_entries = []
            for _ in range(rng.randint(1, 3)):
                sa_contig = rng.choice(["chr1", "chr2"])
                sa_start = rng.randint(0, 500000)
                sa_strand = rng.choice("+-")
                clip_left = rng.choice([1000, 2000, 3000])
                matched = 1000
                clip_right = read_length - clip_left - matched
                sa_cigar = "{0}S{1}M{2}S".format(clip_left, matched, clip_right)
                sa_entries.append("{0},{1},{2},{3},{4},0".format(
                    sa_contig, sa_start + 1, sa_strand, sa_cigar,
                    rng.choice([10, 30, 60])))
            lines.append("read{0}\t{1}\t{2}\t{3}\t60\t{4}\t*\t0\t0\t{5}\t*\tSA:Z:{6};".format(
                i, prim_flag, contig, start + 1, prim_cigar, seq,
                ";".join(sa_entries)))
    lines.sort(key=lambda line: (line.split("\t")[2], int(line.split("\t")[3])))
    return HEADER + "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed,all_bnds", [(1, False), (2, True), (3, False), (4, True)])
def test_packed_matches_host(tmp_path, default_options, seed, all_bnds):
    rng = random.Random(seed)
    sam_path = tmp_path / "random.sam"
    sam_path.write_text(_random_sam(rng, all_split=(seed % 2 == 0)))
    options = default_options.replace(all_bnds=all_bnds)

    host_sigs, host_twins = analyze_alignment_file_coordsorted(
        AlignmentFile(str(sam_path)), options)
    packed_sigs, packed_twins = collect_signatures_packed(
        AlignmentFile(str(sam_path)), options)

    assert len(packed_sigs) == len(host_sigs)
    for host_sig, packed_sig in zip(host_sigs, packed_sigs):
        assert type(host_sig) is type(packed_sig)
        assert host_sig.as_string() == packed_sig.as_string()
        if host_sig.type == "INS":
            assert host_sig.sequence == packed_sig.sequence
    assert [t.as_string() for t in host_twins] == [t.as_string() for t in packed_twins]


def test_oversized_chimera_fallback_and_truncation(tmp_path, default_options):
    """Reads with more than MAX_SEGMENTS alignments: the record-backed path
    must fall back to the exact host analyzer (no truncation), and the
    scan path (no records) must truncate after sorting with a warning, not
    crash."""
    import logging

    from svim_tpu.collect.packed import MAX_SEGMENTS
    from svim_tpu.io import bam as bamio
    from svim_tpu.io.bamscan import scan_bam
    from svim_tpu.io.sam import AlignmentHeader, parse_sam_line
    from svim_tpu.collect.packed import signatures_from_packed

    n_extra = MAX_SEGMENTS + 6
    read_length = 1000 * (n_extra + 1)
    seq = "A" * read_length
    # strictly colinear segments with 500 bp reference gaps: every adjacent
    # pair is an independent DEL, so truncating the segment list truncates
    # the signature list prefix-wise (no tandem merging / BND pairing)
    sa_entries = []
    for k in range(1, n_extra + 1):
        clip_left = 1000 * k
        clip_right = read_length - clip_left - 1000
        sa_entries.append("chr1,{0},+,{1}S1000M{2}S,60,0".format(
            100 + 1500 * k + 1, clip_left, clip_right))
    line = ("chimera\t0\tchr1\t101\t60\t1000M{0}S\t*\t0\t0\t{1}\t*\tSA:Z:{2};"
            .format(read_length - 1000, seq, ";".join(sa_entries)))
    sam_path = tmp_path / "chimera.sam"
    sam_path.write_text(HEADER + line + "\n")

    host_sigs, _ = analyze_alignment_file_coordsorted(
        AlignmentFile(str(sam_path)), default_options)
    packed_sigs, _ = collect_signatures_packed(
        AlignmentFile(str(sam_path)), default_options)
    # record-backed path: exact host parity via the fallback analyzer
    assert ([sig.as_string() for sig in packed_sigs]
            == [sig.as_string() for sig in host_sigs])
    assert len(host_sigs) > 0

    # scan path (records=None): sorted truncation to MAX_SEGMENTS, warning
    header = AlignmentHeader.from_text(HEADER)
    record = parse_sam_line(line, header)
    bam_path = tmp_path / "chimera.bam"
    bamio.write_bam(str(bam_path), header, [record])
    header2, packed, sa_tags = scan_bam(str(bam_path),
                                        default_options.min_mapq,
                                        default_options.min_sv_size)
    scan_sigs, _ = signatures_from_packed(packed, sa_tags, header2,
                                          default_options)
    # truncation keeps the MAX_SEGMENTS smallest (q_start, q_end) segments:
    # the primary is q_start 0, so the first 63 SA segments survive -> the
    # scan path emits exactly the host signatures of those pairs
    truncated = [sig.as_string() for sig in host_sigs][:MAX_SEGMENTS - 1]
    assert [sig.as_string() for sig in scan_sigs] == truncated
