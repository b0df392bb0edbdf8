"""Differential test: queryname-sorted packed COLLECT vs the host grouping
analyzer on randomized reads with REAL supplementary records."""

import random

import pytest

from svim_tpu.collect import analyze_alignment_file_querysorted
from svim_tpu.collect.packed import collect_signatures_packed_querysorted
from svim_tpu.io.sam import AlignmentFile

HEADER = ("@HD\tVN:1.6\tSO:queryname\n"
          "@SQ\tSN:chr1\tLN:1000000\n@SQ\tSN:chr2\tLN:800000\n")


def _random_querysorted_sam(rng, n_reads=80):
    lines = []
    for i in range(n_reads):
        name = "read{0:04d}".format(i)
        kind = rng.random()
        contig = rng.choice(["chr1", "chr2"])
        start = rng.randint(0, 500000)
        if kind < 0.4:
            # indel-rich single alignment
            parts = []
            for _ in range(rng.randint(3, 8)):
                parts.append("{0}M".format(rng.randint(20, 200)))
                parts.append("{0}{1}".format(
                    rng.choice([rng.randint(1, 39), rng.randint(40, 300)]),
                    rng.choice("ID")))
            cigar = "".join(parts) + "30M"
            lines.append("{0}\t{1}\t{2}\t{3}\t60\t{4}\t*\t0\t0\t*\t*".format(
                name, rng.choice([0, 16]), contig, start + 1, cigar))
        elif kind < 0.8:
            # split read: primary + 1-2 REAL supplementary records
            read_length = 3000
            n_suppl = rng.randint(1, 2)
            prim_strand = rng.choice([0, 16])
            lines.append("{0}\t{1}\t{2}\t{3}\t60\t1000M2000S\t*\t0\t0\t*\t*".format(
                name, prim_strand, contig, start + 1))
            for s in range(n_suppl):
                clip_left = 1000 * (s + 1)
                clip_right = read_length - clip_left - 1000
                cigar = "{0}S1000M{1}S".format(clip_left, clip_right)
                if clip_right == 0:
                    cigar = "{0}S1000M".format(clip_left)
                suppl_flag = 2048 | rng.choice([0, 16])
                suppl_contig = rng.choice(["chr1", "chr2"])
                mapq = rng.choice([10, 30, 60])
                lines.append("{0}\t{1}\t{2}\t{3}\t{4}\t{5}\t*\t0\t0\t*\t*".format(
                    name, suppl_flag, suppl_contig,
                    rng.randint(0, 500000) + 1, mapq, cigar))
        else:
            # secondary + low-mapq primary noise
            lines.append("{0}\t{1}\t{2}\t{3}\t{4}\t500M\t*\t0\t0\t*\t*".format(
                name, rng.choice([0, 256]), contig, start + 1,
                rng.choice([5, 60])))
    # queryname sort: group by name (already grouped by construction)
    return HEADER + "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_querysorted_packed_matches_host(tmp_path, default_options, seed):
    rng = random.Random(seed)
    sam_path = tmp_path / "q.sam"
    sam_path.write_text(_random_querysorted_sam(rng))
    host = analyze_alignment_file_querysorted(AlignmentFile(str(sam_path)),
                                              default_options)
    packed = collect_signatures_packed_querysorted(AlignmentFile(str(sam_path)),
                                                   default_options)
    assert [s.as_string() for s in host[0]] == [s.as_string() for s in packed[0]]
    assert [t.as_string() for t in host[1]] == [t.as_string() for t in packed[1]]


def test_querysorted_packed_all_bnds(tmp_path, default_options):
    rng = random.Random(5)
    sam_path = tmp_path / "q.sam"
    sam_path.write_text(_random_querysorted_sam(rng, 60))
    options = default_options.replace(all_bnds=True)
    host = analyze_alignment_file_querysorted(AlignmentFile(str(sam_path)), options)
    packed = collect_signatures_packed_querysorted(AlignmentFile(str(sam_path)),
                                                   options)
    assert [s.as_string() for s in host[0]] == [s.as_string() for s in packed[0]]
    assert [t.as_string() for t in host[1]] == [t.as_string() for t in packed[1]]
