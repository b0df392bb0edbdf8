"""COMBINE merging tests: BND<->INS pairing, cut&paste flagging, genotyping."""

import pytest

from svim_tpu.candidates import CandidateDeletion, CandidateNovelInsertion
from svim_tpu.combine.merging import (
    calculate_score_insertion,
    flag_cutpaste_candidates,
    get_closest_index,
    merge_translocations_at_insertions,
)
from svim_tpu.genotype import genotype
from svim_tpu.io.sam import AlignmentFile
from svim_tpu.signatures import (
    SignatureClusterBiLocal,
    SignatureClusterUniLocal,
    SignatureDeletion,
    SignatureInsertion,
)


def test_get_closest_index():
    assert get_closest_index([], 5) is None
    assert get_closest_index([10], 5) == 0
    assert get_closest_index([10, 20, 30], 19) == 1
    assert get_closest_index([10, 20, 30], 25) == 1  # ties pick the smaller
    assert get_closest_index([10, 20, 30], 26) == 2
    assert get_closest_index([10, 20, 30], 100) == 2


def test_calculate_score_insertion_geometric_mean():
    # perfect components: product 1 -> main score unchanged
    assert calculate_score_insertion(10, [0, 0], [None, None], [None, None]) == 10
    # distances at 100 zero a component -> score 0
    assert calculate_score_insertion(10, [100, 0], [None, None], [None, None]) == 0


def _bnd_cluster(contig, pos, direction1, direction2, dest_contig, dest_pos):
    cluster = SignatureClusterBiLocal(contig, pos, pos + 1, dest_contig,
                                      dest_pos, dest_pos + 1, 10, 3, [],
                                      "BND", 1.0, 1.0)
    cluster.direction1 = direction1
    cluster.direction2 = direction2
    return cluster


def _ins_cluster(contig, start, length, members=()):
    return SignatureClusterUniLocal(contig, start, start + length, 12, 3,
                                    list(members), "INS", 1.0, 1.0)


def test_merge_translocations_at_insertions(default_options):
    # an insertion at chr1:10000 of length 500 flanked by fwd-fwd and rev-rev
    # breakends whose destinations on chr2 span ~500 bp -> DUP_INT
    members = [SignatureInsertion("chr1", 10000, 10500, "suppl", "r{0}".format(i),
                                  "A" * 500) for i in range(3)]
    ins = _ins_cluster("chr1", 10000, 500, members)
    bnd_fwd = _bnd_cluster("chr1", 10010, "fwd", "fwd", "chr2", 50000)
    bnd_rev = _bnd_cluster("chr1", 9995, "rev", "rev", "chr2", 50499)
    new_clusters, to_remove = merge_translocations_at_insertions(
        [bnd_fwd, bnd_rev], [ins], default_options)
    assert len(new_clusters) == 1
    assert to_remove == [0]
    dup = new_clusters[0]
    assert dup.type == "DUP_INT"
    assert dup.get_source()[0] == "chr2"
    assert dup.get_source()[1] == 50000 and dup.get_source()[2] == 50499
    assert dup.get_destination()[0] == "chr1"


def test_merge_requires_matching_span(default_options):
    # destination span far from the insertion length -> no merge
    ins = _ins_cluster("chr1", 10000, 500)
    bnd_fwd = _bnd_cluster("chr1", 10010, "fwd", "fwd", "chr2", 50000)
    bnd_rev = _bnd_cluster("chr1", 9995, "rev", "rev", "chr2", 52000)
    new_clusters, to_remove = merge_translocations_at_insertions(
        [bnd_fwd, bnd_rev], [ins], default_options)
    assert new_clusters == [] and to_remove == []


def test_flag_cutpaste(default_options):
    dup_like = SignatureClusterBiLocal("chr1", 20000, 20500, "chr1", 40000,
                                       40500, 10, 3, [], "DUP_INT", 1.0, 1.0)
    nearby_del = SignatureClusterUniLocal("chr1", 20010, 20490, 8, 3, [],
                                          "DEL", 1.0, 1.0)
    candidates = flag_cutpaste_candidates([dup_like], [nearby_del], default_options)
    assert len(candidates) == 1 and candidates[0].cutpaste
    far_del = SignatureClusterUniLocal("chr1", 900000, 900480, 8, 3, [], "DEL", 1.0, 1.0)
    candidates = flag_cutpaste_candidates([dup_like], [far_del], default_options)
    assert not candidates[0].cutpaste
    # no deletions at all: still emits a non-cutpaste candidate
    candidates = flag_cutpaste_candidates([dup_like], [], default_options)
    assert len(candidates) == 1 and not candidates[0].cutpaste


HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n"


def _genotype_bam(tmp_path, n_ref_spanning):
    lines = []
    for i in range(n_ref_spanning):
        lines.append("ref{0}\t0\tchr1\t{1}\t60\t4000M\t*\t0\t0\t*\t*".format(
            i, 8001 + i))
    path = tmp_path / "gt.sam"
    path.write_text(HEADER + "\n".join(lines) + ("\n" if lines else ""))
    return AlignmentFile(str(path))


@pytest.mark.parametrize("alt,ref,expected", [
    (8, 0, "1/1"),   # VAF 1.0
    (4, 4, "0/1"),   # VAF 0.5
    (1, 9, "0/0"),   # VAF 0.1
    (1, 1, "./."),   # depth below minimum_depth
])
def test_genotype_thresholds(tmp_path, default_options, alt, ref, expected):
    members = [SignatureDeletion("chr1", 10000, 10400, "cigar",
                                 "alt{0}".format(i)) for i in range(alt)]
    candidate = CandidateDeletion("chr1", 10000, 10400, members, 10, None, None)
    bam = _genotype_bam(tmp_path, ref)
    genotype([candidate], bam, "DEL", default_options)
    assert candidate.genotype == expected
    assert candidate.alt_reads == alt and candidate.ref_reads == ref


def test_genotype_low_score_skipped(tmp_path, default_options):
    candidate = CandidateDeletion("chr1", 10000, 10400,
                                  [SignatureDeletion("chr1", 10000, 10400,
                                                     "cigar", "r")], 1, None, None)
    bam = _genotype_bam(tmp_path, 5)
    genotype([candidate], bam, "DEL", default_options)
    assert candidate.genotype == "./."  # untouched: below minimum_score


def test_genotype_insertion_spanning(tmp_path, default_options):
    members = [SignatureInsertion("chr1", 10000, 10200, "cigar",
                                  "alt{0}".format(i), "A" * 200) for i in range(3)]
    candidate = CandidateNovelInsertion("chr1", 10000, 10200, "A" * 200,
                                        members, 10, None, None)
    bam = _genotype_bam(tmp_path, 3)
    genotype([candidate], bam, "INS", default_options)
    assert candidate.genotype == "0/1"
    assert candidate.ref_reads == 3 and candidate.alt_reads == 3
