"""Differential test: vectorized genotyping must match the per-candidate
fetch loop exactly, including the 500-alignment cap."""

import random

from svim_tpu.candidates import CandidateDeletion, CandidateNovelInsertion
from svim_tpu.genotype import genotype, genotype_packed
from svim_tpu.io.bamscan import scan_bam
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentFile
from svim_tpu.signatures import SignatureDeletion, SignatureInsertion

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n"


def _make_inputs(tmp_path, n_background=700):
    """Dense background coverage (to exercise the 500 cap) plus candidates."""
    rng = random.Random(51)
    lines = []
    for i in range(n_background):
        start = rng.randint(95000, 105000)
        length = rng.randint(1500, 6000)
        lines.append("bg{0}\t0\tchr1\t{1}\t{2}\t{3}M\t*\t0\t0\t*\t*".format(
            i, start + 1, rng.choice([10, 25, 60]), length))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    sam_path = tmp_path / "gt.sam"
    sam_path.write_text(HEADER + "\n".join(lines) + "\n")
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "gt.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))

    candidates = []
    for i, (start, length) in enumerate(((100000, 400), (98000, 1200),
                                         (103000, 80), (101500, 50))):
        members = [SignatureDeletion("chr1", start, start + length, "cigar",
                                     "alt{0}_{1}".format(i, j))
                   for j in range(3 + i)]
        candidates.append(CandidateDeletion("chr1", start, start + length,
                                            members, 10, None, None))
    ins_members = [SignatureInsertion("chr1", 100500, 100700, "cigar",
                                      "ins{0}".format(j), "A" * 200)
                   for j in range(4)]
    ins_candidate = CandidateNovelInsertion("chr1", 100500, 100700, "A" * 200,
                                            ins_members, 9, None, None)
    return str(bam_path), candidates, ins_candidate


def test_genotype_packed_matches_loop(tmp_path, default_options):
    bam_path, del_candidates, ins_candidate = _make_inputs(tmp_path)

    import copy
    loop_dels = copy.deepcopy(del_candidates)
    loop_ins = copy.deepcopy(ins_candidate)
    bam = AlignmentFile(bam_path)
    genotype(loop_dels, bam, "DEL", default_options)
    genotype([loop_ins], bam, "INS", default_options)

    header, packed, sa_tags = scan_bam(bam_path, default_options.min_mapq)
    from svim_tpu.collect.packed import _run_collect_scan
    _run_collect_scan(packed, default_options)  # fills ref_end geometry
    genotype_packed(del_candidates, packed, header, "DEL", default_options)
    genotype_packed([ins_candidate], packed, header, "INS", default_options)

    for loop_candidate, fast_candidate in zip(loop_dels + [loop_ins],
                                              del_candidates + [ins_candidate]):
        assert fast_candidate.genotype == loop_candidate.genotype
        assert fast_candidate.ref_reads == loop_candidate.ref_reads
        assert fast_candidate.alt_reads == loop_candidate.alt_reads
        assert fast_candidate.support_fraction == loop_candidate.support_fraction


def test_genotype_packed_filters_unfiltered_table(tmp_path, default_options):
    """A PackedAlignments batch that was NOT prefiltered (min_mapq=0 at scan
    time) must still genotype identically: genotype_packed re-applies the
    mapq/unmapped/secondary filter from the table columns."""
    bam_path, del_candidates, ins_candidate = _make_inputs(tmp_path)

    import copy
    loop_dels = copy.deepcopy(del_candidates)
    loop_ins = copy.deepcopy(ins_candidate)
    bam = AlignmentFile(bam_path)
    genotype(loop_dels, bam, "DEL", default_options)
    genotype([loop_ins], bam, "INS", default_options)

    # scan WITHOUT the mapq filter: the workload has mapq 10 rows that the
    # reference loop skips (min_mapq default 20)
    header, packed, sa_tags = scan_bam(bam_path, 0)
    from svim_tpu.collect.packed import _run_collect_scan
    _run_collect_scan(packed, default_options)
    assert (packed.mapq < default_options.min_mapq).any()
    genotype_packed(del_candidates, packed, header, "DEL", default_options)
    genotype_packed([ins_candidate], packed, header, "INS", default_options)

    for loop_candidate, fast_candidate in zip(loop_dels + [loop_ins],
                                              del_candidates + [ins_candidate]):
        assert fast_candidate.genotype == loop_candidate.genotype
        assert fast_candidate.ref_reads == loop_candidate.ref_reads
        assert fast_candidate.alt_reads == loop_candidate.alt_reads
        assert fast_candidate.support_fraction == loop_candidate.support_fraction


def test_genotype_packed_host_backend_matches_device(tmp_path, default_options):
    """--device_backend host forces the numpy join; results must equal the
    default on-device interval-join kernel."""
    import copy
    bam_path, del_candidates, ins_candidate = _make_inputs(tmp_path)
    host_dels = copy.deepcopy(del_candidates)
    host_ins = copy.deepcopy(ins_candidate)

    header, packed, sa_tags = scan_bam(bam_path, default_options.min_mapq)
    from svim_tpu.collect.packed import _run_collect_scan
    _run_collect_scan(packed, default_options)

    genotype_packed(del_candidates, packed, header, "DEL", default_options)
    genotype_packed([ins_candidate], packed, header, "INS", default_options)
    host_options = default_options.replace(device_backend="host")
    genotype_packed(host_dels, packed, header, "DEL", host_options)
    genotype_packed([host_ins], packed, header, "INS", host_options)

    for host_candidate, device_candidate in zip(host_dels + [host_ins],
                                                del_candidates + [ins_candidate]):
        assert device_candidate.genotype == host_candidate.genotype
        assert device_candidate.ref_reads == host_candidate.ref_reads
        assert device_candidate.alt_reads == host_candidate.alt_reads


def test_genotype_packed_multi_single_call_matches_per_type(tmp_path,
                                                            default_options):
    """One genotype_packed_multi call over MIXED types (DEL + INS jobs with
    different type_class interleaved in one kernel batch) must match the
    separate per-type calls."""
    import copy

    from svim_tpu.genotype import genotype_packed_multi

    bam_path, del_candidates, ins_candidate = _make_inputs(tmp_path)
    separate_dels = copy.deepcopy(del_candidates)
    separate_ins = copy.deepcopy(ins_candidate)

    header, packed, sa_tags = scan_bam(bam_path, default_options.min_mapq)
    from svim_tpu.collect.packed import _run_collect_scan
    _run_collect_scan(packed, default_options)

    genotype_packed(separate_dels, packed, header, "DEL", default_options)
    genotype_packed([separate_ins], packed, header, "INS", default_options)

    genotype_packed_multi(
        [(del_candidates, "DEL", "deletions"),
         ([ins_candidate], "INS", "novel insertions")],
        packed, header, default_options)

    for separate, multi in zip(separate_dels + [separate_ins],
                               del_candidates + [ins_candidate]):
        assert multi.genotype == separate.genotype
        assert multi.ref_reads == separate.ref_reads
        assert multi.alt_reads == separate.alt_reads
        assert multi.support_fraction == separate.support_fraction
