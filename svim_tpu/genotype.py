"""GENOTYPE stage: estimate genotypes from reference-spanning read counts.

Behavioral contract: svim/SVIM_genotyping.py — for each candidate above
minimum_score, fetch alignments in a +-1000 bp window (capped at 500),
count reads that span the locus with margin as reference support, derive
VAF and the 1/1 / 0/1 / 0/0 / ./. genotype.

The host path below reproduces the per-candidate loop; the array path
(svim_tpu.ops.genotype_kernel) computes all candidates at once as a
vectorized interval join over the packed alignment table.
"""

from __future__ import annotations

import logging

ALIGNMENT_CAP = 500     # alignments inspected per locus (SVIM_genotyping.py:56)
WINDOW = 1000           # fetch window around the locus (SVIM_genotyping.py:49)


def span_position_distance(candidate, signature, position_distance_normalizer):
    """Candidate-signature distance with INS<->DUP_INT cross-support
    (reference: SVIM_genotyping.py:9-31)."""
    if candidate.type in ("INS", "DUP_INT"):
        c_contig, c_start, c_end = candidate.get_destination()
    else:
        c_contig, c_start, c_end = candidate.get_source()
    if signature.type == "DUP_INT":
        s_contig, s_start, s_end = signature.get_destination()
    else:
        s_contig, s_start, s_end = signature.get_source()
    if (not (candidate.type == "INS" and signature.type == "DUP_INT")
            and not (candidate.type == "DUP_INT" and signature.type == "INS")
            and candidate.type != signature.type):
        return float("inf")
    if c_contig != s_contig:
        return float("inf")
    span1 = c_end - c_start
    span2 = s_end - s_start
    center1 = (c_start + c_end) // 2
    center2 = (s_start + s_end) // 2
    position_distance = min(abs(c_start - s_start), abs(c_end - s_end),
                            abs(center1 - center2)) / position_distance_normalizer
    span_distance = abs(span1 - span2) / max(span1, span2)
    return position_distance + span_distance


def genotype(candidates, bam, type, options):
    """Genotype candidates in place (reference: SVIM_genotyping.py:34-94)."""
    num_candidates = len(candidates)
    for nr, candidate in enumerate(candidates):
        if (nr + 1) % 10000 == 0:
            logging.info("Processed {0} of {1} candidates".format(nr + 1, num_candidates))
        if candidate.score < options.minimum_score:
            continue
        if type in ("INS", "DUP_INT"):
            contig, start, end = candidate.get_destination()
            # insertion loci are points on the reference
            end = start
        else:
            contig, start, end = candidate.get_source()
        contig_length = bam.get_reference_length(contig)
        alignment_it = bam.fetch(contig=contig, start=max(0, start - WINDOW),
                                 stop=min(contig_length, end + WINDOW))

        reads_supporting_variant = set(sig.read for sig in candidate.members)
        reads_supporting_reference = set()
        aln_no = 0
        for current_alignment in alignment_it:
            if aln_no >= ALIGNMENT_CAP:
                break
            if current_alignment.query_name in reads_supporting_variant:
                continue
            if (current_alignment.is_unmapped or current_alignment.is_secondary
                    or current_alignment.mapping_quality < options.min_mapq):
                continue
            aln_no += 1
            if type in ("DEL", "INV"):
                minimum_overlap = min((end - start) / 2, 2000)
                if (current_alignment.reference_start < (end - minimum_overlap)
                        and current_alignment.reference_end > (end + 100)
                        or current_alignment.reference_start < (start - 100)
                        and current_alignment.reference_end > (start + minimum_overlap)):
                    reads_supporting_reference.add(current_alignment.query_name)
            if type in ("INS", "DUP_INT"):
                if (current_alignment.reference_start < (start - 100)
                        and current_alignment.reference_end > (end + 100)):
                    reads_supporting_reference.add(current_alignment.query_name)

        alt_support = len(reads_supporting_variant)
        ref_support = len(reads_supporting_reference)
        total = alt_support + ref_support
        if total >= options.minimum_depth:
            candidate.support_fraction = alt_support / total
            if candidate.support_fraction >= options.homozygous_threshold:
                candidate.genotype = "1/1"
            elif candidate.support_fraction >= options.heterozygous_threshold:
                candidate.genotype = "0/1"
            else:
                candidate.genotype = "0/0"
        elif total > 0:
            candidate.support_fraction = alt_support / total
            candidate.genotype = "./."
        else:
            candidate.support_fraction = "."
            candidate.genotype = "./."
        candidate.ref_reads = ref_support
        candidate.alt_reads = alt_support
