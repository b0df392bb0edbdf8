"""spoa (pyspoa) shim backed by this repo's consensus primitives.

The reference makes exactly two poa() call shapes
(SVIM_COMBINE.py:208,219):
  1. poa(haplotypes, ...) over >=3 member haplotypes — only the consensus
     string is consumed (msa_reads is never read);
  2. poa([consensus, ref_window], ...) — only the two MSA rows are consumed
     (row 0 = consensus aligned, row 1 = reference aligned).

Backing (1) with our poa_consensus and (2) with our two-piece-affine global
aligner makes the reference compute the IDENTICAL consensus/realignment the
svim_tpu pipeline computes, so a VCF diff isolates ported-logic errors
rather than POA implementation differences.
"""

from svim_tpu.combine.consensus import align_global, poa_consensus


def poa(sequences, algorithm=0, genmsa=True, m=5, n=-4, g=-8, e=-6,
        q=-10, c=-4, min_coverage=-1):
    sequences = list(sequences)
    if len(sequences) == 2:
        row_a, row_b = align_global(sequences[0], sequences[1])
        return row_a.replace("-", ""), [row_a, row_b]
    consensus = poa_consensus(sequences)
    # msa rows are unread in this call shape (SVIM_COMBINE.py:208)
    return consensus, list(sequences)
