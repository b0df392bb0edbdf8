"""COLLECT stage: extract per-read SV signatures from alignments.

Reference semantics: svim/SVIM_COLLECT.py, svim/SVIM_intra.py,
svim/SVIM_inter.py.  Two implementations share one contract:

- host path (this package): exact per-read scans, the correctness oracle;
- array path (svim_tpu.ops + svim_tpu.collect.packed): packed CIGAR/segment
  tensors processed by vectorized JAX kernels, used for throughput.
"""

from svim_tpu.collect.collect import (
    analyze_alignment_file_coordsorted,
    analyze_alignment_file_querysorted,
    bam_iterator,
    retrieve_other_alignments,
)

__all__ = [
    "analyze_alignment_file_coordsorted",
    "analyze_alignment_file_querysorted",
    "bam_iterator",
    "retrieve_other_alignments",
]
