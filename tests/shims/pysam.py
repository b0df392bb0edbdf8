"""pysam shim backed by this repo's first-party IO layer.

Lets the UNMODIFIED reference implementation (/root/reference/src/svim) run
in this environment (which has no pysam/htslib) so its VCF output can be
diffed against ours — the cross-implementation parity check.  Surface
covered: everything the reference touches (svim:79-204, SVIM_COLLECT.py,
SVIM_genotyping.py:48-75, SVIM_clustering.py:37-43, SVIM_COMBINE.py:132-139).
"""

from svim_tpu.io.sam import AlignmentFile, AlignmentRecord
from svim_tpu.io.fasta import FastaFile

# The reference constructs bare segments when reconstructing SA-tag
# alignments (SVIM_COLLECT.py:72-90); AlignmentRecord supports the same
# attribute-assignment protocol including the cigarstring setter.
AlignedSegment = AlignmentRecord

__all__ = ["AlignmentFile", "AlignedSegment", "FastaFile"]
