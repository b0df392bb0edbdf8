"""Packing of alignment records into fixed-width struct-of-array tensors.

This is the boundary between the host data plane and the TPU kernels: ragged
CIGARs become padded (N, K) op/len arrays (bucketed K to bound recompiles),
per-alignment scalars become int32 columns, and read names/sequences stay on
the host, addressed by row index.  The reference has no analog — it hands
pysam objects to Python loops (SVIM_COLLECT.py:132-167); this layout is what
lets COLLECT run as vectorized array ops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

# CIGAR padding buckets: K is rounded up to one of these to bound the number
# of distinct jit shapes
CIGAR_BUCKETS = (128, 512, 2048, 8192, 32768, 131072)

FUNMAP = 0x4
FREVERSE = 0x10
FSECONDARY = 0x100
FSUPPLEMENTARY = 0x800

def bucket_size(max_ops: int) -> int:
    for bucket in CIGAR_BUCKETS:
        if max_ops <= bucket:
            return bucket
    return max_ops


class PackedAlignments:
    """A batch of alignments as dense arrays plus host-side string columns."""

    __slots__ = ("n", "ref_id", "ref_start", "ref_end", "mapq", "flag",
                 "qa_start", "qa_end", "read_len", "cigar_words",
                 "names", "sequences", "records", "device_cigars",
                 "has_hard_clip")

    def __init__(self, n, ref_id, ref_start, ref_end, mapq, flag, qa_start,
                 qa_end, read_len, cigar_words, names, sequences,
                 records=None, device_cigars=None, has_hard_clip=None):
        self.n = n
        self.ref_id = ref_id
        self.ref_start = ref_start
        self.ref_end = ref_end
        self.mapq = mapq
        self.flag = flag
        self.qa_start = qa_start
        self.qa_end = qa_end
        self.read_len = read_len
        # CIGAR batch in raw BAM word encoding: length << 4 | op, padded with 0
        self.cigar_words = cigar_words
        self.names = names
        self.sequences = sequences
        self.records = records
        self.device_cigars = device_cigars
        self.has_hard_clip = has_hard_clip

    @property
    def cigar_ops(self):
        return (self.cigar_words & 0xF).astype(np.int8)

    @property
    def cigar_lens(self):
        return (self.cigar_words >> 4).astype(np.int32)

    @property
    def is_reverse(self):
        return (self.flag & FREVERSE) != 0

    @property
    def is_supplementary(self):
        return (self.flag & FSUPPLEMENTARY) != 0


def encode_cigars_u8(cigar_words: np.ndarray):
    """uint8 CIGAR transfer encoding: (len<<4 | op) with len saturated at 15,
    plus a sparse (rows, cols, deltas) table for the ops whose length
    exceeds 15 (typically ~2 per long read: the terminal match run and the
    SV op).  Decode on device: lens = (w >> 4) + scatter_add(deltas).

    Quarters the host->device traffic vs int32 (the dominant cost of the
    device COLLECT pass over a bandwidth-limited link).  Returns None when
    too many ops overflow for the encoding to pay off."""
    lens = cigar_words >> 4
    ops = cigar_words & 0xF
    over = lens > 15
    n_over = int(over.sum())
    if n_over * 10 > cigar_words.size:
        return None
    words8 = (ops | (np.minimum(lens, 15) << 4)).astype(np.uint8)
    rows, cols = np.nonzero(over)
    deltas = (lens[rows, cols] - 15).astype(np.int32)
    pad = 8
    while pad < len(rows):
        pad *= 2
    rows_padded = np.zeros(pad, dtype=np.int32)
    cols_padded = np.zeros(pad, dtype=np.int32)
    deltas_padded = np.zeros(pad, dtype=np.int32)  # zero delta: harmless add
    rows_padded[:len(rows)] = rows
    cols_padded[:len(cols)] = cols
    deltas_padded[:len(deltas)] = deltas
    return words8, rows_padded, cols_padded, deltas_padded


def pack_alignments(records: Sequence, pad_to: Optional[int] = None) -> PackedAlignments:
    """Pack AlignmentRecord objects into a PackedAlignments batch.

    Records without a CIGAR are packed with zero ops (they produce nothing in
    the kernels)."""
    n = len(records)
    max_ops = 1
    cigars: List = []
    for record in records:
        cigar = record.cigartuples
        cigars.append(cigar)
        if cigar is not None and len(cigar) > max_ops:
            max_ops = len(cigar)
    k = bucket_size(max_ops) if pad_to is None else pad_to

    cigar_words = np.zeros((n, k), dtype=np.int32)
    ref_id = np.empty(n, dtype=np.int32)
    ref_start = np.empty(n, dtype=np.int32)
    mapq = np.empty(n, dtype=np.int32)
    flag = np.empty(n, dtype=np.int32)
    names: List[str] = []
    sequences: List[Optional[str]] = []

    for row, record in enumerate(records):
        ref_id[row] = record.reference_id
        ref_start[row] = record.reference_start
        mapq[row] = record.mapping_quality
        flag[row] = record.flag
        names.append(record.query_name)
        sequences.append(record.query_sequence)
        cigar = cigars[row]
        if cigar:
            count = len(cigar)
            arr = np.asarray(cigar, dtype=np.int64)
            cigar_words[row, :count] = (arr[:, 1] << 4) | arr[:, 0]

    from svim_tpu.io.bamscan import build_packed
    packed = build_packed(ref_id, ref_start, mapq, flag, cigar_words,
                          names, sequences)
    packed.records = list(records)
    return packed
