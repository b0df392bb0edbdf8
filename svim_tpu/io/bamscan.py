"""Fast BAM -> packed-array scanner: the production data plane.

Decodes a BAM stream directly into PackedAlignments: fixed fields via struct
walks, CIGARs as zero-copy uint32 views sliced into a padded (N, K) batch,
sequences decoded lazily (only insertion events ever need them), SA tags
located by a verified byte search.  This avoids materializing AlignmentRecord
objects entirely — the role htslib+pysam play for the reference
(SVIM_COLLECT.py:133), rebuilt for array consumers.  A native C++ version of
the same scan lives in svim_tpu/native.
"""

from __future__ import annotations

import gzip
import struct
from typing import List, Optional

import numpy as np

from svim_tpu.io.packing import PackedAlignments, bucket_size
from svim_tpu.io.sam import AlignmentHeader

FUNMAP = 0x4
FSECONDARY = 0x100

_SEQ_CODES = np.frombuffer(b"=ACMGRSVTWYHKDBN", dtype=np.uint8)
# 256 -> two decoded bases per packed byte
_NIBBLE_HI = _SEQ_CODES[np.arange(256) >> 4]
_NIBBLE_LO = _SEQ_CODES[np.arange(256) & 0xF]

_TAG_SIZES = {ord("c"): 1, ord("C"): 1, ord("s"): 2, ord("S"): 2,
              ord("i"): 4, ord("I"): 4, ord("f"): 4, ord("A"): 1}


class LazySequences:
    """Per-row on-demand decoding of 4-bit packed BAM sequences."""

    def __init__(self, data: bytes, seq_offsets: np.ndarray, seq_lengths: np.ndarray):
        self._data = data
        self._offsets = seq_offsets
        self._lengths = seq_lengths

    def __len__(self):
        return len(self._offsets)

    def __getitem__(self, row: int) -> Optional[str]:
        length = int(self._lengths[row])
        if length == 0:
            return None
        return self.slice(row, 0, length)

    def slice(self, row: int, start: int, end: int) -> str:
        """Decode only bases [start, end) of a row — insertion events touch a
        tiny window of a long read, so whole-read decoding is wasted work."""
        length = int(self._lengths[row])
        start = max(0, min(start, length))
        end = max(start, min(end, length))
        if start >= end:
            return ""
        offset = int(self._offsets[row])
        first_byte = start // 2
        last_byte = (end + 1) // 2
        packed = np.frombuffer(self._data, dtype=np.uint8,
                               count=last_byte - first_byte,
                               offset=offset + first_byte)
        out = np.empty(2 * len(packed), dtype=np.uint8)
        out[0::2] = _NIBBLE_HI[packed]
        out[1::2] = _NIBBLE_LO[packed]
        return out[start - 2 * first_byte:end - 2 * first_byte].tobytes().decode()

    def slice_batch(self, rows, starts, ends):
        """Decode many windows in one vectorized pass (ragged gather + one
        nibble expansion); per-call numpy overhead dominates tiny per-event
        decodes, so batching is ~20x cheaper than repeated slice()."""
        rows = np.asarray(rows, dtype=np.int64)
        if rows.size == 0:
            return []
        lengths = np.asarray(self._lengths, dtype=np.int64)[rows]
        starts = np.clip(np.asarray(starts, dtype=np.int64), 0, lengths)
        ends = np.clip(np.asarray(ends, dtype=np.int64), starts, lengths)
        offsets = np.asarray(self._offsets, dtype=np.int64)[rows]
        first_byte = starts >> 1
        nbytes = ((ends + 1) >> 1) - first_byte
        out_off = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(nbytes, out=out_off[1:])
        total = int(out_off[-1])
        if total == 0:
            return [""] * len(rows)
        gather = (np.arange(total, dtype=np.int64)
                  - np.repeat(out_off[:-1], nbytes)
                  + np.repeat(offsets + first_byte, nbytes))
        packed = np.frombuffer(self._data, dtype=np.uint8)[gather]
        chars = np.empty(2 * total, dtype=np.uint8)
        chars[0::2] = _NIBBLE_HI[packed]
        chars[1::2] = _NIBBLE_LO[packed]
        decoded = chars.tobytes().decode()
        char_start = (2 * out_off[:-1] + (starts - 2 * first_byte)).tolist()
        spans = (ends - starts).tolist()
        return [decoded[o:o + n] for o, n in zip(char_start, spans)]


def _find_sa_tag(data: bytes, tag_start: int, tag_end: int) -> Optional[str]:
    """Locate an SA:Z tag by byte search, verified by walking the tag list
    from the start (guards against 'SAZ' inside another tag's value)."""
    hint = data.find(b"SAZ", tag_start, tag_end)
    if hint < 0:
        return None
    p = tag_start
    while p < tag_end - 3:
        value_type = data[p + 2]
        if data[p] == 0x53 and data[p + 1] == 0x41 and value_type == 0x5A:  # 'S','A','Z'
            nul = data.index(b"\x00", p + 3, tag_end)
            return data[p + 3:nul].decode()
        p += 3
        if value_type in _TAG_SIZES:
            p += _TAG_SIZES[value_type]
        elif value_type in (0x5A, 0x48):  # Z / H
            p = data.index(b"\x00", p, tag_end) + 1
        elif value_type == 0x42:  # B
            sub = data[p]
            (count,) = struct.unpack_from("<i", data, p + 1)
            p += 5 + count * _TAG_SIZES[sub]
        else:
            return None  # malformed; give up on this record's tags
    return None


def scan_bam(filename: str, min_mapq: int = 0, min_sv_size: int = 0):
    """Scan a BAM file into (AlignmentHeader, PackedAlignments, sa_tags).

    Only records passing the COLLECT filter (mapped, not secondary,
    mapq >= min_mapq) are packed — same filter as SVIM_COLLECT.py:143.
    sa_tags[i] is the SA string of row i or None.  min_sv_size > 0 enables
    CIGAR compaction (io/packing.compact_cigar_row): the padded batch is
    sized from compacted op counts, shrinking the device transfer ~100x.
    """
    with open(filename, "rb") as handle:
        compressed = handle.read()
    data = None
    try:
        from svim_tpu import native
        # fused fast path: inflate + record count in ONE native pass (the
        # count walk chases the inflate frontier across the thread pool)
        fused = native.bam_scan_fused(compressed, min_mapq, min_sv_size)
        if fused is not None:
            data, counted = fused
            return scan_bam_bytes(data, min_mapq, min_sv_size,
                                  counted=counted)
        data = native.bgzf_decompress_parallel(compressed)
    except Exception:
        data = None
    if data is None:
        try:
            data = gzip.decompress(compressed)
        except (EOFError, OSError) as error:
            raise ValueError(
                "truncated or corrupt BGZF input ({0} compressed bytes): {1}"
                .format(len(compressed), error)) from error
    return scan_bam_bytes(data, min_mapq, min_sv_size)


class LazyStrings:
    """Per-row on-demand decoding of byte ranges (read names, SA tags)."""

    def __init__(self, data: bytes, offsets, lengths, none_when_negative=False):
        self._data = data
        self._offsets = offsets
        self._lengths = lengths
        self._none_when_negative = none_when_negative

    def __len__(self):
        return len(self._offsets)

    def __getitem__(self, row: int):
        offset = int(self._offsets[row])
        if self._none_when_negative and offset < 0:
            return None
        return self._data[offset:offset + int(self._lengths[row])].decode()

    def present_rows(self):
        """Rows with a value (negative offset = absent) — lets consumers skip
        the per-row lookup over mostly-empty columns like SA tags."""
        return np.nonzero(np.asarray(self._offsets) >= 0)[0]

    def take(self, rows):
        """Decode many rows in one vectorized pass (ragged gather + a single
        bytes decode) — much cheaper than per-row __getitem__ for hot loops
        touching thousands of read names."""
        rows = np.asarray(rows, dtype=np.int64)
        if rows.size == 0:
            return []
        offsets = np.asarray(self._offsets, dtype=np.int64)[rows]
        lengths = np.asarray(self._lengths, dtype=np.int64)[rows]
        if self._none_when_negative and (offsets < 0).any():
            # mixed presence: fall back to scalar decodes for clarity
            return [self[int(row)] for row in rows.tolist()]
        out_off = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(lengths, out=out_off[1:])
        total = int(out_off[-1])
        if total == 0:
            return [""] * len(rows)
        gather = (np.arange(total, dtype=np.int64)
                  - np.repeat(out_off[:-1], lengths)
                  + np.repeat(offsets, lengths))
        decoded = np.frombuffer(self._data, dtype=np.uint8)[gather].tobytes().decode()
        bounds = out_off.tolist()
        return [decoded[bounds[k]:bounds[k + 1]] for k in range(len(rows))]


def scan_bam_bytes(data: bytes, min_mapq: int = 0, min_sv_size: int = 0,
                   counted=None):
    try:
        return _scan_bam_bytes(data, min_mapq, min_sv_size, counted=counted)
    except (struct.error, IndexError, UnicodeDecodeError) as error:
        # a clean diagnostic instead of a raw unpack error (the reference
        # surfaces pysam's "truncated file" here; svim:219-223 logs it)
        raise ValueError(
            "truncated or corrupt BAM stream ({0} inflated bytes): {1}"
            .format(len(data), error)) from error


def _scan_bam_bytes(data: bytes, min_mapq: int = 0, min_sv_size: int = 0,
                    counted=None):
    if data[:4] != b"BAM\x01":
        raise ValueError("not a BAM stream")
    # native fast path: C++ record walk straight into packed columns
    try:
        from svim_tpu import native
        result = native.bamscan_native(data, min_mapq, bucket_size,
                                       min_sv_size, counted=counted)
    except Exception:
        result = None
    if result is not None:
        (text, references, lengths, cigar_words, ref_id, pos, mapq,
         flag, name_off, name_len, seq_off, seq_len, sa_off, sa_len) = result
        header = AlignmentHeader.from_text(text)
        if not header.references:
            header = AlignmentHeader(header.hd, references, lengths, text)
        packed = build_packed(
            ref_id, pos, mapq, flag, cigar_words,
            LazyStrings(data, name_off, name_len),
            LazySequences(data, seq_off, seq_len))
        sa_tags = LazyStrings(data, sa_off, sa_len, none_when_negative=True)
        return header, packed, sa_tags
    offset = 4
    (l_text,) = struct.unpack_from("<i", data, offset)
    offset += 4
    text = data[offset:offset + l_text].split(b"\x00", 1)[0].decode()
    offset += l_text
    (n_ref,) = struct.unpack_from("<i", data, offset)
    offset += 4
    references, lengths = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, offset)
        offset += 4
        references.append(data[offset:offset + l_name - 1].decode())
        offset += l_name + 4
        lengths.append(struct.unpack_from("<i", data, offset - 4)[0])
    header = AlignmentHeader.from_text(text)
    if not header.references:
        header = AlignmentHeader(header.hd, references, lengths, text)

    # first pass: record boundaries + filters + cigar geometry
    total = len(data)
    ref_id_list: List[int] = []
    pos_list: List[int] = []
    mapq_list: List[int] = []
    flag_list: List[int] = []
    name_list: List[str] = []
    cigar_meta: List = []      # (byte offset, op count)
    seq_offsets: List[int] = []
    seq_lengths: List[int] = []
    sa_tags: List[Optional[str]] = []
    max_ops = 1

    unpack = struct.unpack_from
    while offset < total:
        (block_size,) = unpack("<i", data, offset)
        offset += 4
        (ref_id, pos, l_read_name, mapq, _bin, n_cigar_op, flag, l_seq,
         _next_ref, _next_pos, _tlen) = unpack("<iiBBHHHiiii", data, offset)
        if (flag & (FUNMAP | FSECONDARY)) == 0 and mapq >= min_mapq:
            p = offset + 32
            name_list.append(data[p:p + l_read_name - 1].decode())
            p += l_read_name
            cigar_meta.append((p, n_cigar_op))
            if n_cigar_op > max_ops:
                max_ops = n_cigar_op
            p += 4 * n_cigar_op
            seq_offsets.append(p)
            seq_lengths.append(l_seq)
            p += (l_seq + 1) // 2 + l_seq
            ref_id_list.append(ref_id)
            pos_list.append(pos)
            mapq_list.append(mapq)
            flag_list.append(flag)
            sa_tags.append(_find_sa_tag(data, p, offset + block_size))
        offset += block_size

    n = len(name_list)
    k = bucket_size(max_ops)
    cigar_words = np.zeros((n, k), dtype=np.int32)
    for row, (cigar_offset, op_count) in enumerate(cigar_meta):
        if op_count:
            cigar_words[row, :op_count] = np.frombuffer(
                data, dtype="<i4", count=op_count, offset=cigar_offset)
    if min_sv_size > 0:
        from svim_tpu.io.packing import compact_cigar_words
        compacted = compact_cigar_words(cigar_words, min_sv_size)
        if compacted is not None:
            cigar_words = compacted

    packed = build_packed(
        np.asarray(ref_id_list, dtype=np.int32),
        np.asarray(pos_list, dtype=np.int32),
        np.asarray(mapq_list, dtype=np.int32),
        np.asarray(flag_list, dtype=np.int32),
        cigar_words, name_list,
        LazySequences(data, np.asarray(seq_offsets, dtype=np.int64),
                      np.asarray(seq_lengths, dtype=np.int64)))
    return header, packed, sa_tags


def build_packed(ref_id, ref_start, mapq, flag, cigar_words, names,
                 sequences) -> PackedAlignments:
    """Assemble a PackedAlignments batch and ship the raw CIGAR words to the
    device once (BAM encoding, decoded on device).  Geometry columns
    (ref_end, qa bounds, ...) are filled by the fused COLLECT device pass
    (ops.cigar_kernel.collect_scan) on first use — fusing them with event
    compaction keeps the per-batch device round trips at one."""
    import jax.numpy as jnp

    packed = PackedAlignments(
        n=len(names), ref_id=ref_id, ref_start=ref_start, ref_end=None,
        mapq=mapq, flag=flag, qa_start=None, qa_end=None,
        read_len=None, cigar_words=cigar_words,
        names=names, sequences=sequences, records=None)
    # start the CIGAR transfer immediately (async) in the most compact
    # encoding: uint8 words + sparse overflow deltas (quarter of int32), or
    # uint16 when too many ops overflow; the kernels decode on device
    from svim_tpu.io.packing import encode_cigars_u8

    encoded = encode_cigars_u8(cigar_words) if cigar_words.size else None
    if encoded is not None:
        packed.device_cigars = tuple(jnp.asarray(part) for part in encoded)
    else:
        device_words = cigar_words
        if cigar_words.size and int(cigar_words.max()) < 65536:
            device_words = cigar_words.astype(np.uint16)
        packed.device_cigars = jnp.asarray(device_words)
    return packed
