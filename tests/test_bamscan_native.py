"""Field-level parity: native BAM scanner vs the pure-Python scanner core.

The native path (bam_count offset cache + thread-parallel bam_fill) must
produce identical packed columns, names, and SA tags to the Python record
walk for mixed inputs: filtered records (unmapped / secondary / low mapq),
SA tags, hard clips, and long CIGARs.
"""

import gzip
import os
import random
import tempfile

import numpy as np
import pytest

import svim_tpu.io.bamscan as bamscan
from svim_tpu.io.bam import write_bam
from svim_tpu.io.sam import AlignmentHeader, parse_sam_line


def _make_bam(tmp_dir):
    rng = random.Random(99)
    header = AlignmentHeader.from_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:2000000\n"
        "@SQ\tSN:chr2\tLN:1000000\n")
    records = []
    for index in range(300):
        flag = 0
        mapq = rng.choice([0, 10, 20, 35, 60])
        if index % 11 == 0:
            flag |= 0x100  # secondary: filtered
        if index % 17 == 0:
            flag |= 0x4    # unmapped: filtered
        parts = []
        seq_len = 0
        for _ in range(rng.randint(1, 12)):
            op = rng.choice("MIDS")
            length = rng.randint(1, 120)
            parts.append("{0}{1}".format(length, op))
            if op in "MIS":
                seq_len += length
        cigar = "".join(parts) + "25M"
        seq_len += 25
        tags = ""
        if index % 5 == 0:
            tags = "\tSA:Z:chr2,{0},+,100S200M,60,2;".format(rng.randint(1, 500000))
        line = "read{0}\t{1}\tchr1\t{2}\t{3}\t{4}\t*\t0\t0\t{5}\t*{6}".format(
            index, flag, rng.randint(1, 1_500_000), mapq, cigar,
            "ACGT" * (seq_len // 4) + "A" * (seq_len % 4), tags)
        records.append(parse_sam_line(line, header))
    records.sort(key=lambda record: record.reference_start)
    path = os.path.join(tmp_dir, "parity.bam")
    write_bam(path, header, records)
    return path


@pytest.mark.parametrize("min_sv_size", [0, 40])
def test_native_scanner_matches_python(min_sv_size):
    from svim_tpu import native

    if native.get_library() is None:
        pytest.skip("native library unavailable")
    with tempfile.TemporaryDirectory() as tmp_dir:
        path = _make_bam(tmp_dir)
        with open(path, "rb") as handle:
            data = gzip.decompress(handle.read())
        native_result = bamscan.scan_bam_bytes(data, 20, min_sv_size)
        original = native.bamscan_native
        native.bamscan_native = lambda *args, **kwargs: None
        try:
            python_result = bamscan.scan_bam_bytes(data, 20, min_sv_size)
        finally:
            native.bamscan_native = original

        header_n, packed_n, sa_n = native_result
        header_p, packed_p, sa_p = python_result
        assert header_n.references == header_p.references
        for column in ("ref_id", "ref_start", "ref_end", "mapq", "flag"):
            assert np.array_equal(np.asarray(getattr(packed_n, column)),
                                  np.asarray(getattr(packed_p, column))), column
        n = len(np.asarray(packed_n.ref_id))
        assert n > 0
        assert all(packed_n.names[row] == packed_p.names[row] for row in range(n))
        assert all(sa_n[row] == sa_p[row] for row in range(n))
        assert all(packed_n.sequences[row] == packed_p.sequences[row]
                   for row in range(0, n, 7))
        if min_sv_size == 0:
            # raw word encoding must match exactly
            assert np.array_equal(np.asarray(packed_n.cigar_words),
                                  np.asarray(packed_p.cigar_words))
        else:
            # the native path compacts rows even when the bucket does not
            # shrink, so word encodings may differ; the contract is that the
            # DERIVED signatures are identical (compaction is
            # signature-preserving — see io/packing.compact_cigar_row)
            from svim_tpu.collect.packed import signatures_from_packed
            from svim_tpu.config import parse_arguments

            options = parse_arguments(arguments=[
                "alignment", tmp_dir, path, os.path.join(tmp_dir, "nogenome.fa")])
            sigs_n, _ = signatures_from_packed(packed_n, sa_n, header_n, options)
            sigs_p, _ = signatures_from_packed(packed_p, sa_p, header_p, options)
            assert ([sig.as_string() for sig in sigs_n]
                    == [sig.as_string() for sig in sigs_p])
            assert len(sigs_n) > 0


@pytest.mark.parametrize("min_sv_size", [0, 40])
def test_fused_inflate_count_matches_two_pass(min_sv_size):
    """bam_scan_fused (inflate + count chasing the frontier) must produce the
    same inflated bytes, counts, and packed columns as the two-pass path."""
    from svim_tpu import native

    if native.get_library() is None:
        pytest.skip("native library unavailable")
    with tempfile.TemporaryDirectory() as tmp_dir:
        path = _make_bam(tmp_dir)
        with open(path, "rb") as handle:
            compressed = handle.read()
        fused = native.bam_scan_fused(compressed, 20, min_sv_size)
        assert fused is not None
        data_fused, counted = fused
        data_classic = native.bgzf_decompress_parallel(compressed)
        assert bytes(data_fused) == bytes(data_classic)

        result_fused = native.bamscan_native(data_fused, 20,
                                             bamscan.bucket_size, min_sv_size,
                                             counted=counted)
        result_classic = native.bamscan_native(data_classic, 20,
                                               bamscan.bucket_size, min_sv_size)
        assert result_fused is not None and result_classic is not None
        for field_fused, field_classic in zip(result_fused, result_classic):
            if isinstance(field_fused, np.ndarray):
                assert np.array_equal(field_fused, field_classic)
            else:
                assert field_fused == field_classic

        # end-to-end: scan_bam (which takes the fused path) vs the in-memory
        # two-pass scan of the same bytes
        header_a, packed_a, sa_a = bamscan.scan_bam(path, 20, min_sv_size)
        header_b, packed_b, sa_b = bamscan.scan_bam_bytes(data_classic, 20,
                                                          min_sv_size)
        assert header_a.references == header_b.references
        n = packed_a.n
        assert n == packed_b.n > 0
        assert np.array_equal(np.asarray(packed_a.cigar_words),
                              np.asarray(packed_b.cigar_words))
        assert all(packed_a.names[row] == packed_b.names[row] for row in range(n))
        assert all(sa_a[row] == sa_b[row] for row in range(n))


def test_batched_decoders_match_scalar():
    """slice_batch / take must produce exactly the per-call slice() /
    __getitem__ values, including clamped and empty windows."""
    rng = random.Random(7)
    with tempfile.TemporaryDirectory() as tmp_dir:
        path = _make_bam(tmp_dir)
        _header, packed, _sa = bamscan.scan_bam(path, 0, 0)
        sequences = packed.sequences
        names = packed.names
        assert hasattr(sequences, "slice_batch") and hasattr(names, "take")
        n = packed.n
        rows, starts, ends = [], [], []
        for _ in range(500):
            row = rng.randrange(n)
            length = len(sequences[row] or "")
            start = rng.randint(-5, max(0, length))
            rows.append(row)
            starts.append(start)
            ends.append(start + rng.randint(0, 80))
        batch = sequences.slice_batch(rows, starts, ends)
        scalar = [sequences.slice(row, start, end)
                  for row, start, end in zip(rows, starts, ends)]
        assert batch == scalar
        assert names.take(rows) == [names[row] for row in rows]
        assert sequences.slice_batch([], [], []) == []
        assert names.take([]) == []
