"""CIGAR compaction differential tests.

Compaction (io/packing.compact_cigar_row, native cigar_compact_*) collapses
sub-threshold op runs into synthetic advance ops (codes 9/10, merged N).
These tests drive the REAL jitted COLLECT kernels (ops/cigar_kernel) over raw
and compacted encodings of the same CIGARs and require identical outputs:
events (positions, lengths, kinds, order) and all geometry columns.
"""

import random

import numpy as np
import pytest

from svim_tpu.io.packing import (
    bucket_size,
    compact_cigar_row,
    compact_cigar_words,
)

THRESHOLD = 40


def _random_cigar(rng):
    ops = []
    if rng.random() < 0.3:
        ops.append((5, rng.randint(1, 100)))
    if rng.random() < 0.5:
        ops.append((4, rng.randint(1, 500)))
    for _ in range(rng.randint(1, 40)):
        op = rng.choice([0, 1, 2, 1, 2, 0, 7, 8, 3, 6])
        length = rng.choice([0, rng.randint(1, THRESHOLD - 1),
                             rng.randint(THRESHOLD, 5000)])
        ops.append((op, length))
    if rng.random() < 0.5:
        ops.append((4, rng.randint(1, 500)))
    if rng.random() < 0.3:
        ops.append((5, rng.randint(1, 100)))
    return ops


def _words(ops):
    return [(length << 4) | op for op, length in ops]


def _batch(rows):
    k = bucket_size(max(len(row) for row in rows))
    out = np.zeros((len(rows), k), dtype=np.int32)
    for i, row in enumerate(rows):
        out[i, :len(row)] = row
    return out


def _run_kernels(words_batch, ref_start):
    import jax

    from svim_tpu.ops.cigar_kernel import collect_scan

    outputs = collect_scan(words_batch, ref_start, np.int32(THRESHOLD),
                           max_events=1024)
    return [np.asarray(part) for part in jax.device_get(outputs)]


def test_kernel_outputs_identical_on_compacted_batch():
    rng = random.Random(1234)
    raw_rows = [_words(_random_cigar(rng)) for _ in range(200)]
    compact_rows = []
    shrunk = 0
    for row in raw_rows:
        compacted = compact_cigar_row(row, THRESHOLD)
        if compacted is not None:
            shrunk += 1
            compact_rows.append(compacted)
        else:
            compact_rows.append(row)
    assert shrunk > 100  # compaction must actually engage on this workload

    ref_start = np.arange(200, dtype=np.int32) * 1000
    raw_out = _run_kernels(_batch(raw_rows), ref_start)
    compact_out = _run_kernels(_batch(compact_rows), ref_start)

    # geometry columns: ref_end, read_len, qa_start, qa_end, has_hard_clip
    for raw_col, compact_col in zip(raw_out[:5], compact_out[:5]):
        np.testing.assert_array_equal(raw_col, compact_col)
    # events: identical count, rows, prefix positions, lengths, kinds, order
    raw_count, compact_count = int(raw_out[10]), int(compact_out[10])
    assert raw_count == compact_count
    for raw_col, compact_col in zip(raw_out[5:10], compact_out[5:10]):
        np.testing.assert_array_equal(raw_col[:raw_count],
                                      compact_col[:raw_count])


def test_native_matches_python_reference():
    native = pytest.importorskip("svim_tpu.native")
    if native.get_library() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(99)
    rows, offsets, counts, flat = [], [], [], []
    position = 0
    for _ in range(500):
        row = _words(_random_cigar(rng))
        rows.append(row)
        offsets.append(position * 4)
        counts.append(len(row))
        flat.extend(row)
        position += len(row)
    buffer = np.asarray(flat, dtype=np.uint32).tobytes()
    batch = native.cigar_compact_rows(buffer, offsets, counts, THRESHOLD,
                                      bucket_size)
    assert batch is not None
    for i, row in enumerate(rows):
        compacted = compact_cigar_row(row, THRESHOLD)
        expected = [w for w in (compacted if compacted is not None else row)
                    if w != 0]
        got = [int(w) for w in batch[i] if w != 0]
        assert got == expected, f"row {i}"


def test_batch_compaction_shrinks_long_reads():
    # a 2048-op read with two SV events compacts to a handful of words
    row = []
    for _ in range(1000):
        row.append((0, 30))
        row.append((2, 5))
    row.insert(500, (2, 500))   # DEL event
    row.insert(1500, (1, 200))  # INS event
    words = _words(row)
    batch = compact_cigar_words(_batch([words]), THRESHOLD)
    assert batch is not None
    assert batch.shape[1] == 32
    ops = [int(w) & 0xF for w in batch[0] if w]
    assert ops.count(2) == 1 and ops.count(1) == 1


def test_zero_and_padding_ops_preserved():
    # interior zero-length ops and nonzero P ops must not perturb geometry
    words = _words([(4, 10), (6, 5), (0, 100), (0, 0), (4, 7), (2, 80),
                    (3, 30), (0, 50), (4, 20)])
    compacted = compact_cigar_row(words, THRESHOLD)
    batch_raw = _batch([words])
    batch_compact = _batch([compacted if compacted is not None else words])
    ref_start = np.zeros(1, dtype=np.int32)
    raw_out = _run_kernels(batch_raw, ref_start)
    compact_out = _run_kernels(batch_compact, ref_start)
    for raw_col, compact_col in zip(raw_out[:5], compact_out[:5]):
        np.testing.assert_array_equal(raw_col, compact_col)
    assert int(raw_out[10]) == int(compact_out[10])
