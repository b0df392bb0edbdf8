"""Batched on-device genotyping: reference-support counts as an interval join.

Device counterpart of the per-candidate fetch loop (reference:
SVIM_genotyping.py:34-94) and of the numpy join in
svim_tpu.genotype.genotype_packed.  For every candidate, the kernel scans a
fixed-size window of the coordinate-sorted alignment table (one
dynamic-slice per candidate under vmap), applies the reference's exact
qualification chain — in-window test, support-read exclusion, the
500-alignment cap counted in coordinate order, the per-type span test — and
counts DISTINCT supporting read ids via an in-register sort.

Exactness: every comparison is integer.  The only fractional quantity in the
reference is minimum_overlap = min((end-start)/2, 2000) (SVIM_genotyping.py:69);
all coordinates are pre-DOUBLED on the host so the half shows up as the
integer min(end-start, 4000) and the comparisons stay exact
(x < y - h/2  <=>  2x < 2y - h for integers).  Results are bit-identical to
the host paths — no float tolerance anywhere.

When --num_shards > 1 the candidate axis is laid out over the data mesh
(parallel/mesh.shard_batch) and GSPMD splits the batch across devices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ALIGNMENT_CAP = 500   # SVIM_genotyping.py:56
WINDOW = 1000         # SVIM_genotyping.py:49
INT_MAX = np.int32(2**31 - 1)
INT_MIN = np.int32(-2**31)
MAX_WINDOW_ROWS = 8192  # candidates needing a wider table slice fall back


def _genotype_one(lo, width, window_start2, start2, end2, min_overlap2,
                  type_class, support_sorted, starts2, ends2, ids, slice_len):
    """One candidate: (scalar params, (S,) sorted support ids) against the
    padded doubled-coordinate table -> reference-support count (int32)."""
    w_starts2 = jax.lax.dynamic_slice_in_dim(starts2, lo, slice_len)
    w_ends2 = jax.lax.dynamic_slice_in_dim(ends2, lo, slice_len)
    w_ids = jax.lax.dynamic_slice_in_dim(ids, lo, slice_len)
    index = jnp.arange(slice_len, dtype=jnp.int32)
    in_slice = index < width

    # in-window: alignment end past the window start (starts are < window
    # stop by construction of hi) — SVIM_genotyping.py:49 fetch semantics
    in_window = w_ends2 > window_start2

    # support-read exclusion via binary search in the candidate's sorted
    # support-id list (padded with INT_MAX)
    positions = jnp.searchsorted(support_sorted, w_ids)
    positions = jnp.minimum(positions, support_sorted.shape[0] - 1)
    is_support = support_sorted[positions] == w_ids

    qualifying = in_slice & in_window & ~is_support
    # the 500 cap counts qualifying alignments in coordinate order
    rank = jnp.cumsum(qualifying)
    capped = qualifying & (rank <= ALIGNMENT_CAP)

    # span tests (doubled coordinates; margins 100 -> 200)
    spans_del_inv = (((w_starts2 < end2 - min_overlap2) & (w_ends2 > end2 + 200))
                     | ((w_starts2 < start2 - 200) & (w_ends2 > start2 + min_overlap2)))
    spans_ins = (w_starts2 < start2 - 200) & (w_ends2 > end2 + 200)
    supports = jnp.where(type_class == 0, spans_del_inv, spans_ins) & capped

    # distinct read ids among supporters: sort then count boundaries
    masked_ids = jnp.where(supports, w_ids, INT_MAX)
    ordered = jnp.sort(masked_ids)
    previous = jnp.concatenate([jnp.full((1,), INT_MIN, dtype=ordered.dtype),
                                ordered[:-1]])
    return jnp.sum((ordered != INT_MAX) & (ordered != previous),
                   dtype=jnp.int32)


@partial(jax.jit, static_argnames=("slice_len",))
def genotype_support_batched(lo, width, window_start2, start2, end2,
                             min_overlap2, type_class, support_sorted,
                             starts2, ends2, ids, slice_len):
    """(C,) candidate params + (C, S) sorted support ids + padded table
    arrays -> (C,) reference-support counts."""
    return jax.vmap(partial(_genotype_one, slice_len=slice_len),
                    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None))(
        lo, width, window_start2, start2, end2, min_overlap2, type_class,
        support_sorted, starts2, ends2, ids)


def _round_up_pow2(value: int, floor: int) -> int:
    result = floor
    while result < value:
        result *= 2
    return result


class DeviceGenotypeTable:
    """Doubled-coordinate concatenated per-contig table, padded for
    clamp-free dynamic slices, plus per-contig row segments."""

    __slots__ = ("starts2", "ends2", "ids", "segments")

    def __init__(self, per_tid, pad_rows: int):
        starts_parts = []
        ends_parts = []
        id_parts = []
        self.segments = {}
        base = 0
        for tid, (starts, ends, name_ids, max_span) in sorted(per_tid.items()):
            n = len(starts)
            starts_parts.append(starts.astype(np.int64) * 2)
            ends_parts.append(ends.astype(np.int64) * 2)
            id_parts.append(name_ids)
            self.segments[tid] = (base, n, starts, max_span)
            base += n
        starts_parts.append(np.full(pad_rows, INT_MAX, dtype=np.int64))
        ends_parts.append(np.full(pad_rows, INT_MIN, dtype=np.int64))
        id_parts.append(np.full(pad_rows, INT_MAX, dtype=np.int64))
        self.starts2 = np.concatenate(starts_parts).astype(np.int32)
        self.ends2 = np.concatenate(ends_parts).astype(np.int32)
        self.ids = np.concatenate(id_parts).astype(np.int32)


def genotype_ref_support_device(jobs, per_tid, options):
    """Compute reference-support counts for a list of genotyping jobs.

    Each job is (tid, start, end, type_class, support_id_list, contig_length)
    with type_class 0 for DEL/INV and 1 for INS/DUP_INT (end==start there).
    Returns a list of int ref-support counts, or None entries for jobs the
    kernel cannot serve (window slice too wide) — the caller runs those
    through the host join.  All arithmetic is integer => bit-exact."""
    if not jobs:
        return []
    # positions are doubled into int32: contigs past 2^30 bp would overflow
    if any(length is not None and length > 2**30
           for *_head, length in jobs):
        return [None] * len(jobs)

    results = [None] * len(jobs)
    pending = []
    for job_index, (tid, start, end, type_class, support_ids,
                    contig_length) in enumerate(jobs):
        entry = per_tid.get(tid) if tid is not None and tid >= 0 else None
        if entry is None:
            results[job_index] = 0
            continue
        pending.append((job_index, tid, start, end, type_class, support_ids,
                        contig_length))
    if not pending:
        return results

    bases = {}
    base = 0
    for tid, (seg_starts, _ends, _ids, _max_span) in sorted(per_tid.items()):
        bases[tid] = base
        base += len(seg_starts)

    slice_len = 64
    rows = []
    for (job_index, tid, start, end, type_class, support_ids,
         contig_length) in pending:
        seg_starts, _seg_ends, _seg_ids, max_span = per_tid[tid]
        window_start = max(0, start - WINDOW)
        window_stop = min(contig_length, end + WINDOW)
        hi = int(np.searchsorted(seg_starts, window_stop, side="left"))
        lo = int(np.searchsorted(seg_starts, window_start - max_span,
                                 side="left"))
        width = hi - lo
        if width > MAX_WINDOW_ROWS:
            continue  # stays None -> host fallback
        slice_len = max(slice_len, width)
        rows.append((job_index, bases[tid] + lo, width, window_start, start,
                     end, type_class, support_ids))
    if not rows:
        return results

    slice_len = _round_up_pow2(slice_len, 64)
    # pad the table by slice_len so lo + slice_len never clamps
    prepared_table = DeviceGenotypeTable(per_tid, pad_rows=slice_len)

    c = len(rows)
    c_pad = _round_up_pow2(c, 8)
    s_pad = _round_up_pow2(max(1, max(len(r[7]) for r in rows)), 8)
    lo = np.zeros(c_pad, dtype=np.int32)
    width = np.zeros(c_pad, dtype=np.int32)
    window_start2 = np.zeros(c_pad, dtype=np.int32)
    start2 = np.zeros(c_pad, dtype=np.int32)
    end2 = np.zeros(c_pad, dtype=np.int32)
    min_overlap2 = np.zeros(c_pad, dtype=np.int32)
    type_class = np.zeros(c_pad, dtype=np.int32)
    support_sorted = np.full((c_pad, s_pad), INT_MAX, dtype=np.int32)
    for row_index, (job_index, row_lo, row_width, row_ws, row_start, row_end,
                    row_class, support_ids) in enumerate(rows):
        lo[row_index] = row_lo
        width[row_index] = row_width
        window_start2[row_index] = 2 * row_ws
        start2[row_index] = 2 * row_start
        end2[row_index] = 2 * row_end
        # minimum_overlap = min((end-start)/2, 2000), doubled => integer
        min_overlap2[row_index] = min(row_end - row_start, 4000)
        type_class[row_index] = row_class
        if support_ids:
            support_sorted[row_index, :len(support_ids)] = np.sort(
                np.asarray(support_ids, dtype=np.int32))

    arrays = (lo, width, window_start2, start2, end2, min_overlap2, type_class,
              support_sorted)
    num_shards = getattr(options, "num_shards", 1)
    if num_shards > 1:
        from svim_tpu.parallel.mesh import shard_batch
        arrays = shard_batch(num_shards, *arrays)
    counts = np.asarray(genotype_support_batched(
        *arrays, prepared_table.starts2, prepared_table.ends2,
        prepared_table.ids, slice_len))
    for row_index, row in enumerate(rows):
        results[row[0]] = int(counts[row_index])
    return results
