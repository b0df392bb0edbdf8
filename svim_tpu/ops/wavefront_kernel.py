"""Batched exact Levenshtein distance via banded anti-diagonal wavefronts.

Device counterpart of the Myers edit distance (edlib's role in INS
clustering, reference: SVIM_clustering.py:45).  The DP runs as anti-diagonal
wavefronts — every cell of a wavefront depends only on the previous two
fronts, so a whole batch of pairs advances in lockstep with (B, 2W+1) vector
ops per step.  A band half-width W bounds the front; the result is exact
whenever the true distance fits the band (standard band-doubling argument),
so the host wrapper retries with doubled bands until every pair resolves.

This is the ring-attention-like structure the survey predicted for this
workload: wavefront tiling instead of attention (SURVEY.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

INF = np.int32(1 << 20)


@partial(jax.jit, static_argnames=("band",))
def banded_distance(a_codes, a_lens, b_codes, b_lens, band: int):
    """Exact distances for pairs whose edit distance <= band.

    Args:
      a_codes, b_codes: (B, L) uint8 character codes (padding arbitrary)
      a_lens, b_lens: (B,) int32 true lengths
      band: static band half-width W

    Returns (B,) int32; entries > band mean "band too small, retry".
    """
    batch, length = a_codes.shape
    k_width = 2 * band + 1
    e_offsets = jnp.arange(k_width, dtype=jnp.int32) - band  # (K,)
    m = a_lens.astype(jnp.int32)
    n = b_lens.astype(jnp.int32)

    inf_column = jnp.full((batch, 1), INF, dtype=jnp.int32)
    front_prev2 = jnp.full((batch, k_width), INF, dtype=jnp.int32)
    front_prev2 = front_prev2.at[:, band].set(0)  # D(0,0) at wavefront 0
    front_prev = jnp.full((batch, k_width), INF, dtype=jnp.int32)
    if band >= 1:
        # wavefront 1: D(1,0)=1 (e=+1) and D(0,1)=1 (e=-1) where in range
        front_prev = front_prev.at[:, band + 1].set(jnp.where(m >= 1, 1, INF))
        front_prev = front_prev.at[:, band - 1].set(jnp.where(n >= 1, 1, INF))

    answer = jnp.where(m + n == 0, 0, INF).astype(jnp.int32)
    final_k = band + (m - n)  # wavefront index of D(m, n)
    answer = jnp.where((m + n == 1) & (final_k >= 0) & (final_k < k_width),
                       1, answer)

    d_max = int(2 * length)

    def body(d, carry):
        prev2, prev, answer = carry
        d = jnp.int32(d)
        # cell coordinates along the front
        i = (d + e_offsets[None, :]) // 2          # (1, K) broadcast over batch
        j = (d - e_offsets[None, :]) // 2
        in_range = ((i >= 1) & (i <= m[:, None])
                    & (j >= 1) & (j <= n[:, None]))
        i_idx = jnp.broadcast_to(jnp.clip(i - 1, 0, length - 1).astype(jnp.int32),
                                 (batch, k_width))
        j_idx = jnp.broadcast_to(jnp.clip(j - 1, 0, length - 1).astype(jnp.int32),
                                 (batch, k_width))
        ca = jnp.take_along_axis(a_codes, i_idx, axis=1)
        cb = jnp.take_along_axis(b_codes, j_idx, axis=1)
        substitution = jnp.where(ca == cb, 0, 1).astype(jnp.int32)

        from_insert = jnp.concatenate([inf_column, prev[:, :-1]], axis=1) + 1
        from_delete = jnp.concatenate([prev[:, 1:], inf_column], axis=1) + 1
        from_match = prev2 + substitution
        front = jnp.minimum(jnp.minimum(from_insert, from_delete), from_match)

        # boundary injections: D(0, d) = d and D(d, 0) = d while d fits band
        k_top = band - d      # e = -d  (i == 0)
        k_left = band + d     # e = +d  (j == 0)
        k_index = jnp.arange(k_width, dtype=jnp.int32)[None, :]
        front = jnp.where((k_index == k_top) & (d <= n[:, None]), d, front)
        front = jnp.where((k_index == k_left) & (d <= m[:, None]), d, front)
        front = jnp.where(in_range | (k_index == k_top) | (k_index == k_left),
                          front, INF)

        finished = (d == m + n) & (final_k >= 0) & (final_k < k_width)
        final_value = jnp.take_along_axis(
            front, jnp.clip(final_k, 0, k_width - 1)[:, None], axis=1)[:, 0]
        answer = jnp.where(finished, final_value, answer)
        return prev, front, answer

    _prev2, _prev, answer = jax.lax.fori_loop(
        2, d_max + 1, body, (front_prev2, front_prev, answer))
    return answer


# --- Pallas kernel: whole banded DP inside one VMEM-resident program --------
#
# The jnp version above dispatches one XLA op-bundle per wavefront step (2L
# steps of tiny vector work — latency-bound, and the loop-carried (B, K)
# state is what crashed the axon worker at scale).  The Pallas kernel runs
# the ENTIRE d-loop inside one program with the fronts held in VMEM, and
# eliminates the per-step character gathers with a shift-register identity:
#
#     i(d+1, k) = (d+1+e_k)//2 = i(d, k+1)     (e_k = k - band)
#     j(d+1, k) = j(d, k-1)
#
# so the character window for the next front is a one-lane roll of the
# current window, with ONE new column entering at the edge — and both edges
# read the same index t = (d+band)//2 - 1 (a_codes[:, t] on the right,
# b_codes[:, t] on the left).  One dynamic column slice per step instead of
# a (B, K) gather.  The initial windows at d=2 are gathered once OUTSIDE the
# kernel (amortized over the whole loop).


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


def _wavefront_pallas_kernel(a_ref, b_ref, m_ref, n_ref, ca0_ref, cb0_ref,
                             onehot_ref, out_ref, *, band, k_width, length):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile_b = a_ref.shape[0]
    e_offsets = (jax.lax.broadcasted_iota(jnp.int32, (1, k_width), 1) - band)
    k_index = jax.lax.broadcasted_iota(jnp.int32, (1, k_width), 1)
    m = m_ref[:, 0][:, None]                      # (TB, 1)
    n = n_ref[:, 0][:, None]
    final_onehot = onehot_ref[:]                  # (TB, K) precomputed one-hot
    inf = jnp.int32(INF)

    prev2 = jnp.where(k_index == band, 0, inf)
    prev2 = jnp.broadcast_to(prev2, (tile_b, k_width)).astype(jnp.int32)
    prev = jnp.full((tile_b, k_width), inf, dtype=jnp.int32)
    if band >= 1:
        prev = jnp.where((k_index == band + 1) & (m >= 1), 1, prev)
        prev = jnp.where((k_index == band - 1) & (n >= 1), 1, prev)

    answer = jnp.where(m + n == 0, 0, inf).astype(jnp.int32)[:, 0]
    final_k = band + (m - n)                      # (TB, 1)
    answer = jnp.where(((m + n == 1) & (final_k >= 0)
                        & (final_k < k_width))[:, 0], 1, answer)

    ca = ca0_ref[:].astype(jnp.int32)
    cb = cb0_ref[:].astype(jnp.int32)
    d_stop = jnp.max(m_ref[:, 0] + n_ref[:, 0]) + 1

    def body(d, carry):
        prev2, prev, ca, cb, answer = carry
        # advance the character shift registers: roll, then insert the edge
        # columns a[i(d, K-1)-1] (right edge) and b[j(d, 0)-1] (left edge).
        # Mosaic only supports lane-aligned dynamic slices, so load the
        # 128-aligned chunk containing column t and select the lane with a
        # masked reduction.
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def load_column(ref, t):
            chunk_start = pl.multiple_of((t // 128) * 128, 128)
            window = ref[:, pl.ds(chunk_start, 128)].astype(jnp.int32)
            lane = t - chunk_start
            return jnp.sum(jnp.where(lane128 == lane, window, 0), axis=1,
                           keepdims=True)

        t_a = jnp.clip((d + (k_width - 1 - band)) // 2 - 1, 0, length - 1)
        t_b = jnp.clip((d + band) // 2 - 1, 0, length - 1)
        a_col = load_column(a_ref, t_a)                      # (TB, 1)
        b_col = load_column(b_ref, t_b)
        ca = jnp.where(k_index == k_width - 1, a_col,
                       pltpu.roll(ca, k_width - 1, 1))
        cb = jnp.where(k_index == 0, b_col, pltpu.roll(cb, 1, 1))

        i = (d + e_offsets) // 2                   # (1, K)
        j = (d - e_offsets) // 2
        in_range = (i >= 1) & (i <= m) & (j >= 1) & (j <= n)
        substitution = jnp.where(ca == cb, 0, 1)

        from_insert = jnp.where(k_index == 0, inf, pltpu.roll(prev, 1, 1)) + 1
        from_delete = jnp.where(k_index == k_width - 1, inf,
                                pltpu.roll(prev, k_width - 1, 1)) + 1
        from_match = prev2 + substitution
        front = jnp.minimum(jnp.minimum(from_insert, from_delete), from_match)

        k_top = band - d
        k_left = band + d
        front = jnp.where((k_index == k_top) & (d <= n), d, front)
        front = jnp.where((k_index == k_left) & (d <= m), d, front)
        front = jnp.where(in_range | (k_index == k_top) | (k_index == k_left),
                          front, inf)

        finished = (d == (m + n)[:, 0]) & (final_k[:, 0] >= 0) \
            & (final_k[:, 0] < k_width)
        final_value = jnp.sum(jnp.where(final_onehot, front, 0), axis=1)
        answer = jnp.where(finished, final_value, answer)
        return prev, front, ca, cb, answer

    _p2, _p, _ca, _cb, answer = jax.lax.fori_loop(
        2, d_stop, body, (prev2, prev, ca, cb, answer))
    out_ref[:, 0] = answer


@partial(jax.jit, static_argnames=("band", "tile_b", "interpret"))
def banded_distance_pallas(a_codes, a_lens, b_codes, b_lens, band: int,
                           tile_b: int = 8, interpret: bool = False):
    """Pallas version of banded_distance: same contract, whole DP in VMEM.

    a_codes/b_codes: (B, L) int32 (B divisible by tile_b); returns (B,)
    int32 with entries > band meaning "band too small, retry"."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, length = a_codes.shape
    # accept uint8 codes and upcast on device: 4x less host->device traffic
    # (matters over the tunneled TPU)
    a_codes = a_codes.astype(jnp.int32)
    b_codes = b_codes.astype(jnp.int32)
    k_width = _round_up(2 * band + 1, 128)
    m = a_lens.astype(jnp.int32)[:, None]
    n = b_lens.astype(jnp.int32)[:, None]

    # initial shift-register windows at d=2 (single gather, outside Pallas)
    e_offsets = jnp.arange(k_width, dtype=jnp.int32) - band
    i0 = jnp.clip((2 + e_offsets[None, :]) // 2 - 1, 0, length - 1)
    j0 = jnp.clip((2 - e_offsets[None, :]) // 2 - 1, 0, length - 1)
    ca0 = jnp.take_along_axis(a_codes, jnp.broadcast_to(i0, (batch, k_width)),
                              axis=1).astype(jnp.int32)
    cb0 = jnp.take_along_axis(b_codes, jnp.broadcast_to(j0, (batch, k_width)),
                              axis=1).astype(jnp.int32)
    final_k = band + (m - n)
    onehot = (jnp.arange(k_width, dtype=jnp.int32)[None, :]
              == jnp.clip(final_k, 0, k_width - 1))

    kernel = partial(_wavefront_pallas_kernel, band=band, k_width=k_width,
                     length=length)
    grid = (batch // tile_b,)

    def row_spec(cols):
        return pl.BlockSpec((tile_b, cols), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(length), row_spec(length), row_spec(1), row_spec(1),
                  row_spec(k_width), row_spec(k_width), row_spec(k_width)],
        out_specs=row_spec(1),
        out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        interpret=interpret,
    )(a_codes, b_codes, m, n, ca0, cb0, onehot)[:, 0]


_CODE_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _base in enumerate(b"ACGT"):
    _CODE_TABLE[_base] = _i


def _encode(strings, length):
    batch = len(strings)
    out = np.zeros((batch, length), dtype=np.uint8)
    for row, text in enumerate(strings):
        raw = np.frombuffer(text.encode(), dtype=np.uint8)
        out[row, :len(raw)] = raw  # raw bytes: exact comparison incl. N etc.
    return out


def _pow2_at_least(value: int, floor: int) -> int:
    result = floor
    while result < value:
        result *= 2
    return result


def _pow4_at_least(value: int, floor: int) -> int:
    result = floor
    while result < value:
        result *= 4
    return result


BATCH_CHUNK = 1024       # batch chunk at narrow bands
MAX_CELLS_PER_STEP = 1 << 18  # cap B*K: wide-front carries at B=1024 blew the
                              # axon TPU worker (VMEM-scale scan state)


def _batch_chunk_for(band: int) -> int:
    k_width = 2 * band + 1
    chunk = BATCH_CHUNK
    while chunk > 64 and chunk * k_width > MAX_CELLS_PER_STEP:
        chunk //= 2
    return chunk


def _pallas_tile_b(length: int, band: int) -> int:
    """Largest power-of-two batch tile whose VMEM working set (two code rows
    + ~6 front/window arrays) stays within ~4 MB.

    The budget must leave room for Pallas' double-buffered block pipeline
    plus kernel temporaries: the real TPU's 16 MB scoped-vmem limit was
    measured to see ~3.7x this estimate (a tile-64 length-1024 band-1024
    call demanded 16.46 MB and failed AOT compilation — round 4), so 4 MB
    here keeps the worst case near 8 MB on-chip."""
    k_width = _round_up(2 * band + 1, 128)
    bytes_per_row = 2 * length * 4 + 7 * k_width * 4
    tile = 8
    while tile * 2 * bytes_per_row <= 4 * 1024 * 1024 and tile < 256:
        tile *= 2
    return tile


def _use_pallas_default() -> bool:
    """Compiled Pallas on TPU; the jnp scan elsewhere (interpret-mode Pallas
    on CPU is orders of magnitude slower than XLA's compiled scan)."""
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def batched_edit_distance_resident(pairs, band_hints, use_pallas=None):
    """Exact edit distances that STAY ON DEVICE (device-resident INS route).

    Requires PROVEN per-pair upper bounds (`band_hints`): each pow4 band
    bucket then resolves in exactly one pass — no data-dependent host
    band-doubling loop — so the per-bucket outputs can be scattered into one
    jnp.int64 array (input order) without ever fetching values to the host.
    Downstream device consumers (ins_matrices_from_pairs ->
    agglomerate_batched) read it directly; the host sees the values only in
    the stage's single batched device_get."""
    import jax.numpy as jnp

    if use_pallas is None:
        use_pallas = _use_pallas_default()
    count = len(pairs)
    host_fill = np.zeros(count, dtype=np.int32)
    groups = {}
    for idx, (a, b) in enumerate(pairs):
        if len(a) == 0 or len(b) == 0:
            host_fill[idx] = max(len(a), len(b))
            continue
        band = _pow4_at_least(int(band_hints[idx]) + 1, 64)
        groups.setdefault(band, []).append(idx)
    out = jnp.asarray(host_fill)
    for band, indices in sorted(groups.items()):
        subset = [pairs[i] for i in indices]
        length = _pow2_at_least(max(max(len(a), len(b)) for a, b in subset),
                                512)
        band_eff = min(band, length)
        if use_pallas:
            chunk_size = max(_pallas_tile_b(length, band_eff), 8192)
        else:
            chunk_size = _batch_chunk_for(band_eff)
        for chunk_start in range(0, len(subset), chunk_size):
            chunk = subset[chunk_start:chunk_start + chunk_size]
            pad = min(chunk_size, _pow2_at_least(len(chunk), 8))
            a_codes = np.zeros((pad, length), dtype=np.uint8)
            b_codes = np.zeros((pad, length), dtype=np.uint8)
            a_codes[:len(chunk)] = _encode([a for a, _ in chunk], length)
            b_codes[:len(chunk)] = _encode([b for _, b in chunk], length)
            a_lens = np.zeros(pad, dtype=np.int32)
            b_lens = np.zeros(pad, dtype=np.int32)
            a_lens[:len(chunk)] = [len(a) for a, _ in chunk]
            b_lens[:len(chunk)] = [len(b) for _, b in chunk]
            if use_pallas:
                tile_b = _pallas_tile_b(length, band_eff)
                values = banded_distance_pallas(a_codes, a_lens, b_codes,
                                                b_lens, band_eff,
                                                tile_b=tile_b)
            else:
                values = banded_distance(a_codes, a_lens, b_codes, b_lens,
                                         band_eff)
            chunk_idx = np.asarray(indices[chunk_start:chunk_start
                                           + len(chunk)], dtype=np.int32)
            out = out.at[chunk_idx].set(
                values[:len(chunk)].astype(jnp.int32))
    return out


def batched_edit_distance(pairs, initial_band: int = 64, band_hints=None,
                          use_pallas: bool = None):
    """Exact edit distances for a list of (a, b) string pairs on the device,
    with band doubling until all pairs resolve.  Batch and length dimensions
    are padded to power-of-two buckets so repeated calls reuse compiled
    programs.

    band_hints: optional per-pair PROVEN upper bounds on the distance; pairs
    are grouped by power-of-two band and each group resolves in one pass.
    use_pallas: force the Pallas VMEM kernel (None = auto: TPU only)."""
    if not pairs:
        return []
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    results = np.full(len(pairs), -1, dtype=np.int64)
    pending = list(range(len(pairs)))
    # trivial empties
    for idx in pending[:]:
        a, b = pairs[idx]
        if len(a) == 0 or len(b) == 0:
            results[idx] = max(len(a), len(b))
            pending.remove(idx)
    band = initial_band

    def run(subset_indices, band):
        """One or more fixed-shape kernel calls: batch padded to BATCH_CHUNK
        (chunked when larger), lengths bucketed pow4 from 512, band bucketed
        pow4 from the caller's value — a handful of compiled programs total,
        which matters when each compile pays a remote round trip."""
        subset = [pairs[idx] for idx in subset_indices]
        length = max(max(len(a), len(b)) for a, b in subset)
        # pow2 buckets: the padded codes are most of the host->device
        # traffic, so tighter buckets beat fewer compile variants
        length = _pow2_at_least(max(length, 1), 512)
        band = min(band, length)  # a wider band than the strings is degenerate
        if use_pallas:
            # the Pallas grid iterates batch tiles inside ONE call, so big
            # chunks cost no extra VMEM — they just amortize the per-call
            # dispatch (a full RPC on the tunneled TPU)
            chunk_size = max(_pallas_tile_b(length, band), 8192)
        else:
            chunk_size = _batch_chunk_for(band)
        answers = np.empty(len(subset), dtype=np.int64)
        for chunk_start in range(0, len(subset), chunk_size):
            chunk = subset[chunk_start:chunk_start + chunk_size]
            a_codes = np.zeros((chunk_size, length), dtype=np.uint8)
            b_codes = np.zeros((chunk_size, length), dtype=np.uint8)
            a_codes[:len(chunk)] = _encode([a for a, _ in chunk], length)
            b_codes[:len(chunk)] = _encode([b for _, b in chunk], length)
            a_lens = np.zeros(chunk_size, dtype=np.int32)
            b_lens = np.zeros(chunk_size, dtype=np.int32)
            a_lens[:len(chunk)] = [len(a) for a, _ in chunk]
            b_lens[:len(chunk)] = [len(b) for _, b in chunk]
            if use_pallas:
                tile_b = _pallas_tile_b(length, band)
                out = np.asarray(banded_distance_pallas(
                    a_codes, a_lens, b_codes, b_lens, band, tile_b=tile_b))
            else:
                out = np.asarray(banded_distance(a_codes, a_lens, b_codes,
                                                 b_lens, band))
            answers[chunk_start:chunk_start + len(chunk)] = out[:len(chunk)]
        return answers, length

    if band_hints is not None and pending:
        # hints are PROVEN upper bounds but usually loose (e.g. s1+s2 for a
        # pair of near-identical inserts whose true distance is tiny), so a
        # cheap narrow first pass resolves the bulk before the hint-sized
        # groups run
        answers, _length = run(pending, band)
        first_leftovers = []
        for position, idx in enumerate(pending):
            if answers[position] <= band:
                results[idx] = int(answers[position])
            else:
                first_leftovers.append(idx)
        groups = {}
        for idx in first_leftovers:
            hint_band = _pow4_at_least(int(band_hints[idx]) + 1, initial_band)
            groups.setdefault(hint_band, []).append(idx)
        leftovers = []
        for hint_band, indices in sorted(groups.items()):
            answers, _length = run(indices, hint_band)
            for position, idx in enumerate(indices):
                if answers[position] <= hint_band:
                    results[idx] = int(answers[position])
                else:  # hint was not a true bound; fall through to doubling
                    leftovers.append(idx)
        pending = leftovers
        band = max(groups) * 2 if groups else band

    while pending:
        answers, length = run(pending, band)
        still_pending = []
        for position, idx in enumerate(pending):
            if answers[position] <= band:
                results[idx] = int(answers[position])
            else:
                still_pending.append(idx)
        pending = still_pending
        band *= 2
        if pending and band > 2 * length:
            # distance can never exceed max length; one final full-width pass
            answers, _ = run(pending, band)
            for position, idx in enumerate(pending):
                results[idx] = int(answers[position])
            pending = []
    return results.tolist()
