"""On-device average-linkage flat clustering over padded partitions.

Device counterpart of scipy's linkage+fcluster as used by CLUSTER
(reference: SVIM_clustering.py:170-171) and of the host implementation in
svim_tpu.cluster.linkage.  Each partition is a fixed (P, P) distance matrix
(P <= 128 after the reference's subsampling cap), so the whole agglomeration
fits one VMEM tile: P-1 masked argmin+update steps under fori_loop, batched
over partitions with vmap.

Average linkage is monotone, so merging stops (becomes a no-op) once the
global minimum exceeds the cut threshold; the surviving representatives are
the flat clusters at that threshold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.0e38)


def _cluster_one(distance, valid, threshold):
    """(P, P) float32 distances, (P,) bool valid -> (P,) int32 labels
    (representative index per element; padded entries label themselves)."""
    p = distance.shape[0]
    index = jnp.arange(p, dtype=jnp.int32)
    eye = jnp.eye(p, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & ~eye
    d = jnp.where(pair_valid, distance.astype(jnp.float32), BIG)
    sizes = jnp.where(valid, 1, 0).astype(jnp.float32)
    parent = index  # cluster representative per element

    def body(_step, carry):
        d, sizes, parent, active = carry
        flat = jnp.argmin(d)
        i = (flat // p).astype(jnp.int32)
        j = (flat % p).astype(jnp.int32)
        lo = jnp.minimum(i, j)
        hi = jnp.maximum(i, j)
        best = d[lo, hi]
        do_merge = best <= threshold

        size_lo = sizes[lo]
        size_hi = sizes[hi]
        merged_row = (size_lo * d[lo, :] + size_hi * d[hi, :]) / (size_lo + size_hi)
        keep_big = (d[lo, :] >= BIG) | (d[hi, :] >= BIG)
        merged_row = jnp.where(keep_big, BIG, merged_row)

        new_d = d.at[lo, :].set(jnp.where(do_merge, merged_row, d[lo, :]))
        new_d = new_d.at[:, lo].set(jnp.where(do_merge, merged_row, d[:, lo]))
        # deactivate hi and the lo diagonal
        row_mask = (index == hi)[:, None] | (index == hi)[None, :] | eye
        new_d = jnp.where(do_merge & row_mask, BIG, new_d)

        new_sizes = sizes.at[lo].set(jnp.where(do_merge, size_lo + size_hi, size_lo))
        new_sizes = new_sizes.at[hi].set(jnp.where(do_merge, 0.0, size_hi))
        new_parent = jnp.where(do_merge & (parent == hi), lo, parent)
        new_active = active - jnp.where(do_merge, 1, 0)
        return new_d, new_sizes, new_parent, new_active

    n_active = jnp.sum(valid.astype(jnp.int32))
    d, sizes, parent, _ = jax.lax.fori_loop(
        0, p - 1, body, (d, sizes, parent, n_active))
    return parent


@partial(jax.jit, static_argnames=())
def average_linkage_labels_batched(distances, valid, threshold):
    """(B, P, P) distances + (B, P) valid -> (B, P) int32 representative
    labels after cutting average-linkage dendrograms at `threshold`."""
    return jax.vmap(_cluster_one, in_axes=(0, 0, None))(distances, valid,
                                                        threshold)
