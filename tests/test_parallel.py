"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from svim_tpu.ops.distance_kernel import span_position_matrix
from svim_tpu.parallel.mesh import build_pipeline_step, make_mesh


@pytest.mark.parametrize("n_devices", [1, 2, 4, 8])
def test_pipeline_step_compiles_and_runs(n_devices):
    mesh = make_mesh(n_devices)
    step = build_pipeline_step(mesh)
    n = 8 * n_devices
    k = 128
    cigar_words = np.zeros((n, k), dtype=np.int32)
    cigar_words[:, 0] = (50 << 4) | 0
    cigar_words[:, 1] = (60 << 4) | 2
    cigar_words[:, 2] = (50 << 4) | 0
    ref_start = np.arange(n, dtype=np.int32) * 10
    ref_end = ref_start + 160
    loci = np.asarray([[0, 10_000], [100_000, 100_100]], dtype=np.int32)
    starts, lengths, distance, depth = jax.device_get(
        step(cigar_words, ref_start, ref_end, loci))
    # every read contributes one DEL event with start = ref_start + 50
    found = sorted(s for s in starts.tolist() if s >= 0)
    assert found == sorted((ref_start + 50).tolist())
    assert int(depth[0]) == n
    assert int(depth[1]) == 0


def test_depth_psum_matches_serial():
    mesh = make_mesh(4)
    step = build_pipeline_step(mesh)
    n, k = 32, 128
    rng = np.random.default_rng(7)
    cigar_words = np.zeros((n, k), dtype=np.int32)
    cigar_words[:, 0] = (100 << 4) | 0
    ref_start = rng.integers(0, 5000, size=n, dtype=np.int32)
    ref_end = ref_start + 100
    loci = np.asarray([[1000, 1200], [2000, 2500], [4800, 4900]], dtype=np.int32)
    _s, _l, _d, depth = jax.device_get(
        step(cigar_words, ref_start, ref_end, loci))
    for i, (locus_start, locus_end) in enumerate(loci.tolist()):
        expected = int(np.sum((ref_start < locus_end) & (ref_end > locus_start)))
        assert int(depth[i]) == expected


def test_span_position_matrix_matches_host():
    from svim_tpu.cluster.accel import distance_matrix
    from svim_tpu.config import parse_arguments
    from svim_tpu.signatures import SignatureDeletion

    rng = np.random.default_rng(3)
    n = 24
    starts = rng.integers(1000, 2000, size=n)
    ends = starts + rng.integers(50, 500, size=n)
    sigs = [SignatureDeletion("chr1", int(s), int(e), "cigar", "r{0}".format(i))
            for i, (s, e) in enumerate(zip(starts, ends))]
    options = parse_arguments(arguments=["alignment", ".", "x.bam", "g.fa"])
    host = distance_matrix(sigs, "DEL", None, options)

    pad = 128
    starts_pad = np.zeros((1, pad), dtype=np.int32)
    ends_pad = np.zeros((1, pad), dtype=np.int32)
    reads = np.arange(pad, dtype=np.int32)[None]
    valid = np.zeros((1, pad), dtype=bool)
    starts_pad[0, :n] = starts
    ends_pad[0, :n] = ends
    valid[0, :n] = True
    device = np.asarray(span_position_matrix(
        starts_pad, ends_pad, reads, valid,
        np.float32(options.position_distance_normalizer)))[0, :n, :n]
    np.testing.assert_allclose(device, host, rtol=1e-6)


def test_span_position_matrix_pallas_interpret():
    """The Pallas tile kernel computes the same matrices as the jnp version
    (interpret mode runs the kernel on any backend)."""
    from svim_tpu.ops.distance_kernel import span_position_matrix_pallas

    rng = np.random.default_rng(11)
    starts = rng.integers(1000, 2000, size=(3, 128)).astype(np.int32)
    ends = starts + rng.integers(50, 500, size=(3, 128)).astype(np.int32)
    reads = np.tile(np.arange(128, dtype=np.int32) % 60, (3, 1))
    valid = np.ones((3, 128), bool)
    valid[0, 100:] = False
    pallas_out = np.asarray(span_position_matrix_pallas(
        starts, ends, reads, valid, np.float32(900.0), interpret=True))
    jnp_out = np.asarray(span_position_matrix(
        starts, ends, reads, valid, np.float32(900.0)))
    np.testing.assert_allclose(pallas_out, jnp_out, rtol=1e-5, atol=1e-5)
