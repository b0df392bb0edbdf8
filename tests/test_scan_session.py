"""Incremental scan session: the round-4 native ingest component.

The session (native bam_scan_session_*) runs the whole-file fused
inflate+walk on background threads and hands record ranges to the caller
incrementally; collect_soa_pipelined builds the one-shot COLLECT on it.
These tests pin (a) column-for-column equality with the classic one-shot
scanner across batch boundaries, (b) the pooled-buffer size contract (a
pooled buffer's CAPACITY must never leak into the walk length — the round-4
heap-corruption class), and (c) pipelined-vs-classic signature parity."""

import numpy as np
import pytest

from svim_tpu import native
from svim_tpu.io.packing import bucket_size

pytestmark = pytest.mark.skipif(native.get_library() is None,
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from svim_tpu.sim import SimConfig, simulate

    out = tmp_path_factory.mktemp("scansession")
    genome, bam, _ = simulate(str(out), SimConfig(
        seed=31, genome_length=500_000, second_contig_length=200_000,
        coverage=6, n_del=3, n_ins=3, n_inv=2, n_tan=2, n_dup_int=1,
        n_bnd=2, n_background=60))
    return str(out), bam, genome


def _oracle_columns(bam, min_mapq, min_sv_size):
    with open(bam, "rb") as handle:
        compressed = handle.read()
    data, counted = native.bam_scan_fused(compressed, min_mapq, min_sv_size)
    result = native.bamscan_native(data, min_mapq, bucket_size, min_sv_size,
                                   counted=counted)
    return compressed, bytes(data), result


def test_session_matches_oneshot_scanner(dataset):
    _out, bam, _genome = dataset
    compressed, oracle_data, oracle = _oracle_columns(bam, 20, 40)
    (_t, _r, _l, cw0, rid0, pos0, mq0, fl0, no0, nl0, so0, sl0, sao0,
     sal0) = oracle

    for batch in (64, 1000, 1 << 20):   # many boundaries ... single batch
        session = native.BamScanSession(compressed, 20, 40)
        total = 0
        while True:
            row_start, n, max_ops, _body, done = session.next_rows(batch)
            if n:
                k = bucket_size(max(1, max_ops))
                (cw, rid, pos, mq, fl, no, nl, so, sl, sao,
                 sal) = session.fill(row_start, n, k)
                rows = slice(row_start, row_start + n)
                assert np.array_equal(rid, rid0[rows])
                assert np.array_equal(pos, pos0[rows])
                assert np.array_equal(mq, mq0[rows])
                assert np.array_equal(fl, fl0[rows])
                assert np.array_equal(no, no0[rows])
                assert np.array_equal(nl, nl0[rows])
                assert np.array_equal(so, so0[rows])
                assert np.array_equal(sl, sl0[rows])
                assert np.array_equal(sao, sao0[rows])
                assert np.array_equal(sal, sal0[rows])
                kk = min(k, cw0.shape[1])
                assert np.array_equal(cw[:, :kk], cw0[rows][:, :kk])
                if k < cw0.shape[1]:
                    assert not cw0[rows][:, kk:].any()
                total += n
            if done:
                break
        assert bytes(session.data) == oracle_data
        assert total == len(rid0)
        session.close()


def test_session_rejects_non_bgzf():
    with pytest.raises(ValueError):
        native.BamScanSession(b"not a bam at all", 0, 0)


def test_session_truncated_stream_raises(dataset):
    _out, bam, _genome = dataset
    with open(bam, "rb") as handle:
        compressed = handle.read()
    # keep whole BGZF blocks but cut the BAM record stream mid-record by
    # dropping the EOF block AND truncating: inflate of a half block fails
    session = None
    truncated = compressed[:len(compressed) // 2]
    try:
        session = native.BamScanSession(truncated, 20, 40)
    except ValueError:
        return   # rejected at block scan: fine
    with pytest.raises(ValueError):
        while True:
            _rs, n, _mo, _b, done = session.next_rows(1 << 20)
            if done:
                break
    session.close()


def test_pipelined_collect_matches_classic(dataset):
    """collect_soa_pipelined == scan_bam + signatures_from_packed_soa,
    signature for signature, across multiple batches."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from svim_tpu.collect.packed import (
        collect_soa_pipelined,
        signatures_from_packed_soa,
    )
    from svim_tpu.config import parse_arguments
    from svim_tpu.io.bamscan import scan_bam
    from svim_tpu.sigtable import SIG_TYPES

    out, bam, genome = dataset
    options = parse_arguments(arguments=["alignment", out, bam, genome,
                                         "--batch_reads", "64"])
    header, packed, sa_tags = scan_bam(bam, options.min_mapq,
                                       options.min_sv_size)
    classic_soa, classic_twins = signatures_from_packed_soa(
        packed, sa_tags, header, options)
    _h, table, soa, twins = collect_soa_pipelined(bam, options)
    for sig_type in SIG_TYPES:
        a, b = classic_soa.tables[sig_type], soa.tables[sig_type]
        assert a.n == b.n, sig_type
        assert ([s.as_string() for s in a.materialize_list(range(a.n))]
                == [s.as_string() for s in b.materialize_list(range(b.n))])
    assert ([t.as_string() for t in classic_twins]
            == [t.as_string() for t in twins])
    assert len(table.names) == packed.n
