"""Multi-process (multi-host) execution tests.

Launches REAL separate processes wired through jax.distributed (CPU backend,
4 virtual devices per process) and asserts the distributed pipeline's
variants.vcf is byte-identical to the single-process run — process-boundary
gathers included (SURVEY.md §7.1 step 7; BASELINE 2-host target)."""

import os
import socket
import subprocess
import sys

import pytest

from svim_tpu.io.bamrange import BamRangePlan, scan_bam_range
from svim_tpu.sim import SimConfig, simulate

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("multihost")
    config = SimConfig(genome_length=600_000, second_contig_length=200_000,
                       coverage=6, n_del=4, n_ins=4, n_inv=2, n_tan=2,
                       n_dup_int=2, n_bnd=2, n_background=50, seed=23)
    genome, bam, _ = simulate(str(out), config)
    return str(out), bam, genome


def test_range_scan_tiles_exactly(dataset):
    """Per-process record ranges tile the file: concatenation equals the
    whole-file scan for several process counts."""
    import numpy as np

    _, bam, _ = dataset
    from svim_tpu.io.bamscan import scan_bam
    _, full, _ = scan_bam(bam, 20, 40)
    full_names = list(full.names.take(np.arange(full.n)))
    for world in (2, 3, 4, 7):
        names = []
        for rank in range(world):
            _, packed, _ = scan_bam_range(bam, world, rank, 20, 40)
            if packed.n:
                names.extend(packed.names.take(np.arange(packed.n)))
        assert names == full_names, "world={0}".format(world)


def test_block_ranges_cover_and_disjoint(dataset):
    _, bam, _ = dataset
    plan = BamRangePlan(bam)
    n_blocks = len(plan.block_offsets) - 1
    for world in (2, 5):
        edges = [plan.block_range(world, rank) for rank in range(world)]
        assert edges[0][0] == 0
        assert edges[-1][1] == n_blocks
        for (_, hi), (lo, _) in zip(edges, edges[1:]):
            assert hi == lo


def _run_rank(wd, bam, genome, coordinator, world, rank, extra=()):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "SVIM_COORDINATOR": coordinator,
        "SVIM_NUM_PROCESSES": str(world),
        "SVIM_PROCESS_ID": str(rank),
        "PYTHONPATH": REPO_ROOT,
    })
    return subprocess.Popen(
        [sys.executable, "-m", "svim_tpu", "alignment", wd, bam, genome,
         "--distributed", "--device_backend", "cpu"] + list(extra),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _read_vcf(path):
    with open(path) as handle:
        return [line for line in handle if not line.startswith("##fileDate")]


@pytest.mark.slow
def test_two_process_vcf_parity(dataset):
    out, bam, genome = dataset

    # single-process reference run
    wd_single = os.path.join(out, "wd_single")
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO_ROOT})
    proc = subprocess.run(
        [sys.executable, "-m", "svim_tpu", "alignment", wd_single, bam, genome,
         "--device_backend", "cpu"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    # 2-process distributed run (4 virtual devices each -> 8-device mesh)
    wd_multi = os.path.join(out, "wd_multi")
    coordinator = "127.0.0.1:{0}".format(_free_port())
    ranks = [_run_rank(wd_multi, bam, genome, coordinator, 2, rank)
             for rank in range(2)]
    outputs = []
    for proc in ranks:
        stdout, _ = proc.communicate(timeout=600)
        outputs.append(stdout)
    for rank, proc in enumerate(ranks):
        assert proc.returncode == 0, "rank {0}:\n{1}".format(rank, outputs[rank])

    single = _read_vcf(os.path.join(wd_single, "variants.vcf"))
    multi = _read_vcf(os.path.join(wd_multi, "variants.vcf"))
    assert multi == single


@pytest.mark.slow
def test_two_process_dryrun_multichip():
    """__graft_entry__.dryrun_multichip joins a 2-process runtime and runs
    the sharded COLLECT + clustering steps over an 8-device mesh whose
    all_gather/psum cross the process boundary."""
    coordinator = "127.0.0.1:{0}".format(_free_port())
    code = ("import sys; sys.path.insert(0, {0!r});"
            "import __graft_entry__ as g; g.dryrun_multichip(8);"
            "print('DRYRUN_OK')").format(REPO_ROOT)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "SVIM_COORDINATOR": coordinator,
            "SVIM_NUM_PROCESSES": "2",
            "SVIM_PROCESS_ID": str(rank),
            "PYTHONPATH": REPO_ROOT,
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    for rank, proc in enumerate(procs):
        stdout, _ = proc.communicate(timeout=600)
        assert proc.returncode == 0 and "DRYRUN_OK" in stdout, \
            "rank {0}:\n{1}".format(rank, stdout)


def test_parse_header_end_short_data_returns_none():
    """A valid BAM whose first block inflates to 4-11 bytes must return None
    (inflate more), not raise 'not a BAM stream' (ADVICE round 3)."""
    from svim_tpu.io.bamrange import parse_header_end

    assert parse_header_end(b"BAM\x01") is None
    assert parse_header_end(b"BAM\x01\x00\x00\x00") is None
    assert parse_header_end(b"BA") is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_header_end(b"XXXX\x00\x00\x00\x00\x00\x00\x00\x00")


def test_soa_exchange_round_trip(dataset):
    """The fixed-dtype column exchange (VERDICT r3 #5: no pickled objects)
    reproduces tables, twins, and genotype columns exactly, and the merged
    SoA clusters identically to the original."""
    import numpy as np

    out, bam, genome = dataset
    from svim_tpu.cluster import cluster_sv_signatures
    from svim_tpu.collect.packed import collect_soa_from_bam
    from svim_tpu.config import parse_arguments
    from svim_tpu.parallel.multihost import (
        arrays_to_bytes,
        bytes_to_arrays,
        merge_gathered_soa,
        soa_to_arrays,
    )
    from svim_tpu.sigtable import SIG_TYPES

    options = parse_arguments(arguments=["alignment", out, bam, genome,
                                         "--all_bnds"])
    header, table, soa, twins = collect_soa_from_bam(bam, options)
    geno = {"ref_id": np.asarray(table.ref_id, np.int32),
            "ref_start": np.asarray(table.ref_start, np.int64),
            "ref_end": np.asarray(table.ref_end, np.int64),
            "mapq": np.asarray(table.mapq, np.int32),
            "flag": np.zeros(len(table.ref_id), np.int32),
            "names": list(table.names)}
    blob = arrays_to_bytes(soa_to_arrays(soa, twins, geno))
    merged_soa, merged_twins, merged_geno = merge_gathered_soa(
        [bytes_to_arrays(blob)])

    for sig_type in SIG_TYPES:
        original = soa.tables[sig_type]
        rebuilt = merged_soa.tables[sig_type]
        assert original.n == rebuilt.n
        assert ([s.as_string() for s in
                 original.materialize_list(range(original.n))]
                == [s.as_string() for s in
                    rebuilt.materialize_list(range(rebuilt.n))])
    assert ([t.as_string() for t in twins]
            == [t.as_string() for t in merged_twins])
    assert merged_geno.names == geno["names"]

    first = cluster_sv_signatures(soa, options)
    second = cluster_sv_signatures(merged_soa, options)
    for original_list, rebuilt_list in zip(first, second):
        assert len(original_list) == len(rebuilt_list)
        for a, b in zip(original_list, rebuilt_list):
            entry_a = (a.get_bed_entries() if hasattr(a, "get_bed_entries")
                       else a.get_bed_entry())
            entry_b = (b.get_bed_entries() if hasattr(b, "get_bed_entries")
                       else b.get_bed_entry())
            assert entry_a == entry_b


def test_sharded_cluster_matches_unsharded(dataset):
    """cluster_sv_signatures_sharded at world=1 (every partition owned)
    produces cluster lists identical to the standard driver — the position
    re-grouping round trip is a no-op on content."""
    out, bam, genome = dataset
    from svim_tpu.cluster import cluster_sv_signatures
    from svim_tpu.collect.packed import collect_soa_from_bam
    from svim_tpu.config import parse_arguments
    from svim_tpu.parallel.cluster_shard import cluster_sv_signatures_sharded

    options = parse_arguments(arguments=["alignment", out, bam, genome])
    _header, _table, soa, _twins = collect_soa_from_bam(bam, options)
    reference_clusters = cluster_sv_signatures(soa, options)
    sharded_clusters = cluster_sv_signatures_sharded(soa, options)
    for original_list, sharded_list in zip(reference_clusters,
                                           sharded_clusters):
        assert len(original_list) == len(sharded_list)
        for a, b in zip(original_list, sharded_list):
            entry_a = (a.get_bed_entries() if hasattr(a, "get_bed_entries")
                       else a.get_bed_entry())
            entry_b = (b.get_bed_entries() if hasattr(b, "get_bed_entries")
                       else b.get_bed_entry())
            assert entry_a == entry_b


def test_range_pipelined_collect_tiles_exactly(dataset):
    """collect_soa_pipelined_range (the session-backed rank COLLECT) tiles
    the file: concatenating per-rank signature tables and genotype columns
    in rank order equals the single-process pipelined collect, for several
    process counts including ones that leave some rank nearly/fully empty."""
    import numpy as np

    out, bam, genome = dataset
    from svim_tpu.collect.packed import (
        collect_soa_pipelined,
        collect_soa_pipelined_range,
    )
    from svim_tpu.config import parse_arguments

    from svim_tpu.parallel.multihost import (
        _table_genotype_columns,
        merge_gathered_soa,
        soa_to_arrays,
    )

    options = parse_arguments(arguments=["alignment", out, bam, genome])
    _header, table, soa, twins = collect_soa_pipelined(bam, options)
    full_sigs = [s.as_string() for s in soa.materialize_all()]
    full_names = list(table.names)
    for world in (2, 3, 7):
        gathered = []
        for rank in range(world):
            _h, r_table, r_soa, r_twins = collect_soa_pipelined_range(
                bam, options, world, rank)
            gathered.append(soa_to_arrays(r_soa, r_twins,
                                          _table_genotype_columns(r_table)))
        merged_soa, merged_twins, merged_geno = merge_gathered_soa(gathered)
        assert ([s.as_string() for s in merged_soa.materialize_all()]
                == full_sigs), "world={0}".format(world)
        assert merged_geno.names == full_names, "world={0}".format(world)
        assert np.array_equal(np.asarray(merged_geno.ref_start),
                              np.asarray(table.ref_start))
        assert len(merged_twins) == len(twins)


def test_consensus_outcome_exchange_round_trip():
    """exchange_consensus_outcomes at world=1 must hand back exactly what
    was computed locally (the transport encodes statuses, coordinates, and
    consensus strings in fixed dtypes)."""
    from svim_tpu.parallel.multihost import exchange_consensus_outcomes

    local = {
        0: (0, (1234, 56, "ACGTACGT")),
        2: (1, ()),
        5: (0, (99, 0, "")),
        7: (4, ()),
    }
    merged = exchange_consensus_outcomes(local)
    assert merged == local
