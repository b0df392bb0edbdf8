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
