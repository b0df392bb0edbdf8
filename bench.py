#!/usr/bin/env python3
"""svim-tpu benchmark: aligned reads/s through signature extraction + clustering.

Workload: synthetic long-read BAM (ONT-like CIGARs with embedded SVs, split
reads with SA tags).  Baseline: the ACTUAL single-core SVIM v2.0.0 — the
unmodified reference code under /root/reference run against this repo's
pysam shim (tests/shims; its record accessors are memoized one-pass
computations, approximating pysam's C-backed properties) — timed over the
same COLLECT+CLUSTER stages, plus a measured strict lower bound for the BAM
ingest real pysam pays inside COLLECT.  When the reference tree is absent
the baseline falls back to this repo's sequential host port of the same
loops.  Array path: packed BAM scan + device kernels on whatever
jax.devices() provides.

Prints ONE JSON line:
  {"metric": ..., "value": reads/s, "unit": "reads/s", "vs_baseline": x}
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_READS = int(os.environ.get("SVIM_BENCH_READS", "8192"))
# 0 = run the baseline over the full workload (fair: clustering cost is
# nonlinear in signature density, so subsampled baselines extrapolate wrong)
BASELINE_SAMPLE = int(os.environ.get("SVIM_BENCH_BASELINE_READS", "0"))
READ_LENGTH_OPS = 3000          # CIGAR ops per read (ONT-like noise)
REPEATS = int(os.environ.get("SVIM_BENCH_REPEATS", "9"))


COVERAGE = 24          # reads supporting each simulated SV locus
# SV loci scale with the read count (constant SV density, like real genomes:
# deeper total input = proportionally more loci at the same coverage)
N_DEL_LOCI = max(8, N_READS // 85)
N_INS_LOCI = max(8, N_READS // 85)
GENOME_SPAN = max(12_000_000, N_READS * 6_000)


def _noisy_cigar(rng, sv=None):
    """ONT-like CIGAR: many 1-8 bp indels; optionally one embedded SV op.
    Returns (cigar, seq_len, ref_len, sv_seq_pos, ref_before_sv) where
    ref_before_sv is the reference length consumed before the SV op — the
    caller anchors the read so the SV lands at the locus position (real
    variants have ONE genomic position; alignment jitter is small)."""
    parts = []
    seq_len = 0
    ref_len = 0
    sv_seq_pos = -1
    ref_before_sv = -1
    half = READ_LENGTH_OPS // 2
    sv_at = rng.randint(half // 4, 3 * half // 4) if sv else -1
    for k in range(half):
        m = rng.randint(3, 15)
        parts.append("{0}M".format(m))
        seq_len += m
        ref_len += m
        if k == sv_at:
            op, length = sv
            parts.append("{0}{1}".format(length, op))
            ref_before_sv = ref_len
            if op == "I":
                sv_seq_pos = seq_len
                seq_len += length
            else:
                ref_len += length
            continue
        op = rng.choice("ID")
        length = rng.randint(1, 8)
        parts.append("{0}{1}".format(length, op))
        if op == "I":
            seq_len += length
        else:
            ref_len += length
    parts.append("20M")
    seq_len += 20
    ref_len += 20
    return "".join(parts), seq_len, ref_len, sv_seq_pos, ref_before_sv


def make_workload(tmp_dir):
    """Synthetic BAM with realistic coverage pileups: DEL and INS loci each
    supported by ~COVERAGE reads (shared breakpoints, per-read noisy copies of
    the inserted sequence), background reads with indel noise, ~8% split
    reads.  This shape exercises clustering the way deep long-read data does
    (multi-member partitions, INS haplotype edit distances, consensus)."""
    from svim_tpu.io.sam import AlignmentHeader, parse_sam_line
    from svim_tpu.io import bam as bamio

    rng = random.Random(1234)
    header_text = ("@HD\tVN:1.6\tSO:coordinate\n"
                   "@SQ\tSN:chr1\tLN:200000000\n@SQ\tSN:chr2\tLN:150000000\n")
    header = AlignmentHeader.from_text(header_text)
    records = []
    read_number = 0

    def add_read(start, cigar, seq, tags=""):
        nonlocal read_number
        line = "read{0}\t0\tchr1\t{1}\t60\t{2}\t*\t0\t0\t{3}\t*{4}".format(
            read_number, start + 1, cigar, seq, tags)
        records.append(parse_sam_line(line, header))
        read_number += 1

    # deletion loci: COVERAGE reads sharing one D run (jittered size) at ONE
    # genomic position (reads are anchored so the SV op lands on the locus)
    for locus in range(N_DEL_LOCI):
        locus_pos = rng.randint(100_000, GENOME_SPAN)
        size = rng.randint(60, 800)
        for _ in range(COVERAGE):
            cigar, seq_len, _, _, ref_before = _noisy_cigar(
                rng, sv=("D", size + rng.randint(-3, 3)))
            add_read(locus_pos - ref_before + rng.randint(-10, 10), cigar,
                     "A" * seq_len)

    # insertion loci: COVERAGE reads inserting noisy copies of a shared motif
    for locus in range(N_INS_LOCI):
        locus_pos = rng.randint(100_000, GENOME_SPAN)
        size = rng.randint(60, 500)
        motif = "".join(rng.choice("ACGT") for _ in range(size))
        for _ in range(COVERAGE):
            noisy = list(motif)
            for _ in range(rng.randint(0, 4)):  # per-read sequencing noise
                noisy[rng.randrange(len(noisy))] = rng.choice("ACGT")
            insert = "".join(noisy)
            cigar, seq_len, _, sv_pos, ref_before = _noisy_cigar(
                rng, sv=("I", len(insert)))
            seq = "A" * sv_pos + insert + "A" * (seq_len - sv_pos - len(insert))
            add_read(locus_pos - ref_before + rng.randint(-10, 10), cigar, seq)

    # background reads (noise only) + occasional split reads
    n_background = max(0, N_READS - read_number)
    for i in range(n_background):
        cigar, seq_len, _, _, _ = _noisy_cigar(rng)
        tags = ""
        if i % 12 == 0:
            tags = "\tSA:Z:chr2,{0},+,{1}S{2}M,60,0;".format(
                rng.randint(1, 100000000), seq_len - 500, 500)
        add_read(rng.randint(0, GENOME_SPAN), cigar, "A" * seq_len, tags)

    records.sort(key=lambda record: record.reference_start)
    bam_path = os.path.join(tmp_dir, "bench.bam")
    bamio.write_bam(bam_path, header, records)

    genome_path = os.path.join(tmp_dir, "genome.fa")
    import numpy as np
    genome_rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(genome_path, "wb") as handle:
        # chr1 covers every locus so INS clustering fetches real windows
        handle.write(b">chr1\n")
        chunk = GENOME_SPAN // 60 + 1
        genome = bases[genome_rng.integers(0, 4, size=chunk * 60)]
        for row in genome.reshape(chunk, 60):
            handle.write(row.tobytes() + b"\n")
        handle.write(b">chr2\n" + b"ACGT" * 2500 + b"\n")
    return bam_path, genome_path, header, records


def run_cluster(signatures, options):
    from svim_tpu.cluster import cluster_sv_signatures
    return cluster_sv_signatures(signatures, options)


def run_cluster_reference(signatures, options):
    """Reference-equivalent clustering (scalar per-pair loops, the cost model
    of single-core SVIM)."""
    from svim_tpu.cluster.reference_path import cluster_sv_signatures_reference
    return cluster_sv_signatures_reference(signatures, options)


REFERENCE_SRC = "/root/reference/src"


def _reference_baseline_measurement(tmp_dir, bam_path, genome_path):
    """Time the UNMODIFIED reference SVIM's COLLECT+CLUSTER on the workload
    (runs in a subprocess via --reference-baseline: the reference mutates
    global logging and the shim import must shadow absent third-party
    packages).  Prints ONE json line {best_s, n_sigs}."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests", "shims"))
    sys.path.insert(1, REFERENCE_SRC)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import logging
    logging.disable(logging.INFO)

    from svim_tpu.config import parse_arguments
    options = parse_arguments(arguments=["alignment", tmp_dir, bam_path,
                                         genome_path])
    import pysam  # the shim (first-party IO underneath)
    from svim.SVIM_COLLECT import analyze_alignment_file_coordsorted
    from svim.SVIM_CLUSTER import cluster_sv_signatures as reference_cluster

    best = float("inf")
    n_sigs = 0
    # first pass warms scipy/.fai; best-of-4 because this box's multi-100ms
    # stalls move single measurements ±30% (same policy as the array side;
    # round 4 saw identical binaries read 10.9x and 33.5x hours apart)
    for _ in range(4):
        bam = pysam.AlignmentFile(bam_path)
        t0 = time.perf_counter()
        signatures, _trans = analyze_alignment_file_coordsorted(bam, options)
        reference_cluster(signatures, options)
        best = min(best, time.perf_counter() - t0)
        n_sigs = len(signatures)
    print(json.dumps({"best_s": best, "n_sigs": n_sigs}))


def _run_reference_baseline_subprocess(tmp_dir, bam_path, genome_path):
    """Reference baseline in a subprocess; None when unavailable/failed."""
    if not os.path.isdir(REFERENCE_SRC):
        return None
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--reference-baseline", tmp_dir, bam_path, genome_path],
            capture_output=True, timeout=1200, text=True)
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return None


def _probe_tpu(timeout_s: int = None) -> bool:
    """Run a trivial computation on the default jax platform in a SUBPROCESS:
    the axon TPU worker can crash/hang (first attach also takes minutes), and
    a hung in-process attach would take the whole benchmark down."""
    import subprocess
    if timeout_s is None:
        # cold axon attach alone can take 60-240+ s
        timeout_s = int(os.environ.get("SVIM_BENCH_PROBE_TIMEOUT", "600"))
    code = ("import jax, jax.numpy as jnp;"
            "print(int(jnp.arange(4).sum()))")
    try:
        result = subprocess.run([sys.executable, "-c", code],
                                capture_output=True, timeout=timeout_s)
        return result.returncode == 0 and b"6" in result.stdout
    except subprocess.TimeoutExpired:
        return False


def _array_measurement(tmp_dir, bam_path, genome_path):
    """Measure the array path; prints ONE json line {platform, best_s}.

    Run in a subprocess (see main): the experimental axon TPU worker can
    wedge mid-run, and a wedged in-process measurement would take the whole
    benchmark down."""
    import logging
    logging.disable(logging.INFO)

    from svim_tpu.config import parse_arguments
    from svim_tpu.utils.device import select_backend, setup_jax_cache

    platform_note = ""
    if os.environ.get("SVIM_BENCH_FORCE_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        setup_jax_cache()
    else:
        # the production backend choice: measure the accelerator link and
        # run on host XLA when batch shipping can't beat it (utils/device)
        if select_backend("auto") == "host-auto":
            platform_note = " (auto: host XLA, degraded device link)"
    options = parse_arguments(arguments=["alignment", tmp_dir, bam_path, genome_path])

    import jax
    from svim_tpu.collect.packed import collect_soa_from_bam

    platform = jax.devices()[0].platform + platform_note
    # warmup (compile)
    collect_soa_from_bam(bam_path, options)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        _header, _packed, signatures, _twins = collect_soa_from_bam(bam_path, options)
        collect_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_cluster(signatures, options)
        cluster_time = time.perf_counter() - t0
        best = min(best, collect_time + cluster_time)
        # release this iteration's packed buffers BEFORE the next scan so the
        # native inflate pool can recycle them (a fresh hundreds-of-MB
        # bytearray risks this kernel's variable page-compaction stalls)
        del _header, _packed, signatures, _twins
    print(json.dumps({"platform": platform, "best_s": best}))


def _run_array_subprocess(tmp_dir, bam_path, genome_path):
    """Array measurement in a watchdogged subprocess; retries pinned to CPU
    if the device run hangs or dies, so the bench ALWAYS reports."""
    import subprocess
    timeout_s = int(os.environ.get("SVIM_BENCH_ARRAY_TIMEOUT", "2100"))
    for force_cpu in (False, True):
        env = dict(os.environ)
        if force_cpu:
            env["SVIM_BENCH_FORCE_CPU"] = "1"
            print("# device array run failed; re-measuring on CPU backend",
                  file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--array",
                 tmp_dir, bam_path, genome_path],
                capture_output=True, timeout=timeout_s, env=env, text=True)
        except subprocess.TimeoutExpired:
            continue
        if proc.returncode == 0:
            for line in reversed(proc.stdout.splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
    raise RuntimeError("array measurement failed on device and CPU")


def main():
    import logging
    logging.disable(logging.INFO)
    import tempfile

    from svim_tpu.config import parse_arguments

    if os.environ.get("SVIM_BENCH_SKIP_PROBE") != "1" and not _probe_tpu():
        # device unreachable: fall back to CPU so the bench always reports
        os.environ["SVIM_BENCH_FORCE_CPU"] = "1"
        print("# TPU probe failed; benchmarking on CPU backend", file=sys.stderr)
    tmp_dir = tempfile.mkdtemp(prefix="svim_bench_")
    bam_path, genome_path, header, records = make_workload(tmp_dir)
    options = parse_arguments(arguments=["alignment", tmp_dir, bam_path, genome_path])

    # The reference pays BAM ingest inside its COLLECT loop (htslib BGZF
    # inflate + pysam record decode), while the shim's AlignmentFile decodes
    # records up front (outside the timed window) and the array path's
    # timing includes its own scan.  Charge the baseline a measured STRICT
    # LOWER BOUND on that cost: the single-threaded native inflate + record
    # walk + column decode, with no Python object materialization and
    # libdeflate (faster than htslib's zlib).  Everything pysam does beyond
    # this is uncharged.
    ingest_best = 0.0
    try:
        from svim_tpu import native as svim_native
        from svim_tpu.io.packing import bucket_size
        if svim_native.get_library() is not None and not BASELINE_SAMPLE:
            with open(bam_path, "rb") as handle:
                compressed = handle.read()
            ingest_best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                data, counted = svim_native.bam_scan_fused(
                    compressed, options.min_mapq, 0, n_threads=1)
                svim_native.bamscan_native(data, options.min_mapq, bucket_size,
                                           0, counted=counted, n_threads=1)
                ingest_best = min(ingest_best, time.perf_counter() - t0)
    except Exception:
        ingest_best = 0.0

    # ---- array path FIRST: the reference subprocess peaks at GBs of Python
    # objects and leaves the box's page cache churned — measuring the array
    # path after it was worth ~2x on its best_s (pure box-state noise)
    array = _run_array_subprocess(tmp_dir, bam_path, genome_path)
    array_reads_per_s = N_READS / array["best_s"]

    # ---- baseline: the ACTUAL reference (unmodified, via shims) ---------------
    reference = (None if BASELINE_SAMPLE
                 else _run_reference_baseline_subprocess(tmp_dir, bam_path,
                                                         genome_path))
    if reference is not None:
        baseline_best = reference["best_s"]
        baseline_reads = N_READS
    else:
        # fallback: this repo's sequential host port of the same loops
        from svim_tpu.collect.intra import analyze_alignment_indel
        from svim_tpu.collect.collect import retrieve_other_alignments
        from svim_tpu.collect.inter import analyze_read_segments
        from svim_tpu.io.sam import AlignmentFile

        bam_host = AlignmentFile(bam_path)
        host_records = list(bam_host.fetch(until_eof=True))
        if BASELINE_SAMPLE:
            host_records = host_records[:BASELINE_SAMPLE]
        baseline_reads = len(host_records)

        baseline_best = float("inf")
        # first pass warms one-time costs (scipy, .fai build) for BOTH
        # paths; best-of-2 keeps the baseline fair under load noise
        for _ in range(2):
            t0 = time.perf_counter()
            host_signatures = []
            for record in host_records:
                supplementary = [aln for aln in retrieve_other_alignments(record, bam_host)
                                 if aln.mapping_quality >= options.min_mapq]
                sigs, _ = analyze_alignment_indel(record, bam_host, record.query_name, options)
                host_signatures.extend(sigs)
                sigs, _ = analyze_read_segments(record, supplementary, bam_host, options)
                host_signatures.extend(sigs)
            host_collect_time = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_cluster_reference(host_signatures, options)
            host_cluster_time = time.perf_counter() - t0
            baseline_best = min(baseline_best,
                                host_collect_time + host_cluster_time)
    baseline_reads_per_s = baseline_reads / (baseline_best + ingest_best)

    result = {
        "metric": "aligned reads/s through signature extraction+clustering (1 chip: {0})".format(
            array["platform"]),
        "value": round(array_reads_per_s, 2),
        "unit": "reads/s",
        "vs_baseline": round(array_reads_per_s / baseline_reads_per_s, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--array":
        _array_measurement(sys.argv[2], sys.argv[3], sys.argv[4])
    elif len(sys.argv) > 1 and sys.argv[1] == "--reference-baseline":
        _reference_baseline_measurement(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        main()
