"""Multi-host (multi-process) execution: jax.distributed wiring, per-host
BAM-range ingestion, and host-table exchange.

Layout (SURVEY.md §7.1 step 7 / BASELINE 2-host target):
  * every process initializes the same jax.distributed runtime (coordinator
    from SVIM_COORDINATOR / SVIM_NUM_PROCESSES / SVIM_PROCESS_ID, matching
    jax's standard env-based init);
  * each process ingests its contiguous BAM block range
    (io.bamrange.scan_bam_range) and runs the SAME local COLLECT device
    pass as the single-host path on its addressable devices;
  * per-process signature lists and genotyping columns are exchanged with
    ONE process_allgather round (DCN collective) and concatenated in rank
    order — ranges are contiguous file slices, so rank order IS the serial
    file order and every downstream stage (gap-cut partitioning first)
    sees exactly the single-process stream;
  * CLUSTER/COMBINE run redundantly on every process (deterministic, no
    collectives), and only process 0 writes outputs.

The reference has no multi-process analog (README.rst:73 single-threaded);
the merge semantics preserved here are the ones SURVEY.md §2.3 extracts:
COLLECT is per-read independent, clustering needs each (type, contig)
partition co-located, COMBINE needs the global cross-type view.
"""

from __future__ import annotations

import logging
import os
import pickle

import numpy as np


def env_process_info():
    """(coordinator, num_processes, process_id) from the environment, or
    None when not launched as part of a multi-process job."""
    coordinator = os.environ.get("SVIM_COORDINATOR")
    num_processes = os.environ.get("SVIM_NUM_PROCESSES")
    process_id = os.environ.get("SVIM_PROCESS_ID")
    if coordinator is None or num_processes is None or process_id is None:
        return None
    return coordinator, int(num_processes), int(process_id)


_initialized = False


def initialize_from_env() -> int:
    """Initialize jax.distributed from SVIM_* env vars; returns this
    process's rank (0 for single-process runs)."""
    global _initialized
    info = env_process_info()
    if info is None:
        return 0
    coordinator, num_processes, process_id = info
    if num_processes <= 1:
        return 0
    if not _initialized:
        import jax
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)
        _initialized = True
    return process_id


def process_index() -> int:
    import jax
    try:
        return jax.process_index()
    except Exception:
        return 0


def process_count() -> int:
    import jax
    try:
        return jax.process_count()
    except Exception:
        return 1


def allgather_blobs(blob: bytes):
    """All-to-all exchange of one opaque byte blob per process; returns the
    list of every process's blob in rank order (two collective rounds: a
    fixed-shape length gather, then the padded payload gather)."""
    from jax.experimental import multihost_utils

    if process_count() == 1:
        return [blob]
    length = np.asarray([len(blob)], dtype=np.int64)
    lengths = np.asarray(multihost_utils.process_allgather(length)).reshape(-1)
    pad = int(lengths.max())
    padded = np.zeros(pad, dtype=np.uint8)
    if blob:
        padded[:len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(lengths), pad)
    return [gathered[rank, :int(lengths[rank])].tobytes()
            for rank in range(len(lengths))]


def allgather_object(payload):
    """process_allgather for an arbitrary picklable payload."""
    return [pickle.loads(blob)
            for blob in allgather_blobs(pickle.dumps(payload, protocol=4))]


class MergedGenotypeTable:
    """Global alignment-interval table assembled from per-process columns;
    fetch/column-compatible with genotype_packed_multi (ref_id/ref_start/
    ref_end/mapq/flag columns + names list)."""

    def __init__(self, ref_id, ref_start, ref_end, mapq, flag, names):
        self.ref_id = ref_id
        self.ref_start = ref_start
        self.ref_end = ref_end
        self.mapq = mapq
        self.flag = flag
        self.names = names


class MergedAlignmentIndex:
    """aln_file stand-in for the distributed pipeline: header surface +
    packed table for genotyping (mirrors io.packed_fetch.PackedAlignmentIndex
    without re-sorting, which the genotyper does itself)."""

    def __init__(self, table: MergedGenotypeTable, header):
        self.packed = table
        self.header = header

    @property
    def references(self):
        return self.header.references

    @property
    def lengths(self):
        return self.header.lengths


def _local_genotype_columns(packed):
    """The five columns + names the genotyper needs, as plain host arrays."""
    names = packed.names
    take = getattr(names, "take", None)
    if take is not None:
        names = take(np.arange(packed.n))
    else:
        names = list(names)
    return {
        "ref_id": np.asarray(packed.ref_id, dtype=np.int32),
        "ref_start": np.asarray(packed.ref_start, dtype=np.int64),
        "ref_end": np.asarray(packed.ref_end, dtype=np.int64),
        "mapq": np.asarray(packed.mapq, dtype=np.int32),
        "flag": np.asarray(packed.flag, dtype=np.int32),
        "names": names,
    }


def collect_distributed(options):
    """Per-process ranged COLLECT + global exchange.

    Returns (MergedAlignmentIndex, signatures, twins) where the signature
    list equals the single-process COLLECT output on the whole file."""
    from svim_tpu.collect.packed import signatures_from_packed
    from svim_tpu.io.bamrange import scan_bam_range

    rank = process_index()
    world = process_count()
    header, packed, sa_tags = scan_bam_range(
        options.bam_file, world, rank,
        options.min_mapq, options.min_sv_size)
    local_sigs, local_twins = signatures_from_packed(packed, sa_tags, header,
                                                     options)
    logging.info("Process {0}/{1}: collected {2} local signatures from "
                 "{3} records".format(rank, world, len(local_sigs), packed.n))

    payload = {
        "sigs": local_sigs,
        "twins": local_twins,
        "columns": _local_genotype_columns(packed),
    }
    gathered = allgather_object(payload)

    signatures = []
    twins = []
    for part in gathered:
        signatures.extend(part["sigs"])
        twins.extend(part["twins"])
    names = []
    for part in gathered:
        names.extend(part["columns"]["names"])
    merged = MergedGenotypeTable(
        ref_id=np.concatenate([p["columns"]["ref_id"] for p in gathered]),
        ref_start=np.concatenate([p["columns"]["ref_start"] for p in gathered]),
        ref_end=np.concatenate([p["columns"]["ref_end"] for p in gathered]),
        mapq=np.concatenate([p["columns"]["mapq"] for p in gathered]),
        flag=np.concatenate([p["columns"]["flag"] for p in gathered]),
        names=names)
    return MergedAlignmentIndex(merged, header), signatures, twins
