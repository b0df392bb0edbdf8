"""Mid-scan incremental clustering (cluster/incremental.py): the memo must
only ever reproduce exactly what the ordinary CLUSTER stage computes.

The pileup workload guarantees memo hits (multi-member partitions finalize
well behind the scan frontier); the random split reads scatter inter-
alignment signatures at positions unrelated to the scan frontier, which is
the misprediction case — those partitions must silently miss the memo and
recompute, never corrupt output.  Reference contract under test:
svim/SVIM_clustering.py:17-180 ordering and results."""

import contextlib
import random

import pytest

from svim_tpu.cli import main
from svim_tpu.io import bam as bamio
from svim_tpu.io.sam import AlignmentFile

from tests.test_packed_collect import _random_sam


@contextlib.contextmanager
def _chunked_scan(chunk):
    """Deliver scan-session rows in `chunk`-sized ranges (simulating a walker
    slower than the consumer): tiny test files otherwise arrive in ONE claim,
    which never triggers the mid-scan consume + observe path."""
    from svim_tpu import native

    original = native.BamScanSession.next_rows
    buffers = {}

    def chunked(self, min_rows):
        buffer = buffers.get(id(self))
        if buffer is None:
            buffers[id(self)] = buffer = list(original(self, min_rows))
        row_start, remaining, max_ops, body, done = buffer
        take = min(chunk, remaining)
        buffer[0] += take
        buffer[1] -= take
        if buffer[1] == 0 and not done:
            buffers.pop(id(self))   # claim a fresh range next call
        return (row_start, take, max_ops, body, done and buffer[1] == 0)

    native.BamScanSession.next_rows = chunked
    try:
        yield
    finally:
        native.BamScanSession.next_rows = original

HEADER = ("@HD\tVN:1.6\tSO:coordinate\n"
          "@SQ\tSN:chr1\tLN:600000\n@SQ\tSN:chr2\tLN:600000\n")


def _pileup_sam(rng, n_loci=24, coverage=5):
    """Coordinate-sorted SAM with DEL and INS pileups (multi-member
    partitions -> memoizable) plus split reads (SA segments land anywhere ->
    misprediction stress)."""
    lines = []
    read_number = 0
    for locus in range(n_loci):
        contig = "chr1" if locus % 2 else "chr2"
        position = 2000 + locus * 20000
        sv_len = 80 + locus * 3
        insert = "".join(rng.choice("ACGT") for _ in range(sv_len))
        for member in range(coverage):
            start = position - 150 + rng.randint(-20, 20)
            if locus % 3 == 0:   # INS pileup (shared insert, small jitter)
                noisy = list(insert)
                for _ in range(rng.randint(0, 2)):
                    noisy[rng.randrange(len(noisy))] = rng.choice("ACGT")
                cigar = "150M{0}I150M".format(sv_len)
                seq = "A" * 150 + "".join(noisy) + "A" * 150
            else:                # DEL pileup
                cigar = "150M{0}D150M".format(sv_len + rng.randint(-3, 3))
                seq = "A" * 300
            lines.append("pile{0}\t0\t{1}\t{2}\t60\t{3}\t*\t0\t0\t{4}\t*".format(
                read_number, contig, start + 1, cigar, seq))
            read_number += 1
    # split reads from the shared generator (SA segments at random positions
    # and strands -> BND/INV/DUP/INS/DEL inter signatures off-frontier)
    split = _random_sam(rng, 40, all_split=True)
    lines.extend(line for line in split.splitlines()
                 if line and not line.startswith("@"))
    lines.sort(key=lambda line: (line.split("\t")[2], int(line.split("\t")[3])))
    return HEADER + "\n".join(lines) + "\n"


def _write_inputs(tmp_path, rng):
    sam_path = tmp_path / "pileup.sam"
    sam_path.write_text(_pileup_sam(rng))
    af = AlignmentFile(str(sam_path))
    bam_path = tmp_path / "pileup.bam"
    bamio.write_bam(str(bam_path), af.header, list(af.fetch(until_eof=True)))
    genome_path = tmp_path / "genome.fa"
    genome_rng = random.Random(7)
    with open(genome_path, "w") as handle:
        for contig in ("chr1", "chr2"):
            handle.write(">{0}\n".format(contig))
            for _ in range(600000 // 60):
                handle.write("".join(genome_rng.choice("ACGT")
                                     for _ in range(60)) + "\n")
    return str(bam_path), str(genome_path)


def _strip_date(path):
    with open(path) as handle:
        return [line for line in handle if not line.startswith("##fileDate")]


def test_memo_populates_and_matches_fresh(tmp_path):
    """collect_soa_from_bam attaches a non-empty memo under small batches,
    and every memo entry equals a fresh recomputation of that partition."""
    import numpy as np

    from svim_tpu.cluster.cluster import clusters_from_partitions
    from svim_tpu.cluster.partition import form_partitions_table
    from svim_tpu.collect.packed import collect_soa_from_bam
    from svim_tpu.config import parse_arguments
    from svim_tpu.io.fasta import FastaFile

    bam_path, genome_path = _write_inputs(tmp_path, random.Random(11))
    options = parse_arguments(arguments=[
        "alignment", str(tmp_path), bam_path, genome_path,
        "--batch_reads", "24"])
    with _chunked_scan(24):
        _header, _table, soa, _twins = collect_soa_from_bam(bam_path, options)
    memo = soa.cluster_memo
    assert memo, "no partitions were memoized mid-scan"

    hits = 0
    with FastaFile(genome_path) as reference:
        for sig_type, table in soa.tables.items():
            for partition in form_partitions_table(
                    table, options.partition_max_distance):
                stored = memo.get((sig_type, partition.indices.tobytes()))
                if stored is None:
                    continue
                hits += 1
                fresh = clusters_from_partitions([partition], reference,
                                                 options)
                assert [list(array) for array in stored] == \
                    [np.asarray(cluster.indices).tolist() for cluster in fresh]
    assert hits > 0, "memo never matched a final partition"


@pytest.mark.parametrize("extra", [[], ["--all_bnds"]])
def test_incremental_pipeline_byte_parity(tmp_path, extra):
    """Full pipeline with mid-scan clustering on vs off: byte-equal VCF and
    signature clusters (only fileDate may differ)."""
    bam_path, genome_path = _write_inputs(tmp_path, random.Random(13))
    wd_auto = tmp_path / "wd_auto"
    wd_off = tmp_path / "wd_off"
    common = ["--batch_reads", "24"] + extra
    with _chunked_scan(24):
        assert main(["alignment", str(wd_auto), bam_path, genome_path]
                    + common) == 0
        assert main(["alignment", str(wd_off), bam_path, genome_path,
                     "--incremental_cluster", "off"] + common) == 0
    assert _strip_date(wd_auto / "variants.vcf") == \
        _strip_date(wd_off / "variants.vcf")
    for name in ("del.bed", "ins.bed", "inv.bed", "dup_tan_source.bed",
                 "dup_tan_dest.bed", "dup_int.bed", "trans.bed"):
        assert (wd_auto / "signatures" / name).read_text() == \
            (wd_off / "signatures" / name).read_text(), name
