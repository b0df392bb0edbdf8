"""Sharded COLLECT over the virtual device mesh must match single-device
results exactly, and the aligner wrapper surfaces missing tools cleanly."""

import random

import pytest

from svim_tpu.align import ToolMissingError, run_alignment
from svim_tpu.collect.packed import collect_signatures_packed
from svim_tpu.io.sam import AlignmentFile


def _sam(tmp_path, n_reads=64):
    rng = random.Random(12)
    lines = []
    for i in range(n_reads):
        start = rng.randint(0, 100000)
        lines.append("r{0}\t0\tchr1\t{1}\t60\t500M{2}D500M\t*\t0\t0\t{3}\t*".format(
            i, start + 1, rng.randint(50, 200), "A" * 1000))
    lines.sort(key=lambda line: int(line.split("\t")[3]))
    path = tmp_path / "shard.sam"
    path.write_text("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n"
                    + "\n".join(lines) + "\n")
    return str(path)


def test_sharded_collect_matches_single_device(tmp_path, default_options):
    sam_path = _sam(tmp_path, n_reads=64)  # divisible by 8 shards
    single = collect_signatures_packed(AlignmentFile(sam_path), default_options)
    sharded = collect_signatures_packed(AlignmentFile(sam_path),
                                        default_options.replace(num_shards=8))
    assert [s.as_string() for s in single[0]] == [s.as_string() for s in sharded[0]]
    assert len(single[0]) == 64


def test_run_alignment_missing_tool(tmp_path):
    with pytest.raises(ToolMissingError):
        run_alignment(str(tmp_path), "genome.fa", "reads.fq", "fastq", 1,
                      "definitely-not-an-aligner", False)
