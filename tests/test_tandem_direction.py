"""Bug-for-bug parity for the tandem-duplication run merger.

The reference does NOT reset current_direction when a run flushes
(/root/reference/src/svim/SVIM_inter.py:262-269 — only chromosome/starts/
ends/copies/covered restart), so every later run keeps comparing against the
FIRST tandem entry's direction.  A read with mixed-direction tandem evidence
must therefore split runs the same stale way here (VERDICT round 3, item 3).
"""

import os
import random

import pytest

from svim_tpu.cli import main
from svim_tpu.collect.inter import _Emitter, _merge_tandem_runs
from svim_tpu.config import parse_arguments


def _options():
    return parse_arguments(
        arguments=["alignment", "wd", "reads.bam", "genome.fa"])


def test_stale_direction_splits_later_runs():
    """[fwd, rev, rev] at one locus: the reference flushes on EVERY rev entry
    because the stale comparison direction remains fwd -> three 1-copy
    signatures, never a merged 2-copy run."""
    emit = _Emitter("read1", _options())
    emit.tandem_runs = [
        ("chr1", 1000, 1500, True, True),    # fwd run seeds the direction
        ("chr1", 3000, 3500, True, False),   # dissimilar locus -> flush
        ("chr1", 3000, 3500, True, False),   # similar to prev, same rev
                                             # direction -> reference still
                                             # flushes (stale dir is fwd)
    ]
    _merge_tandem_runs(emit)
    tandems = [s for s in emit.signatures if s.type == "DUP_TAN"]
    assert [t.copies for t in tandems] == [1, 1, 1]


def test_stale_direction_merges_across_direction_change():
    """[fwd, rev, fwd]: the third (fwd) entry matches the STALE fwd direction
    and merges into the rev-seeded run — reference behavior."""
    emit = _Emitter("read1", _options())
    emit.tandem_runs = [
        ("chr1", 1000, 1500, True, True),
        ("chr1", 3000, 3500, True, False),
        ("chr1", 3000, 3500, True, True),
    ]
    _merge_tandem_runs(emit)
    tandems = [s for s in emit.signatures if s.type == "DUP_TAN"]
    assert [t.copies for t in tandems] == [1, 2]


REFERENCE_DRIVER = "/root/reference/src/svim/svim"


def _write_mixed_direction_fixture(out_dir):
    """One read whose segments yield tandem evidence [fwd, rev, rev]:
    a forward self-overlap at 1.0-1.5 kb, then two reverse self-overlaps at
    3.0-3.5 kb.  Merge behavior depends exactly on the stale-direction
    semantics (3 signatures reference-style vs 2 if direction were reset)."""
    rng = random.Random(99)
    genome = "".join(rng.choice("ACGT") for _ in range(10_000))
    genome_path = os.path.join(out_dir, "genome.fa")
    with open(genome_path, "w") as handle:
        handle.write(">chr1\n")
        for i in range(0, len(genome), 80):
            handle.write(genome[i:i + 80] + "\n")
    seq = "".join(rng.choice("ACGT") for _ in range(3000))
    sa = ("chr1,1001,+,500S500M2000S,60,0;"
          "chr1,3001,-,1500S500M1000S,60,0;"
          "chr1,3001,-,1000S500M1500S,60,0;"
          "chr1,3001,-,500S500M2000S,60,0;")
    sam_path = os.path.join(out_dir, "reads.sam")
    with open(sam_path, "w") as handle:
        handle.write("@HD\tVN:1.6\tSO:coordinate\n")
        handle.write("@SQ\tSN:chr1\tLN:10000\n")
        handle.write("mixdir\t0\tchr1\t1001\t60\t500M2500S\t*\t0\t0\t"
                     + seq + "\t*\tSA:Z:" + sa + "\n")
    return sam_path, genome_path


@pytest.mark.skipif(not os.path.exists(REFERENCE_DRIVER),
                    reason="reference implementation not available")
@pytest.mark.slow
def test_mixed_direction_reference_parity(tmp_path):
    from tests.test_reference_diff import _diff_tree, _run_reference

    out = str(tmp_path)
    sam, genome = _write_mixed_direction_fixture(out)
    wd_ref = os.path.join(out, "wd_ref")
    wd_ours = os.path.join(out, "wd_ours")
    _run_reference(wd_ref, sam, genome)
    assert main(["alignment", wd_ours, sam, genome]) == 0
    _diff_tree(wd_ref, wd_ours)
    # Non-vacuousness guard: the merger must have split the rev entries into
    # 1-copy runs (stale direction).  Were current_direction reset on flush,
    # the two rev entries would merge into ONE 2-copy signature and the
    # second row would read ';2;' with a 1000 bp destination.  (The two
    # identical 1-copy rev signatures then same-read dedup into one cluster,
    # hence 2 rows.)
    with open(os.path.join(wd_ours, "signatures",
                           "dup_tan_source.bed")) as handle:
        rows = handle.read().strip().splitlines()
    assert len(rows) == 2
    assert all(";1;" in row for row in rows)
    assert "chr1:3500-4000" in rows[1]
