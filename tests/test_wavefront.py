"""Banded wavefront edit-distance kernel: exactness vs the DP oracle."""

import random

from svim_tpu.cluster.edit_distance import edit_distance_dp
from svim_tpu.ops.wavefront_kernel import batched_edit_distance


def _mutate(rng, text, edits):
    out = list(text)
    for _ in range(edits):
        if not out:
            break
        op = rng.choice("sid")
        position = rng.randrange(len(out))
        if op == "s":
            out[position] = rng.choice("ACGT")
        elif op == "i":
            out.insert(position, rng.choice("ACGT"))
        else:
            del out[position]
    return "".join(out)


def test_batched_edit_distance_exact():
    rng = random.Random(13)
    pairs = []
    for _ in range(30):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 120)))
        if rng.random() < 0.6:
            b = _mutate(rng, a, rng.randint(0, 8))
        else:
            b = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 120)))
        pairs.append((a, b))
    pairs += [("", ""), ("", "ACGT"), ("AC", ""), ("A" * 50, "A" * 50)]
    got = batched_edit_distance(pairs, initial_band=2)  # force band doubling
    want = [edit_distance_dp(a, b) for a, b in pairs]
    assert got == want


def test_band_doubling_handles_distant_pairs():
    # distance far above the initial band: must retry, not clamp
    got = batched_edit_distance([("A" * 64, "C" * 64)], initial_band=2)
    assert got == [64]
