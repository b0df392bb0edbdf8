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


def test_pallas_kernel_matches_jnp_and_oracle():
    """The Pallas VMEM wavefront kernel (interpret mode on CPU) produces the
    same resolved distances as the jnp scan and the DP oracle."""
    import numpy as np

    from svim_tpu.cluster.edit_distance import edit_distance_dp
    from svim_tpu.ops.wavefront_kernel import (
        _encode,
        banded_distance,
        banded_distance_pallas,
    )

    rng = random.Random(17)

    def noisy(text, edits):
        chars = list(text)
        for _ in range(edits):
            op = rng.random()
            pos = rng.randrange(len(chars))
            if op < 0.4:
                chars[pos] = rng.choice("ACGT")
            elif op < 0.7:
                chars.insert(pos, rng.choice("ACGT"))
            else:
                del chars[pos]
        return "".join(chars)

    pairs = []
    for _ in range(16):
        base = "".join(rng.choice("ACGT") for _ in range(rng.randint(4, 450)))
        pairs.append((base, noisy(base, rng.randint(0, 50))))

    length = 512
    band = 64
    a_codes = _encode([a for a, _ in pairs], length).astype(np.int32)
    b_codes = _encode([b for _, b in pairs], length).astype(np.int32)
    a_lens = np.asarray([len(a) for a, _ in pairs], dtype=np.int32)
    b_lens = np.asarray([len(b) for _, b in pairs], dtype=np.int32)

    jnp_out = np.asarray(banded_distance(a_codes.astype(np.uint8), a_lens,
                                         b_codes.astype(np.uint8), b_lens, band))
    pallas_out = np.asarray(banded_distance_pallas(
        a_codes, a_lens, b_codes, b_lens, band, tile_b=8, interpret=True))
    for index, (a, b) in enumerate(pairs):
        truth = edit_distance_dp(a, b)
        if jnp_out[index] <= band:
            assert jnp_out[index] == truth
        if pallas_out[index] <= band:
            assert pallas_out[index] == truth
        if jnp_out[index] <= band:  # pallas band is >= jnp band (lane padding)
            assert pallas_out[index] == truth
