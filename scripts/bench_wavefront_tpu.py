#!/usr/bin/env python3
"""Measure the Pallas wavefront kernel on the real TPU vs native CPU Myers.

Run standalone: python scripts/bench_wavefront_tpu.py
(first computation pays the 60-240 s axon attach; run under timeout)."""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pairs(n, length, edits, seed=1):
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        base = "".join(rng.choice("ACGT") for _ in range(length))
        chars = list(base)
        for _ in range(edits):
            op = rng.random()
            pos = rng.randrange(len(chars))
            if op < 0.4:
                chars[pos] = rng.choice("ACGT")
            elif op < 0.7:
                chars.insert(pos, rng.choice("ACGT"))
            else:
                del chars[pos]
        pairs.append((base, "".join(chars)))
    return pairs


def main():
    import jax
    print("platform:", jax.devices()[0].platform, flush=True)

    from svim_tpu.ops.wavefront_kernel import (
        _encode, _pallas_tile_b, banded_distance_pallas)
    from svim_tpu.native import aligner, get_library
    assert get_library() is not None

    for (n, length, edits, band) in [(256, 1800, 60, 128),
                                     (256, 1800, 900, 1024),
                                     (64, 7800, 3000, 4096)]:
        pairs = make_pairs(n, length, edits)
        L = 2048 if length <= 2000 else 8192
        tile_b = _pallas_tile_b(L, band)
        B = ((n + tile_b - 1) // tile_b) * tile_b
        a = np.zeros((B, L), np.uint8); b = np.zeros((B, L), np.uint8)
        a[:n] = _encode([p[0] for p in pairs], L)
        b[:n] = _encode([p[1] for p in pairs], L)
        al = np.ones(B, np.int32); bl = np.ones(B, np.int32)
        al[:n] = [len(p[0]) for p in pairs]; bl[:n] = [len(p[1]) for p in pairs]

        t0 = time.time()
        out = np.asarray(banded_distance_pallas(a, al, b, bl, band, tile_b=tile_b))
        compile_time = time.time() - t0
        t0 = time.time()
        out = np.asarray(banded_distance_pallas(a, al, b, bl, band, tile_b=tile_b))
        warm = time.time() - t0

        t0 = time.time()
        native = aligner.edit_distance_batch(pairs)
        native_time = time.time() - t0
        resolved = out[:n][out[:n] <= band]
        match = all(int(o) == int(e) for o, e in zip(out[:n], native)
                    if o <= band)
        print(json.dumps({
            "n": n, "L": length, "band": band, "tile_b": tile_b,
            "compile_s": round(compile_time, 2),
            "pallas_warm_s": round(warm, 3),
            "native_cpu_s": round(native_time, 3),
            "resolved": int(len(resolved)), "values_match": match}), flush=True)


if __name__ == "__main__":
    main()
