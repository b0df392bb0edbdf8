#!/usr/bin/env python3
"""Accuracy evaluation: simulate all six SV classes, run the pipeline,
report per-class precision/recall/F1 vs the simulated truth
(BASELINE config 2 shape).

Usage: python scripts/eval_accuracy.py [seed]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import logging

    logging.disable(logging.INFO)
    from svim_tpu.cli import main as run_cli
    from svim_tpu.sim import SimConfig, evaluate_vcf, f1, simulate

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out_dir = tempfile.mkdtemp(prefix="svim_eval_")
    genome_path, bam_path, truth = simulate(out_dir, SimConfig(seed=seed))
    workdir = os.path.join(out_dir, "wd")
    assert run_cli(["alignment", workdir, bam_path, genome_path]) == 0

    results = evaluate_vcf(os.path.join(workdir, "variants.vcf"), truth)
    for svtype, (tp, fp, fn) in sorted(results.items()):
        print(json.dumps({"svtype": svtype, "tp": tp, "fp": fp, "fn": fn,
                          "f1": round(f1(tp, fp, fn), 3)}))


if __name__ == "__main__":
    main()
