#!/usr/bin/env python3
"""Fine-grained breakdown of the INS clustering route (the CLUSTER hot spot).

Times, per warm round: partition forming, subsampling, edit-distance pair
building, the native/device edit-distance batch, per-partition matrix builds,
device agglomeration dispatch, and consume/fallback.
"""
import json
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
logging.disable(logging.INFO)

import bench
from svim_tpu.config import parse_arguments
from svim_tpu.utils.device import setup_jax_cache


def main():
    setup_jax_cache()
    tmp_dir = tempfile.mkdtemp(prefix="svim_profile_ins_")
    bam_path, genome_path, header, records = bench.make_workload(tmp_dir)
    options = parse_arguments(arguments=["alignment", tmp_dir, bam_path, genome_path])

    import jax
    print("platform:", jax.devices()[0].platform, flush=True)

    from svim_tpu.collect.packed import collect_signatures_from_bam
    from svim_tpu.cluster.partition import form_partitions
    from svim_tpu.cluster import accel
    from svim_tpu.cluster import cluster as cl
    from svim_tpu.io.fasta import FastaFile
    from random import seed, sample

    _h, _t, sigs, _tw = collect_signatures_from_bam(bam_path, options)
    ins = [s for s in sigs if s.type == "INS"]
    print("n_ins:", len(ins), flush=True)

    for round_no in range(3):
        t = {}
        t0 = time.perf_counter()
        partitions = form_partitions(ins, options.partition_max_distance)
        t["form_partitions"] = time.perf_counter() - t0

        seed(cl.RANDOM_SEED)
        samples = []
        for partition in partitions:
            if len(partition) > cl.MAX_PARTITION_SIZE:
                samples.append(sample(partition, cl.MAX_PARTITION_SIZE))
            else:
                samples.append(partition)

        with FastaFile(options.genome) as reference:
            t0 = time.perf_counter()
            multi = [s for s in samples if len(s) >= 2]
            ed_cache = accel.precompute_ins_edit_distances(multi, reference,
                                                           options)
            t["ed_precompute"] = time.perf_counter() - t0
            t["n_pairs"] = len(ed_cache.pairs) // 2

            t0 = time.perf_counter()
            from svim_tpu.cluster.device_cluster import dispatch_partitions_device
            eligible = [(i, s) for i, s in enumerate(samples) if 3 <= len(s) <= 128]
            pending = dispatch_partitions_device(
                [s for _, s in eligible], "INS", reference, options, ed_cache=ed_cache)
            t["matrix_prep+dispatch"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            from svim_tpu.cluster.device_cluster import consume_partitions_device
            per_pos = consume_partitions_device(pending)
            t["consume"] = time.perf_counter() - t0
            t["n_fallback"] = sum(1 for r in per_pos.values() if r.clusters is None)

            # full route for comparison
            t0 = time.perf_counter()
            cl.clusters_from_partitions(partitions, reference, options)
            t["full_route"] = time.perf_counter() - t0
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in t.items()}), flush=True)


if __name__ == "__main__":
    main()
