"""Gap-cut partitioning of sorted signature streams.

Reference semantics: svim/SVIM_clustering.py:17-29 — sort by get_key() and
cut a new partition whenever the downstream distance to the previous
signature exceeds partition_max_distance.
"""

from __future__ import annotations

from typing import List


def form_partitions(sv_signatures, max_distance) -> List[list]:
    sorted_signatures = sorted(sv_signatures, key=lambda evi: evi.get_key())
    partitions = []
    current_partition = []
    for signature in sorted_signatures:
        if current_partition and current_partition[-1].downstream_distance_to(signature) > max_distance:
            partitions.append(current_partition)
            current_partition = []
        current_partition.append(signature)
    if current_partition:
        partitions.append(current_partition)
    return partitions
