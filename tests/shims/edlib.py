"""edlib shim: exact Levenshtein distance from this repo's implementation.

The reference calls align(query, target)["editDistance"] with default
mode="NW" (global; SVIM_clustering.py:45).  Edit distance is a uniquely
defined integer, so backing it with our exact native banded/Myers
implementation reproduces edlib bit-for-bit.
"""

from svim_tpu.cluster.edit_distance import edit_distance


def align(query, target, mode="NW", task="distance", k=-1,
          additionalEqualities=None):
    if mode != "NW":
        raise NotImplementedError("shim implements global (NW) mode only")
    return {"editDistance": edit_distance(query, target)}
