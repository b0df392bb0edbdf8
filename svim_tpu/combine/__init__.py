"""COMBINE stage: merge clusters across SV types into final candidates.

Reference semantics: svim/SVIM_COMBINE.py, svim/SVIM_merging.py — BND<->INS
merging into interspersed duplications, cut&paste flagging, removal of
insertions explained by duplications, and insertion consensus generation.
"""

from svim_tpu.combine.combine import combine_clusters

__all__ = ["combine_clusters"]
