"""GSM branch checkpoint merging.

Mirror of /root/reference/infinicube/voxelgen/utils/model_merge_util.py:38-87:
the reference trains the 3D-only and 2D-only GSM variants separately and
merges their checkpoints into the dual-branch model. Here: graft the
``voxel_branch``/``pixel_branch`` (and optionally ``sky``/``encoder``)
subtrees from two parameter trees into one dual-branch tree."""

from __future__ import annotations

import copy


def merge_gsm_params(dual_params: dict, voxel_params: dict | None = None,
                     pixel_params: dict | None = None,
                     take_sky_from: str = "voxel") -> dict:
    """dual_params: an initialized dual-branch tree (shapes authoritative);
    voxel_params / pixel_params: trained single-branch trees."""
    out = copy.deepcopy(dual_params)
    p = out["params"]

    def graft(src_tree, keys):
        sp = src_tree["params"]
        for k in keys:
            if k in sp and k in p:
                p[k] = copy.deepcopy(sp[k])

    if voxel_params is not None:
        graft(voxel_params, ["voxel_branch"])
        if take_sky_from == "voxel":
            graft(voxel_params, ["sky", "encoder"])
    if pixel_params is not None:
        graft(pixel_params, ["pixel_branch"])
        if take_sky_from == "pixel":
            graft(pixel_params, ["sky", "encoder"])
    return out
