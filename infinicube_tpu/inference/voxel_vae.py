"""VAE reconstruction eval (stage-1a regression harness).

Mirror of /root/reference/infinicube/inference/voxel_vae.py: run the sparse
VAE on inputs, compare reconstructed grids against GT (struct IoU, semantic
accuracy), save pred/gt grids + renders. Serves as the de-facto regression
test the reference uses (SURVEY.md §4 eval-as-test)."""

from __future__ import annotations

import argparse
import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid.ops import index_map
from infinicube_tpu.models.vae import (
    SparseStructureVAE, SparseVAEConfig, build_hash_tree)
from infinicube_tpu.utils.fileio import save_grid_semantic


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_jit(model, params, grids, sem):
    return model.apply(params, grids, sem, method=SparseStructureVAE.encode)


@functools.partial(jax.jit, static_argnums=(0,))
def _decode_jit(model, params, mu):
    return model.apply(params, mu, None, method=SparseStructureVAE.decode)


def evaluate_reconstruction(model: SparseStructureVAE, params,
                            points: jnp.ndarray, semantics_pts: jnp.ndarray,
                            rng) -> dict:
    """One-sample VAE roundtrip metrics."""
    cfg = model.cfg
    mask = jnp.ones(points.shape[:2], bool)
    grids = build_hash_tree(cfg, points, mask)
    from infinicube_tpu.grid.ops import majority_label
    sem = majority_label(grids[0], points, semantics_pts, mask,
                         cfg.num_semantic)
    mu, logvar = _encode_jit(model, params, grids, sem)
    dec = _decode_jit(model, params, mu)
    pred = dec["grid"]
    gt = grids[0]
    # IoU of voxel sets
    inter = int(jnp.sum((index_map(pred, gt) >= 0) & pred.mask))
    union = int(pred.total_voxels + gt.total_voxels) - inter
    # semantic accuracy on intersecting voxels
    gi = index_map(pred, gt)
    have = (gi >= 0) & pred.mask
    labels = jax.vmap(lambda s, i: s[jnp.clip(i, 0)])(sem, gi)
    acc = float(jnp.sum((jnp.argmax(dec["semantic_logits"], -1) == labels) &
                        have) / jnp.maximum(jnp.sum(have), 1))
    return {"grid_iou": inter / max(union, 1), "semantic_acc": acc,
            "pred_grid": pred, "gt_grid": gt,
            "pred_sem": jnp.argmax(dec["semantic_logits"], -1), "gt_sem": sem}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True, help="npz with xyz/semantic")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output", required=True)
    args = ap.parse_args(argv)
    d = np.load(args.points)
    cfg = SparseVAEConfig()
    model = SparseStructureVAE(cfg)
    pts = jnp.asarray(d["xyz"], jnp.float32)[None]
    sem = jnp.asarray(d["semantic"], jnp.int32)[None]
    rng = jax.random.PRNGKey(0)
    if args.checkpoint:
        from infinicube_tpu.training.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.checkpoint)
        grids = build_hash_tree(cfg, pts, jnp.ones(pts.shape[:2], bool))
        abstract = jax.eval_shape(model.init, rng, grids, sem[:, :grids[0].capacity], rng)
        params = mgr.restore(abstract)
    else:
        grids = build_hash_tree(cfg, pts, jnp.ones(pts.shape[:2], bool))
        from infinicube_tpu.grid.ops import majority_label
        s0 = majority_label(grids[0], pts, sem, jnp.ones(pts.shape[:2], bool),
                            cfg.num_semantic)
        params = model.init(rng, grids, s0, rng)
    res = evaluate_reconstruction(model, params, pts, sem, rng)
    out = Path(args.output)
    g = res["pred_grid"]
    m = np.asarray(g.mask[0])
    save_grid_semantic(out / "pred.npz", np.asarray(g.ijk[0])[m],
                       np.asarray(res["pred_sem"][0])[m],
                       np.asarray(g.voxel_size), np.asarray(g.origin))
    print({k: v for k, v in res.items() if isinstance(v, float)})


if __name__ == "__main__":
    main()
