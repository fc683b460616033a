"""Dataset -> model-batch adapters: the bridge between the host data
pipeline (data/waymo_dataset.py) and the jitted train steps.

Mirrors how the reference models consume batches (get_dataset_spec +
transform_batch in each Lightning model; deferred voxelization at first
device touch, base_model.py:634-672):

- VAE batches: crop points (+ semantics) -> hash-tree grid pyramid + voxel
  labels on device.
- Diffusion batches: VAE-encoded latents (frozen VAE, extract_latent
  diffusion.py:466) + map/box condition cubes.
- GSM batches: grid + input images/masks/poses + voxel-depth priors.

Everything returns fixed-capacity padded arrays so batches are jit-stable."""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.data.specs import DatasetSpec, pad_stack
from infinicube_tpu.grid.ops import majority_label
from infinicube_tpu.models.vae.sunet import SparseVAEConfig, build_hash_tree


def _points_batch(samples: list[dict], capacity: int):
    pts, mask = pad_stack([s[DatasetSpec.INPUT_PC] for s in samples],
                          capacity)
    sem, _ = pad_stack([s[DatasetSpec.GT_SEMANTIC].astype(np.int32)
                        for s in samples], capacity)
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(sem)


def vae_batches(dataset, cfg: SparseVAEConfig, batch_size: int = 1,
                point_capacity: int = 65536) -> Iterator:
    """-> (grids, voxel_semantics) batches for SparseStructureVAE."""
    buf: list[dict] = []
    for sample in dataset:
        buf.append(sample)
        if len(buf) < batch_size:
            continue
        pts, mask, sem = _points_batch(buf, point_capacity)
        buf = []
        grids = build_hash_tree(cfg, pts, mask)
        vox_sem = majority_label(grids[0], pts, sem, mask, cfg.num_semantic)
        yield grids, vox_sem


def _cond_from_sample(s: dict, diffusion, max_map: int, max_box: int):
    maps = s.get(DatasetSpec.MAPS_3D, {})
    T = diffusion.cfg.num_map_types
    mp = np.zeros((T, max_map, 3), np.float32)
    mm = np.zeros((T, max_map), bool)
    for ti, key in enumerate(sorted(maps)[:T]):
        p = maps[key]
        n = min(len(p), max_map)
        if n:
            sel = np.linspace(0, len(p) - 1, n).astype(int)
            mp[ti, :n] = p[sel]
            mm[ti, :n] = True
    boxes = s.get(DatasetSpec.BOXES_3D, {})
    bp = np.tile(np.eye(4, dtype=np.float32), (max_box, 1, 1))
    bl = np.ones((max_box, 3), np.float32)
    bm = np.zeros((max_box,), bool)
    poses = np.asarray(boxes.get("poses", np.zeros((0, 4, 4))))[:max_box]
    if len(poses):
        bp[:len(poses)] = poses
        bl[:len(poses)] = np.asarray(boxes["lwhs"])[:len(poses)]
        bm[:len(poses)] = True
    return mp, mm, bp, bl, bm


def diffusion_batches(dataset, diffusion, vae, vae_params,
                      vae_cfg: SparseVAEConfig, batch_size: int = 2,
                      point_capacity: int = 65536, max_map: int = 8192,
                      max_box: int = 32, rng: jax.Array | None = None
                      ) -> Iterator:
    """-> (latents, CondCubes) batches: frozen-VAE encode + condition cubes
    (reference extract_latent + _forward_cond assembly)."""
    from infinicube_tpu.models.vae.sunet import SparseStructureVAE
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    @jax.jit
    def encode(pts, mask, sem, key):
        grids = build_hash_tree(vae_cfg, pts, mask)
        vox_sem = majority_label(grids[0], pts, sem, mask,
                                 vae_cfg.num_semantic)
        mu, logvar = vae.apply(vae_params, grids, vox_sem,
                               method=SparseStructureVAE.encode)
        eps = jax.random.normal(key, mu.shape)
        return mu + jnp.exp(0.5 * logvar) * eps

    buf: list[dict] = []
    for sample in dataset:
        buf.append(sample)
        if len(buf) < batch_size:
            continue
        pts, mask, sem = _points_batch(buf, point_capacity)
        conds = [_cond_from_sample(s, diffusion, max_map, max_box)
                 for s in buf]
        buf = []
        rng, sub = jax.random.split(rng)
        latents = encode(pts, mask, sem, sub)
        cond = diffusion.encode_conditions(
            jnp.asarray(np.stack([c[0] for c in conds])),
            jnp.asarray(np.stack([c[1] for c in conds])),
            jnp.asarray(np.stack([c[2] for c in conds])),
            jnp.asarray(np.stack([c[3] for c in conds])),
            jnp.asarray(np.stack([c[4] for c in conds])))
        yield latents, cond


def scale_by_std(batches: Iterator, save_path=None) -> Iterator:
    """scale_by_std (reference diffusion.py:424-443): fix scale_factor =
    1/std(latents) from the FIRST batch, scale every batch's latents by it,
    and optionally persist it (json) so inference divides samples by the
    same value (model.sample(scale_factor=...))."""
    import json
    from pathlib import Path
    it = iter(batches)
    latents, cond = next(it)
    sf = float(1.0 / max(float(jnp.std(latents)), 1e-6))
    if save_path is not None:
        p = Path(save_path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps({"scale_factor": sf}))
    yield latents * sf, cond
    for latents, cond in it:
        yield latents * sf, cond


def gsm_batches(dataset, gsm_cfg, voxel_capacity: int = 65536,
                point_capacity: int = 65536) -> Iterator:
    """-> GSM batch dicts (single scene per step, the reference's batch-1
    GSM training)."""
    from infinicube_tpu.grid.build import grid_from_points
    from infinicube_tpu.models.gsm.lifter import voxel_depth_prior
    for s in dataset:
        if DatasetSpec.IMAGES_INPUT not in s:
            continue
        pts = jnp.asarray(s[DatasetSpec.INPUT_PC])[None]
        mask = jnp.ones(pts.shape[:2], bool)
        grid = grid_from_points(pts, mask, 0.2, 0.1,
                                capacity=voxel_capacity)
        images = jnp.asarray(s[DatasetSpec.IMAGES_INPUT])
        Ks = jnp.asarray(s[DatasetSpec.IMAGES_INPUT_INTRINSIC])
        poses = jnp.asarray(s[DatasetSpec.IMAGES_INPUT_POSE])
        depth_prior = voxel_depth_prior(
            grid, Ks, poses, gsm_cfg.dense_ijk_min, gsm_cfg.dense_dims,
            images.shape[1:3])
        yield {
            "grid": grid,
            "images": images,
            "masks": jnp.asarray(s[DatasetSpec.IMAGES_INPUT_MASK]),
            "Ks": Ks,
            "cam_to_worlds": poses,
            "depth_prior": depth_prior,
        }
