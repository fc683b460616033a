"""Small shared helpers.

Mirror of /root/reference/infinicube/voxelgen/utils/common_util.py:
model-from-config construction (:52-175), batch2device (:32), and
mask_image_patches (:176 — the GSM pixel-branch depth patch-dropout)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_model_from_config(cfg, seed: int = 0):
    """Build (model, params) from a Config with a ``model:`` key — the local
    analogue of create_model_from_local_config. Checkpoint loading composes
    via training.checkpoint.CheckpointManager / partial_restore."""
    from infinicube_tpu.train import BUILDERS
    kind = cfg.get_path("model", "diffusion")
    params, loss_fn, _ = BUILDERS[kind](cfg)
    return params, loss_fn


def batch2device(batch, sharding=None):
    """Move a host batch pytree onto device(s)."""
    if sharding is None:
        return jax.tree.map(jnp.asarray, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def mask_image_patches(rng: jax.Array, image: jnp.ndarray, patch: int = 32,
                       drop_prob: float = 0.5) -> jnp.ndarray:
    """Zero random patches (masked_voxel_depth patch-dropout p=0.5 used by
    the GSM pixel branch at training, pixel_branch.py:129-198)."""
    h, w = image.shape[-3:-1]
    ph, pw = -(-h // patch), -(-w // patch)
    keep = jax.random.uniform(rng, image.shape[:-3] + (ph, pw)) >= drop_prob
    keep = jnp.repeat(jnp.repeat(keep, patch, -1), patch, -2)[..., :h, :w]
    return image * keep[..., None]
