"""VAE losses and metrics.

Mirror of the reference's autoencoding losses
(/root/reference/infinicube/voxelgen/modules/autoencoding/losses/base_loss.py):
per-level structure cross-entropy with optional adaptive positive weighting
(base_loss.py:40-79), struct accuracy + grid IoU metrics (81-100), semantic CE
(151), and normalized KL with linear annealing (198-344)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import index_map


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    struct_weight: float = 10.0
    semantic_weight: float = 1.0
    normal_weight: float = 0.0
    kl_weight: float = 2e-3
    kl_anneal_steps: int = 0          # 0 = no anneal
    adaptive_pos_weight: bool = True


def struct_ce(logits: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
              adaptive_pos_weight: bool = True):
    """2-class CE over candidate voxels. logits [B, C, 2]; target bool[B, C];
    mask bool[B, C]. Adaptive weighting balances the (sparse) positives."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = target.astype(jnp.int32)
    ce = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    if adaptive_pos_weight:
        pos = jnp.sum(target * m) + 1.0
        neg = jnp.sum((1 - target) * m) + 1.0
        w_pos = (pos + neg) / (2.0 * pos)
        w_neg = (pos + neg) / (2.0 * neg)
        w = jnp.where(target, w_pos, w_neg)
        ce = ce * w
    loss = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    pred = jnp.argmax(logits, axis=-1) > 0
    acc = jnp.sum((pred == target) * m) / jnp.maximum(jnp.sum(m), 1.0)
    inter = jnp.sum((pred & target) * m)
    union = jnp.sum((pred | target) * m)
    iou = inter / jnp.maximum(union, 1.0)
    return loss, {"acc": acc, "iou": iou}


def semantic_ce(logits: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(lp, target[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    m = mask.astype(jnp.float32)
    loss = jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)
    acc = jnp.sum((jnp.argmax(logits, -1) == target) * m) / \
        jnp.maximum(jnp.sum(m), 1.0)
    return loss, {"sem_acc": acc}


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray):
    """Mean KL(q || N(0,1)) per latent element (normalized, base_loss KL)."""
    return 0.5 * jnp.mean(jnp.square(mu) + jnp.exp(logvar) - 1.0 - logvar)


def vae_loss(cfg: VAELossConfig, outputs: dict, gt_grid_finest: Grid,
             gt_semantics: jnp.ndarray, step: jnp.ndarray | int = 0):
    """Total loss from SparseStructureVAE guided outputs.

    gt_semantics int32[B, C0] aligned to gt_grid_finest slots."""
    metrics = {}
    total = 0.0
    for i, (logits, target, mask) in enumerate(outputs["struct"]):
        l, m = struct_ce(logits, target, mask.astype(bool),
                         cfg.adaptive_pos_weight)
        total = total + cfg.struct_weight * l
        metrics[f"struct{i}_ce"] = l
        metrics[f"struct{i}_iou"] = m["iou"]

    # semantics: decoded finest grid is a subset of GT (guided) — fetch GT
    # labels at matching voxels
    dec_grid: Grid = outputs["grid"]
    gt_idx = index_map(dec_grid, gt_grid_finest)
    have = (gt_idx >= 0) & dec_grid.mask
    labels = jax.vmap(lambda s, i: s[jnp.clip(i, 0)])(gt_semantics, gt_idx)
    sem_l, sem_m = semantic_ce(outputs["semantic_logits"], labels, have)
    total = total + cfg.semantic_weight * sem_l
    metrics["semantic_ce"] = sem_l
    metrics.update(sem_m)

    kl = kl_divergence(outputs["mu"], outputs["logvar"])
    w_kl = cfg.kl_weight
    if cfg.kl_anneal_steps > 0:
        w_kl = w_kl * jnp.minimum(1.0, jnp.asarray(step, jnp.float32) /
                                  cfg.kl_anneal_steps)
    total = total + w_kl * kl
    metrics["kl"] = kl
    metrics["total"] = total
    return total, metrics
