"""Kitchen-sink NKSR field losses (UDF / spatial TSDF / GT-surface).

TPU-native replacement for the reference's
/root/reference/infinicube/voxelgen/modules/autoencoding/losses/nksr_loss.py,
which supervises the optional neural-kernel (NKSR) UDF/SDF decoder branch.
The reference leans on three CUDA extensions:

- ``ext.sdfgen.sdf_from_points`` (nksr_loss.py:155) — a k-NN IMLS signed
  distance from an oriented point cloud. Here it is the classic IMLS
  estimator over the MXU brute-force k-NN (``ops/knn.py``): one rank-3
  matmul for the distances, Gaussian-weighted plane distances for the value.
- ``nksr.svh`` hierarchy sample generation (nksr_loss.py:43-119) — here
  inverse-CDF slot sampling over the capacity-padded grids (one cumsum +
  one searchsorted; no jagged tensors).
- ``field.evaluate_f(grad=True)`` (nksr_loss.py:319-333) — here the field is
  a plain callable ``field_fn(points f32[N, 3]) -> f32[N]`` and the surface
  normal comes from ``jax.vjp`` (exact analytic gradient, free on TPU).

Chi convention matches the reference: **positive inside** the surface
(nksr_loss.py:155 negates sdf_from_points). The reference's batched paths
assert ``len(batch[DS.GT_GEOMETRY]) == 1`` ("Only supports single batch for
now", nksr_loss.py:212/362) — this module is likewise single-sample; vmap if
a batched variant is ever needed. ``StructureLoss`` (nksr_loss.py:246-273)
is already covered by ``vae.loss.struct_ce``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import index_map
from infinicube_tpu.ops.knn import knn_bruteforce

FieldFn = Callable[[jnp.ndarray], jnp.ndarray]   # f32[N, 3] -> f32[N]


# ---------------------------------------------------------------------------
# grid IoU (nksr_loss.py:26-34)
# ---------------------------------------------------------------------------

def grid_iou(gt: Grid, pd: Grid) -> jnp.ndarray:
    """f32[B] IoU of two same-frame grids' active voxel sets.

    Reference grid_iou uses ijk_to_index + count (nksr_loss.py:26-34); here
    the sorted packed-key lookup (grid/ops.index_map) does the same in one
    searchsorted."""
    idx = index_map(gt, pd)                       # [B, C_gt] into pd, -1 miss
    inter = jnp.sum((idx >= 0) & gt.mask, axis=-1).astype(jnp.float32)
    union = (gt.num_voxels + pd.num_voxels).astype(jnp.float32) - inter
    return inter / (union + 1e-6)


# ---------------------------------------------------------------------------
# IMLS signed distance from an oriented point cloud (ext.sdfgen replacement)
# ---------------------------------------------------------------------------

def sdf_from_points(query: jnp.ndarray, ref_xyz: jnp.ndarray,
                    ref_normal: jnp.ndarray,
                    ref_mask: jnp.ndarray | None = None, k: int = 8,
                    stdv: float = 0.2) -> jnp.ndarray:
    """IMLS SDF estimate: positive OUTSIDE (along the normals).

    sdf(q) = sum_i w_i <q - x_i, n_i> / sum_i w_i over the k nearest
    reference points, w_i = exp(-||q - x_i||^2 / (2 stdv^2)). Replaces
    ext.sdfgen.sdf_from_points(q, xyz, normal, 8, stdv, False)
    (nksr_loss.py:155); the reference picks stdv=0.2 for voxel_size>0.004."""
    d2, idx = knn_bruteforce(query, ref_xyz, ref_mask, k=k)
    nn_xyz = ref_xyz[idx]                         # [N, k, 3]
    nn_nrm = ref_normal[idx]
    plane_d = jnp.sum((query[:, None, :] - nn_xyz) * nn_nrm, axis=-1)
    w = jnp.exp(-d2 / (2.0 * stdv * stdv))
    # guard against all-weights-underflow far from the cloud: fall back to
    # uniform weights over the k neighbors (same limit the CUDA op takes)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(wsum > 1e-12, w, 1.0)
    return jnp.sum(w * plane_d, -1) / jnp.maximum(jnp.sum(w, -1), 1e-12)


# ---------------------------------------------------------------------------
# field transform (nksr_loss.py:121-135)
# ---------------------------------------------------------------------------

def transform_field(x: jnp.ndarray, truncation: float,
                    soft: bool = True) -> jnp.ndarray:
    """tanh-soft (gt_soft) or hard clamp truncation of a distance field."""
    if soft:
        return jnp.tanh(x / truncation) * truncation
    return jnp.clip(x, -truncation, truncation)


# ---------------------------------------------------------------------------
# samplers (nksr_loss.py:43-119)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """One entry of hparams.supervision.{udf,spatial}.samplers."""
    type: str = "uniform"          # "uniform" | "band"
    n_samples: int = 4096
    expand: int = 0                # uniform: voxel-cube expansion
    expand_top: int = 0            # uniform: expansion of the coarsest level
    eps: float = 0.5               # band: normal-noise scale, * voxel_size


def _masked_choice(key, valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """int32[n] slot indices drawn uniformly from valid slots (inverse CDF:
    one cumsum + one searchsorted — no jagged compaction)."""
    cum = jnp.cumsum(valid.astype(jnp.int32))
    total = jnp.maximum(cum[-1], 1)
    u = jax.random.uniform(key, (n,)) * total.astype(jnp.float32)
    return jnp.searchsorted(cum.astype(jnp.float32), u, side="right"
                            ).astype(jnp.int32)


def hierarchy_samples(key, grids: Sequence[Grid], n_samples: int,
                      expand: int = 0, expand_top: int = 0,
                      batch_index: int = 0) -> jnp.ndarray:
    """f32[n_samples, 3] uniform samples across all decoder hierarchy levels
    (_get_svh_samples, nksr_loss.py:43-89).

    The reference dilates each level's grid by ``expand // 2`` voxels when
    expand >= 3 and samples the padded voxel set uniformly; here each active
    voxel's sample cube is widened to ``(1 + 2 * (expand // 2))`` voxels —
    the same support, with overlap regions weighted by multiplicity instead
    of uniformly (MC sample positions for a loss, not a measure match)."""
    centers, scales, valid = [], [], []
    for d, g in enumerate(grids):
        e = expand if d != len(grids) - 1 else expand_top
        width = float(1 + 2 * (e // 2)) if e >= 3 else 1.0
        centers.append(g.voxel_centers()[batch_index])
        scales.append(jnp.broadcast_to(g.voxel_size[None, :] * width,
                                       (g.capacity, 3)))
        valid.append(g.mask[batch_index])
    centers = jnp.concatenate(centers, 0)
    scales = jnp.concatenate(scales, 0)
    valid = jnp.concatenate(valid, 0)
    k_slot, k_off = jax.random.split(key)
    slots = _masked_choice(k_slot, valid, n_samples)
    off = jax.random.uniform(k_off, (n_samples, 3)) - 0.5
    return centers[slots] + off * scales[slots]


def band_samples(key, ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
                 ref_mask: jnp.ndarray | None, n_samples: int, eps: float,
                 voxel_size: float) -> jnp.ndarray:
    """f32[n_samples, 3] near-surface band samples: reference points jittered
    along their normals by N(0, (eps * voxel_size)^2) (nksr_loss.py:101-118)."""
    if ref_mask is None:
        ref_mask = jnp.ones(ref_xyz.shape[:1], bool)
    k_slot, k_nrm = jax.random.split(key)
    inds = _masked_choice(k_slot, ref_mask, n_samples)
    sigma = eps * voxel_size
    noise = jax.random.normal(k_nrm, (n_samples, 1)) * sigma
    return ref_xyz[inds] + ref_normal[inds] * noise


def draw_samples(key, samplers: Sequence[SamplerConfig],
                 grids: Sequence[Grid], ref_xyz: jnp.ndarray,
                 ref_normal: jnp.ndarray, ref_mask: jnp.ndarray | None,
                 voxel_size: float) -> jnp.ndarray:
    """_get_samples (nksr_loss.py:91-119): concatenation over sampler configs."""
    out = []
    for i, s in enumerate(samplers):
        sk = jax.random.fold_in(key, i)
        if s.type == "uniform":
            out.append(hierarchy_samples(sk, grids, s.n_samples, s.expand,
                                         s.expand_top))
        elif s.type == "band":
            out.append(band_samples(sk, ref_xyz, ref_normal, ref_mask,
                                    s.n_samples, s.eps, voxel_size))
        else:
            raise ValueError(f"unknown sampler type {s.type!r}")
    return jnp.concatenate(out, 0)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NKSRLossConfig:
    """hparams.supervision subset consumed by the kitchen-sink losses."""
    voxel_size: float = 0.1
    gt_band: float = 3.0               # truncation = gt_band * voxel_size
    gt_soft: bool = True
    udf_weight: float = 1.0
    spatial_weight: float = 1.0
    reg_sdf_weight: float = 0.0
    surface_value_weight: float = 1.0
    surface_normal_weight: float = 1.0
    surface_subsample: int = 4096
    sdf_knn: int = 8
    sdf_stdv: float = 0.2

    @property
    def truncation(self) -> float:
        return self.gt_band * self.voxel_size


def compute_gt_chi(cfg: NKSRLossConfig, query: jnp.ndarray,
                   ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
                   ref_mask: jnp.ndarray | None = None,
                   transform: bool = True) -> jnp.ndarray:
    """compute_gt_chi_from_pts (nksr_loss.py:137-161): chi = -IMLS sdf,
    optionally truncated."""
    chi = -sdf_from_points(query, ref_xyz, ref_normal, ref_mask,
                           k=cfg.sdf_knn, stdv=cfg.sdf_stdv)
    return transform_field(chi, cfg.truncation, cfg.gt_soft) if transform \
        else chi


def udf_loss(cfg: NKSRLossConfig, field_fn: FieldFn, query: jnp.ndarray,
             ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
             ref_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """UDFLoss.apply (nksr_loss.py:185-243): L1 between the truncated
    predicted field and |truncated gt chi|, normalized by voxel_size."""
    gt_tudf = jnp.abs(compute_gt_chi(cfg, query, ref_xyz, ref_normal,
                                     ref_mask))
    pd_tudf = transform_field(field_fn(query), cfg.truncation, cfg.gt_soft)
    return jnp.mean(jnp.abs(pd_tudf - gt_tudf) / cfg.voxel_size)


def spatial_loss(cfg: NKSRLossConfig, field_fn: FieldFn, query: jnp.ndarray,
                 ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
                 ref_mask: jnp.ndarray | None = None,
                 near_surface_mask: jnp.ndarray | None = None):
    """SpatialLoss.apply (nksr_loss.py:342-415).

    Near-surface: L1 of truncated fields / voxel_size; empty space:
    0.1 * exp(chi / (2 voxel_size)) (pushes chi negative = outside). With
    point-cloud GT every sample is near-surface (nksr_loss.py:388-391).
    Returns (mixed_loss, reg_sdf_loss)."""
    pd_chi = field_fn(query)
    gt_tsdf = compute_gt_chi(cfg, query, ref_xyz, ref_normal, ref_mask)
    pd_tsdf = transform_field(pd_chi, cfg.truncation, cfg.gt_soft)
    if near_surface_mask is None:
        near_surface_mask = jnp.ones(query.shape[:1], bool)
    near = jnp.abs(pd_tsdf - gt_tsdf) / cfg.voxel_size
    empty = 0.1 * jnp.exp(pd_chi / (2.0 * cfg.voxel_size))
    mixed = (jnp.sum(jnp.where(near_surface_mask, near, 0.0))
             + jnp.sum(jnp.where(near_surface_mask, 0.0, empty))
             ) / query.shape[0]
    reg_sdf_eps = 0.5
    reg = jnp.mean(reg_sdf_eps / (pd_chi * pd_chi + reg_sdf_eps ** 2))
    return mixed, reg


def gt_surface_loss(cfg: NKSRLossConfig, field_fn: FieldFn, key,
                    ref_xyz: jnp.ndarray, ref_normal: jnp.ndarray,
                    ref_mask: jnp.ndarray | None = None):
    """GTSurfaceLoss.apply (nksr_loss.py:276-339): field value L1 on the
    surface + (1 - <normalized -grad field, gt normal>).

    The gradient is exact via jax.vjp (valid for pointwise fields, which is
    what evaluate_f computes per query). Returns (value_loss, normal_loss)."""
    if ref_mask is None:
        ref_mask = jnp.ones(ref_xyz.shape[:1], bool)
    n = min(cfg.surface_subsample, ref_xyz.shape[0]) \
        if cfg.surface_subsample > 0 else ref_xyz.shape[0]
    inds = _masked_choice(key, ref_mask, n)
    pts, nrm = ref_xyz[inds], ref_normal[inds]
    val, vjp = jax.vjp(field_fn, pts)
    value_loss = jnp.mean(jnp.abs(val))
    if cfg.surface_normal_weight > 0.0:
        grad = vjp(jnp.ones_like(val))[0]
        pd_grad = -grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True)
                           + 1e-6)
        normal_loss = 1.0 - jnp.mean(jnp.sum(pd_grad * nrm, axis=-1))
    else:
        normal_loss = jnp.zeros(())
    return value_loss, normal_loss


def kitchen_sink_losses(cfg: NKSRLossConfig, field_fn: FieldFn, key,
                        grids: Sequence[Grid], ref_xyz: jnp.ndarray,
                        ref_normal: jnp.ndarray,
                        ref_mask: jnp.ndarray | None = None,
                        samplers: Sequence[SamplerConfig] = (
                            SamplerConfig("uniform", 4096, expand_top=4),
                            SamplerConfig("band", 4096),
                        )):
    """Weighted sum of every enabled kitchen-sink loss + per-term metrics —
    the apply() cascade the reference runs per training step."""
    k_samp, k_surf = jax.random.split(key)
    metrics = {}
    total = jnp.zeros(())
    if cfg.udf_weight > 0.0 or cfg.spatial_weight > 0.0:
        query = draw_samples(k_samp, samplers, grids, ref_xyz, ref_normal,
                             ref_mask, cfg.voxel_size)
        if cfg.udf_weight > 0.0:
            l = udf_loss(cfg, field_fn, query, ref_xyz, ref_normal, ref_mask)
            total += cfg.udf_weight * l
            metrics["udf"] = l
        if cfg.spatial_weight > 0.0:
            mixed, reg = spatial_loss(cfg, field_fn, query, ref_xyz,
                                      ref_normal, ref_mask)
            total += cfg.spatial_weight * mixed
            metrics["spatial"] = mixed
            if cfg.reg_sdf_weight > 0.0:
                total += cfg.reg_sdf_weight * reg
                metrics["msa"] = reg
    if cfg.surface_value_weight > 0.0 or cfg.surface_normal_weight > 0.0:
        v, nl = gt_surface_loss(cfg, field_fn, k_surf, ref_xyz, ref_normal,
                                ref_mask)
        total += cfg.surface_value_weight * v \
            + cfg.surface_normal_weight * nl
        metrics["gt-surface-value"] = v
        metrics["gt-surface-normal"] = nl
    metrics["total"] = total
    return total, metrics
