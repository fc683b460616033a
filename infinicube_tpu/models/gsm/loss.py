"""GSM unified loss: masked alpha L1, pixel L1 + masked SSIM, depth loss,
perceptual term, PSNR metrics, gaussian statistics.

Mirror of the reference's UnifiedLoss + ssim_w_mask + depth_losses
(/root/reference/infinicube/voxelgen/modules/gsm_modules/loss/
unified_loss.py:30-233). The perceptual term uses the checkpoint-shaped
LPIPS-VGG16 (models/gsm/lpips.py, converted via convert_lpips) when
``lpips_params`` are supplied, falling back to a multi-scale
gradient-magnitude proxy otherwise."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GSMLossConfig:
    rgb_l1_weight: float = 1.0
    ssim_weight: float = 0.2
    alpha_weight: float = 0.5
    depth_weight: float = 0.1
    perceptual_weight: float = 0.05
    lpips_crop: int | None = 224
    # Real-LPIPS images are cropped to lpips_crop^2 (random offsets when an
    # rng is passed to gsm_loss, center otherwise) — common LPIPS practice,
    # and the costed memory lever for training at release scale: VGG16
    # fwd+bwd over full 3x480x704 views pushes the release train step
    # 578 MB past the 15.75 GB v5e HBM (measured compile OOM); 224^2 crops
    # cut the VGG activation footprint 6.7x. None = full images.


def _gaussian_kernel(size=11, sigma=1.5):
    x = jnp.arange(size) - size // 2
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray | None = None):
    """Masked SSIM over (..., H, W, C) images in [0,1]
    (reference ssim_w_mask.py)."""
    k = _gaussian_kernel()[..., None, None]

    def filt(x):
        C = x.shape[-1]
        kc = jnp.tile(k, (1, 1, 1, C))
        return jax.lax.conv_general_dilated(
            x[None] if x.ndim == 3 else x, kc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    a4 = a if a.ndim == 4 else a[None]
    b4 = b if b.ndim == 4 else b[None]
    mu_a, mu_b = filt(a4), filt(b4)
    var_a = filt(a4 * a4) - mu_a ** 2
    var_b = filt(b4 * b4) - mu_b ** 2
    cov = filt(a4 * b4) - mu_a * mu_b
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / \
        ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    if mask is not None:
        m = mask[..., None] if mask.ndim == s.ndim - 1 else mask
        m = jnp.broadcast_to(m, s.shape)
        return jnp.sum(s * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(s)


def perceptual_proxy(a: jnp.ndarray, b: jnp.ndarray):
    """Multi-scale gradient-magnitude distance (LPIPS stand-in)."""
    total = 0.0
    for _ in range(3):
        db_x = jnp.diff(a - b, axis=-2)
        db_y = jnp.diff(a - b, axis=-3)
        total = total + jnp.abs(db_x).mean() + jnp.abs(db_y).mean()
        a = a[..., ::2, ::2, :]
        b = b[..., ::2, ::2, :]
    return total / 3.0


def psnr(a, b, mask=None):
    if mask is not None:
        m = jnp.broadcast_to(mask[..., None], a.shape)
        mse = jnp.sum(((a - b) ** 2) * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def gsm_loss(cfg: GSMLossConfig, render: dict, gt_rgb: jnp.ndarray,
             gt_mask: jnp.ndarray, sky_mask: jnp.ndarray,
             gt_depth: jnp.ndarray | None = None,
             gaussians: dict | None = None,
             lpips_params: dict | None = None,
             rng: jnp.ndarray | None = None):
    """render: dict from renderer (rgb/alpha/depth [V,...]); gt_mask
    bool[V,H,W] = effective supervision mask; sky_mask bool[V,H,W].
    ``rng`` randomizes the per-view LPIPS crop offsets (cfg.lpips_crop)."""
    m = gt_mask.astype(jnp.float32)
    rgb_l1 = jnp.sum(jnp.abs(render["rgb"] - gt_rgb) * m[..., None]) / \
        jnp.maximum(jnp.sum(m) * 3, 1.0)
    s = ssim(render["rgb"], gt_rgb, gt_mask)
    # alpha: 1 on non-sky foreground, 0 on sky
    alpha_target = (~sky_mask).astype(jnp.float32)
    alpha_l1 = jnp.sum(jnp.abs(render["alpha"] - alpha_target) * m) / \
        jnp.maximum(jnp.sum(m), 1.0)
    total = cfg.rgb_l1_weight * rgb_l1 + cfg.ssim_weight * (1.0 - s) + \
        cfg.alpha_weight * alpha_l1
    metrics = {"rgb_l1": rgb_l1, "ssim": s, "alpha_l1": alpha_l1,
               "psnr": psnr(render["rgb"], gt_rgb, gt_mask)}
    if cfg.perceptual_weight > 0:
        if lpips_params is not None:
            from infinicube_tpu.models.gsm.lpips import LPIPS
            a, b = render["rgb"], gt_rgb
            c = cfg.lpips_crop
            if c is not None and (a.shape[-3] > c or a.shape[-2] > c):
                V, H, W = a.shape[-4], a.shape[-3], a.shape[-2]
                cy, cx = min(c, H), min(c, W)
                if rng is not None:
                    ky, kx = jax.random.split(rng)
                    ys = jax.random.randint(ky, (V,), 0, H - cy + 1)
                    xs = jax.random.randint(kx, (V,), 0, W - cx + 1)
                else:
                    ys = jnp.full((V,), (H - cy) // 2, jnp.int32)
                    xs = jnp.full((V,), (W - cx) // 2, jnp.int32)
                crop = jax.vmap(lambda img, y, x: jax.lax.dynamic_slice(
                    img, (y, x, 0), (cy, cx, img.shape[-1])))
                a, b = crop(a, ys, xs), crop(b, ys, xs)
            # compute in the params' dtype: bf16 LPIPS params (cast by the
            # caller, e.g. GSM_LPIPS_BF16) halve the VGG activation
            # footprint. jax.checkpoint drops the VGG forward residuals
            # from the step backward's liveness window (recompute at 224^2
            # is one cheap extra VGG forward) — together with the crop,
            # the levers that fit real LPIPS in the release train step.
            lp_dtype = jax.tree_util.tree_leaves(lpips_params)[0].dtype

            @jax.checkpoint
            def _lpips(a_, b_):
                return jnp.mean(LPIPS().apply(lpips_params, a_, b_))

            p = _lpips(
                LPIPS.from_unit_range(a).astype(lp_dtype),
                LPIPS.from_unit_range(b).astype(lp_dtype),
            ).astype(jnp.float32)
        else:
            p = perceptual_proxy(render["rgb"], gt_rgb)
        total = total + cfg.perceptual_weight * p
        metrics["perceptual"] = p
    if gt_depth is not None and cfg.depth_weight > 0:
        dm = m * (gt_depth > 0)
        dl = jnp.sum(jnp.abs(render["depth"] - gt_depth) * dm) / \
            jnp.maximum(jnp.sum(dm), 1.0)
        total = total + cfg.depth_weight * dl
        metrics["depth_l1"] = dl
    if gaussians is not None:
        v = gaussians["valid"]
        metrics["gs_mean_scale"] = jnp.sum(
            jnp.mean(gaussians["scales"], -1) * v) / jnp.maximum(v.sum(), 1)
        metrics["gs_mean_opacity"] = jnp.sum(
            gaussians["opacities"] * v) / jnp.maximum(v.sum(), 1)
    metrics["total"] = total
    return total, metrics
