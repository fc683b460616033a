"""Tile-based 3D Gaussian Splatting rasterizer (gsplat replacement).

Replaces the CUDA gsplat wheel the reference renders with
(/root/reference/infinicube/voxelgen/modules/render/gsplat_renderer.py:208-244:
``rasterization(means, quats, scales, opacities, colors, viewmats, Ks,
render_mode="RGB+ED", ...)`` returning color + expected depth + alpha).

TPU-first formulation (SURVEY.md §7.1-4; FlashGS/tensor-core-GS papers in
PAPERS.md are the pattern references):

1. **project**: EWA splatting math — camera transform, perspective Jacobian,
   2D covariance + 0.3 px low-pass, 3-sigma radius, near/radius culling. Pure
   vectorized jnp.
2. **bin**: each gaussian emits up to SxS static tile instances (span larger
   than S tiles is radius-clamped); instances are lexsorted by (tile, depth)
   — one global sort replaces CUDA's radix sort — and each tile gathers its
   first K_max instances via searchsorted offsets (capacity-bounded,
   front-to-back ordered).
3. **composite**: per tile, alpha weights for all K_max gaussians evaluate
   vectorized over the 16x16 pixel block; transmittance is an exclusive
   cumprod over the depth axis (differentiable, no sequential scan over
   gaussians); tiles are processed in chunks under ``lax.map`` to bound
   memory. Gradients flow to every gaussian parameter through the gathers —
   the AD backward IS the gsplat backward.

Returns (color [H,W,C], alpha [H,W], depth [H,W] — expected z), matching the
reference's RGB+ED semantics (0 depth where nothing renders).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """quats (..., 4) wxyz (need not be normalized) -> (..., 3, 3)."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True),
                            1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


class Projected(NamedTuple):
    mean2d: jnp.ndarray   # f32[N, 2] pixel coords
    conic: jnp.ndarray    # f32[N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # f32[N] camera z
    radius: jnp.ndarray   # f32[N] pixel radius (3 sigma)
    valid: jnp.ndarray    # bool[N]


def project_gaussians(means: jnp.ndarray, quats: jnp.ndarray,
                      scales: jnp.ndarray, viewmat: jnp.ndarray,
                      K: jnp.ndarray, image_hw: tuple[int, int],
                      near: float = 0.01, radius_clip: float = 0.0,
                      eps2d: float = 0.3) -> Projected:
    """viewmat f32[4,4] world-to-camera (OpenCV). EWA projection."""
    h, w = image_hw
    R = viewmat[:3, :3]
    tcam = means @ R.T + viewmat[:3, 3]
    z = tcam[:, 2]
    # Behind-/near-plane gaussians are invalidated below, but an unguarded
    # 1/z would still flow 1e6-scale inv_z into the Jacobian terms whose
    # squares overflow f32 in the BACKWARD pass (inf * 0-mask = NaN grads
    # on means/quats/scales — measured: views with cameras inside the
    # volume produced ~5e5 NaN grad entries and every train step was
    # silently NaN-skipped). Sanitize z first; values on masked rows are
    # irrelevant downstream.
    front = z > near
    z_safe = jnp.where(front, jnp.maximum(z, near), 1.0)
    inv_z = 1.0 / z_safe
    fx, fy = K[0, 0], K[1, 1]
    u = tcam[:, 0] * inv_z * fx + K[0, 2]
    v = tcam[:, 1] * inv_z * fy + K[1, 2]

    # EWA covariance fully COMPONENT-WISE on [N] arrays: materializing
    # [N, 3, 3] / [N, 2, 3] tensors on TPU pads each 3x3 onto (8, 128)
    # tiles (~40-60x memory blowup — measured 6.4 GB for a 115 MB tensor at
    # 3M gaussians), which OOMs the rendering backward.
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True),
                            1e-8)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy),
         2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx),
         2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)]
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]

    def c3(a, b):  # world-frame cov3d[a, b] = sum_j R[a,j] s_j^2 R[b,j]
        return (r[3 * a] * r[3 * b] * s0 * s0 +
                r[3 * a + 1] * r[3 * b + 1] * s1 * s1 +
                r[3 * a + 2] * r[3 * b + 2] * s2 * s2)

    cw = [[c3(0, 0), c3(0, 1), c3(0, 2)],
          [None, c3(1, 1), c3(1, 2)],
          [None, None, c3(2, 2)]]

    def cwi(a, b):
        return cw[a][b] if b >= a else cw[b][a]

    def cc(a, b):  # camera-frame cov[a, b] = R_view cov3d R_view^T
        return sum(R[a, i] * cwi(i, j) * R[b, j]
                   for i in range(3) for j in range(3))

    cxx, cxy, cxz = cc(0, 0), cc(0, 1), cc(0, 2)
    cyy, cyz, czz = cc(1, 1), cc(1, 2), cc(2, 2)

    # perspective Jacobian rows J0 = (j00, 0, j02), J1 = (0, j11, j12)
    j00 = fx * inv_z
    j02 = -fx * tcam[:, 0] * inv_z ** 2
    j11 = fy * inv_z
    j12 = -fy * tcam[:, 1] * inv_z ** 2
    a2 = j00 * j00 * cxx + 2 * j00 * j02 * cxz + j02 * j02 * czz + eps2d
    b2 = j00 * j11 * cxy + j00 * j12 * cxz + j02 * j11 * cyz + \
        j02 * j12 * czz
    c2 = j11 * j11 * cyy + 2 * j11 * j12 * cyz + j12 * j12 * czz + eps2d

    det = a2 * c2 - b2 ** 2
    # RELATIVE determinant floor. An absolute 1e-10 floor lets extreme
    # needle gaussians (scale ratio ~1e4, e.g. a 29m x 4mm gaussian grazing
    # a camera) reach conic-backward terms ~ c2/det^2 ~ 1e31 that overflow
    # f32 — measured NaN grads on exactly one such gaussian, and fusion-
    # sensitive (clean per-view, NaN under lax.map: fma contraction shifts
    # the a2*c2 - b2^2 cancellation). Flooring at a fraction of a2*c2
    # (both >= eps2d > 0) bounds |conic| <= 1e6/min(a2,c2) and every
    # backward term, with no effect on well-conditioned gaussians where
    # det >> 1e-6*a2*c2.
    det = jnp.maximum(det, 1e-6 * a2 * c2)
    conic = jnp.stack([c2 / det, -b2 / det, a2 / det], -1)
    mid = 0.5 * (a2 + c2)
    lam = mid + jnp.sqrt(jnp.maximum(mid ** 2 - det, 0.01))
    radius = 3.0 * jnp.sqrt(lam)

    inside = (u + radius > 0) & (u - radius < w) & \
        (v + radius > 0) & (v - radius < h)
    valid = front & inside & (radius > radius_clip)
    return Projected(mean2d=jnp.stack([u, v], -1), conic=conic, depth=z,
                     radius=radius, valid=valid)


@partial(jax.jit, static_argnames=("image_hw", "tile", "max_span",
                                   "tile_capacity", "chunk"))
def rasterize(proj: Projected, opacities: jnp.ndarray, colors: jnp.ndarray,
              image_hw: tuple[int, int], tile: int = 16, max_span: int = 4,
              tile_capacity: int = 256, chunk: int = 130):
    """Composite projected gaussians. colors f32[N, C].

    tile_capacity bounds gaussians per tile (front-most by depth win);
    max_span bounds the tile footprint of one gaussian (span^2 instances) —
    huge gaussians are radius-clamped to the span."""
    h, w = image_hw
    ty_n, tx_n = -(-h // tile), -(-w // tile)
    T = ty_n * tx_n
    N = proj.mean2d.shape[0]
    S = max_span

    # clamp radius so the footprint fits the static span
    radius = jnp.minimum(proj.radius, (S * tile) / 2.0 - 1.0)
    t_min_x = jnp.floor((proj.mean2d[:, 0] - radius) / tile).astype(jnp.int32)
    t_min_y = jnp.floor((proj.mean2d[:, 1] - radius) / tile).astype(jnp.int32)
    t_max_x = jnp.floor((proj.mean2d[:, 0] + radius) / tile).astype(jnp.int32)
    t_max_y = jnp.floor((proj.mean2d[:, 1] + radius) / tile).astype(jnp.int32)

    # footprint expansion with N on the MINOR axis: [N, S, S] layouts pad
    # the trailing (S, S) onto (8, 128) tiles (32x memory at millions of
    # gaussians — measured 6.4 GB for a 204 MB tensor); [S, S, N] is fully
    # packed. The flat instance order changes (span-major) but the sort
    # downstream is order-invariant.
    offs = jnp.arange(S)
    gx = t_min_x[None, :] + offs[:, None]            # [S, N]
    gy = t_min_y[None, :] + offs[:, None]
    okx = (gx <= t_max_x[None, :]) & (gx >= 0) & (gx < tx_n)
    oky = (gy <= t_max_y[None, :]) & (gy >= 0) & (gy < ty_n)
    tile_id = (gy[:, None, :] * tx_n + gx[None, :, :])      # [S, S, N]
    ok = (oky[:, None, :] & okx[None, :, :]) & proj.valid[None, None, :]
    gauss_id = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, None],
                                (S, S, N)).reshape(-1)

    # ONE key-value sort: packed key = tile_id << depth_bits | log-quantized
    # depth; the gaussian id rides along inside lax.sort, avoiding the 8M
    # random permutation gathers an argsort would need. depth_bits sized so
    # the key fits int32; the per-gaussian depth key is computed ONCE and
    # broadcast over the footprint (no gather).
    import math as _math
    depth_bits = max(8, min(20, 30 - int(_math.ceil(_math.log2(T + 2)))))
    znear, zfar = 1e-2, 4e4
    zq_g = jnp.clip(jnp.log(jnp.maximum(proj.depth, znear) / znear) /
                    np.log(zfar / znear) * ((1 << depth_bits) - 1), 0,
                    (1 << depth_bits) - 1).astype(jnp.int32)
    packed = jnp.where(ok, tile_id * (1 << depth_bits) + zq_g[None, None, :],
                       T * (1 << depth_bits)).reshape(-1)
    skeys, gauss_sorted = jax.lax.sort((packed, gauss_id), num_keys=1)
    tile_sorted = skeys >> depth_bits

    starts = jnp.searchsorted(tile_sorted, jnp.arange(T))
    ends = jnp.searchsorted(tile_sorted, jnp.arange(T) + 1)

    # per-tile gather of up to tile_capacity front-most instances; all
    # per-gaussian parameters are packed into ONE row matrix so the whole
    # rasterizer performs a single row gather (TPU gathers are the cost)
    karange = jnp.arange(tile_capacity)
    idx = starts[:, None] + karange[None]                    # [T, K]
    k_ok = idx < ends[:, None]
    idx = jnp.clip(idx, 0, tile_sorted.shape[0] - 1)
    gidx = gauss_sorted[idx]                                 # [T, K]
    packed_params = jnp.concatenate([
        proj.mean2d, proj.conic, proj.depth[:, None], opacities[:, None],
        colors.astype(jnp.float32)], axis=-1)                # [N, 7 + C]
    tile_params = packed_params[gidx.reshape(-1)].reshape(
        T, tile_capacity, -1)                                # one gather

    # tile pixel coordinates
    tgrid_y, tgrid_x = jnp.meshgrid(jnp.arange(ty_n), jnp.arange(tx_n),
                                    indexing="ij")
    px0 = (tgrid_x.reshape(-1) * tile)
    py0 = (tgrid_y.reshape(-1) * tile)
    dyx = jnp.meshgrid(jnp.arange(tile), jnp.arange(tile), indexing="ij")
    local = jnp.stack([dyx[1].reshape(-1), dyx[0].reshape(-1)], -1)  # [P,(x,y)]

    C = colors.shape[-1]

    def tile_block(args):
        params, kk, x0, y0 = args                 # [K, 7+C], [K], scalars
        mu = params[:, 0:2]                       # [K, 2]
        con = params[:, 2:5]                      # [K, 3]
        dep = params[:, 5]                        # [K]
        op = params[:, 6]                         # [K]
        col = params[:, 7:]                       # [K, C]
        pix = jnp.stack([x0, y0]) + local + 0.5   # [P, 2]
        d = pix[None, :, :] - mu[:, None, :]      # [K, P, 2]
        sigma = 0.5 * (con[:, 0, None] * d[..., 0] ** 2 +
                       con[:, 2, None] * d[..., 1] ** 2) + \
            con[:, 1, None] * d[..., 0] * d[..., 1]
        # clamp sigma before exp: negative-sigma rows are masked below
        # (sigma > 0 gate), but an unclamped exp(-sigma) can overflow to
        # inf on them and the masking where/min backward then multiplies
        # 0 * inf = NaN into the op/conic/mean grads
        alpha = jnp.minimum(
            op[:, None] * jnp.exp(-jnp.maximum(sigma, -30.0)), 0.999)
        alpha = jnp.where((sigma > 0) & kk[:, None] & (alpha > 1.0 / 255.0),
                          alpha, 0.0)             # [K, P]
        # exclusive transmittance via a strictly-lower-triangular matmul in
        # log space: one MXU op instead of a K-step sequential cumprod
        Kn = alpha.shape[0]
        ltri = jnp.tril(jnp.ones((Kn, Kn), jnp.float32), k=-1)
        log_t_excl = ltri @ jnp.log1p(-alpha)     # [K, P]
        wgt = alpha * jnp.exp(log_t_excl)         # [K, P]
        out_c = jnp.einsum("kp,kc->pc", wgt, col)
        out_a = jnp.sum(wgt, axis=0)
        out_d = jnp.einsum("kp,k->p", wgt, dep)
        return out_c, out_a, out_d

    # remat each tile chunk: without it the chunked lax.map saves every
    # [chunk, K, P] alpha/weight intermediate for the backward — measured
    # ~20 x 325 MB HLO temps at 480x704/K=256 (the r4 GSM full-step OOM).
    # Recomputing a chunk is ~3 ms of MXU work; the residual that remains
    # is just the [T, K, 7+C] gathered params (tens of MB).
    out_c, out_a, out_d = jax.lax.map(
        jax.checkpoint(tile_block), (tile_params, k_ok, px0, py0),
        batch_size=chunk)

    def untile(x):
        ch = x.shape[-1] if x.ndim == 3 else None
        x = x.reshape(ty_n, tx_n, tile, tile, -1)
        x = x.transpose(0, 2, 1, 3, 4).reshape(ty_n * tile, tx_n * tile, -1)
        x = x[:h, :w]
        return x if ch else x[..., 0]

    color = untile(out_c)
    alpha = untile(out_a)
    depth = untile(out_d)
    # exact math guarantees alpha = 1 - prod(1-a_i) <= 1; the log-space
    # triangular matmul runs at MXU bf16 accumulation and can overshoot by
    # ~2e-3 at K=256 terms — clamp to keep alpha a valid transmittance
    alpha = jnp.clip(alpha, 0.0, 1.0)
    # expected depth normalized by alpha (gsplat ED semantics)
    depth = jnp.where(alpha > 1e-6, depth / jnp.maximum(alpha, 1e-6), 0.0)
    return color, alpha, depth


def render_gaussians(means, quats, scales, opacities, colors, viewmat, K,
                     image_hw, near: float = 0.01, radius_clip: float = 0.0,
                     tile: int = 16, max_span: int = 4,
                     tile_capacity: int = 256,
                     background: jnp.ndarray | None = None):
    """gsplat ``rasterization`` equivalent for one camera (vmap over cameras
    replaces the reference's >=20-view chunking, rgb_renderer.py:98-137).

    Returns (color [H,W,C], alpha [H,W], depth [H,W])."""
    proj = project_gaussians(means, quats, scales, viewmat, K, image_hw,
                             near=near, radius_clip=radius_clip)
    color, alpha, depth = rasterize(proj, opacities, colors, image_hw,
                                    tile=tile, max_span=max_span,
                                    tile_capacity=tile_capacity)
    if background is not None:
        color = color + (1.0 - alpha)[..., None] * background
    return color, alpha, depth
