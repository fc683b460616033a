"""Kitchen-sink NKSR field losses (models/vae/nksr_loss.py).

Analytic ground truths: a z=0 plane point cloud with +z normals has
sdf(q) = q_z (IMLS), chi(q) = -q_z, and the perfect field's gradient is
-z, so the surface losses vanish on it."""

import jax
import jax.numpy as jnp
import pytest

from infinicube_tpu.grid.build import grid_from_ijk
from infinicube_tpu.models.vae.nksr_loss import (
    NKSRLossConfig, SamplerConfig, band_samples, compute_gt_chi,
    draw_samples, grid_iou, gt_surface_loss, hierarchy_samples,
    kitchen_sink_losses, sdf_from_points, spatial_loss, transform_field,
    udf_loss,
)


def _plane_cloud(n=40):
    """Dense z=0 grid of points with +z normals."""
    xs = jnp.linspace(-2.0, 2.0, n)
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    xyz = jnp.stack([gx.ravel(), gy.ravel(), jnp.zeros(n * n)], -1)
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n * n, 1))
    return xyz, nrm


def test_sdf_from_points_plane_height():
    xyz, nrm = _plane_cloud()
    q = jnp.array([[0.1, -0.3, 0.7], [0.0, 0.0, -0.4], [0.5, 0.5, 0.0]])
    sdf = sdf_from_points(q, xyz, nrm, k=8, stdv=0.2)
    assert jnp.allclose(sdf, jnp.array([0.7, -0.4, 0.0]), atol=1e-3)
    # chi convention: positive inside (below the plane)
    cfg = NKSRLossConfig(voxel_size=0.1, gt_band=3.0)
    chi = compute_gt_chi(cfg, q, xyz, nrm, transform=False)
    assert chi[1] > 0 and chi[0] < 0


def test_transform_field_soft_and_hard():
    x = jnp.array([-5.0, -0.01, 0.0, 0.01, 5.0])
    hard = transform_field(x, 0.3, soft=False)
    assert jnp.allclose(hard, jnp.clip(x, -0.3, 0.3))
    soft = transform_field(x, 0.3, soft=True)
    assert jnp.all(jnp.abs(soft) <= 0.3 + 1e-6)
    # unit derivative at 0 (nksr_loss.py:129 "derivative norm at 0 if 1")
    g = jax.grad(lambda v: transform_field(v, 0.3, soft=True))(0.0)
    assert jnp.allclose(g, 1.0, atol=1e-5)


def test_grid_iou_identical_and_disjoint():
    ijk_a = jnp.arange(12, dtype=jnp.int32).reshape(1, 4, 3)
    a = grid_from_ijk(ijk_a, jnp.ones((1, 4), bool), 1.0, 0.0, capacity=16)
    b = grid_from_ijk(ijk_a + 100, jnp.ones((1, 4), bool), 1.0, 0.0,
                      capacity=16)
    assert jnp.allclose(grid_iou(a, a), 1.0, atol=1e-4)
    assert jnp.allclose(grid_iou(a, b), 0.0, atol=1e-4)


def test_hierarchy_samples_cover_only_active_voxels():
    ijk = jnp.array([[[0, 0, 0], [4, 0, 0], [0, 4, 0], [9, 9, 9]]],
                    jnp.int32)
    mask = jnp.array([[True, True, True, False]])
    g = grid_from_ijk(ijk, mask, 1.0, 0.0, capacity=8)
    pts = hierarchy_samples(jax.random.PRNGKey(0), [g], 512)
    assert pts.shape == (512, 3) and bool(jnp.all(jnp.isfinite(pts)))
    # every sample within half a voxel of an ACTIVE center (never slot 3)
    centers = g.voxel_centers()[0][:3]
    d = jnp.max(jnp.abs(pts[:, None, :] - centers[None]), axis=-1)
    assert bool(jnp.all(jnp.min(d, axis=-1) <= 0.5 + 1e-5))


def test_band_samples_stay_near_surface():
    xyz, nrm = _plane_cloud(10)
    pts = band_samples(jax.random.PRNGKey(1), xyz, nrm, None, 256,
                       eps=0.5, voxel_size=0.1)
    assert pts.shape == (256, 3)
    # jitter is along z only, ~N(0, 0.05^2)
    assert bool(jnp.all(jnp.abs(pts[:, 2]) < 0.5))
    assert bool(jnp.all(jnp.min(jnp.abs(pts[:, 0:1] -
                                        xyz[None, :, 0].T.ravel()), -1)
                        < 1e-4))


def test_udf_and_spatial_losses_vanish_on_perfect_field():
    xyz, nrm = _plane_cloud()
    cfg = NKSRLossConfig(voxel_size=0.1, gt_band=3.0)

    def perfect(q):          # chi: positive below the plane
        return -q[:, 2]

    q = jax.random.uniform(jax.random.PRNGKey(2), (256, 3),
                           minval=-0.2, maxval=0.2)
    # the UDF branch predicts an UNSIGNED field: perfect is |z|
    assert udf_loss(cfg, lambda qq: jnp.abs(qq[:, 2]), q, xyz, nrm) < 0.05
    mixed, _ = spatial_loss(cfg, perfect, q, xyz, nrm)
    assert mixed < 0.05

    def wrong(qq):
        return jnp.abs(qq[:, 2]) + 0.3

    assert udf_loss(cfg, wrong, q, xyz, nrm) > 1.0
    mixed_w, _ = spatial_loss(cfg, wrong, q, xyz, nrm)
    assert mixed_w > 1.0


def test_gt_surface_loss_value_and_normal():
    xyz, nrm = _plane_cloud()
    cfg = NKSRLossConfig(surface_subsample=128)

    def perfect(q):
        return -q[:, 2]

    v, nl = gt_surface_loss(cfg, perfect, jax.random.PRNGKey(3), xyz, nrm)
    assert v < 1e-5 and nl < 1e-5

    def flipped(q):
        return q[:, 2]       # gradient points the wrong way

    v2, nl2 = gt_surface_loss(cfg, flipped, jax.random.PRNGKey(3), xyz, nrm)
    assert nl2 > 1.9         # 1 - (-1)


def test_kitchen_sink_jits_and_aggregates():
    xyz, nrm = _plane_cloud(12)
    ijk = jnp.stack(jnp.meshgrid(jnp.arange(4), jnp.arange(4),
                                 jnp.arange(2), indexing="ij"),
                    -1).reshape(1, -1, 3).astype(jnp.int32)
    g = grid_from_ijk(ijk, jnp.ones(ijk.shape[:2], bool), 0.5, 0.0,
                      capacity=64)
    cfg = NKSRLossConfig(voxel_size=0.1, reg_sdf_weight=0.1)
    samplers = (SamplerConfig("uniform", 128, expand_top=4),
                SamplerConfig("band", 128, eps=0.5))

    @jax.jit
    def run(key):
        return kitchen_sink_losses(cfg, lambda q: -q[:, 2], key, [g],
                                   xyz, nrm, samplers=samplers)

    total, metrics = run(jax.random.PRNGKey(4))
    assert jnp.isfinite(total)
    for name in ("udf", "spatial", "msa", "gt-surface-value",
                 "gt-surface-normal", "total"):
        assert name in metrics and jnp.isfinite(metrics[name])
    q = draw_samples(jax.random.PRNGKey(5), samplers, [g], xyz, nrm, None,
                     cfg.voxel_size)
    assert q.shape == (256, 3)
