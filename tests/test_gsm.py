import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.grid import grid_from_points
from infinicube_tpu.models.gsm.encoders import UnifiedEncoder, UnifiedEncoderConfig
from infinicube_tpu.models.gsm.lifter import (
    lift_features, sample_image_features, visible_voxel_mask)
from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss, psnr, ssim
from infinicube_tpu.models.gsm.model import GSM, GSMConfig
from infinicube_tpu.models.gsm.pixel_branch import PixelBranchConfig
from infinicube_tpu.models.gsm.sky import SkyConfig
from infinicube_tpu.models.gsm.voxel_branch import VoxelBranchConfig
from infinicube_tpu.utils.sky_math import (
    direction_to_latlong_uv, latlong_uv_to_direction)


HW = (32, 48)


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    h, w = HW
    V = 2
    # scene: ground plane + wall in front (FLU world)
    pts = np.stack([rng.uniform(1, 15, 800), rng.uniform(-6, 6, 800),
                    rng.uniform(0, 0.3, 800)], -1)
    wall = np.stack([np.full(400, 12.0), rng.uniform(-6, 6, 400),
                     rng.uniform(0, 4, 400)], -1)
    allp = jnp.asarray(np.concatenate([pts, wall]), jnp.float32)[None]
    grid = grid_from_points(allp, jnp.ones((1, 1200), bool), 0.5, 0.25,
                            capacity=2048)
    # camera at origin looking +x
    T = np.eye(4, dtype=np.float32)
    T[:3, 0] = [0, -1, 0]
    T[:3, 1] = [0, 0, -1]
    T[:3, 2] = [1, 0, 0]
    T[:3, 3] = [0, 0, 1.5]
    T2 = T.copy()
    T2[:3, 3] = [1.0, 0.5, 1.5]
    poses = jnp.asarray(np.stack([T, T2]))
    K = jnp.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    Ks = jnp.stack([K, K])
    images = jnp.asarray(rng.uniform(size=(V, h, w, 3)), jnp.float32)
    masks = jnp.ones((V, h, w, 4), jnp.float32)
    # top rows are sky
    masks = masks.at[:, :8, :, 0].set(0.0)
    depth_prior = jnp.zeros((V, h, w, 1))
    return {"grid": grid, "images": images, "masks": masks, "Ks": Ks,
            "cam_to_worlds": poses, "depth_prior": depth_prior}


def tiny_cfg(**kw):
    base = dict(
        encoder=UnifiedEncoderConfig(conv_width=16),
        voxel=VoxelBranchConfig(f_maps=16, levels=2, gaussians_per_voxel=2),
        pixel=PixelBranchConfig(width=8, dims=(1, 2), gs_per_pixel=1),
        sky=SkyConfig(embed_dim=32, num_layers=1, num_heads=2, patch=8),
        dense_dims=(40, 32, 16), dense_ijk_min=(0, -16, -2),
        render_tile_capacity=64)
    base.update(kw)
    return GSMConfig(**base)


def test_lifter_and_visibility():
    b = make_batch()
    grid = b["grid"]
    feats = jnp.ones(b["images"].shape[:3] + (5,))
    lifted = lift_features(grid, feats, b["Ks"], b["cam_to_worlds"],
                           (0, -16, -2), (40, 32, 16))
    assert lifted.shape == (1, grid.capacity, 5)
    # some voxels receive features, and only active ones
    got = np.asarray((jnp.abs(lifted).sum(-1) > 0)[0])
    assert got.sum() > 10
    assert not got[~np.asarray(grid.mask[0])].any()
    vis = visible_voxel_mask(grid, b["Ks"], b["cam_to_worlds"], (0, -16, -2),
                             (40, 32, 16), ray_hw=(32, 48))
    nv = int(vis.sum())
    assert 0 < nv <= int(grid.total_voxels)


def test_sample_image_features_bilinear():
    # constant feature image -> sampled value constant
    feats = jnp.full((1, 8, 8, 2), 3.0)
    K = jnp.array([[4.0, 0, 4.0], [0, 4.0, 4.0], [0, 0, 1]])
    pose = jnp.eye(4)
    pts = jnp.array([[0.1, 0.1, 2.0], [0.0, 0.0, 5.0]])
    out = sample_image_features(pts, feats, K[None], pose[None])
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_gsm_forward_shapes_and_gradients():
    cfg = tiny_cfg()
    model = GSM(cfg)
    b = make_batch()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, b)
    out = model.apply(params, b)
    V, h, w = 2, HW[0], HW[1]
    assert out["render"]["rgb"].shape == (V, h, w, 3)
    assert out["render"]["alpha"].shape == (V, h, w)
    assert np.isfinite(np.asarray(out["render"]["rgb"])).all()
    # loss + grads
    sky_mask = np.zeros((V, h, w), bool)
    sky_mask[:, :8] = True

    def loss_fn(p):
        o = model.apply(p, b)
        l, _ = gsm_loss(GSMLossConfig(), o["render"], b["images"],
                        jnp.ones((V, h, w), bool), jnp.asarray(sky_mask),
                        gaussians=o["gaussians"])
        return l

    g = jax.grad(loss_fn)(params)
    total = jax.tree.reduce(lambda a, c: a + float(jnp.sum(jnp.abs(c))), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_gsm_loss_lpips_crop_plumbing():
    """lpips_crop crops the real-LPIPS images (random offsets with rng,
    center without); gradients flow and the crop changes the value."""
    from infinicube_tpu.models.gsm.lpips import LPIPS
    rng = jax.random.PRNGKey(0)
    lp = jax.jit(LPIPS().init)(rng, jnp.zeros((1, 16, 16, 3)),
                               jnp.zeros((1, 16, 16, 3)))
    V, h, w = 2, 48, 64
    k1, k2 = jax.random.split(rng)
    pred = jax.random.uniform(k1, (V, h, w, 3))
    gt = jax.random.uniform(k2, (V, h, w, 3))
    render = {"rgb": pred, "alpha": jnp.ones((V, h, w)),
              "depth": jnp.zeros((V, h, w))}
    ones = jnp.ones((V, h, w), bool)
    sky = jnp.zeros((V, h, w), bool)
    cfg = GSMLossConfig(lpips_crop=32)
    l_center, m1 = gsm_loss(cfg, render, gt, ones, sky, lpips_params=lp)
    l_rng, m2 = gsm_loss(cfg, render, gt, ones, sky, lpips_params=lp,
                         rng=jax.random.PRNGKey(3))
    l_full, m3 = gsm_loss(GSMLossConfig(lpips_crop=None), render, gt, ones,
                          sky, lpips_params=lp)
    for l in (l_center, l_rng, l_full):
        assert np.isfinite(float(l))
    # different crops -> different perceptual values (almost surely)
    assert float(m1["perceptual"]) != float(m3["perceptual"])
    g = jax.grad(lambda x: gsm_loss(cfg, dict(render, rgb=x), gt, ones, sky,
                                    lpips_params=lp,
                                    rng=jax.random.PRNGKey(4))[0])(pred)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_gsm_decode_all_pixels_for_dynamic():
    cfg = tiny_cfg(use_voxel_branch=False)
    model = GSM(cfg)
    b = make_batch()
    params = model.init(jax.random.PRNGKey(0), b)
    out = model.apply(params, b, decode_all_pixels=True)
    # every pixel emits a gaussian when decoding all (dynamic recon mode)
    assert bool(out["gaussians"]["valid"].all())


def test_ssim_and_psnr_sanity():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    assert float(ssim(a, a)) > 0.99
    assert float(psnr(a, a)) > 60
    b = jnp.clip(a + 0.3, 0, 1)
    assert float(ssim(a, b)) < 0.95


def test_sky_math_roundtrip():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(100, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    uv = direction_to_latlong_uv(d)
    assert (uv >= 0).all() and (uv <= 1).all()
    back = latlong_uv_to_direction(uv)
    np.testing.assert_allclose(back, d, atol=1e-5)
    # up direction maps to v=0
    assert abs(float(direction_to_latlong_uv(np.array([0.0, 0, 1]))[1])) < 1e-6


def test_voxel_preprocess_surface_and_crop():
    from infinicube_tpu.grid import grid_from_dense
    g = grid_from_dense(1, (5, 5, 5), (0, 0, 0), 1.0, 0.0)
    out = GSM.voxel_preprocess(g, surface_only=True)
    # the 3x3x3 interior (27 voxels) is culled from the 5^3 block
    assert int(out.total_voxels) == 125 - 27
    out2 = GSM.voxel_preprocess(g, crop_min=(0, 0, 0), crop_max=(1.6, 10, 10))
    assert int(out2.total_voxels) == 2 * 25


def test_plucker_encoder_kind():
    """UnifiedEncoder "plucker" kind: rgb + plucker-ray channels patchified
    (reference plucker_conv_patch_encoder.py)."""
    import jax
    from infinicube_tpu.models.gsm.encoders import (
        UnifiedEncoder, UnifiedEncoderConfig)
    cfg = UnifiedEncoderConfig(encoders=("conv", "plucker"),
                               plucker_width=8, plucker_patch=4)
    enc = UnifiedEncoder(cfg)
    imgs = jnp.ones((1, 2, 16, 24, 3))
    masks = jnp.ones((1, 2, 16, 24, 4))
    K = jnp.asarray([[20.0, 0, 12], [0, 20, 8], [0, 0, 1]])
    Ks = jnp.tile(K, (1, 2, 1, 1))
    poses = jnp.tile(jnp.eye(4), (1, 2, 1, 1))
    p = enc.init(jax.random.PRNGKey(0), imgs, masks, Ks, poses)
    out = enc.apply(p, imgs, masks, Ks, poses)
    assert out["features"].shape == (1, 2, 16, 24, 64 + 8)
    # different poses -> different plucker features
    poses2 = poses.at[0, 1, 0, 3].set(5.0)
    out2 = enc.apply(p, imgs, masks, Ks, poses2)
    assert float(jnp.abs(out2["features"][0, 1] -
                         out["features"][0, 1]).max()) > 0


def test_lifter_splat_vs_dda_agree():
    """The packed-splat fast path approximates the exact DDA first-hit
    lift/visibility on a surface scene (front-voxel winners match on most
    pixels; visible sets strongly overlap)."""
    import numpy as np
    from infinicube_tpu.grid.build import grid_from_points
    from infinicube_tpu.models.gsm.lifter import (lift_features,
                                                  visible_voxel_mask)
    rng = np.random.default_rng(0)
    n = 4000
    # thin ground sheet + a wall: crisp surfaces where "front voxel per
    # ray" is well defined for both implementations
    ground = np.stack([rng.uniform(4, 18, n // 2), rng.uniform(-5, 5, n // 2),
                       np.zeros(n // 2)], -1)
    wall = np.stack([np.full(n - n // 2, 15.0),
                     rng.uniform(-5, 5, n - n // 2),
                     rng.uniform(0, 4, n - n // 2)], -1)
    pts = np.concatenate([ground, wall]).astype(np.float32)
    g = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, n), bool),
                         0.4, 0.2, capacity=4096)
    K = jnp.asarray([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
    T = jnp.asarray(np.array([[0, 0, 1, 0], [-1, 0, 0, 0],
                              [0, -1, 0, 1.5], [0, 0, 0, 1]], np.float32))
    feats = jnp.ones((1, 64, 96, 8))
    args = (g, jnp.asarray(K)[None], T[None], (-16, -32, -8), (64, 64, 32))
    vis_s = visible_voxel_mask(*args, impl="splat")
    vis_d = visible_voxel_mask(*args, impl="dda")
    inter = float(jnp.sum(vis_s & vis_d))
    smaller = float(min(jnp.sum(vis_s), jnp.sum(vis_d)))
    # the two define "front voxel" differently (first intersected cell vs
    # nearest projected center); require strong containment of the smaller
    # set rather than IoU
    assert inter / max(smaller, 1.0) > 0.6, (inter, smaller)
    lf_s = lift_features(g, feats, *args[1:], impl="splat")
    lf_d = lift_features(g, feats, *args[1:], impl="dda")
    got_s = jnp.any(lf_s[0] != 0, -1)
    got_d = jnp.any(lf_d[0] != 0, -1)
    inter = float(jnp.sum(got_s & got_d))
    assert inter / max(float(jnp.sum(got_d)), 1.0) > 0.5


def test_voxel_branch_dense_bounds_config():
    """level_dense_bounds follows the floor-div coarsening; None = off."""
    import numpy as np
    from infinicube_tpu.models.gsm.voxel_branch import VoxelBranchConfig
    cfg = VoxelBranchConfig(
        dense_lookup_bounds=((-8, -64, -8), (224, 128, 48)))
    mn0, dm0 = cfg.level_dense_bounds(0)
    assert mn0 == (-8, -64, -8) and dm0 == (224, 128, 48)
    mn1, dm1 = cfg.level_dense_bounds(1)
    assert mn1 == (-4, -32, -4) and dm1 == (112, 64, 24)
    mn2, dm2 = cfg.level_dense_bounds(2)
    assert mn2 == (-2, -16, -2) and dm2 == (56, 32, 12)
    assert VoxelBranchConfig().level_dense_bounds(0) is None
