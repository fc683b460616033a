import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import grid_from_points, coarsened_grid
from infinicube_tpu.models.diffusion.alt_encoders import (
    ClassEmbedder, LssConfig, LssEncoder, Lift3DEncoder, PointNetEncoder,
    SemanticEncoder, StructEncoder, depth_distribution_loss)
from infinicube_tpu.models.diffusion.unet_sparse import (
    SparseUNet, SparseUNetConfig)


def test_pointnet_permutation_invariance():
    enc = PointNetEncoder(width=16, out_dim=8)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(rng, (2, 50, 3))
    mask = jnp.ones((2, 50), bool)
    params = enc.init(rng, pts, mask)
    out1 = enc.apply(params, pts, mask)
    perm = jax.random.permutation(rng, 50)
    out2 = enc.apply(params, pts[:, perm], mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # masked points don't contribute
    pts2 = pts.at[:, 0].set(1e3)
    mask2 = mask.at[:, 0].set(False)
    out3 = enc.apply(params, pts2, mask2)
    assert np.isfinite(np.asarray(out3)).all()


def test_class_and_semantic_embedders():
    ce = ClassEmbedder(num_classes=10, embed_dim=4)
    p = ce.init(jax.random.PRNGKey(0), jnp.array([1, 2]))
    assert ce.apply(p, jnp.array([1, 2])).shape == (2, 4)
    se = SemanticEncoder(embed_dim=8)
    p = se.init(jax.random.PRNGKey(0), jnp.zeros((1, 5), jnp.int32))
    assert se.apply(p, jnp.zeros((1, 5), jnp.int32)).shape == (1, 5, 8)


def test_lift3d_and_lss():
    rng = jax.random.PRNGKey(0)
    V, H, W = 2, 16, 24
    images = jax.random.uniform(rng, (V, H, W, 3))
    K = jnp.array([[20.0, 0, 12], [0, 20, 8], [0, 0, 1]])
    Ks = jnp.stack([K, K])
    T = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    T[:, :3, 0] = [0, -1, 0]
    T[:, :3, 1] = [0, 0, -1]
    T[:, :3, 2] = [1, 0, 0]
    poses = jnp.asarray(T)
    ii, jj, kk = jnp.meshgrid(jnp.arange(8), jnp.arange(8), jnp.arange(4),
                              indexing="ij")
    centers = jnp.stack([ii + 2.0, jj - 4.0, kk - 1.0], -1)
    l3d = Lift3DEncoder(feat_dim=6)
    p = l3d.init(rng, images, Ks, poses, centers)
    cube = l3d.apply(p, images, Ks, poses, centers)
    assert cube.shape == (8, 8, 4, 6)
    assert np.isfinite(np.asarray(cube)).all()

    lss = LssEncoder(LssConfig(feat_dim=6, depth_bins=8))
    p = lss.init(rng, images, Ks, poses, (8, 8, 4), (0, -4, -1), 1.0, 0.5)
    cube, dlog = lss.apply(p, images, Ks, poses, (8, 8, 4), (0, -4, -1),
                           1.0, 0.5)
    assert cube.shape == (8, 8, 4, 6)
    assert dlog.shape[0] == V and dlog.shape[-1] == 8
    gt = jnp.full((V, H, W), 5.0)
    loss = depth_distribution_loss(dlog, gt, LssConfig(feat_dim=6,
                                                       depth_bins=8))
    assert np.isfinite(float(loss))


def test_struct_encoder():
    se = StructEncoder(feat_dim=4)
    occ = jnp.zeros((1, 4, 4, 4, 1)).at[0, 1, 1, 1, 0].set(1.0)
    p = se.init(jax.random.PRNGKey(0), occ)
    assert se.apply(p, occ).shape == (1, 4, 4, 4, 4)


def test_sparse_unet_denoiser():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 3, (2, 150, 3)), jnp.float32)
    g0 = grid_from_points(pts, jnp.ones((2, 150), bool), 0.5, 0.25,
                          capacity=256)
    g1 = coarsened_grid(g0, (2, 2, 2), capacity=128)
    cfg = SparseUNetConfig(out_channels=4, model_channels=8,
                           channel_mult=(1, 2), num_res_blocks=1,
                           attend_levels=(1,), num_heads=2)
    model = SparseUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 4))
    t = jnp.array([10, 500])
    params = model.init(jax.random.PRNGKey(0), [g0, g1], x, t)
    out = model.apply(params, [g0, g1], x, t)
    assert out.shape == (2, 256, 4)
    # outputs masked to active voxels
    assert float(jnp.abs(out * ~g0.mask[..., None]).sum()) == 0.0
    # with cross-attention context
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    params = model.init(jax.random.PRNGKey(0), [g0, g1], x, t, ctx)
    out = model.apply(params, [g0, g1], x, t, ctx)
    assert np.isfinite(np.asarray(out)).all()
