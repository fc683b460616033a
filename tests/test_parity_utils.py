import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid import grid_from_points
from infinicube_tpu.models.gsm.lifter import voxel_depth_prior
from infinicube_tpu.training.test_recorder import TestRecorder
from infinicube_tpu.utils.common import batch2device, mask_image_patches
from infinicube_tpu.utils.sky_math import (
    load_skybox, render_panorama, sample_panorama, save_skybox)


def test_mask_image_patches():
    img = jnp.ones((2, 64, 64, 3))
    out = mask_image_patches(jax.random.PRNGKey(0), img, patch=16,
                             drop_prob=0.5)
    frac = float((out == 0).mean())
    assert 0.2 < frac < 0.8
    # whole patches are dropped together
    o = np.asarray(out[0, :, :, 0])
    blocks = o.reshape(4, 16, 4, 16)
    for i in range(4):
        for j in range(4):
            b = blocks[i, :, j, :]
            assert (b == 0).all() or (b == 1).all()


def test_test_recorder(tmp_path):
    rec = TestRecorder(tmp_path)
    rec.record("s0", {"psnr": 20.0}, artifacts={"gs": {"x": 1}})
    rec.record("s1", {"psnr": 30.0})
    means = rec.finalize()
    assert means["psnr"] == 25.0
    assert (tmp_path / "metrics.csv").exists()
    assert (tmp_path / "s0.gs.pkl").exists()


def test_voxel_depth_prior():
    # wall of voxels at x = 10
    rng = np.random.default_rng(0)
    pts = np.stack([np.full(300, 10.0), rng.uniform(-5, 5, 300),
                    rng.uniform(-2, 4, 300)], -1)
    g = grid_from_points(jnp.asarray(pts, jnp.float32)[None],
                         jnp.ones((1, 300), bool), 0.5, 0.25, capacity=512)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0] = [0, -1, 0]
    T[:3, 1] = [0, 0, -1]
    T[:3, 2] = [1, 0, 0]
    T[:3, 3] = [0, 0, 1.0]
    K = jnp.array([[30.0, 0, 16], [0, 30, 12], [0, 0, 1]])
    # splat default reports the winning voxel-CENTER z; dda reports the
    # entry-face depth — both within half a voxel diagonal of the wall
    d = voxel_depth_prior(g, K[None], jnp.asarray(T)[None], (15, -15, -8),
                          (10, 30, 25), (24, 32))
    assert d.shape == (1, 24, 12 + 20, 1)[0:1] + (24, 32, 1)
    center = float(d[0, 12, 16, 0])
    assert abs(center - 10.0) < 0.6, center
    d = voxel_depth_prior(g, K[None], jnp.asarray(T)[None], (15, -15, -8),
                          (10, 30, 25), (24, 32), impl="dda")
    center = float(d[0, 12, 16, 0])
    assert abs(center - 9.75) < 0.5  # wall front face ~ 10 - vs/2


def test_panorama_roundtrip(tmp_path):
    # bake a direction-dependent sky and sample it back
    def sky(dirs):
        return np.stack([np.clip(dirs[..., 2], 0, 1),
                         np.zeros_like(dirs[..., 0]),
                         np.clip(-dirs[..., 2], 0, 1)], -1)

    pano = render_panorama(sky, (64, 128))
    assert pano.shape == (64, 128, 3)
    # top rows (up directions) are red-ish
    assert pano[0, :, 0].mean() > 0.9
    save_skybox(tmp_path / "sky.npz", pano)
    back = load_skybox(tmp_path / "sky.npz")
    up = sample_panorama(back, np.array([[0.0, 0, 1.0]]))
    assert up[0, 0] > 0.9


def test_batch2device():
    out = batch2device({"a": np.ones(3)})
    assert isinstance(out["a"], jnp.ndarray)
