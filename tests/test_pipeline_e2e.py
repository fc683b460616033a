"""End-to-end three-stage pipeline integration test at tiny scale:
stage 1 (chunked diffusion world gen) -> stage 2 (guidance buffers + tar
round-trip) -> stage 3 (GSM gaussian reconstruction incl. dynamic objects)."""

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.inference.guidance_buffer_generation import (
    generate_buffers_for_world, save_voxel_world, load_voxel_world,
    write_buffer_tars, resample_trajectory)
from infinicube_tpu.inference.scene_gaussian_generation import (
    build_gsm_masks, load_buffer_folder, reconstruct_scene)
from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.utils.world_grid import WorldGrid
from infinicube_tpu.models.gsm.model import GSMConfig
from infinicube_tpu.models.gsm.encoders import UnifiedEncoderConfig
from infinicube_tpu.models.gsm.pixel_branch import PixelBranchConfig
from infinicube_tpu.models.gsm.sky import SkyConfig
from infinicube_tpu.models.gsm.voxel_branch import VoxelBranchConfig


CAM = PinholeCamera(fx=40.0, fy=40.0, cx=24.0, cy=16.0, w=48, h=32)


def make_world():
    """Synthetic stage-1 output: road plane + wall."""
    w = WorldGrid(0.5)
    xs, ys = np.meshgrid(np.arange(0, 30, 0.5), np.arange(-8, 8, 0.5))
    ground = np.stack([xs.ravel(), ys.ravel(), np.zeros(xs.size)], -1)
    wall = np.stack([np.full(400, 25.0),
                     np.random.default_rng(0).uniform(-8, 8, 400),
                     np.random.default_rng(1).uniform(0, 5, 400)], -1)
    w.merge_points(ground, np.full(len(ground), 18))   # ROAD
    w.merge_points(wall, np.full(len(wall), 14))       # BUILDING
    return w


def ego_poses(n=6):
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, 3] = np.stack([np.linspace(1, 12, n), np.zeros(n),
                            np.full(n, 1.6)], -1)
    return T


def test_full_pipeline(tmp_path):
    # ---- stage 1 output (world) + persistence roundtrip
    world = make_world()
    save_voxel_world(tmp_path / "world.npz", world)
    world2 = load_voxel_world(tmp_path / "world.npz")
    assert world2.num_voxels == world.num_voxels

    # ---- stage 2: buffers
    poses_flu = resample_trajectory(ego_poses(), num_frames=4)
    buffers = generate_buffers_for_world(world2, poses_flu, CAM)
    dep = np.asarray(buffers["depth"])
    sem = np.asarray(buffers["semantic"])
    assert dep.shape == (4, 32, 48)
    # road visible below horizon, sky above
    assert (sem[:, -6:, :] == 18).mean() > 0.5
    assert (dep[:, :4, :] == 0).all()
    assert np.asarray(buffers["coordinate"]).shape == (4, 32, 48, 3)

    buf_dir = tmp_path / "buffers"
    write_buffer_tars(buf_dir, buffers, poses_flu, CAM)
    save_voxel_world(buf_dir / "world.npz", world2)

    # ---- stage 3: load + reconstruct
    data = load_buffer_folder(buf_dir, num_frames=2)
    np.testing.assert_allclose(data["depth"], dep[:2], atol=0.02)  # /100 png
    # inject a fake dynamic region + rgb video
    data["instance"][:, 20:26, 20:30] = 10001
    rng = np.random.default_rng(2)
    data["video"] = rng.uniform(size=data["depth"].shape + (3,)).astype(
        np.float32)

    cfg = GSMConfig(
        encoder=UnifiedEncoderConfig(conv_width=8),
        voxel=VoxelBranchConfig(f_maps=8, levels=2, gaussians_per_voxel=1),
        pixel=PixelBranchConfig(width=8, dims=(1, 2), gs_per_pixel=1),
        sky=SkyConfig(embed_dim=16, num_layers=1, num_heads=2, patch=8),
        dense_dims=(64, 36, 16), dense_ijk_min=(0, -17, -2),
        render_tile_capacity=32)
    static_gs, object_gs, out, model, params = reconstruct_scene(
        data, cfg=cfg, max_views=2)
    assert len(static_gs["means"]) > 0
    assert 10001 in object_gs
    assert len(object_gs[10001]["means"]) > 0
    assert out["render"]["rgb"].shape == (2, 32, 48, 3)
    assert np.isfinite(np.asarray(out["render"]["rgb"])).all()


def test_gsm_masks_semantics():
    depth = np.zeros((1, 8, 8), np.float32)
    depth[0, 4:] = 5.0
    inst = np.zeros((1, 8, 8), np.int32)
    inst[0, 5, 5] = 10002
    m = build_gsm_masks(depth, inst)
    # sky fallback: depth==0 rows are sky (ch0 = 0)
    assert (m[0, :4, :, 0] == 0).all() and (m[0, 4:, :, 0] == 1).all()
    assert m[0, 5, 5, 1] == 0 and m[0, 4, 4, 1] == 1


def test_gsm_masks_pixel_branch_last_n():
    """Frames before the last N must have an empty midground (ch0 == ch3);
    the last N keep fg-from-seg distinct from fg-from-grid; last_n=0/None
    disables the pixel branch everywhere (reference :460-478)."""
    depth = np.zeros((3, 4, 4), np.float32)
    depth[:, 2:] = 5.0                      # grid covers bottom half
    sky_seg = np.zeros((3, 4, 4), np.int32)
    sky_seg[:, 0] = 1                       # seg: only the top row is sky
    inst = np.zeros((3, 4, 4), np.int32)

    m = build_gsm_masks(depth, inst, sky_seg, pixel_branch_last_n=1)
    mid = (m[..., 0] > 0) & (m[..., 3] == 0)
    assert not mid[:2].any()                # early frames: midground empty
    assert mid[2, 1].all()                  # last frame: row 1 is midground

    m0 = build_gsm_masks(depth, inst, sky_seg, pixel_branch_last_n=0)
    assert ((m0[..., 0] > 0) == (m0[..., 3] > 0)).all()
    mN = build_gsm_masks(depth, inst, sky_seg, pixel_branch_last_n=None)
    assert ((mN[..., 0] > 0) == (mN[..., 3] > 0)).all()
