import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.diffusion.model import DiffusionConfig, VoxelDiffusion
from infinicube_tpu.inference.voxel_world_generation import (
    VoxelWorldGenerator, WorldGenConfig)
from infinicube_tpu.utils.world_grid import (
    WorldGrid, connected_component_filter, pack64, transform_ijk, unpack64)
from infinicube_tpu.utils.interpolate import (
    average_quaternions, extrapolate_trajectory, inter_poses,
    interpolate_two_poses, rot_to_quat, quat_to_rot, slerp)


def test_world_grid_merge_and_crop():
    w = WorldGrid(0.5)
    pts = np.array([[0.3, 0.3, 0.3], [0.3, 0.3, 0.3], [5.0, 0.0, 0.0]])
    w.merge_points(pts, np.array([1, 1, 2]))
    assert w.num_voxels == 2
    # existing voxels win on merge
    w.merge_points(np.array([[0.3, 0.3, 0.3]]), np.array([9]))
    ijk, sem = w.crop([-1, -1, -1], [1, 1, 1])
    assert len(ijk) == 1 and sem[0] == 1
    assert w.occupancy_in([4, -1, -1], [6, 1, 1])
    assert not w.occupancy_in([10, 10, 10], [11, 11, 11])


def test_pack64_roundtrip_and_transform():
    rng = np.random.default_rng(0)
    ijk = rng.integers(-100000, 100000, (500, 3)).astype(np.int64)
    np.testing.assert_array_equal(unpack64(pack64(ijk)), ijk)
    # pure translation by exact voxel multiples
    T = np.eye(4)
    T[:3, 3] = [1.0, -2.0, 0.5]
    out = transform_ijk(ijk, T, 0.5, 0.25)
    np.testing.assert_array_equal(out, ijk + np.array([2, -4, 1]))


def test_connected_component_filter():
    # blob of 5 + isolated single voxel
    blob = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [2, 1, 0], [2, 1, 1]])
    lone = np.array([[50, 50, 50]])
    keep = connected_component_filter(np.concatenate([blob, lone]), min_size=3)
    assert keep[:5].all() and not keep[5]


def test_interpolation_utils():
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [10, 0, 0]
    seq = interpolate_two_poses(T0, T1, 5)
    np.testing.assert_allclose(seq[2, :3, 3], [5, 0, 0], atol=1e-6)
    # slerp between identity and 90deg-z rotations: midpoint is 45deg
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    q = slerp(rot_to_quat(np.eye(3)), rot_to_quat(Rz), 0.5)
    Rm = quat_to_rot(q)
    np.testing.assert_allclose(Rm @ [1, 0, 0],
                               [np.cos(np.pi / 4), np.sin(np.pi / 4), 0],
                               atol=1e-6)
    # inter_poses produces requested count, smooth positions
    keys = np.stack([T0, T1, T0])
    out = inter_poses(keys, 30, smoothness=0.0)
    assert out.shape == (30, 4, 4)
    # extrapolate along +x heading
    ex = extrapolate_trajectory(np.stack([T0, T1]), 2, 5.0)
    np.testing.assert_allclose(ex[-1, :3, 3], [20, 0, 0], atol=1e-6)
    q = average_quaternions(np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)


def tiny_generator(cc=0):
    cfg = DiffusionConfig(
        latent_channels=2, cube_dims=(8, 8, 4), cube_ijk_min=(-4, -4, -2),
        latent_voxel_size=(1.0, 1.0, 1.0), latent_origin=(0.5, 0.5, 0.5),
        model_channels=8, channel_mult=(1, 2), attention_ds=(),
        num_res_blocks=1, num_heads=2, transformer_depth=1,
        dtype=jnp.float32, num_map_types=2)
    diff = VoxelDiffusion(cfg)
    params = diff.init(jax.random.PRNGKey(0))

    def decode_fn(latents):
        # fake decoder: one voxel per latent cell with latent[...,0] > 0,
        # at 4x subdivision of the latent coordinate (in chunk frame)
        lat = np.asarray(latents)[0]
        occ = lat[..., 0] > 0
        ii, jj, kk = np.meshgrid(*[np.arange(n) for n in lat.shape[:3]],
                                 indexing="ij")
        ijk = np.stack([ii, jj, kk], -1)[occ] + np.array([-4, -4, -2])
        return (ijk * 4).astype(np.int64), np.ones(len(ijk), np.int32)

    gen = VoxelWorldGenerator(
        diff, params, decode_fn,
        WorldGenConfig(ddim_steps=2, max_map_points=64, max_boxes=4,
                       cc_min_size=cc),
        finest_voxel_size=0.25)
    return gen


def test_trajectory_generation_accumulates_world():
    gen = tiny_generator()
    # straight trajectory long enough for 3 chunks (interval = 8*0.75 = 6 m)
    T = np.tile(np.eye(4), (40, 1, 1))
    T[:, 0, 3] = np.linspace(0, 14, 40)
    maps = {"road_edge": np.array([[1.0, 0, 0], [2.0, 0, 0]])}
    world = gen.generate_trajectory(T, map_points=maps, seed=0)
    assert world.num_voxels > 0
    keys = gen.key_poses_along_trajectory(T)
    assert len(keys) == 3


def test_blocks_generation_with_latent_table():
    gen = tiny_generator()
    world = gen.generate_blocks([-4, -4], [8, 4], seed=0)
    assert world.num_voxels > 0
    assert len(gen._latent_table) > 0
    # overlapping blocks share latent entries: table smaller than
    # blocks x cells
    n_blocks = len(gen._block_centers([-4, -4], [8, 4]))
    assert len(gen._latent_table) < n_blocks * 8 * 8 * 4
