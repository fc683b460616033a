import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.data.specs import DatasetSpec
from infinicube_tpu.models.diffusion.model import DiffusionConfig, VoxelDiffusion
from infinicube_tpu.models.vae.sunet import SparseStructureVAE, SparseVAEConfig
from infinicube_tpu.training.data_glue import (
    diffusion_batches, gsm_batches, vae_batches)


def tiny_vae_cfg():
    return SparseVAEConfig(
        sem_embed_dim=8, c_dim=8, f_maps=8,
        pooling_factors=((2, 2, 1), (2, 2, 2)),
        latent_channels=2, neck_dims=(4, 4, 4), neck_ijk_min=(-2, -2, -2),
        capacities=(512, 256, 128),
        finest_voxel_size=(0.2, 0.2, 0.2), origin=(0.1, 0.1, 0.1))


def fake_dataset(n=3, with_images=False):
    rng = np.random.default_rng(0)
    for _ in range(n):
        s = {
            DatasetSpec.INPUT_PC: rng.uniform(-1.5, 1.5, (200, 3))
            .astype(np.float32),
            DatasetSpec.GT_SEMANTIC: rng.integers(0, 23, 200).astype(np.int32),
            DatasetSpec.MAPS_3D: {
                "road_edge": rng.uniform(-1, 1, (20, 3)).astype(np.float32),
                "road_surface": np.zeros((0, 3), np.float32)},
            DatasetSpec.BOXES_3D: {
                "poses": np.eye(4, dtype=np.float32)[None],
                "lwhs": np.array([[1.0, 1.0, 1.0]], np.float32)},
        }
        if with_images:
            V, h, w = 2, 16, 24
            T = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
            T[:, :3, 0] = [0, -1, 0]
            T[:, :3, 1] = [0, 0, -1]
            T[:, :3, 2] = [1, 0, 0]
            s[DatasetSpec.IMAGES_INPUT] = rng.uniform(
                size=(V, h, w, 3)).astype(np.float32)
            s[DatasetSpec.IMAGES_INPUT_MASK] = np.ones((V, h, w, 4),
                                                       np.float32)
            s[DatasetSpec.IMAGES_INPUT_POSE] = T
            s[DatasetSpec.IMAGES_INPUT_INTRINSIC] = np.tile(
                np.array([[20.0, 0, 12], [0, 20, 8], [0, 0, 1]],
                         np.float32), (V, 1, 1))
        yield s


def test_vae_batches():
    cfg = tiny_vae_cfg()
    it = vae_batches(fake_dataset(2), cfg, batch_size=1, point_capacity=256)
    grids, sem = next(it)
    assert len(grids) == 3
    assert sem.shape == (1, cfg.capacities[0])


def test_diffusion_batches_with_frozen_vae():
    vcfg = tiny_vae_cfg()
    vae = SparseStructureVAE(vcfg)
    # init the VAE once
    from infinicube_tpu.models.vae.sunet import build_hash_tree
    from infinicube_tpu.grid.ops import majority_label
    pts = jnp.asarray(np.random.default_rng(1).uniform(-1.5, 1.5, (2, 64, 3)),
                      jnp.float32)
    mask = jnp.ones((2, 64), bool)
    grids = build_hash_tree(vcfg, pts, mask)
    sem = majority_label(grids[0], pts, jnp.zeros((2, 64), jnp.int32), mask, 23)
    vae_params = vae.init(jax.random.PRNGKey(0), grids, sem,
                          jax.random.PRNGKey(1))
    dcfg = DiffusionConfig(
        latent_channels=2, cube_dims=(4, 4, 4), cube_ijk_min=(-2, -2, -2),
        latent_voxel_size=(0.8, 0.8, 0.4), latent_origin=(0.4, 0.4, 0.2),
        model_channels=8, channel_mult=(1, 2), attention_ds=(),
        num_res_blocks=1, num_heads=2, transformer_depth=1,
        dtype=jnp.float32, num_map_types=2)
    diff = VoxelDiffusion(dcfg)
    it = diffusion_batches(fake_dataset(2), diff, vae, vae_params, vcfg,
                           batch_size=2, point_capacity=256, max_map=64,
                           max_box=4)
    latents, cond = next(it)
    assert latents.shape == (2, 4, 4, 4, 2)
    assert cond.map_cube.shape == (2, 4, 4, 4, 2)
    # the batch feeds the train loss directly
    params = diff.init(jax.random.PRNGKey(0))
    loss, _ = diff.train_loss(params, jax.random.PRNGKey(1), latents, cond)
    assert np.isfinite(float(loss))


def test_gsm_batches():
    from infinicube_tpu.models.gsm.model import GSMConfig
    cfg = GSMConfig(dense_dims=(16, 16, 8), dense_ijk_min=(0, -8, -2))
    it = gsm_batches(fake_dataset(2, with_images=True), cfg,
                     voxel_capacity=512)
    b = next(it)
    assert b["images"].shape[0] == 2
    assert b["depth_prior"].shape == b["images"].shape[:3] + (1,)
    assert b["grid"].capacity == 512
