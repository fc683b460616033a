"""Config-selectable alt conditioning modes reach the denoiser
(VoxelDiffusion._assemble/denoise vs reference _forward_cond,
diffusion.py:501-914): adm class one-hot, crossattn context, semantic cube,
single-scan PointNet, lift3d / LSS image lifts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)

BASE = dict(latent_channels=2, cube_dims=(8, 8, 8), cube_ijk_min=(-4, -4, -4),
            latent_voxel_size=(1.0, 1.0, 1.0), latent_origin=(0.5, 0.5, 0.5),
            model_channels=8, channel_mult=(1, 2), attention_ds=(2,),
            num_res_blocks=1, num_heads=2, transformer_depth=1,
            dtype=jnp.float32, num_map_types=2)


def _run(cfg, cond_extra=None, **raw):
    model = VoxelDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B = 2
    cond = CondCubes.null(B, cfg, context_len=3)
    if raw:
        extra = model.encode_extra(params, **raw)
        assert extra.shape == (B,) + cfg.cube_dims + \
            (cfg.extra_cond_channels,)
        cond = CondCubes(cond.map_cube, cond.box_cube, extra_cube=extra,
                         class_oh=cond.class_oh, context=cond.context)
    if cond_extra:
        cond = CondCubes(cond.map_cube, cond.box_cube,
                         extra_cube=cond.extra_cube, **cond_extra)
    lat = jnp.zeros((B,) + cfg.cube_dims + (cfg.latent_channels,))
    loss, m = model.train_loss(params, jax.random.PRNGKey(1), lat, cond)
    assert np.isfinite(float(loss))
    out = model.denoise(params, lat, jnp.zeros((B,), jnp.int32), cond)
    assert out.shape == lat.shape
    return model, params, cond


def test_adm_class_conditioning():
    cfg = DiffusionConfig(**BASE, num_classes=5)
    model, params, _ = _run(
        cfg, cond_extra={"class_oh": jax.nn.one_hot(jnp.array([1, 3]), 5)})
    # diffusion blocks zero-init their output convs, so nothing reaches the
    # output at init: replace every all-zero kernel with small noise first
    def dezero(path, x):
        if x.ndim >= 2 and float(jnp.abs(x).max()) == 0.0:
            return jax.random.normal(
                jax.random.PRNGKey(len(str(path))), x.shape) * 0.05
        return x
    params = jax.tree_util.tree_map_with_path(dezero, params)
    lat = jnp.zeros((2,) + cfg.cube_dims + (2,))
    c1 = CondCubes.null(2, cfg)
    c1 = CondCubes(c1.map_cube, c1.box_cube,
                   class_oh=jax.nn.one_hot(jnp.array([1, 1]), 5))
    c2 = CondCubes(c1.map_cube, c1.box_cube,
                   class_oh=jax.nn.one_hot(jnp.array([2, 2]), 5))
    t = jnp.zeros((2,), jnp.int32)
    o1 = model.denoise(params, lat, t, c1)
    o2 = model.denoise(params, lat, t, c2)
    assert float(jnp.abs(o1 - o2).max()) > 0


def test_crossattn_context():
    cfg = DiffusionConfig(**BASE, context_dim=16)
    model, params, _ = _run(
        cfg, cond_extra={"context": jnp.ones((2, 3, 16))})


def test_semantic_cube_mode():
    cfg = DiffusionConfig(**BASE, use_semantic_cond=True,
                          semantic_embed_dim=4)
    _run(cfg, semantics=jnp.zeros((2, 8, 8, 8), jnp.int32))


def test_single_scan_mode():
    cfg = DiffusionConfig(**BASE, use_single_scan_cond=True,
                          single_scan_dim=4)
    _run(cfg, scan_points=jnp.ones((2, 16, 3)),
         scan_mask=jnp.ones((2, 16), bool))


@pytest.mark.parametrize("kind", ["lift3d", "lss"])
def test_image_cond_modes(kind):
    cfg = DiffusionConfig(**BASE, use_image_cond=kind, image_cond_dim=4)
    K = jnp.asarray([[16.0, 0, 16], [0, 16, 16], [0, 0, 1]])
    _run(cfg, images=jnp.ones((2, 1, 32, 32, 3)),
         Ks=jnp.tile(K, (2, 1, 1, 1)),
         cam_to_worlds=jnp.tile(jnp.eye(4), (2, 1, 1, 1)))
