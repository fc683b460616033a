import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.diffusion.schedulers import (
    NoiseSchedule, ddim_sample, ddpm_sample, dpmpp_sample, sampling_timesteps)
from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)
from infinicube_tpu.models.diffusion import encoders
from infinicube_tpu.models.diffusion.ema import EmaState
from infinicube_tpu.models.diffusion.sdedit import (
    warp_prev_latents, make_sdedit_callback)


def tiny_cfg(**kw):
    base = dict(latent_channels=4, cube_dims=(8, 8, 8), cube_ijk_min=(-4, -4, -4),
                latent_voxel_size=(1.0, 1.0, 1.0), latent_origin=(0.5, 0.5, 0.5),
                model_channels=16, channel_mult=(1, 2), attention_ds=(2,),
                num_res_blocks=1, num_heads=2, transformer_depth=1,
                dtype=jnp.float32, num_map_types=2)
    base.update(kw)
    return DiffusionConfig(**base)


def test_schedule_vpred_roundtrip():
    s = NoiseSchedule.linear(1000)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 3, 3, 3, 2))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([0, 250, 700, 999])
    x_t = s.add_noise(x0, noise, t)
    v = s.v_target(x0, noise, t)
    eps_hat, x0_hat = s.to_eps_x0(v, x_t, t, "v_prediction")
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise), atol=1e-5)
    # epsilon parameterization consistency
    e2, x02 = s.to_eps_x0(noise, x_t, t, "epsilon")
    np.testing.assert_allclose(np.asarray(x02), np.asarray(x0), atol=1e-4)


def _perfect_model(schedule, c):
    """Model that knows x0 = c exactly and returns the true v."""
    def fn(x, t):
        a = schedule.alphas_cumprod[t].reshape((-1,) + (1,) * (x.ndim - 1))
        eps = (x - jnp.sqrt(a) * c) / jnp.sqrt(1 - a)
        return jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * c
    return fn


def test_samplers_converge_with_perfect_model():
    s = NoiseSchedule.linear(1000)
    c = 0.7
    shape = (2, 4, 4, 4, 2)
    x_T = jax.random.normal(jax.random.PRNGKey(1), shape)
    model = _perfect_model(s, c)
    x_ddim = ddim_sample(s, model, x_T, num_steps=50)
    np.testing.assert_allclose(np.asarray(x_ddim), c, atol=1e-3)
    x_ddpm = ddpm_sample(s, model, x_T, jax.random.PRNGKey(2), num_steps=100)
    np.testing.assert_allclose(np.asarray(x_ddpm), c, atol=0.15)
    x_dpm = dpmpp_sample(s, model, x_T, num_steps=20)
    np.testing.assert_allclose(np.asarray(x_dpm), c, atol=2e-2)


def test_sampling_timesteps_descending():
    ts = sampling_timesteps(1000, 100)
    assert len(ts) == 100 and ts[0] == 990 and ts[-1] == 0
    assert (np.diff(ts) < 0).all()


def test_unet_and_training_loss():
    cfg = tiny_cfg()
    model = VoxelDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B = 2
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (B, 8, 8, 8, cfg.latent_channels))
    cond = CondCubes.null(B, cfg)
    (loss, aux), grads = jax.value_and_grad(
        lambda p: model.train_loss(p, jax.random.PRNGKey(2), lat, cond),
        has_aux=True)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
    assert gnorm > 0


def test_sample_shapes_and_cfg():
    cfg = tiny_cfg()
    model = VoxelDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0))
    cond = CondCubes.null(2, cfg)
    out = model.sample(params, jax.random.PRNGKey(1), cond, num_steps=4,
                       guidance_scale=2.0)
    assert out.shape == (2, 8, 8, 8, cfg.latent_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_map_and_box_encoders():
    cfg = tiny_cfg()
    # a map point at world (0.5, 0.5, 0.5) -> ijk (0,0,0) -> cube idx (4,4,4)
    mp = jnp.zeros((1, 2, 3, 3)).at[0, 0, 0].set(jnp.array([0.5, 0.5, 0.5]))
    mm = jnp.zeros((1, 2, 3), bool).at[0, 0, 0].set(True)
    cube = encoders.encode_map(mp, mm, cfg.cube_dims, cfg.cube_ijk_min,
                               cfg.latent_voxel_size, cfg.latent_origin)
    assert cube.shape == (1, 8, 8, 8, 2)
    assert float(cube[0, 4, 4, 4, 0]) == 1.0
    assert float(cube.sum()) == 1.0
    # box centered at origin, 2x2x2, yaw 90deg
    pose = jnp.eye(4)
    yaw = jnp.pi / 2
    R = jnp.array([[jnp.cos(yaw), -jnp.sin(yaw), 0],
                   [jnp.sin(yaw), jnp.cos(yaw), 0], [0, 0, 1]])
    pose = pose.at[:3, :3].set(R)
    bc = encoders.encode_boxes(pose[None, None], jnp.array([[[2.0, 2.0, 2.0]]]),
                               jnp.ones((1, 1), bool), cfg.cube_dims,
                               cfg.cube_ijk_min, cfg.latent_voxel_size,
                               cfg.latent_origin)
    assert bc.shape == (1, 8, 8, 8, 2)
    # voxel at cube idx (4,4,4) = world (0.5,0.5,0.5) is inside
    np.testing.assert_allclose(np.asarray(bc[0, 4, 4, 4]),
                               [np.sin(np.pi / 2), np.cos(np.pi / 2)], atol=1e-5)
    # distant voxel untouched
    assert float(jnp.abs(bc[0, 0, 0, 0]).sum()) == 0.0


def test_classifier_free_drop_statistics():
    c = jnp.ones((64, 2, 2, 2, 1))
    out = encoders.classifier_free_drop(c, jax.random.PRNGKey(0), 0.5)
    frac = float((out.sum(axis=(1, 2, 3, 4)) == 0).mean())
    assert 0.2 < frac < 0.8


def test_ema_moves_toward_params():
    p = {"w": jnp.zeros(3)}
    ema = EmaState.create(p)
    target = {"w": jnp.ones(3)}
    for _ in range(20):
        ema = ema.update(target, decay=0.5)
    assert float(ema.params["w"][0]) > 0.9


def test_sdedit_warp_and_callback():
    s = NoiseSchedule.linear(1000)
    prev = jnp.ones((1, 8, 8, 8, 2))
    valid = jnp.ones((1, 8, 8, 8), bool)
    # current chunk shifted +2 voxels in x relative to prev: current frame ->
    # prev frame adds +2 * vs
    rel = jnp.eye(4).at[0, 3].set(2.0)
    st = warp_prev_latents(prev, valid, rel, (-4, -4, -4), (1, 1, 1),
                           (0.5, 0.5, 0.5))
    m = np.asarray(st.overlap_mask[0])
    # voxels whose shifted coordinate falls outside prev cube are not overlapped
    assert m[:6].all() and not m[6:].any()
    cb = make_sdedit_callback(st, s, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 8, 8, 8, 2))
    out = cb(x, jnp.int32(0), 0)
    # at t=0, alphas_cumprod ~ 1 => overlap entries ~ prev latents
    np.testing.assert_allclose(np.asarray(out[0, :6]), 1.0, atol=0.05)
    np.testing.assert_allclose(np.asarray(out[0, 6:]), 0.0, atol=1e-6)


def test_dpmpp_karras_sigmas():
    s = NoiseSchedule.linear(1000)
    c = 0.3
    x_T = jax.random.normal(jax.random.PRNGKey(5), (1, 8))
    out = dpmpp_sample(s, _perfect_model(s, c), x_T, num_steps=20,
                       use_karras_sigmas=True)
    np.testing.assert_allclose(np.asarray(out), c, atol=5e-2)
