"""Voxel latent diffusion model: training loss + guided sampling.

Functional counterpart of the reference's ``diffusion.Model``
(/root/reference/infinicube/voxelgen/models/diffusion.py): frozen-VAE latent
diffusion on the dense 64x64x64 latent cube, conditioned by concatenation of
pos-embed + map cube + box cube (release conditioning_key
``concat_scube_general`` + use_pos_embed/map_3d/box_3d,
configs/diffusion_64x64x64_dense_vs02_map_cond.yaml:44-52), v-prediction MSE
training with per-sample timesteps and classifier-free dropout, EMA weights,
and DDIM/DDPM/DPM++ sampling with CFG and SDEdit overlap injection
(diffusion.py:917-983 forward, 1644-1755 random_sample_latents, 1408-1566
evaluation_api).

TPU design: the whole sampler (all denoise steps, CFG pairs batched as a
doubled batch) jits into one XLA program; latents stay NDHWC end-to-end.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from infinicube_tpu.models.diffusion import encoders
from infinicube_tpu.models.diffusion.schedulers import (
    NoiseSchedule, ddim_sample, ddpm_sample, dpmpp_sample)
from infinicube_tpu.models.diffusion.sdedit import (
    SDEditState, make_sdedit_callback)
from infinicube_tpu.models.diffusion.unet3d import UNet3D

# per-process memo of AOT-loaded sampler executables (see evaluation_api)
_AOT_SAMPLE: dict = {}


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    # latent geometry (release: VAE 64^3 dense neck, 8 ch,
    # latent voxel sizes [0.8, 0.8, 0.4], cube ijk [-32,32)^2 x [-16,48))
    latent_channels: int = 8
    cube_dims: tuple = (64, 64, 64)
    cube_ijk_min: tuple = (-32, -32, -32)  # symmetric, = VAE neck_ijk_min
    latent_voxel_size: tuple = (0.8, 0.8, 0.4)
    latent_origin: tuple = (0.4, 0.4, 0.2)
    # network
    model_channels: int = 192
    channel_mult: tuple = (1, 2, 4, 4)
    attention_ds: tuple = (4, 8)
    num_res_blocks: int = 2
    num_heads: int = 8
    transformer_depth: int = 12
    dtype: Any = jnp.bfloat16
    remat: bool = False
    serve_quant: bool = False   # int8 MXU convs in sample() only (dynamic
    # per-channel quantization, ops/dense_conv.py; training/train_loss keep
    # full precision — quality gate in tests/test_quant.py)
    # conditioning (release: concat_scube_general pos+map+box; the alt
    # modes mirror _forward_cond, reference diffusion.py:501-914)
    num_map_types: int = 3
    use_map_cond: bool = True
    use_box_cond: bool = True
    use_pos_embed: bool = True
    use_semantic_cond: bool = False     # dense semantic cube -> embedding
    num_semantic: int = 23
    semantic_embed_dim: int = 8
    use_single_scan_cond: bool = False  # one lidar scan -> PointNet splat
    single_scan_dim: int = 8
    use_image_cond: str | None = None   # "lift3d" | "lss"
    image_cond_dim: int = 8
    num_classes: int = 0                # >0: adm one-hot class conditioning
    context_dim: int | None = None      # crossattn context (e.g. text)
    classifier_free_prob: float = 0.1
    # diffusion
    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    prediction_type: str = "v_prediction"
    ema_decay: float = 0.9999

    @property
    def extra_cond_channels(self) -> int:
        c = 0
        if self.use_semantic_cond:
            c += self.semantic_embed_dim
        if self.use_single_scan_cond:
            c += self.single_scan_dim
        if self.use_image_cond:
            c += self.image_cond_dim
        return c

    @property
    def cond_channels(self) -> int:
        c = self.extra_cond_channels
        if self.use_pos_embed:
            c += 3
        if self.use_map_cond:
            c += self.num_map_types
        if self.use_box_cond:
            c += 2
        return c


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CondCubes:
    """Encoded conditioning (zeros = null condition). ``extra_cube`` carries
    the alt concat modes (semantic / single-scan / image); ``class_oh`` the
    adm one-hot; ``context`` crossattn tokens."""
    map_cube: jnp.ndarray                 # f32[B, D, H, W, n_types]
    box_cube: jnp.ndarray                 # f32[B, D, H, W, 2]
    extra_cube: jnp.ndarray | None = None   # f32[B, D, H, W, E]
    class_oh: jnp.ndarray | None = None     # f32[B, num_classes]
    context: jnp.ndarray | None = None      # f32[B, L, context_dim]

    @staticmethod
    def null(batch: int, cfg: DiffusionConfig,
             context_len: int = 1) -> "CondCubes":
        D, H, W = cfg.cube_dims
        ec = cfg.extra_cond_channels
        return CondCubes(
            jnp.zeros((batch, D, H, W, cfg.num_map_types)),
            jnp.zeros((batch, D, H, W, 2)),
            extra_cube=jnp.zeros((batch, D, H, W, ec)) if ec else None,
            class_oh=jnp.zeros((batch, cfg.num_classes))
            if cfg.num_classes else None,
            context=jnp.zeros((batch, context_len, cfg.context_dim))
            if cfg.context_dim else None)


class CondEncoders(nn.Module):
    """Parameter-bearing alt-condition encoders -> one dense extra cube
    (reference _forward_cond's semantic / single-scan / image-w-depth / LSS
    assemblies, diffusion.py:501-914). Applied ONCE per sample/loss call;
    the resulting cube rides the concat path every denoise step."""
    cfg: DiffusionConfig

    def _cube_centers(self):
        cfg = self.cfg
        D, H, W = cfg.cube_dims
        ijk = jnp.stack(jnp.meshgrid(jnp.arange(D), jnp.arange(H),
                                     jnp.arange(W), indexing="ij"),
                        -1) + jnp.asarray(cfg.cube_ijk_min)
        return ijk * jnp.asarray(cfg.latent_voxel_size) + \
            jnp.asarray(cfg.latent_origin)

    @nn.compact
    def __call__(self, semantics=None, scan_points=None, scan_mask=None,
                 images=None, Ks=None, cam_to_worlds=None):
        from infinicube_tpu.models.diffusion import alt_encoders as alt
        cfg = self.cfg
        D, H, W = cfg.cube_dims
        parts = []
        if cfg.use_semantic_cond:
            parts.append(alt.SemanticEncoder(
                cfg.num_semantic, cfg.semantic_embed_dim,
                name="semantic")(semantics))
        if cfg.use_single_scan_cond:
            g = alt.PointNetEncoder(out_dim=cfg.single_scan_dim,
                                    name="single_scan")(scan_points,
                                                        scan_mask)
            parts.append(jnp.broadcast_to(
                g[:, None, None, None, :],
                g.shape[:1] + (D, H, W, cfg.single_scan_dim)))
        if cfg.use_image_cond == "lift3d":
            enc = alt.Lift3DEncoder(cfg.image_cond_dim, name="lift3d")
            centers = self._cube_centers()
            parts.append(nn.vmap(
                lambda m, im, K, p: m(im, K, p, centers),
                variable_axes={"params": None}, split_rngs={"params": False},
                in_axes=(0, 0, 0))(enc, images, Ks, cam_to_worlds))
        elif cfg.use_image_cond == "lss":
            enc = alt.LssEncoder(alt.LssConfig(feat_dim=cfg.image_cond_dim),
                                 name="lss")
            out = nn.vmap(
                lambda m, im, K, p: m(im, K, p, cfg.cube_dims,
                                      cfg.cube_ijk_min,
                                      cfg.latent_voxel_size,
                                      cfg.latent_origin),
                variable_axes={"params": None}, split_rngs={"params": False},
                in_axes=(0, 0, 0))(enc, images, Ks, cam_to_worlds)
            parts.append(out[0])
        return jnp.concatenate(parts, axis=-1) if parts else None


class VoxelDiffusion:
    def __init__(self, cfg: DiffusionConfig = DiffusionConfig()):
        self.cfg = cfg
        self.unet = UNet3D(
            out_channels=cfg.latent_channels,
            model_channels=cfg.model_channels,
            channel_mult=cfg.channel_mult,
            num_res_blocks=cfg.num_res_blocks,
            attention_ds=cfg.attention_ds,
            num_heads=cfg.num_heads,
            transformer_depth=cfg.transformer_depth,
            context_dim=cfg.context_dim,
            dtype=cfg.dtype, remat=cfg.remat)
        # serving twin: identical param tree, int8 convs when cfg.serve_quant
        self.unet_serve = self.unet if not cfg.serve_quant else \
            self.unet.clone(conv_quant=True)
        self.cond_enc = CondEncoders(cfg) if cfg.extra_cond_channels else None
        self.schedule = NoiseSchedule.linear(
            cfg.num_train_timesteps, cfg.beta_start, cfg.beta_end)

    # ---- parameters -------------------------------------------------------
    def init(self, rng: jax.Array):
        cfg = self.cfg
        D, H, W = cfg.cube_dims
        x = jnp.zeros((1, D, H, W, cfg.latent_channels + cfg.cond_channels))
        t = jnp.zeros((1,), jnp.int32)
        kw = {}
        if cfg.context_dim:
            kw["context"] = jnp.zeros((1, 1, cfg.context_dim))
        if cfg.num_classes:
            kw["y_emb"] = jnp.zeros((1, cfg.num_classes))
        up = self.unet.init(rng, x, t, **kw)
        if self.cond_enc is None:
            return up
        # param-bearing alt encoders live beside the unet in one tree
        ck = {}
        if cfg.use_semantic_cond:
            ck["semantics"] = jnp.zeros((1, D, H, W), jnp.int32)
        if cfg.use_single_scan_cond:
            ck["scan_points"] = jnp.zeros((1, 8, 3))
            ck["scan_mask"] = jnp.ones((1, 8), bool)
        if cfg.use_image_cond:
            ck["images"] = jnp.zeros((1, 1, 32, 32, 3))
            ck["Ks"] = jnp.tile(jnp.eye(3) * 16.0, (1, 1, 1, 1))
            ck["cam_to_worlds"] = jnp.tile(jnp.eye(4), (1, 1, 1, 1))
        cp = self.cond_enc.init(jax.random.fold_in(rng, 1), **ck)
        return {"params": {"unet": up["params"], "cond_enc": cp["params"]}}

    def _unet_params(self, params):
        if self.cond_enc is None:
            return params
        return {"params": params["params"]["unet"]}

    def encode_extra(self, params, **raw) -> jnp.ndarray | None:
        """Encode the raw alt-condition inputs into the dense extra cube
        (call once; reuse across all denoise steps)."""
        if self.cond_enc is None:
            return None
        return self.cond_enc.apply(
            {"params": params["params"]["cond_enc"]}, **raw)

    # ---- conditioning assembly -------------------------------------------
    def encode_conditions(self, map_points, map_mask, box_poses, box_lwhs,
                          box_mask) -> CondCubes:
        cfg = self.cfg
        mc = encoders.encode_map(map_points, map_mask, cfg.cube_dims,
                                 cfg.cube_ijk_min, cfg.latent_voxel_size,
                                 cfg.latent_origin) if cfg.use_map_cond else None
        bc = encoders.encode_boxes(box_poses, box_lwhs, box_mask, cfg.cube_dims,
                                   cfg.cube_ijk_min, cfg.latent_voxel_size,
                                   cfg.latent_origin) if cfg.use_box_cond else None
        B = map_points.shape[0] if mc is not None else box_poses.shape[0]
        null = CondCubes.null(B, cfg)
        return CondCubes(map_cube=mc if mc is not None else null.map_cube,
                         box_cube=bc if bc is not None else null.box_cube)

    def _assemble(self, x: jnp.ndarray, cond: CondCubes) -> jnp.ndarray:
        cfg = self.cfg
        parts = [x]
        if cfg.use_pos_embed:
            pe = encoders.pos_embed_cube(cfg.cube_dims)
            parts.append(jnp.broadcast_to(pe[None], x.shape[:4] + (3,)))
        if cfg.use_map_cond:
            parts.append(cond.map_cube)
        if cfg.use_box_cond:
            parts.append(cond.box_cube)
        if cfg.extra_cond_channels:
            ec = cond.extra_cube if cond.extra_cube is not None else \
                jnp.zeros(x.shape[:4] + (cfg.extra_cond_channels,))
            parts.append(ec)
        return jnp.concatenate(parts, axis=-1)

    def denoise(self, params, x, t, cond: CondCubes, serve: bool = False):
        kw = {}
        if self.cfg.context_dim and cond.context is not None:
            kw["context"] = cond.context
        if self.cfg.num_classes and cond.class_oh is not None:
            kw["y_emb"] = cond.class_oh
        net = self.unet_serve if serve else self.unet
        return net.apply(self._unet_params(params),
                         self._assemble(x, cond), t, **kw)

    # ---- training ---------------------------------------------------------
    def train_loss(self, params, rng: jax.Array, latents: jnp.ndarray,
                   cond: CondCubes, scale_factor: float = 1.0):
        """v-prediction MSE with per-sample timesteps + CF dropout
        (reference diffusion.py:917-983, 476-498).

        ``scale_factor`` is the scale_by_std normalizer (1/std of the first
        training batch, reference diffusion.py:424-443); it must match the
        value passed to ``sample`` or the trained and sampled latent
        distributions disagree. The training stream usually pre-applies it
        (training/data_glue.scale_by_std); pass it here when feeding raw
        VAE latents directly."""
        cfg = self.cfg
        latents = latents * scale_factor
        B = latents.shape[0]
        r_t, r_n, r_m, r_b = jax.random.split(rng, 4)
        t = jax.random.randint(r_t, (B,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(r_n, latents.shape)
        x_t = self.schedule.add_noise(latents, noise, t)
        target = self.schedule.v_target(latents, noise, t) \
            if cfg.prediction_type == "v_prediction" else noise
        def drop(v, key):
            return None if v is None else encoders.classifier_free_drop(
                v, key, cfg.classifier_free_prob)

        r_e, r_c, r_x = jax.random.split(jax.random.fold_in(r_m, 1), 3)
        cond = CondCubes(
            map_cube=encoders.classifier_free_drop(
                cond.map_cube, r_m, cfg.classifier_free_prob),
            box_cube=encoders.classifier_free_drop(
                cond.box_cube, r_b, cfg.classifier_free_prob),
            extra_cube=drop(cond.extra_cube, r_e),
            class_oh=drop(cond.class_oh, r_c),
            context=drop(cond.context, r_x))
        pred = self.denoise(params, x_t, t, cond)
        loss = jnp.mean((pred - target) ** 2)
        return loss, {"mse": loss}

    # ---- sampling ---------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "num_steps", "sampler",
                                       "use_sdedit", "guidance_scale"))
    def sample(self, params, rng: jax.Array, cond: CondCubes,
               num_steps: int = 100, guidance_scale: float = 1.0,
               sampler: str = "ddim", scale_factor: float = 1.0,
               sdedit: SDEditState | None = None,
               use_sdedit: bool = False) -> jnp.ndarray:
        """Generate latents (already divided by scale_factor back to VAE
        space). CFG runs condition+null as a doubled batch (one UNet call per
        step). Mirrors evaluation_api + random_sample_latents."""
        cfg = self.cfg
        B = cond.map_cube.shape[0]
        D, H, W = cfg.cube_dims
        r_init, r_loop = jax.random.split(rng)
        x_T = jax.random.normal(r_init, (B, D, H, W, cfg.latent_channels))

        use_cfg = guidance_scale != 1.0
        if use_cfg:
            null = CondCubes.null(
                B, cfg, context_len=cond.context.shape[1]
                if cond.context is not None else 1)

            def cat(a, b):
                return None if a is None else jnp.concatenate([a, b])

            cond2 = CondCubes(
                map_cube=jnp.concatenate([cond.map_cube, null.map_cube]),
                box_cube=jnp.concatenate([cond.box_cube, null.box_cube]),
                extra_cube=cat(cond.extra_cube, null.extra_cube),
                class_oh=cat(cond.class_oh, null.class_oh),
                context=cat(cond.context, null.context))

            def model_fn(x, t):
                out = self.denoise(params, jnp.concatenate([x, x]),
                                   jnp.concatenate([t, t]), cond2,
                                   serve=True)
                c, u = jnp.split(out, 2, axis=0)
                return u + guidance_scale * (c - u)
        else:
            def model_fn(x, t):
                return self.denoise(params, x, t, cond, serve=True)

        callback = None
        if use_sdedit and sdedit is not None:
            sd = SDEditState(
                warped_latents=sdedit.warped_latents * scale_factor,
                overlap_mask=sdedit.overlap_mask)
            callback = make_sdedit_callback(sd, self.schedule,
                                            jax.random.fold_in(r_loop, 7))

        if sampler == "ddim":
            x = ddim_sample(self.schedule, model_fn, x_T, num_steps,
                            prediction_type=cfg.prediction_type,
                            step_callback=callback)
        elif sampler == "ddpm":
            x = ddpm_sample(self.schedule, model_fn, x_T, r_loop, num_steps,
                            prediction_type=cfg.prediction_type,
                            step_callback=callback)
        elif sampler == "dpmpp":
            x = dpmpp_sample(self.schedule, model_fn, x_T, num_steps,
                             prediction_type=cfg.prediction_type,
                             step_callback=callback)
        else:
            raise ValueError(sampler)
        return x / scale_factor

    @staticmethod
    def compute_scale_factor(latents: jnp.ndarray) -> jnp.ndarray:
        """scale_by_std: 1/std of the first batch of latents
        (reference diffusion.py:424-443)."""
        return 1.0 / jnp.maximum(jnp.std(latents), 1e-6)

    def evaluation_api(self, params, rng, cond: CondCubes, decode_fn=None,
                       num_steps: int = 100, guidance_scale: float = 1.0,
                       scale_factor: float = 1.0,
                       sdedit: SDEditState | None = None, sampler="ddim"):
        """Public inference entry mirroring the reference's evaluation_api
        (diffusion.py:1408-1566): sample latents under (EMA) params with
        CFG + optional SDEdit, then decode to a sparse semantic grid when a
        VAE ``decode_fn(latents) -> (ijk, semantics)`` is supplied."""
        from infinicube_tpu.utils.aot import aot_dir, cached_compile
        kw = dict(num_steps=num_steps, guidance_scale=guidance_scale,
                  sampler=sampler, use_sdedit=sdedit is not None)
        args = (params, rng, cond)
        pos = dict(scale_factor=scale_factor, sdedit=sdedit)
        if aot_dir() is not None:
            # AOT warm path (INFINICUBE_AOT_DIR, utils/aot.py): the DDIM-100
            # sampler is the dominant cold compile of the e2e (measured
            # minutes per fresh process through the axon tunnel); the
            # serialized executable reloads in ~0.2 s.
            key = ("vox_sample", cond.map_cube.shape, num_steps,
                   guidance_scale, sampler, sdedit is not None)
            fn = _AOT_SAMPLE.get(key)
            if fn is None:
                fn = _AOT_SAMPLE[key] = cached_compile(
                    type(self).sample, self, *args, **pos, **kw,
                    tag="vox_sample")
            latents = fn(*args, **pos)
        else:
            latents = self.sample(*args, **pos, **kw)
        if decode_fn is None:
            return latents, None
        return latents, decode_fn(latents)
