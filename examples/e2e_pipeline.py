"""End-to-end three-stage pipeline on one accelerator (random weights).

Runs the north-star flow at reduced sampling cost: chunked voxel-world
diffusion (release-shape 64^3 latent cube, DDIM-10) -> guidance buffers
(93 frames @ 480p, splat path) -> GSM gaussian reconstruction -> artifact
dump. With converted checkpoints the same script produces real scenes.

Usage: python examples/e2e_pipeline.py [outdir]

E2E_STEADY=1 runs every timed stage a SECOND time in-process after the
first pass and reports both timings — the second pass is the steady-state
(serving) number with all XLA compiles amortized, the deployment-relevant
figure (a server keeps the process alive; compiles happen once per
binary+shape). E2E_VIDEO=0 skips the Wan stage. E2E_DDIM sets the stage-1
DDIM step count (default 10 = the fast profile; 100 = the reference's
release default, /root/reference/README.md:43).

E2E_PROFILE selects the stage-1/3 configuration:
- "demo" (default): REDUCED stages 1 and 3 — stage 1 runs a
  transformer_depth=2 UNet with a VAE-free threshold decode, stage 3 a
  shrunken GSM (f_maps 32, 2 views, 8 frames). Fast smoke, NOT the
  reference workload.
- "release": the true release configs — stage 1 the default 750M
  DiffusionConfig (transformer_depth=12,
  /root/reference/infinicube/voxelgen/configs/
  diffusion_64x64x64_dense_vs02_map_cond.yaml:54-66) with the real jitted
  VAE structure decoder per chunk (vae_decode_fn), stage 3 the default
  release GSMConfig at the reference's key-frame count (93 frames step 6
  -> 16 views, scene_gaussian_generation.py:225-236). Pair with
  E2E_DDIM=100 for the full reference-fidelity measurement."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os
import jax
import jax.numpy as jnp
import numpy as np

STEADY = os.environ.get("E2E_STEADY", "0") == "1"


def fence(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def timed(label, fn):
    """Run fn once (cold, includes compiles); in E2E_STEADY mode run it
    again and report the steady-state (compile-free) wall time."""
    import time as _t
    t0 = _t.perf_counter()
    out = fn()
    cold = _t.perf_counter() - t0
    if STEADY:
        t0 = _t.perf_counter()
        out = fn()
        warm = _t.perf_counter() - t0
        print(f"[{label}] cold {cold:.1f}s -> steady {warm:.1f}s")
    else:
        print(f"[{label}] {cold:.1f}s")
    return out


def main(outdir="out/e2e"):
    outdir = Path(outdir)
    t_all = time.perf_counter()

    # ---- stage 1: chunked voxel world generation --------------------------
    from infinicube_tpu.models.diffusion.model import (
        DiffusionConfig, VoxelDiffusion)
    from infinicube_tpu.inference.voxel_world_generation import (
        VoxelWorldGenerator, WorldGenConfig)

    PROFILE = os.environ.get("E2E_PROFILE", "demo")
    if PROFILE == "release":
        # the release 750M UNet (default DiffusionConfig) + the REAL jitted
        # VAE structure decoder chain per chunk (random weights: the struct
        # heads grow a capacity-bounded grid; timing is weight-independent)
        from infinicube_tpu.inference.voxel_world_generation import (
            vae_decode_fn)
        from infinicube_tpu.models.vae.sunet import (
            SparseStructureVAE, SparseVAEConfig, build_hash_tree)
        dcfg = DiffusionConfig()
        vcfg = SparseVAEConfig()
        vae = SparseStructureVAE(vcfg)
        rngv = np.random.default_rng(0)
        pts = jnp.asarray(np.stack([rngv.uniform(-25, 25, (1, 500)),
                                    rngv.uniform(-25, 25, (1, 500)),
                                    rngv.uniform(-12, 12, (1, 500))],
                                   -1), jnp.float32)
        grids0 = build_hash_tree(vcfg, pts, jnp.ones((1, 500), bool))
        sem0 = jnp.zeros((1, grids0[0].capacity), jnp.int32)
        vae_params = jax.jit(vae.init)(jax.random.PRNGKey(1), grids0, sem0,
                                       jax.random.PRNGKey(2))
        decode_fn = vae_decode_fn(vae, vae_params)
    else:
        dcfg = DiffusionConfig(transformer_depth=2)  # REDUCED demo UNet

        def decode_fn(latents):
            # threshold decode (VAE-free demo): latent ch0 > 1 sigma ->
            # voxel at 4x subdivision, semantics by latent sign pattern
            lat = np.asarray(jax.device_get(latents))[0]
            occ = lat[..., 0] > 1.0
            ii, jj, kk = np.meshgrid(*[np.arange(s) for s in lat.shape[:3]],
                                     indexing="ij")
            ijk = np.stack([ii, jj, kk], -1)[occ] + \
                np.asarray(dcfg.cube_ijk_min)
            sem = np.where(lat[..., 1][occ] > 0, 18, 14).astype(np.int32)
            return (ijk * 4).astype(np.int64), sem

    diffusion = VoxelDiffusion(dcfg)
    params = jax.jit(diffusion.init)(jax.random.PRNGKey(0))

    gen = VoxelWorldGenerator(diffusion, params, decode_fn,
                              WorldGenConfig(ddim_steps=int(
                                  os.environ.get("E2E_DDIM", "10"))),
                              finest_voxel_size=0.2)
    T_ego = np.tile(np.eye(4), (30, 1, 1))
    T_ego[:, 0, 3] = np.linspace(0, 45, 30)
    maps = {"road_edge": np.stack([np.linspace(0, 80, 200),
                                   np.full(200, -4.0), np.zeros(200)], -1),
            "road_line": np.stack([np.linspace(0, 80, 200),
                                   np.full(200, 4.0), np.zeros(200)], -1)}
    world = timed("stage1 world", lambda: gen.generate_trajectory(
        T_ego, map_points=maps, seed=0))
    print(f"[stage1] world: {world.num_voxels} voxels")

    from infinicube_tpu.inference.guidance_buffer_generation import (
        save_voxel_world)
    save_voxel_world(outdir / "world.npz", world)

    # ---- stage 2: guidance buffers ----------------------------------------
    from infinicube_tpu.camera.pinhole import PinholeCamera
    from infinicube_tpu.inference.guidance_buffer_generation import (
        generate_buffers_for_world, write_buffer_tars)
    cam = PinholeCamera(fx=480.0, fy=480.0, cx=416.0, cy=240.0, w=832, h=480)
    poses = np.tile(np.eye(4), (93, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 40, 93)
    poses[:, 2, 3] = 1.8
    def _buffers():
        b = generate_buffers_for_world(world, poses, cam)
        fence(b["depth"])
        return b
    buffers = timed("stage2 buffers 93f@480p", _buffers)
    print(f"[stage2] hit {float((np.asarray(buffers['depth']) > 0).mean()):.2f}")
    write_buffer_tars(outdir / "buffers", buffers, poses, cam)
    save_voxel_world(outdir / "buffers" / "world.npz", world)
    del gen, params, diffusion   # release stage-1 HBM (3 GB) for the DiT
    if PROFILE == "release":
        del decode_fn, vae_params    # VAE tower + jitted decode residency

    # ---- stage 2.5: Wan video generation (E2E_VIDEO=0 to skip) -----------
    # the reference's ~20-min A100 video stage (README.md:65): 1.3B DiT,
    # 93f@480p, 50-step CFG denoise + tiled VAE decode, random weights here
    if os.environ.get("E2E_VIDEO", "1") != "0":
        from infinicube_tpu.inference.guidance_buffer_generation import (
            write_preview_videos)
        from infinicube_tpu.models.wan.pipeline import (
            WanPipelineConfig, WanVideoGenerator)
        sem_rgb, coord = write_preview_videos(outdir / "buffers", buffers)
        buffers = None   # free the device buffer stack — the video stage
        # needs every HBM byte (stage 3 reloads from the written tars)
        gen = WanVideoGenerator(WanPipelineConfig.serving())
        gen.params = gen.init_params(jax.random.PRNGKey(0))
        gen.cast_params_bf16()   # serving residency: DiT 5.7 -> 2.9 GB
        frames = timed("stage2.5 video 93f@480p 50-step CFG", lambda:
                       gen.generate((sem_rgb[:93] * 255).astype(np.uint8),
                                    coord[:93], "a realistic driving scene"))
        from infinicube_tpu.utils.fileio import write_video
        write_video(outdir / "video.mp4", frames)
        video_frames = np.asarray(frames, np.float32) / 255.0
    else:
        video_frames = None

    # ---- stage 3: GSM gaussian scene --------------------------------------
    from infinicube_tpu.inference.scene_gaussian_generation import (
        load_buffer_folder, reconstruct_scene)
    from infinicube_tpu.models.gsm.model import GSMConfig
    from infinicube_tpu.models.gsm.encoders import UnifiedEncoderConfig
    from infinicube_tpu.models.gsm.voxel_branch import VoxelBranchConfig
    from infinicube_tpu.models.gsm.pixel_branch import PixelBranchConfig
    from infinicube_tpu.models.gsm.sky import SkyConfig
    from infinicube_tpu.utils.gaussian_io import save_pkl, save_splat

    if PROFILE == "release":
        # reference key-frame selection: every 6th of 93 frames -> 16 views
        # (scene_gaussian_generation.py:225-236); default release GSMConfig
        # (f_maps 64, gs/voxel 4, XUnet width 32 dims (1,2,4,8), sky 192) —
        # only the scene-crop fields describe THIS demo world
        n_frames, stride, n_views = 16, 6, 16
        gcfg = GSMConfig(dense_dims=(512, 256, 64),
                         dense_ijk_min=(-32, -128, -16))
    else:
        n_frames, stride, n_views = 8, 8, 2
        gcfg = GSMConfig(
            encoder=UnifiedEncoderConfig(conv_width=32),
            voxel=VoxelBranchConfig(f_maps=32, levels=2,
                                    gaussians_per_voxel=2),
            pixel=PixelBranchConfig(width=16, dims=(1, 2, 4), gs_per_pixel=1),
            sky=SkyConfig(embed_dim=64, num_layers=2, num_heads=4),
            dense_dims=(512, 256, 64), dense_ijk_min=(-32, -128, -16),
            render_tile_capacity=128)
    data = load_buffer_folder(outdir / "buffers", num_frames=n_frames,
                              stride=stride)
    if video_frames is not None:
        data["video"] = video_frames[::stride][: data["depth"].shape[0]]
    else:
        rng = np.random.default_rng(0)
        data["video"] = rng.uniform(size=data["depth"].shape + (3,)).astype(
            np.float32)
    static_gs, object_gs, out, _, _ = timed(
        f"stage3 GSM ({PROFILE}: {n_views} views)",
        lambda: reconstruct_scene(data, cfg=gcfg, max_views=n_views))
    print(f"[stage3] {len(static_gs['means'])} gaussians")
    save_pkl(outdir / "decoded_gs_static.pkl", static_gs)
    save_splat(outdir / "decoded_gs_static.splat", static_gs)
    from PIL import Image
    Image.fromarray((np.clip(np.asarray(out["render"]["rgb"][0]), 0, 1)
                     * 255).astype(np.uint8)).save(outdir / "render0.png")
    print(f"[e2e] done in {time.perf_counter()-t_all:.1f}s -> {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
