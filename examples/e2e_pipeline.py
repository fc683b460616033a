"""End-to-end three-stage pipeline on one accelerator (random weights).

Runs the north-star flow at reduced sampling cost: chunked voxel-world
diffusion (release-shape 64^3 latent cube, DDIM-10) -> guidance buffers
(93 frames @ 480p, splat path) -> GSM gaussian reconstruction -> artifact
dump. With converted checkpoints the same script produces real scenes.

Usage: python examples/e2e_pipeline.py [outdir]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def main(outdir="out/e2e"):
    outdir = Path(outdir)
    t_all = time.perf_counter()

    # ---- stage 1: chunked voxel world generation --------------------------
    from infinicube_tpu.models.diffusion.model import (
        DiffusionConfig, VoxelDiffusion)
    from infinicube_tpu.inference.voxel_world_generation import (
        VoxelWorldGenerator, WorldGenConfig)

    dcfg = DiffusionConfig(transformer_depth=2)  # lighter middle for the demo
    diffusion = VoxelDiffusion(dcfg)
    params = jax.jit(diffusion.init)(jax.random.PRNGKey(0))

    def decode_fn(latents):
        # threshold decode (VAE-free demo): latent ch0 > 1 sigma -> voxel at
        # 4x subdivision, semantics by latent sign pattern
        lat = np.asarray(jax.device_get(latents))[0]
        occ = lat[..., 0] > 1.0
        ii, jj, kk = np.meshgrid(*[np.arange(s) for s in lat.shape[:3]],
                                 indexing="ij")
        ijk = np.stack([ii, jj, kk], -1)[occ] + np.asarray(dcfg.cube_ijk_min)
        sem = np.where(lat[..., 1][occ] > 0, 18, 14).astype(np.int32)
        return (ijk * 4).astype(np.int64), sem

    gen = VoxelWorldGenerator(diffusion, params, decode_fn,
                              WorldGenConfig(ddim_steps=10),
                              finest_voxel_size=0.2)
    T_ego = np.tile(np.eye(4), (30, 1, 1))
    T_ego[:, 0, 3] = np.linspace(0, 45, 30)
    t0 = time.perf_counter()
    maps = {"road_edge": np.stack([np.linspace(0, 80, 200),
                                   np.full(200, -4.0), np.zeros(200)], -1),
            "road_line": np.stack([np.linspace(0, 80, 200),
                                   np.full(200, 4.0), np.zeros(200)], -1)}
    world = gen.generate_trajectory(T_ego, map_points=maps, seed=0)
    print(f"[stage1] world: {world.num_voxels} voxels in "
          f"{time.perf_counter()-t0:.1f}s")

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
    t0 = time.perf_counter()
    buffers = generate_buffers_for_world(world, poses, cam)
    fence(buffers["depth"])
    print(f"[stage2] buffers 93f@480p in {time.perf_counter()-t0:.1f}s "
          f"(hit {float((np.asarray(buffers['depth']) > 0).mean()):.2f})")
    write_buffer_tars(outdir / "buffers", buffers, poses, cam)
    save_voxel_world(outdir / "buffers" / "world.npz", world)

    # ---- stage 2.5: Wan video generation (E2E_VIDEO=0 to skip) -----------
    # the reference's ~20-min A100 video stage (README.md:65): 1.3B DiT,
    # 93f@480p, 50-step CFG denoise + tiled VAE decode, random weights here
    import os
    if os.environ.get("E2E_VIDEO", "1") != "0":
        from infinicube_tpu.inference.guidance_buffer_generation import (
            write_preview_videos)
        from infinicube_tpu.models.wan.pipeline import (
            WanPipelineConfig, WanVideoGenerator)
        sem_rgb, coord = write_preview_videos(outdir / "buffers", buffers)
        t0 = time.perf_counter()
        gen = WanVideoGenerator(WanPipelineConfig())
        gen.params = gen.init_params(jax.random.PRNGKey(0))
        frames = gen.generate((sem_rgb[:93] * 255).astype(np.uint8),
                              coord[:93], "a realistic driving scene")
        print(f"[stage2.5] video 93f@480p 50-step CFG in "
              f"{time.perf_counter()-t0:.1f}s")
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

    data = load_buffer_folder(outdir / "buffers", num_frames=8, stride=8)
    if video_frames is not None:
        data["video"] = video_frames[:: 8][: data["depth"].shape[0]]
    else:
        rng = np.random.default_rng(0)
        data["video"] = rng.uniform(size=data["depth"].shape + (3,)).astype(
            np.float32)
    gcfg = GSMConfig(
        encoder=UnifiedEncoderConfig(conv_width=32),
        voxel=VoxelBranchConfig(f_maps=32, levels=2, gaussians_per_voxel=2),
        pixel=PixelBranchConfig(width=16, dims=(1, 2, 4), gs_per_pixel=1),
        sky=SkyConfig(embed_dim=64, num_layers=2, num_heads=4),
        dense_dims=(512, 256, 64), dense_ijk_min=(-32, -128, -16),
        render_tile_capacity=128)
    t0 = time.perf_counter()
    static_gs, object_gs, out, _, _ = reconstruct_scene(data, cfg=gcfg,
                                                        max_views=2)
    print(f"[stage3] {len(static_gs['means'])} gaussians in "
          f"{time.perf_counter()-t0:.1f}s")
    save_pkl(outdir / "decoded_gs_static.pkl", static_gs)
    save_splat(outdir / "decoded_gs_static.splat", static_gs)
    from PIL import Image
    Image.fromarray((np.clip(np.asarray(out["render"]["rgb"][0]), 0, 1)
                     * 255).astype(np.uint8)).save(outdir / "render0.png")
    print(f"[e2e] done in {time.perf_counter()-t_all:.1f}s -> {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
