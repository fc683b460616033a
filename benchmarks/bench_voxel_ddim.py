"""Voxel diffusion DDIM sampling benchmark (tracked config 2):
release-shape 64^3 dense map-conditioned UNet, CFG pair per step."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import os
import time

import jax
import jax.numpy as jnp

from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)


def main():
    steps = int(os.environ.get("BENCH_DDIM_STEPS", "10"))
    # serving default: int8 MXU convs (quality-gated, tests/test_quant.py);
    # BENCH_DDIM_PRECISION=bf16 reports the full-precision number
    precision = os.environ.get("BENCH_DDIM_PRECISION", "int8")
    cfg = DiffusionConfig(serve_quant=precision == "int8")
    model = VoxelDiffusion(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    cond = CondCubes.null(1, cfg)
    out = model.sample(params, jax.random.PRNGKey(1), cond, num_steps=steps,
                       guidance_scale=2.0)
    _ = jax.device_get(out[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    out = model.sample(params, jax.random.PRNGKey(2), cond, num_steps=steps,
                       guidance_scale=2.0)
    _ = jax.device_get(out[0, 0, 0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"voxel DDIM (release UNet, CFG): {steps/dt:.2f} it/s "
          f"({dt/steps*1e3:.0f} ms/it; DDIM-100 chunk = {100*dt/steps:.1f}s)")


if __name__ == "__main__":
    main()
