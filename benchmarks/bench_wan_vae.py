"""Wan2.1 causal video VAE decode on the v5e: latents [1, 24, 60, 104, 16]
-> 93f @ 480x832 video (the stage-2 serving path after the 50-step denoise).
BENCH_FRAMES env overrides the frame count (latent T = 1 + (f-1)/4)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from infinicube_tpu.models.wan.vae3d import VideoVAE, VideoVAEConfig

frames = int(os.environ.get("BENCH_FRAMES", "93"))
T = 1 + (frames - 1) // 4
H, W = 60, 104
cfg = VideoVAEConfig.wan21()
vae = VideoVAE(cfg)
z = jax.random.normal(jax.random.PRNGKey(0), (1, T, H, W,
                                              cfg.latent_channels))
params = vae.init(jax.random.PRNGKey(1), z[:, :, :16, :16],
                  method=VideoVAE.decode)
# full-frame decode at 93f 480p needs ~20 GB (one f32 intermediate at
# 93x480x832x96 is 14 GB) — serving uses the tiled decode, like the
# reference's tiled=True default
from infinicube_tpu.models.wan.vae3d import decode_tiled_host
dec = lambda p, z: decode_tiled_host(vae, p, z, to_uint8=True)
out = dec(params, z)
_ = out[0, 0, 0, 0]
t0 = time.perf_counter()
out = dec(params, z)
_ = out[0, 0, 0, 0]
dt = time.perf_counter() - t0
print(f"Wan VAE decode {frames}f -> {out.shape[2]}x{out.shape[3]}: "
      f"{dt:.2f} s ({frames/dt:.1f} frames/s)", flush=True)
