"""Wan VAE tile probes: XLA convs vs the Pallas implicit-GEMM routing.

VERDICT r3 next #2: the steady video stage spends ~126 s in the two buffer
encodes + tiled decode (vs 194.5 s denoise). Both are ResidualBlock-conv
bound; this bench times ONE release decode tile (24 latent frames, 64x32
latent -> 93f 512x256 px) and ONE release encode tile (93f 512x256 px) under
conv_impl="xla" vs "auto" (Pallas, ops/dense_conv.py).

Timings are host-fetch fenced (block_until_ready does not block under the
axon tunnel). First Pallas compile is minutes per conv-shape variant —
steady numbers are the repeat passes.

Usage: python benchmarks/bench_vae_tiles.py [decode|encode] [xla|auto]
(no args = all four cells).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.wan.vae3d import VideoVAE, VideoVAEConfig

REPS = 2


def bench(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])  # in-order fence; ravel on big outputs hits the tile-padding relayout trap
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])  # in-order fence; ravel on big outputs hits the tile-padding relayout trap
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:28s} compile+1st {tc:6.1f} s   steady {dt * 1e3:8.0f} ms",
          flush=True)
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "all"
impls = [sys.argv[2]] if len(sys.argv) > 2 else ["xla", "auto"]

rng = np.random.default_rng(0)
z = jnp.asarray(rng.standard_normal((1, 24, 64, 32, 16)), jnp.float32)
video = jnp.asarray(
    rng.standard_normal((1, 93, 512, 256, 3)).clip(-1, 1), jnp.float32)

for impl in impls:
    cfg = VideoVAEConfig.wan21(conv_impl=impl)
    vae = VideoVAE(cfg)
    params = jax.jit(vae.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 64, 64, 3), jnp.float32))
    if which in ("all", "decode"):
        dec = jax.jit(lambda p, zz: vae.apply(p, zz, method=VideoVAE.decode))
        bench(f"decode tile 64x32 [{impl}]", dec, params, z)
    if which in ("all", "encode"):
        enc = jax.jit(lambda p, v: vae.apply(p, v, method=VideoVAE.encode))
        bench(f"encode tile 512x256 [{impl}]", enc, params, video)
