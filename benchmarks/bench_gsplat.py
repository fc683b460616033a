"""3DGS rasterizer benchmark: 500k gaussians -> 480p (stage-3 hot op)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import time

import numpy as np
import jax
import jax.numpy as jnp

from infinicube_tpu.ops.gsplat import render_gaussians


def main():
    rng = np.random.default_rng(0)
    n = 500_000
    means = np.stack([rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                      rng.uniform(2, 80, n)], -1).astype(np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)
    op = rng.uniform(0.2, 0.9, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = jnp.array([[480.0, 0, 416], [0, 480, 240], [0, 0, 1]])
    view = jnp.eye(4)
    hw = (480, 832)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, op, col))

    f = jax.jit(lambda *a: render_gaussians(*a, view, K, hw))
    out = f(*args)
    _ = jax.device_get(out[0][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(*args)
    _ = jax.device_get(out[0][0, 0, 0])
    dt = (time.perf_counter() - t0) / 5
    print(f"render 500k gaussians @480p: {dt*1e3:.1f} ms "
          f"({1.0/dt:.1f} fps)")


if __name__ == "__main__":
    main()
