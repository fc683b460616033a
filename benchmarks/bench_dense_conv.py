"""Pallas 3x3x3 conv vs XLA conv3d at the release voxel-UNet shapes (v5e).

Prints ms and effective TF/s (bf16) per shape for both paths.
Override plan with BY/OBLK env for tuning.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.ops.dense_conv import (
    conv3x3x3, conv_plan_feasible, _xla_conv)

SHAPES = [
    ((2, 64, 64, 64), 192, 192),
    ((2, 64, 64, 64), 384, 192),
    ((2, 64, 64, 64), 384, 384),
    ((2, 32, 32, 32), 384, 384),
    ((2, 32, 32, 32), 768, 384),
    ((2, 32, 32, 32), 768, 768),
    ((2, 16, 16, 16), 768, 768),
    ((2, 16, 16, 16), 1536, 768),
]


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    for shape, C, O in SHAPES:
        B, D, H, W = shape
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), dt)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, C, O)) * 0.05, dt)
        b = jnp.zeros((O,), jnp.float32)
        plan = conv_plan_feasible(shape, C, O, dt)
        if os.environ.get("BY"):
            plan = (int(os.environ["BY"]), int(os.environ["OBLK"]),
                    int(os.environ.get("CBLK", C)))
        flops = 2 * B * D * H * W * 27 * C * O
        t_x = timeit(jax.jit(lambda x, w, b: _xla_conv(x, w, b)), x, w, b)
        r_x = flops / t_x / 1e12
        if plan is None:
            print(f"{shape} C{C}->O{O}: XLA {t_x*1e3:.2f} ms ({r_x:.0f} TF/s)"
                  f"; no pallas plan", flush=True)
            continue
        f_p = jax.jit(lambda x, w, b: conv3x3x3(x, w, b, plan, False))
        t_p = timeit(f_p, x, w, b)
        r_p = flops / t_p / 1e12
        err = float(jnp.abs(
            f_p(x, w, b).astype(jnp.float32) -
            _xla_conv(x, w, b).astype(jnp.float32)).max())
        print(f"{shape} C{C}->O{O}: XLA {t_x*1e3:.2f} ms ({r_x:.0f} TF/s) | "
              f"pallas{plan} {t_p*1e3:.2f} ms ({r_p:.0f} TF/s) "
              f"[{t_x/t_p:.2f}x] err {err:.3f}", flush=True)


if __name__ == "__main__":
    main()
