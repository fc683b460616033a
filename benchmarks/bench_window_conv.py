"""Window-GEMM (Pallas) sparse conv on realistic surface voxels, fwd + bwd.

Sparse-effective TF/s = 2 * C_active * 27 * F_in * F_out / time."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.sparse import SparseConv3d
from infinicube_tpu.ops.window_conv import (
    build_window_plan, window_sparse_conv)

rng = np.random.default_rng(0)
n = 400_000
road = np.stack([rng.uniform(-50, 50, n // 2), rng.uniform(-20, 20, n // 2),
                 rng.normal(0, 0.1, n // 2)], -1)
walls = np.stack([rng.uniform(-50, 50, n // 4),
                  np.sign(rng.normal(size=n // 4)) * rng.normal(18, 0.3, n // 4),
                  rng.uniform(0, 12, n // 4)], -1)
objs = rng.normal(0, 1.2, (n - n // 2 - n // 4, 3)) * [1, 1, 0.8] + \
    np.stack([rng.uniform(-45, 45, n // 4), rng.uniform(-15, 15, n // 4),
              np.full(n // 4, 1.0)], -1)
pts = np.concatenate([road, walls, objs], 0).astype(np.float32)

CAP = 1 << 17
g = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, len(pts)), bool),
                     0.2, 0.1, capacity=CAP)
C_act = int(jax.device_get(g.total_voxels))


def timeit(f, *args, iters=10):
    out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


t0 = time.perf_counter()
plan = build_window_plan(g)
jax.device_get(plan.num_missed)
nm = int(jax.device_get(plan.num_missed)[0])
print(f"voxels {C_act}/{CAP}; plan {time.perf_counter()-t0:.2f}s; "
      f"misses {nm} ({nm/(C_act*27):.3%} of pairs), "
      f"overflowed={bool(jax.device_get(plan.overflowed)[0])}", flush=True)

for F in (64, 128, 256):
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, CAP, F),
                              jnp.bfloat16)
    feats = jnp.where(g.mask[..., None], feats, 0)
    w = (jax.random.normal(jax.random.PRNGKey(1), (27, F, F)) * 0.05
         ).astype(jnp.bfloat16)
    flops = 2 * C_act * 27 * F * F
    f = jax.jit(lambda x, w: window_sparse_conv(plan, x, w))
    dt = timeit(f, feats, w)
    print(f"F={F} fwd: {dt*1e3:.2f} ms ({flops/dt/1e12:.1f} TF/s eff)",
          flush=True)

    def loss(x, w):
        return jnp.sum(window_sparse_conv(plan, x, w).astype(jnp.float32)**2)
    fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
    dt = timeit(fb, feats, w, iters=5)
    print(f"F={F} fwd+bwd: {dt*1e3:.2f} ms ({3*flops/dt/1e12:.1f} TF/s eff)",
          flush=True)

# gather baseline at F=64
F = 64
feats = jax.random.normal(jax.random.PRNGKey(0), (1, CAP, F), jnp.bfloat16)
nbr = neighbor_indexes(g, 3)
conv = SparseConv3d(F, dtype=jnp.bfloat16)
params = conv.init(jax.random.PRNGKey(1), feats, nbr)
fg = jax.jit(lambda p, x: conv.apply(p, x, nbr))
dt = timeit(fg, params, feats, iters=3)
print(f"gather-GEMM F=64 fwd: {dt*1e3:.2f} ms "
      f"({2*C_act*27*F*F/dt/1e12:.2f} TF/s)", flush=True)
