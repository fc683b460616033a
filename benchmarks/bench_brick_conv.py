"""Brick-dense sparse conv vs gather-GEMM on realistic (surface-like) voxels.

Reports sparse-effective TF/s: FLOPs counted over *active* voxels only
(2 * C_active * 27 * F_in * F_out), so backends are comparable."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.brick import build_brick_plan
from infinicube_tpu.nn.sparse import SparseConv3d, SparseResBlock

rng = np.random.default_rng(0)
n = 400_000
# Waymo-like scene surfaces: road plane, building walls, scattered objects
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
print(f"active voxels: {C_act} / cap {CAP}", flush=True)

F_in, F_out = 64, 64
feats = jax.random.normal(jax.random.PRNGKey(0), (1, CAP, F_in), jnp.bfloat16)
feats = jnp.where(g.mask[..., None], feats, 0)
flops = 2 * C_act * 27 * F_in * F_out


def timeit(f, *args, iters=10):
    out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


# plan build cost (once per grid)
for shape, bcap_div in ((4, 4), (8, 16)):
    bshape = (shape,) * 3
    t0 = time.perf_counter()
    plan = jax.jit(lambda g: build_brick_plan(g, bshape, CAP // bcap_div),
                   static_argnums=())(g)
    jax.device_get(plan.num_dropped)
    nb = int(jax.device_get(plan.brick_mask.sum()))
    occ = C_act / (nb * shape ** 3)
    print(f"brick {bshape}: plan {time.perf_counter()-t0:.2f}s, "
          f"{nb} bricks, occupancy {occ:.1%}, dropped "
          f"{int(jax.device_get(plan.num_dropped)[0])}", flush=True)
    for impl in ("taps", "xla"):
        conv = SparseConv3d(F_out, dtype=jnp.bfloat16, brick_impl=impl)
        params = conv.init(jax.random.PRNGKey(1), feats, plan)
        f = jax.jit(lambda p, x: conv.apply(p, x, plan))
        dt = timeit(f, params, feats)
        print(f"  brick[{impl}]: {dt*1e3:.2f} ms ({flops/dt/1e12:.1f} TF/s "
              f"sparse-effective)", flush=True)
    blk = SparseResBlock(F_out, dtype=jnp.bfloat16)
    bp = blk.init(jax.random.PRNGKey(2), feats, plan, g.mask)
    f = jax.jit(lambda p, x: blk.apply(p, x, plan, g.mask))
    dt = timeit(f, bp, feats)
    print(f"  resblock[brick taps]: {dt*1e3:.2f} ms "
          f"({2*flops/dt/1e12:.1f} TF/s)", flush=True)

nbr = neighbor_indexes(g, 3)
jax.device_get(nbr[0, 0, 0])
conv = SparseConv3d(F_out, dtype=jnp.bfloat16)
params = conv.init(jax.random.PRNGKey(1), feats, nbr)
f = jax.jit(lambda p, x: conv.apply(p, x, nbr))
dt = timeit(f, params, feats, iters=3)
print(f"gather-GEMM: {dt*1e3:.2f} ms ({flops/dt/1e12:.2f} TF/s)", flush=True)
