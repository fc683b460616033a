import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import time
import numpy as np
import jax
import jax.numpy as jnp
from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.sparse import SparseConv3d

rng = np.random.default_rng(0)
n = 120_000
pts = np.stack([rng.uniform(-25, 25, n), rng.uniform(-25, 25, n),
                rng.uniform(-6, 19, n)], -1)
g = grid_from_points(jnp.asarray(pts, jnp.float32)[None],
                     jnp.ones((1, n), bool), 0.2, 0.1, capacity=1 << 17)
print("voxels:", int(jax.device_get(g.total_voxels)), flush=True)
t0 = time.perf_counter()
nbr = neighbor_indexes(g, 3)
_ = jax.device_get(nbr[0, 0, 0])
print(f"neighbor table: {time.perf_counter()-t0:.2f}s", flush=True)

F_in, F_out = 64, 64
conv = SparseConv3d(F_out, dtype=jnp.bfloat16)
feats = jax.random.normal(jax.random.PRNGKey(0), (1, 1 << 17, F_in),
                          jnp.bfloat16)
params = conv.init(jax.random.PRNGKey(1), feats, nbr)
f = jax.jit(lambda p, x: conv.apply(p, x, nbr))
out = f(params, feats)
_ = jax.device_get(out[0, 0, 0])
t0 = time.perf_counter()
for _ in range(5):
    out = f(params, out)
_ = jax.device_get(out[0, 0, 0])
dt = (time.perf_counter() - t0) / 5
flops = 2 * (1 << 17) * 27 * F_in * F_out
print(f"sparse conv C=131k {F_in}->{F_out}: {dt*1e3:.1f} ms "
      f"({flops/dt/1e12:.1f} TF/s)", flush=True)
