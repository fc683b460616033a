"""GSM train step on the v5e (window sparse-conv backend): realistic scene
scale — 65k-voxel grid, 3 input views at 480x704, dual branch + rasterize +
loss + backward."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss
from infinicube_tpu.models.gsm.model import (GSM, GSMConfig,
    gsm_bf16_config)
from infinicube_tpu.training.state import (
    TrainConfig, TrainState, make_train_step)

rng = np.random.default_rng(0)
n = 200_000
road = np.stack([rng.uniform(0, 80, n // 2), rng.uniform(-20, 20, n // 2),
                 rng.normal(0, 0.1, n // 2)], -1)
walls = np.stack([rng.uniform(0, 80, n // 4),
                  np.sign(rng.normal(size=n // 4)) * rng.normal(16, 0.3, n // 4),
                  rng.uniform(0, 10, n // 4)], -1)
objs = rng.normal(0, 1.0, (n // 4, 3)) + \
    np.stack([rng.uniform(5, 70, n // 4), rng.uniform(-12, 12, n // 4),
              np.full(n // 4, 1.0)], -1)
pts = np.concatenate([road, walls, objs]).astype(np.float32)

V, h, w = 3, 480, 704
K = np.array([[420.0, 0, w / 2], [0, 420, h / 2], [0, 0, 1]], np.float32)
T = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
# OpenCV cams looking +x (world FLU)
T[:, :3, 0] = [0, -1, 0]
T[:, :3, 1] = [0, 0, -1]
T[:, :3, 2] = [1, 0, 0]
for i in range(V):
    T[i, :3, 3] = [2.0 * i, 0, 1.8]

grid = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, n), bool),
                        0.4, 0.2, capacity=1 << 16)
batch = {
    "grid": grid,
    "images": jnp.asarray(rng.uniform(size=(V, h, w, 3)), jnp.float32),
    "masks": jnp.ones((V, h, w, 4), jnp.float32),
    "Ks": jnp.asarray(np.stack([K] * V)),
    "cam_to_worlds": jnp.asarray(T),
    "depth_prior": jnp.zeros((V, h, w, 1)),
}
import os
import dataclasses as _dc
cfg0 = gsm_bf16_config() if os.environ.get('GSM_BF16', '1') == '1' \
    else GSMConfig()
# scene cube (this synthetic crop at vs 0.4: i in [0,200], j +-52, k [0,27])
# -> dense slot-volume conv-plan builds instead of the 27-tap searchsorted
cfg0 = _dc.replace(cfg0, voxel=_dc.replace(
    cfg0.voxel, dense_lookup_bounds=((-8, -64, -8), (224, 128, 48))))
if os.environ.get('GSM_NO_REMAT'):
    cfg0 = _dc.replace(cfg0, render_remat=False)
model = GSM(cfg0)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
npar = sum(x.size for x in jax.tree.leaves(params))
print(f"GSM params: {npar/1e6:.1f}M; voxels "
      f"{int(jax.device_get(grid.total_voxels))}", flush=True)


# real LPIPS-VGG16 in the loss (the reference trains with LPIPS:
# unified_loss.py:39-43). GSM_LPIPS=0 reverts to the cheap proxy; timing is
# weight-independent so the bench uses random (checkpoint-shaped) weights.
lpips_params = None
if os.environ.get("GSM_LPIPS", "1") == "1":
    from infinicube_tpu.models.gsm.lpips import LPIPS
    _lp_dtype = jnp.bfloat16 if os.environ.get("GSM_LPIPS_BF16") else None
    lpips_params = jax.jit(LPIPS().init)(
        jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 32, 32, 3)))
    if _lp_dtype is not None:
        lpips_params = jax.tree.map(lambda x: x.astype(_lp_dtype),
                                    lpips_params)
    print("LPIPS: on" + (" (bf16)" if _lp_dtype else ""), flush=True)


def loss_fn(p, rng_, b):
    out = model.apply(p, b)
    valid = b["masks"][..., 0] * b["masks"][..., 2] > 0
    return gsm_loss(GSMLossConfig(), out["render"], b["images"], valid,
                    out["sky_mask"], gaussians=out["gaussians"],
                    lpips_params=lpips_params, rng=rng_)


tcfg = TrainConfig(use_ema=False)
state = TrainState.create(tcfg, params)
step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
state, m = step(state, jax.random.PRNGKey(1), batch)
jax.device_get(m["loss"])
print("compiled", flush=True)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(2), i),
                    batch)
jax.device_get(m["loss"])
dt = (time.perf_counter() - t0) / 3
print(f"GSM train step (3 views 480x704, dual branch, "
      f"LPIPS {'on' if lpips_params is not None else 'off'}): "
      f"{dt*1e3:.0f} ms "
      f"(loss {float(jax.device_get(m['loss'])):.3f})", flush=True)
