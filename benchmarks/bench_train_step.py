import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import time
import jax
import jax.numpy as jnp
from infinicube_tpu.models.diffusion.model import (
    CondCubes, DiffusionConfig, VoxelDiffusion)
from infinicube_tpu.training.state import TrainConfig, TrainState, make_train_step

cfg = DiffusionConfig(remat=True)
model = VoxelDiffusion(cfg)
params = jax.jit(model.init)(jax.random.PRNGKey(0))
n_params = sum(x.size for x in jax.tree.leaves(params))
print(f"UNet params: {n_params/1e6:.1f}M", flush=True)
tcfg = TrainConfig(use_ema=False)
state = TrainState.create(tcfg, params)

def loss_fn(p, rng, batch):
    lat, cond = batch
    return model.train_loss(p, rng, lat, cond)

step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
B = 1
lat = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 64, 8))
cond = CondCubes.null(B, cfg)
state, m = step(state, jax.random.PRNGKey(2), (lat, cond))
_ = jax.device_get(m["loss"])
print("compiled", flush=True)
t0 = time.perf_counter()
for i in range(3):
    state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(3), i),
                    (lat, cond))
_ = jax.device_get(m["loss"])
dt = (time.perf_counter() - t0) / 3
print(f"train step (B={B}, remat, no-ema): {dt*1e3:.0f} ms -> "
      f"{B/dt:.2f} samples/s", flush=True)
