"""VAE train step on the v5e: gather vs window sparse-conv backends.

Release-shaped config (131k finest capacity, f_maps 64) on a surface-like
synthetic batch; reports ms/step for each conv backend."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.grid.ops import majority_label
from infinicube_tpu.models.vae import (
    SparseStructureVAE, SparseVAEConfig, build_hash_tree)
from infinicube_tpu.models.vae.loss import VAELossConfig, vae_loss
from infinicube_tpu.training.state import (
    TrainConfig, TrainState, make_train_step)

rng = np.random.default_rng(0)
n = 300_000
road = np.stack([rng.uniform(-25, 25, n // 2), rng.uniform(-20, 20, n // 2),
                 rng.normal(0, 0.1, n // 2)], -1)
walls = np.stack([rng.uniform(-25, 25, n // 4),
                  np.sign(rng.normal(size=n // 4)) * rng.normal(17, 0.3, n // 4),
                  rng.uniform(0, 12, n // 4)], -1)
objs = rng.normal(0, 1.2, (n // 4, 3)) * [1, 1, 0.8] + \
    np.stack([rng.uniform(-22, 22, n // 4), rng.uniform(-15, 15, n // 4),
              np.full(n // 4, 1.0)], -1)
pts = np.concatenate([road, walls, objs]).astype(np.float32)[None]
sem_pts = rng.integers(0, 23, (1, n)).astype(np.int32)


def bench(backend: str, iters=5):
    cfg = SparseVAEConfig(conv_backend=backend, dtype=jnp.bfloat16)
    model = SparseStructureVAE(cfg)
    grids = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((1, n), bool))
    sem = majority_label(grids[0], jnp.asarray(pts), jnp.asarray(sem_pts),
                         jnp.ones((1, n), bool), cfg.num_semantic)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), grids, sem,
                                 jax.random.PRNGKey(1))
    lcfg = VAELossConfig()
    tcfg = TrainConfig(use_ema=False)
    state = TrainState.create(tcfg, params)

    def loss_fn(p, r, batch):
        g, s = batch
        out = model.apply(p, g, s, r)
        return vae_loss(lcfg, out, g[0], s)

    step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
    state, m = step(state, jax.random.PRNGKey(2), (grids, sem))
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(3), i),
                        (grids, sem))
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    nv = int(jax.device_get(grids[0].total_voxels))
    print(f"VAE train step [{backend}]: {dt*1e3:.0f} ms "
          f"({nv} voxels, loss {float(jax.device_get(m['loss'])):.3f})",
          flush=True)
    return dt


dt_w = bench("window")
try:
    dt_g = bench("gather")
    print(f"speedup: {dt_g/dt_w:.2f}x", flush=True)
except Exception as e:  # gather-GEMM backward exceeds HBM at this scale
    print(f"gather backend failed at release scale: {type(e).__name__} "
          f"(27-tap gather backward exceeds the 15.75 GB HBM)", flush=True)
