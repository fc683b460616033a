"""GSM train-step wall breakdown on the v5e (VERDICT r3 weak #5: the
release step runs at ~3.5 s but had no post-splat-lifter profile, so the
slowest trainer had no costed next lever).

Same scene scale as bench_gsm_train.py (65k voxels, 3 views 480x704, dual
branch). Times CUMULATIVE jitted forward prefixes (encoder; +lift/visible;
+voxel branch; +pixel branch; +sky+render; +loss) — differences are the
per-stage forwards — plus forward-only vs full value_and_grad+optimizer
(the backward+update term), each host-fetch fenced (block_until_ready does
not block under the axon tunnel). Ref shape anchor: gsm.Model.forward
(/root/reference/infinicube/voxelgen/models/gsm.py:90-102)."""
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera import projection as proj
from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.models.gsm.lifter import lift_features, visible_voxel_mask
from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss
from infinicube_tpu.models.gsm.model import GSM, gsm_bf16_config
from infinicube_tpu.models.gsm.renderer import merge_gaussians, render_views
from infinicube_tpu.training.state import (
    TrainConfig, TrainState, make_train_step)

rng = np.random.default_rng(0)
n = 200_000
road = np.stack([rng.uniform(0, 80, n // 2), rng.uniform(-20, 20, n // 2),
                 rng.normal(0, 0.1, n // 2)], -1)
walls = np.stack([rng.uniform(0, 80, n // 4),
                  np.sign(rng.normal(size=n // 4)) * rng.normal(16, 0.3,
                                                                n // 4),
                  rng.uniform(0, 10, n // 4)], -1)
objs = rng.normal(0, 1.0, (n // 4, 3)) + \
    np.stack([rng.uniform(5, 70, n // 4), rng.uniform(-12, 12, n // 4),
              np.full(n // 4, 1.0)], -1)
pts = np.concatenate([road, walls, objs]).astype(np.float32)

V, h, w = 3, 480, 704
K = np.array([[420.0, 0, w / 2], [0, 420, h / 2], [0, 0, 1]], np.float32)
T = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
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
import dataclasses as _dc
cfg0 = gsm_bf16_config()
cfg0 = _dc.replace(cfg0, voxel=_dc.replace(
    cfg0.voxel, dense_lookup_bounds=((-8, -64, -8), (224, 128, 48))))
if os.environ.get("GSM_REMAT", "1") == "0":
    # lever probe: skip per-view render remat in the backward (costs HBM
    # for the stacked per-view intermediates, saves recomputing the
    # dominant render forward)
    cfg0 = _dc.replace(cfg0, render_remat=False)
if os.environ.get("GSM_STAGES", "1") == "0":
    # full-train-step-only mode (skip the six prefix compiles)
    pass
model = GSM(cfg0)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
print(f"voxels {int(jax.device_get(grid.total_voxels))}", flush=True)

REPS = int(os.environ.get("REPS", "3"))


def fence(x):
    # execution is in-order on the device stream: a tiny program enqueued
    # after x completes only after x. Never ravel a big [.., 3]/[.., 1]
    # output (tile-padding relayout trap, CLAUDE.md).
    del x
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])


def timeit(label, fn, *args):
    out = fn(*args)
    fence(out)                       # compile + first exec
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:42s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


# --- cumulative forward prefixes (bound methods via model.apply) -----------
def fwd_prefix(stage):
    def run(p, b):
        cfg = model.cfg

        def inner(mdl):
            enc = mdl.encoder(b["images"][None], b["masks"][None],
                              Ks=b["Ks"][None],
                              cam_to_worlds=b["cam_to_worlds"][None],
                              depth=b["depth_prior"][None])
            if stage == "encoder":
                return enc["features"]
            feats = enc["features"][0]
            g = b["grid"]
            lifted = lift_features(g, feats, b["Ks"], b["cam_to_worlds"],
                                   cfg.dense_ijk_min, cfg.dense_dims)
            visible = visible_voxel_mask(
                g, b["Ks"], b["cam_to_worlds"], cfg.dense_ijk_min,
                cfg.dense_dims,
                ray_hw=(b["images"].shape[1] // 2, b["images"].shape[2] // 2))
            if stage == "lift":
                return lifted, visible
            grids = mdl.grid_pyramid(g)
            gs_v = mdl.voxel_branch(grids, lifted, visible, feats, b["Ks"],
                                    b["cam_to_worlds"])
            if stage == "voxel":
                return gs_v
            pixel_mask = enc["midground"][0] & (enc["effective_mask"][0] > 0)
            gs_p = mdl.pixel_branch(b["images"], b["depth_prior"], b["Ks"],
                                    b["cam_to_worlds"], pixel_mask=pixel_mask)
            if stage == "pixel":
                return gs_v, gs_p
            gaussians = merge_gaussians(gs_v, gs_p)
            hw = b["images"].shape[1:3]
            t_dirs = jax.vmap(lambda Kk, pp: proj.posed_rays_from_intrinsics(
                Kk, pp, hw)[1])(b["Ks"], b["cam_to_worlds"])
            token = mdl.sky_token(b["images"], enc["sky_mask"][0], b["Ks"],
                                  b["cam_to_worlds"])
            sky_images = mdl.sky.sample(token, t_dirs)
            render = render_views(gaussians, b["Ks"], b["cam_to_worlds"], hw,
                                  sky_images=sky_images,
                                  tile_capacity=cfg.render_tile_capacity,
                                  tile=cfg.render_tile,
                                  max_span=cfg.render_span,
                                  remat=cfg.render_remat)
            if stage == "render":
                return render["rgb"]
            valid = b["masks"][..., 0] * b["masks"][..., 2] > 0
            return gsm_loss(GSMLossConfig(), render, b["images"], valid,
                            enc["sky_mask"][0],
                            gaussians=gaussians)[0]

        return nn_apply(inner, p)

    return jax.jit(run)


import flax.linen as nn


def nn_apply(inner, p):
    return nn.apply(inner, model)(p)


def loss_fn(p, rng_, b):
    out = model.apply(p, b)
    valid = b["masks"][..., 0] * b["masks"][..., 2] > 0
    return gsm_loss(GSMLossConfig(), out["render"], b["images"], valid,
                    out["sky_mask"], gaussians=out["gaussians"])


ts = {}
stages = ("encoder", "lift", "voxel", "pixel", "render", "loss") \
    if os.environ.get("GSM_STAGES", "1") != "0" else ("loss",)
for stage in stages:
    ts[stage] = timeit(f"fwd prefix through {stage}", fwd_prefix(stage),
                       params, batch)

if os.environ.get("GSM_GRAD", "0") == "1":
    # fwd+bwd of each cumulative prefix (prefix output sum-reduced to a
    # scalar); difference minus the fwd difference isolates each stage's
    # BACKWARD cost — the term the full-step wall analysis needs
    def grad_prefix(stage):
        run = fwd_prefix(stage)   # jitted; grad-through-jit is fine

        def loss_like(p, b):
            out = jax.tree.leaves(run(p, b))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in out
                       if jnp.issubdtype(o.dtype, jnp.floating))
        return jax.jit(jax.grad(loss_like))

    gs = {}
    for stage in stages:
        gs[stage] = timeit(f"fwd+bwd prefix through {stage}",
                           grad_prefix(stage), params, batch)
    prev_f = prev_g = 0.0
    print("\nper-stage fwd / bwd (difference of prefixes):")
    for stage in stages:
        fw = (ts[stage] - prev_f) * 1e3
        bw = (gs[stage] - prev_g) * 1e3 - fw
        print(f"  {stage:12s} fwd {fw:8.1f} ms   bwd {bw:8.1f} ms")
        prev_f, prev_g = ts[stage], gs[stage]

tcfg = TrainConfig(use_ema=False)
state = TrainState.create(tcfg, params)
step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
s2, m = step(state, jax.random.PRNGKey(1), batch)
fence(m["loss"])
t0 = time.perf_counter()
for i in range(REPS):
    s2, m = step(s2, jax.random.fold_in(jax.random.PRNGKey(2), i), batch)
fence(m["loss"])
full = (time.perf_counter() - t0) / REPS
print(f"{'FULL train step (fwd+bwd+opt)':42s} {full * 1e3:8.1f} ms",
      flush=True)

prev = 0.0
print("\nper-stage forward (difference of prefixes):")
for stage in stages:
    print(f"  {stage:12s} {(ts[stage] - prev) * 1e3:8.1f} ms")
    prev = ts[stage]
print(f"  backward+opt {(full - ts['loss']) * 1e3:8.1f} ms")
