"""Overfit-to-quality demos (VERDICT r4 next #4): prove the stack can TRAIN
to a good result, not merely that loss decreases.

The reference's de-facto regression harness is eval-driven reconstruction
quality (/root/reference/infinicube/inference/voxel_vae.py,
feedforward_reconstruction.py) with released weights; those weights are not
downloadable here, so the only available fidelity evidence is overfitting:

  (a) GSM on one synthetic multi-view-consistent scene to in-view PSNR >= 28
      and HELD-OUT-view PSNR >= 22 (novel-view generalization, the
      reference's val metric shape, train.py:307-315);
  (b) VAE to free-running structure-decode grid IoU >= 0.95 (the reference's
      grid IoU metric, modules/autoencoding/losses/base_loss.py:81-100);
  (c) diffusion on a one-point toy distribution until DDIM samples
      reproduce the data point (the only distribution whose match is
      checkable without FVD infrastructure).

Chip-gated slow tests (minutes of training each); each run refreshes its
section of tests/golden/overfit_metrics.json, and the always-on
test_overfit_metrics_committed asserts the committed numbers clear the bars
so the CPU suite enforces the evidence without re-training.

    INFINICUBE_TPU_TESTS=1 python -m pytest tests/test_overfit_quality.py -m slow -q
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

METRICS = Path(__file__).parent / "golden" / "overfit_metrics.json"

# OVERFIT_STEPS_SCALE scales every demo's training length (CPU smoke /
# chip tuning); the committed metrics must come from scale 1.0 runs.
import os
_SCALE = float(os.environ.get("OVERFIT_STEPS_SCALE", "1.0"))


def _steps(n: int) -> int:
    return max(2, int(n * _SCALE))


def _record(section: str, metrics: dict):
    data = json.loads(METRICS.read_text()) if METRICS.exists() else {}
    data[section] = {k: float(v) for k, v in metrics.items()}
    METRICS.write_text(json.dumps(data, indent=2, sort_keys=True))


# ---------------------------------------------------------------------------
# (a) GSM: synthetic gaussian scene, 4 train views + 1 held-out view
# ---------------------------------------------------------------------------

def _gsm_scene(h=120, w=160):
    """Multi-view-consistent targets: render a ground-truth gaussian scene
    (one gaussian per occupied voxel, smooth position-keyed colors) with OUR
    rasterizer over a constant sky; the GSM's voxel head can represent this
    exactly (K gaussians per voxel), so overfit quality is a property of the
    training stack, not of target realizability."""
    from infinicube_tpu.grid.build import grid_from_points
    from infinicube_tpu.ops.gsplat import render_gaussians

    rng = np.random.default_rng(0)
    n = 40_000
    ground = np.stack([rng.uniform(0, 16, n // 2), rng.uniform(-6, 6, n // 2),
                       rng.normal(0, 0.05, n // 2)], -1)
    box1 = rng.uniform([5, -3.5, 0], [7, -1.5, 2.2], (n // 4, 3))
    box2 = rng.uniform([9, 1, 0], [11.5, 3, 1.6], (n - n // 2 - n // 4, 3))
    pts = np.concatenate([ground, box1, box2]).astype(np.float32)
    grid = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, n), bool),
                            0.4, 0.2, capacity=1 << 14)

    mask = np.asarray(grid.mask[0])
    means = np.asarray(grid.voxel_centers()[0])[mask]
    m = len(means)
    w_mix = np.array([[0.9, 0.3, 0.2], [-0.2, 1.1, 0.5], [0.4, -0.6, 1.3]])
    colors = 0.5 + 0.45 * np.sin(means @ w_mix.T + [0.0, 2.0, 4.0])
    quats = np.tile([1.0, 0, 0, 0], (m, 1)).astype(np.float32)
    scales = np.full((m, 3), 0.22, np.float32)
    opac = np.full(m, 0.97, np.float32)
    sky_rgb = jnp.asarray([0.45, 0.6, 0.9])

    K = np.array([[110.0, 0, w / 2], [0, 110, h / 2], [0, 0, 1]], np.float32)
    poses = []
    for i, (x, y) in enumerate([(-3, 0), (-1, -1.5), (1, 1.5), (3, 0),
                                (0, 0.6)]):       # last = held-out
        T = np.eye(4, dtype=np.float32)
        T[:3, 0] = [0, -1, 0]       # OpenCV cam looking +x (world FLU)
        T[:3, 1] = [0, 0, -1]
        T[:3, 2] = [1, 0, 0]
        T[:3, 3] = [x, y, 1.6]
        poses.append(T)
    poses = np.stack(poses)

    render = jax.jit(lambda vm: render_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(colors.astype(np.float32)),
        vm, jnp.asarray(K), (h, w)))
    imgs, fgs, depths = [], [], []
    for T in poses:
        rgb, alpha, depth = render(jnp.linalg.inv(jnp.asarray(T)))
        fg = np.asarray(alpha) > 0.5
        imgs.append(np.asarray(rgb) +
                    (1 - np.asarray(alpha))[..., None] * np.asarray(sky_rgb))
        fgs.append(fg)
        depths.append(np.where(fg, np.asarray(depth), 0.0))
    return (grid, np.stack(imgs).astype(np.float32), np.stack(fgs),
            np.stack(depths).astype(np.float32), np.stack([K] * 5), poses)


@pytest.mark.slow
@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="chip-gated overfit demo")
def test_gsm_overfit_one_scene():
    """Train the dual-branch GSM on 4 views of one scene; in-view PSNR >= 28
    and held-out-view PSNR >= 22.

    Runs under f32 matmul precision: the TPU default (bf16 matmul inputs)
    DIVERGES on this training problem — measured loss 0.57 -> 0.75 over
    600 steps at default precision vs 0.57 -> 0.11 (PSNR 19+ by step 175)
    at "highest", same code and data. The reference trains GSM on A100
    TF32 (10-bit mantissa); bf16's 8-bit mantissa in the rasterizer/UNet
    backward is below what this optimization tolerates."""
    prev = jax.config.read("jax_default_matmul_precision")
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        _gsm_overfit_body()
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def _gsm_overfit_body():
    from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss, psnr
    from infinicube_tpu.models.gsm.model import GSM, GSMConfig, gsm_apply_jit
    from infinicube_tpu.models.gsm.encoders import UnifiedEncoderConfig
    from infinicube_tpu.models.gsm.voxel_branch import VoxelBranchConfig
    from infinicube_tpu.models.gsm.pixel_branch import PixelBranchConfig
    from infinicube_tpu.models.gsm.sky import SkyConfig
    from infinicube_tpu.training.state import (TrainConfig, TrainState,
                                               make_train_step)

    grid, imgs, fgs, depths, Ks, poses = _gsm_scene()
    V = 4
    masks = np.zeros(imgs.shape[:3] + (4,), np.float32)
    masks[..., 0] = fgs                      # ch0 fg-from-seg (0 = sky)
    masks[..., 1] = 1.0                      # non-dynamic
    masks[..., 2] = 1.0                      # no hood/pad
    batch = {
        "grid": grid,
        "images": jnp.asarray(imgs[:V]),
        "masks": jnp.asarray(masks[:V]),
        "Ks": jnp.asarray(Ks[:V]),
        "cam_to_worlds": jnp.asarray(poses[:V]),
        "depth_prior": jnp.asarray(depths[:V, ..., None]),
    }
    cfg = GSMConfig(
        encoder=UnifiedEncoderConfig(conv_width=32),
        voxel=VoxelBranchConfig(f_maps=32, levels=2, gaussians_per_voxel=2),
        pixel=PixelBranchConfig(width=16, dims=(1, 2, 4), gs_per_pixel=1),
        sky=SkyConfig(embed_dim=64, num_layers=2, num_heads=4),
        dense_dims=(64, 64, 32), dense_ijk_min=(-8, -32, -8),
        render_tile_capacity=192)
    model = GSM(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def loss_fn(p, rng_, b):
        out = model.apply(p, b)
        valid = jnp.ones(b["images"].shape[:3], bool)   # supervise sky too
        return gsm_loss(GSMLossConfig(perceptual_weight=0.0,
                                      ssim_weight=0.05),
                        out["render"], b["images"], valid,
                        out["sky_mask"])

    tcfg = TrainConfig(learning_rate=1e-3, use_ema=False, grad_clip_value=1.0)
    state = TrainState.create(tcfg, params)
    step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
    for i in range(_steps(600)):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(1), i),
                        batch)
        if i % 100 == 0:
            print(f"[gsm-overfit] step {i} loss "
                  f"{float(jax.device_get(m['loss'])):.4f} psnr "
                  f"{float(jax.device_get(m['psnr'])):.2f}", flush=True)

    eval_batch = dict(batch, target_Ks=jnp.asarray(Ks),
                      target_poses=jnp.asarray(poses))
    out = gsm_apply_jit(model, state.params, eval_batch)
    ren = np.asarray(out["render"]["rgb"], np.float32)
    in_view = float(np.mean([float(psnr(jnp.asarray(ren[i]),
                                        jnp.asarray(imgs[i])))
                             for i in range(V)]))
    held_out = float(psnr(jnp.asarray(ren[4]), jnp.asarray(imgs[4])))
    print(f"[gsm-overfit] in-view PSNR {in_view:.2f}, "
          f"held-out PSNR {held_out:.2f}", flush=True)
    _record("gsm_overfit", {"in_view_psnr": in_view,
                            "held_out_psnr": held_out,
                            "final_loss": float(jax.device_get(m["loss"]))})
    assert in_view >= 28.0, in_view
    assert held_out >= 22.0, held_out


# ---------------------------------------------------------------------------
# (b) VAE: free-running structure decode IoU on one scene
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="chip-gated overfit demo")
def test_vae_overfit_struct_iou():
    """Overfit the sparse VAE on one scene until the FREE-RUNNING decode
    (struct heads grow the grid, no teacher forcing) reproduces the GT
    finest grid at IoU >= 0.95 (reference grid-IoU metric,
    base_loss.py:81-100)."""
    from infinicube_tpu.grid.ops import majority_label
    from infinicube_tpu.models.vae import (SparseStructureVAE,
                                           SparseVAEConfig, build_hash_tree)
    from infinicube_tpu.models.vae.loss import VAELossConfig, vae_loss
    from infinicube_tpu.training.state import (TrainConfig, TrainState,
                                               make_train_step)

    cfg = SparseVAEConfig(
        sem_embed_dim=8, c_dim=16, f_maps=16,
        pooling_factors=((2, 2, 1), (2, 2, 2)),
        latent_channels=4, neck_dims=(8, 8, 8), neck_ijk_min=(-4, -4, -4),
        capacities=(4096, 2048, 1024),
        finest_voxel_size=(0.2, 0.2, 0.2), origin=(0.1, 0.1, 0.1))
    rng = np.random.default_rng(0)
    n = 2000
    # structured scene: plane + wall + blob inside the 8^3-neck crop
    plane = np.stack([rng.uniform(-3, 3, n // 2), rng.uniform(-3, 3, n // 2),
                      rng.normal(-0.5, 0.03, n // 2)], -1)
    wall = np.stack([rng.uniform(-3, 3, n // 4), rng.normal(2.0, 0.05, n // 4),
                     rng.uniform(-0.6, 0.6, n // 4)], -1)
    blob = rng.normal(0, 0.3, (n - n // 2 - n // 4, 3)) + [0, -1.0, 0]
    pts = np.concatenate([plane, wall, blob]).astype(np.float32)[None]
    sem_pts = np.concatenate([np.full(n // 2, 18), np.full(n // 4, 14),
                              np.full(n - n // 2 - n // 4, 5)]
                             ).astype(np.int32)[None]
    grids = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((1, n), bool))
    sem = majority_label(grids[0], jnp.asarray(pts), jnp.asarray(sem_pts),
                         jnp.ones((1, n), bool), cfg.num_semantic)
    model = SparseStructureVAE(cfg)
    params = model.init(jax.random.PRNGKey(0), grids, sem,
                        jax.random.PRNGKey(1))

    lcfg = VAELossConfig(kl_weight=1e-6)    # overfit: structure >> prior

    def loss_fn(p, rng_, b):
        out = model.apply(p, grids, sem, rng_)
        loss, metrics = vae_loss(lcfg, out, grids[0], sem)
        return loss, metrics

    tcfg = TrainConfig(learning_rate=1e-3, use_ema=False, grad_clip_value=1.0)
    state = TrainState.create(tcfg, params)
    step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
    for i in range(_steps(800)):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(2), i),
                        None)
        if i % 200 == 0:
            print(f"[vae-overfit] step {i} loss "
                  f"{float(jax.device_get(m['loss'])):.4f}", flush=True)

    def free_decode(p):
        mu, _ = model.apply(p, grids, sem,
                            method=SparseStructureVAE.encode)
        return model.apply(p, mu, method=SparseStructureVAE.decode)

    dec = jax.jit(free_decode)(state.params)
    g = dec["grid"]
    pred = set(np.asarray(g.keys[0])[np.asarray(g.mask[0])].tolist())
    gt = set(np.asarray(grids[0].keys[0])[
        np.asarray(grids[0].mask[0])].tolist())
    iou = len(pred & gt) / max(len(pred | gt), 1)
    # semantics on the true positives
    gt_mask = np.asarray(grids[0].mask[0])
    idx = {k: i for i, k in enumerate(
        np.asarray(grids[0].keys[0])[gt_mask].tolist())}
    pk = np.asarray(g.keys[0])[np.asarray(g.mask[0])]
    ps = np.asarray(jnp.argmax(dec["semantic_logits"][0], -1)
                    )[np.asarray(g.mask[0])]
    gts = np.asarray(sem[0])[gt_mask]
    hits = [(gts[idx[k]] == s) for k, s in zip(pk.tolist(), ps.tolist())
            if k in idx]
    sem_acc = float(np.mean(hits)) if hits else 0.0
    print(f"[vae-overfit] free-decode IoU {iou:.4f}, sem acc {sem_acc:.4f}",
          flush=True)
    _record("vae_overfit", {"struct_iou": iou, "sem_acc": sem_acc,
                            "final_loss": float(jax.device_get(m["loss"]))})
    assert iou >= 0.95, iou
    assert sem_acc >= 0.9, sem_acc


# ---------------------------------------------------------------------------
# (c) diffusion: one-point toy distribution -> DDIM samples reproduce it
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="chip-gated overfit demo")
def test_diffusion_overfit_toy_distribution():
    """Train the dense UNet on a single fixed latent (the degenerate
    distribution) with v-prediction; DDIM-50 samples from ANY seed must
    land on the data point (cosine >= 0.95, relative L2 <= 0.35)."""
    from infinicube_tpu.models.diffusion.model import (CondCubes,
                                                       DiffusionConfig,
                                                       VoxelDiffusion)
    from infinicube_tpu.training.state import (TrainConfig, TrainState,
                                               make_train_step)

    cfg = DiffusionConfig(
        cube_dims=(8, 8, 8), cube_ijk_min=(-4, -4, -4),
        latent_voxel_size=(1.0, 1.0, 1.0), latent_origin=(0.5, 0.5, 0.5),
        latent_channels=2, model_channels=32, channel_mult=(1, 2),
        attention_ds=(), num_res_blocks=1, num_heads=2,
        transformer_depth=1, num_map_types=2, classifier_free_prob=0.0)
    model = VoxelDiffusion(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    # smooth unit-variance target (scale_by_std semantics already applied)
    ii, jj, kk = np.meshgrid(*[np.linspace(0, 2 * np.pi, 8)] * 3,
                             indexing="ij")
    x0 = np.stack([np.sin(ii + 2 * jj), np.cos(kk - ii)], -1)
    x0 = (x0 / x0.std()).astype(np.float32)[None]
    x0 = jnp.asarray(x0)
    cond = CondCubes.null(1, cfg)

    def loss_fn(p, rng_, b):
        return model.train_loss(p, rng_, x0, cond)

    tcfg = TrainConfig(learning_rate=2e-3, use_ema=False, grad_clip_value=1.0)
    state = TrainState.create(tcfg, params)
    step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
    for i in range(_steps(2000)):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(1), i),
                        None)
        if i % 500 == 0:
            print(f"[diff-overfit] step {i} mse "
                  f"{float(jax.device_get(m['mse'])):.5f}", flush=True)

    cos_all, rel_all = [], []
    for seed in range(4):
        s = model.sample(state.params, jax.random.PRNGKey(100 + seed), cond,
                         num_steps=50, guidance_scale=1.0)
        s = np.asarray(s, np.float32).ravel()
        t = np.asarray(x0, np.float32).ravel()
        cos_all.append(float(np.dot(s, t) /
                             (np.linalg.norm(s) * np.linalg.norm(t))))
        rel_all.append(float(np.linalg.norm(s - t) / np.linalg.norm(t)))
    cos_min, rel_max = min(cos_all), max(rel_all)
    print(f"[diff-overfit] cosine min {cos_min:.4f}, rel L2 max "
          f"{rel_max:.4f}", flush=True)
    _record("diffusion_overfit", {
        "cosine_min": cos_min, "rel_l2_max": rel_max,
        "final_mse": float(jax.device_get(m["mse"]))})
    assert cos_min >= 0.95, cos_all
    assert rel_max <= 0.35, rel_all


# ---------------------------------------------------------------------------
# committed-evidence gate (runs in the default CPU suite)
# ---------------------------------------------------------------------------

def test_overfit_metrics_committed():
    """The committed overfit metrics must exist and clear the VERDICT bars —
    the CPU suite enforces the chip-run evidence without re-training."""
    assert METRICS.exists(), "run the -m slow overfit demos on the chip"
    m = json.loads(METRICS.read_text())
    assert m["gsm_overfit"]["in_view_psnr"] >= 28.0
    assert m["gsm_overfit"]["held_out_psnr"] >= 22.0
    assert m["vae_overfit"]["struct_iou"] >= 0.95
    assert m["vae_overfit"]["sem_acc"] >= 0.9
    assert m["diffusion_overfit"]["cosine_min"] >= 0.95
