"""Training CLI driver.

Mirror of the reference's train.py
(/root/reference/infinicube/voxelgen/train.py:162-519): YAML config with
include/interpolation + ``--k.e.y v`` / ``--exec`` overrides
(ConfigArgumentParser), model selection by ``model:`` key, logger selection,
checkpoint auto-resume. The PL/DDP machinery collapses into one jitted SPMD
step over the global mesh (data-parallel by sharding; no process forking —
multi-host runs call ``jax.distributed.initialize`` once).

Usage:
  python -m infinicube_tpu.train configs/train_diffusion.yaml \
      --name myrun --exec max_steps=10000
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.config import Config, ConfigArgumentParser
from infinicube_tpu.parallel.mesh import MeshConfig, make_mesh
from infinicube_tpu.training.logging import make_logger
from infinicube_tpu.training.loop import LoopConfig, train
from infinicube_tpu.training.state import TrainConfig


def _real_dataset(cfg: Config):
    """WaymoClipDataset when a data root with shards is configured."""
    from pathlib import Path
    root = cfg.get_path("data.root")
    if not root or not Path(root).exists():
        return None
    from infinicube_tpu.data.waymo_dataset import (
        WaymoDatasetConfig, build_dataset)
    dcfg = WaymoDatasetConfig(root=root, **{
        k: v for k, v in cfg.get_path("data", Config()).items()
        if k != "root" and k in WaymoDatasetConfig.__dataclass_fields__})

    class Looping:
        def __iter__(self):
            while True:
                yield from build_dataset(dcfg)

    return Looping()


def build_diffusion(cfg: Config):
    from infinicube_tpu.models.diffusion.model import (
        CondCubes, DiffusionConfig, VoxelDiffusion)
    dc = DiffusionConfig(**cfg.get_path("diffusion", {}))
    model = VoxelDiffusion(dc)
    params = model.init(jax.random.PRNGKey(cfg.get_path("seed", 0)))

    def loss_fn(p, rng, batch):
        latents, cond = batch
        return model.train_loss(p, rng, latents, cond)

    ds = _real_dataset(cfg)
    if ds is not None:
        # frozen VAE for latent extraction (reference load_first_stage)
        from infinicube_tpu.models.vae.sunet import (
            SparseStructureVAE, SparseVAEConfig)
        from infinicube_tpu.training.checkpoint import CheckpointManager
        from infinicube_tpu.training.data_glue import diffusion_batches
        vcfg = SparseVAEConfig(**cfg.get_path("vae", {}))
        vae = SparseStructureVAE(vcfg)
        ckpt = cfg.get_path("vae_checkpoint")
        if not ckpt:
            raise SystemExit("diffusion training on real data requires "
                             "vae_checkpoint")
        # shape-init the VAE then load the frozen checkpoint into it
        from infinicube_tpu.models.vae.sunet import build_hash_tree
        from infinicube_tpu.grid.ops import majority_label
        pts0 = jnp.zeros((1, 64, 3))
        mask0 = jnp.ones((1, 64), bool)
        grids0 = build_hash_tree(vcfg, pts0, mask0)
        sem0 = majority_label(grids0[0], pts0, jnp.zeros((1, 64), jnp.int32),
                              mask0, vcfg.num_semantic)
        vae_params = vae.init(jax.random.PRNGKey(0), grids0, sem0,
                              jax.random.PRNGKey(1))
        mgr = CheckpointManager(ckpt)
        if mgr.latest_step() is not None:
            vae_params = mgr.restore(vae_params)
        from infinicube_tpu.training.data_glue import scale_by_std
        sf_path = (cfg.get_path("ckpt_dir",
                                f"checkpoints/{cfg.get_path('name', 'run')}")
                   + "/scale_factor.json")
        return params, loss_fn, scale_by_std(
            diffusion_batches(ds, model, vae, vae_params, vcfg,
                              batch_size=cfg.get_path("batch_size", 2)),
            save_path=sf_path)

    def synthetic_batches():
        # synthetic latents stream for smoke training without data
        rng = np.random.default_rng(0)
        B = cfg.get_path("batch_size", 2)
        D, H, W = dc.cube_dims
        while True:
            lat = jnp.asarray(rng.normal(size=(B, D, H, W,
                                               dc.latent_channels)),
                              jnp.float32)
            yield lat, CondCubes.null(B, dc)

    return params, loss_fn, synthetic_batches()


def build_vae(cfg: Config):
    from infinicube_tpu.models.vae import (
        SparseStructureVAE, SparseVAEConfig, build_hash_tree)
    from infinicube_tpu.models.vae.loss import VAELossConfig, vae_loss
    from infinicube_tpu.grid.ops import majority_label
    vc = SparseVAEConfig(**cfg.get_path("vae", {}))
    model = SparseStructureVAE(vc)
    lcfg = VAELossConfig(**cfg.get_path("vae_loss", {}))

    rng0 = np.random.default_rng(0)
    B, N = cfg.get_path("batch_size", 1), cfg.get_path("points_per_sample", 2048)

    def make_batch():
        pts = jnp.asarray(rng0.uniform(-5, 5, (B, N, 3)), jnp.float32)
        mask = jnp.ones((B, N), bool)
        grids = build_hash_tree(vc, pts, mask)
        sem = majority_label(grids[0], pts,
                             jnp.asarray(rng0.integers(0, vc.num_semantic,
                                                       (B, N)), jnp.int32),
                             mask, vc.num_semantic)
        return grids, sem

    grids0, sem0 = make_batch()
    params = model.init(jax.random.PRNGKey(0), grids0, sem0,
                        jax.random.PRNGKey(1))

    def loss_fn(p, rng, batch):
        grids, sem = batch
        out = model.apply(p, grids, sem, rng)
        return vae_loss(lcfg, out, grids[0], sem)

    ds = _real_dataset(cfg)
    if ds is not None:
        # real Waymo clips (reference train.py VAE stage: hash-tree grids +
        # voxel-majority semantics from the accumulated clip point cloud)
        from infinicube_tpu.training.data_glue import vae_batches
        return params, loss_fn, vae_batches(
            ds, vc, batch_size=B,
            point_capacity=cfg.get_path("point_capacity", 65536))

    def batches():
        while True:
            yield make_batch()

    return params, loss_fn, batches()


def build_gsm(cfg: Config):
    from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss
    from infinicube_tpu.models.gsm.model import GSM, GSMConfig
    from infinicube_tpu.grid.build import grid_from_points
    import dataclasses as _dc
    # training runs on per-sample crops (the same recentered +-(25.6, 25.6,
    # 12.8) m cube as the VAE at vs 0.2), so the conv plans can use the
    # dense slot-volume lookup; world-scale inference leaves bounds None
    gc = GSMConfig()
    gc = _dc.replace(gc, voxel=_dc.replace(
        gc.voxel, dense_lookup_bounds=((-132, -132, -68), (264, 264, 136))))
    model = GSM(gc)
    lcfg = GSMLossConfig(**cfg.get_path("gsm_loss", {}))
    rng0 = np.random.default_rng(0)

    def make_batch():
        pts = jnp.asarray(rng0.uniform(0, 20, (1, 2000, 3)), jnp.float32)
        grid = grid_from_points(pts, jnp.ones((1, 2000), bool), 0.5, 0.25,
                                capacity=4096)
        V, h, w = 2, 64, 96
        T = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
        T[:, :3, 0] = [0, -1, 0]
        T[:, :3, 1] = [0, 0, -1]
        T[:, :3, 2] = [1, 0, 0]
        T[:, :3, 3] = [0, 0, 2]
        K = np.array([[80.0, 0, w / 2], [0, 80, h / 2], [0, 0, 1]],
                     np.float32)
        return {
            "grid": grid,
            "images": jnp.asarray(rng0.uniform(size=(V, h, w, 3)),
                                  jnp.float32),
            "masks": jnp.ones((V, h, w, 4), jnp.float32),
            "Ks": jnp.asarray(np.stack([K, K])),
            "cam_to_worlds": jnp.asarray(T),
            "depth_prior": jnp.zeros((V, h, w, 1)),
        }

    batch0 = make_batch()
    params = model.init(jax.random.PRNGKey(0), batch0)

    # real LPIPS-VGG16 perceptual term (the reference trains with it,
    # unified_loss.py:39-43). ``lpips_checkpoint`` points at the converted
    # lpips-library state dict (.npz via convert_lpips, see
    # models/gsm/lpips.py); the literal "random" initializes
    # checkpoint-shaped random weights (plumbing tests / timing — the
    # release LPIPS weights are a download this image cannot ship).
    lpips_params = None
    lp_ckpt = cfg.get_path("lpips_checkpoint", None)
    if lp_ckpt:
        from infinicube_tpu.models.gsm.lpips import LPIPS, convert_lpips
        if lp_ckpt == "random":
            lpips_params = jax.jit(LPIPS().init)(
                jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3)),
                jnp.zeros((1, 32, 32, 3)))
        else:
            sd = dict(np.load(lp_ckpt))
            lpips_params = convert_lpips(sd)

    def loss_fn(p, rng, batch):
        out = model.apply(p, batch)
        valid = batch["masks"][..., 0] * batch["masks"][..., 2] > 0
        return gsm_loss(lcfg, out["render"], batch["images"], valid,
                        out["sky_mask"], gaussians=out["gaussians"],
                        lpips_params=lpips_params, rng=rng)

    ds = _real_dataset(cfg)
    if ds is not None:
        # real Waymo clips (reference GSM stage: per-scene batch with
        # multi-view images, 4-ch masks, voxel depth prior)
        from infinicube_tpu.training.data_glue import gsm_batches
        return params, loss_fn, gsm_batches(
            ds, gc, voxel_capacity=cfg.get_path("voxel_capacity", 65536))

    def batches():
        while True:
            yield make_batch()

    return params, loss_fn, batches()


BUILDERS = {"diffusion": build_diffusion, "vae": build_vae, "gsm": build_gsm}


def main(argv=None):
    parser = ConfigArgumentParser()
    parser.add_argument("--name", type=str, default="run")
    parser.add_argument("--logger", type=str, default="jsonl")
    parser.add_argument("--logdir", type=str, default="logs")
    cfg = parser.parse_config(argv)
    model_kind = cfg.get_path("model", "diffusion")
    if model_kind not in BUILDERS:
        raise SystemExit(f"unknown model '{model_kind}'")
    params, loss_fn, batches = BUILDERS[model_kind](cfg)
    mesh = make_mesh(MeshConfig(model=cfg.get_path("mesh.model", 1),
                                seq=cfg.get_path("mesh.seq", 1)))
    loop_cfg = LoopConfig(
        max_steps=cfg.get_path("max_steps", 1000),
        log_every=cfg.get_path("log_every", 50),
        ckpt_every=cfg.get_path("ckpt_every", 50),
        ckpt_dir=cfg.get_path("ckpt_dir", f"checkpoints/{cfg.get_path('name')}"))
    train_cfg = TrainConfig(
        learning_rate=cfg.get_path("learning_rate.init", 5e-5),
        grad_clip_value=cfg.get_path("grad_clip", 0.5),
        weight_decay=cfg.get_path("weight_decay", 0.0),
        ema_decay=cfg.get_path("ema_decay", 0.9999),
        use_ema=cfg.get_path("ema", True))
    logger = make_logger(cfg.get_path("logger", "jsonl"),
                         cfg.get_path("logdir", "logs"),
                         cfg.get_path("name", "run"))
    state = train(loop_cfg, train_cfg, params, loss_fn, batches,
                  jax.random.PRNGKey(cfg.get_path("seed", 0)), logger=logger,
                  mesh=mesh)
    print(f"[train] finished at step {int(state.step)} "
          f"({int(state.num_nan_skips)} NaN-skipped steps)")


if __name__ == "__main__":
    main(sys.argv[1:])
