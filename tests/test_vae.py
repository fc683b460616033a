import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.models.vae import (
    SparseVAEConfig, SparseStructureVAE, build_hash_tree)
from infinicube_tpu.models.vae.loss import VAELossConfig, vae_loss
from infinicube_tpu.grid.ops import index_map


def tiny_cfg():
    return SparseVAEConfig(
        sem_embed_dim=8, c_dim=8, f_maps=8,
        pooling_factors=((2, 2, 1), (2, 2, 2)),
        latent_channels=2, neck_dims=(4, 4, 4), neck_ijk_min=(-2, -2, -2),
        capacities=(512, 256, 128),
        finest_voxel_size=(0.2, 0.2, 0.2), origin=(0.1, 0.1, 0.1))


def make_inputs(cfg, b=2, n=200, seed=0):
    rng = np.random.default_rng(seed)
    # points inside the crop covered by the 4^3 neck at latent vs (.8,.8,.4):
    # world x,y in [-1.6,1.6), z in [-0.8, 0.8)
    pts = np.stack([rng.uniform(-1.5, 1.5, (b, n)), rng.uniform(-1.5, 1.5, (b, n)),
                    rng.uniform(-0.7, 0.7, (b, n))], -1).astype(np.float32)
    sem_pts = rng.integers(0, 23, (b, n)).astype(np.int32)
    grids = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((b, n), bool))
    # per-voxel semantics on finest grid
    from infinicube_tpu.grid.ops import majority_label
    sem = majority_label(grids[0], jnp.asarray(pts), jnp.asarray(sem_pts),
                         jnp.ones((b, n), bool), 23)
    return grids, sem


def test_hash_tree_levels_align():
    cfg = tiny_cfg()
    grids, _ = make_inputs(cfg)
    assert len(grids) == 3
    # every finest voxel has an ancestor at each level
    f01 = jnp.asarray(cfg.pooling_factors[0])
    parent_ijk = jnp.floor_divide(grids[0].ijk, f01)
    pidx = grids[1].ijk_to_index(parent_ijk, grids[0].mask)
    assert bool(jnp.all(pidx[grids[0].mask] >= 0))
    # voxel sizes compose
    np.testing.assert_allclose(np.asarray(grids[2].voxel_size), [0.8, 0.8, 0.4],
                               atol=1e-6)


def test_vae_forward_guided_and_loss():
    cfg = tiny_cfg()
    grids, sem = make_inputs(cfg)
    model = SparseStructureVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, grids, sem, rng)
    out = model.apply(params, grids, sem, rng)
    assert out["mu"].shape == (2, 4, 4, 4, cfg.latent_channels)
    # guided decode returns struct logits for every level transition
    assert len(out["struct"]) == cfg.tree_depth
    # decoded grid equals GT finest grid (teacher forcing)
    gt_n = int(grids[0].total_voxels)
    dec_n = int(out["grid"].total_voxels)
    assert dec_n == gt_n
    loss, metrics = vae_loss(VAELossConfig(), out, grids[0], sem)
    assert np.isfinite(float(loss))
    assert 0 <= float(metrics["sem_acc"]) <= 1


def test_vae_grads_flow():
    cfg = tiny_cfg()
    grids, sem = make_inputs(cfg, b=1, n=80)
    model = SparseStructureVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, grids, sem, rng)

    def loss_fn(p):
        out = model.apply(p, grids, sem, rng)
        l, _ = vae_loss(VAELossConfig(), out, grids[0], sem)
        return l

    g = jax.grad(loss_fn)(params)
    total = jax.tree.reduce(lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0)
    assert np.isfinite(total) and total > 0


def test_vae_unguided_decode_shapes():
    cfg = tiny_cfg()
    grids, sem = make_inputs(cfg, b=1, n=80)
    model = SparseStructureVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, grids, sem, rng)
    z = jax.random.normal(rng, (1, 4, 4, 4, cfg.latent_channels))
    dec = model.apply(params, z, None, method=SparseStructureVAE.decode)
    assert dec["grid"].capacity == cfg.capacities[0]
    assert dec["semantic_logits"].shape[-1] == 23
    # structure is data-dependent but the program must be shape-static
    assert dec["grid"].ijk.shape == (1, cfg.capacities[0], 3)


def test_encode_is_permutation_invariant_to_point_order():
    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    pts = np.stack([rng.uniform(-1.5, 1.5, (1, 60)),
                    rng.uniform(-1.5, 1.5, (1, 60)),
                    rng.uniform(-0.7, 0.7, (1, 60))], -1).astype(np.float32)
    perm = rng.permutation(60)
    grids_a = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((1, 60), bool))
    grids_b = build_hash_tree(cfg, jnp.asarray(pts[:, perm]),
                              jnp.ones((1, 60), bool))
    # same voxel sets in the same sorted order
    np.testing.assert_array_equal(np.asarray(grids_a[0].keys),
                                  np.asarray(grids_b[0].keys))


def test_vae_attention_color_and_cutoff():
    """Round-2 parity depth: per-batch attention levels, color head, and the
    unstable-cutoff guard (reference sunet.py:210-266, 516-527, 636-654)."""
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg(), attention_levels=(2,),
                              use_color_head=True, attn_heads=2)
    grids, sem = make_inputs(cfg)
    model = SparseStructureVAE(cfg)
    params = model.init(jax.random.PRNGKey(0), grids, sem,
                        jax.random.PRNGKey(1))
    names = params["params"].keys()
    assert "attn2_enc_qkv" in names and "attn2_dec_proj" in names
    out = model.apply(params, grids, sem, jax.random.PRNGKey(2))
    assert out["colors"].shape == (2, cfg.capacities[0], 3)
    assert float(out["colors"].min()) >= 0 and float(out["colors"].max()) <= 1

    # inference decode with a runaway struct head: force logits to predict
    # occupancy everywhere -> the cutoff zeroes the decision (empty grid
    # instead of a capacity-corrupting explosion)
    z = jnp.zeros((2,) + cfg.neck_dims + (cfg.latent_channels,))
    pruned = jax.tree_util.tree_map(lambda x: x, params)
    tree = pruned["params"]
    for k in tree:
        if k.startswith("struct"):
            tree[k]["kernel"] = jnp.zeros_like(tree[k]["kernel"])
            # always "occupied" in every (child-slot, 2-class) pair — the
            # subpixel heads carry 2*prod(factor) logits (round 5)
            nb = tree[k]["bias"].shape[0]
            tree[k]["bias"] = jnp.tile(jnp.asarray([0.0, 10.0]), nb // 2)
    dec = model.apply(pruned, z, method=model.decode)
    assert int(jax.device_get(dec["grid"].num_voxels.sum())) == 0

    cfg_off = dataclasses.replace(cfg, unstable_cutoff=False)
    dec2 = SparseStructureVAE(cfg_off).apply(pruned, z,
                                             method=model.decode)
    assert int(jax.device_get(dec2["grid"].num_voxels.sum())) > 0


def test_default_neck_covers_symmetric_crop():
    """The data crop recenters on the crop-box center (reference
    crop_pcd_and_generate_grid_raw:439-442), so ground points sit BELOW
    z=0 in crop coords; the release neck must be symmetric
    (neck_bound [32,32,32] -> low [-32,-32,-32] in the reference release
    config) or those voxels silently vanish in to_dense."""
    import numpy as np
    from infinicube_tpu.models.vae import SparseVAEConfig, build_hash_tree
    from infinicube_tpu.grid.ops import to_dense
    cfg = SparseVAEConfig()
    assert cfg.neck_ijk_min == (-32, -32, -32)
    # points across the FULL symmetric crop incl. ground below center
    pts = np.array([[0.0, 0.0, -12.0], [20.0, -20.0, -6.5],
                    [-25.0, 25.0, 12.0], [0.0, 0.0, 0.0]], np.float32)[None]
    grids = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((1, 4), bool))
    g2 = grids[-1]
    n_active = int(jax.device_get(g2.mask.sum()))
    dense = to_dense(g2, g2.mask[..., None].astype(jnp.float32),
                     cfg.neck_ijk_min, cfg.neck_dims)
    assert int(jax.device_get((dense > 0).sum())) == n_active
    # and the dense-lookup cube covers every level's voxels
    from infinicube_tpu.grid.ops import dense_bounds_violations
    for lvl, g in enumerate(grids):
        mn, dm = cfg.level_dense_bounds(lvl)
        assert int(jax.device_get(
            dense_bounds_violations(g, mn, dm)).max()) == 0


def test_subpixel_struct_heads_learn_child_occupancy():
    """Round-5 regression: the struct heads below the neck are SUBPIXEL
    heads (2*prod(factor) logits predicted from the PARENT features) —
    scoring nearest-upsampled child copies cannot beat the base rate
    (measured plateau at CE ~0.57 on a single-scene overfit, free-decode
    IoU 0.17). A short overfit must push the candidate-level CEs well
    below that plateau."""
    from infinicube_tpu.models.vae.loss import VAELossConfig, vae_loss
    from infinicube_tpu.training.state import (TrainConfig, TrainState,
                                               make_train_step)

    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    n = 600
    # structured scene (plane + wall) so child occupancy is learnable
    plane = np.stack([rng.uniform(-1.4, 1.4, n // 2),
                      rng.uniform(-1.4, 1.4, n // 2),
                      rng.normal(-0.3, 0.02, n // 2)], -1)
    wall = np.stack([rng.uniform(-1.4, 1.4, n - n // 2),
                     rng.normal(0.8, 0.03, n - n // 2),
                     rng.uniform(-0.5, 0.5, n - n // 2)], -1)
    pts = np.concatenate([plane, wall]).astype(np.float32)[None]
    sem_pts = np.concatenate([np.full(n // 2, 18),
                              np.full(n - n // 2, 14)]).astype(np.int32)[None]
    grids = build_hash_tree(cfg, jnp.asarray(pts), jnp.ones((1, n), bool))
    from infinicube_tpu.grid.ops import majority_label
    sem = majority_label(grids[0], jnp.asarray(pts), jnp.asarray(sem_pts),
                         jnp.ones((1, n), bool), cfg.num_semantic)
    model = SparseStructureVAE(cfg)
    params = model.init(jax.random.PRNGKey(0), grids, sem,
                        jax.random.PRNGKey(1))
    lcfg = VAELossConfig(kl_weight=1e-6)

    def loss_fn(p, rng_, b):
        out = model.apply(p, grids, sem, rng_)
        return vae_loss(lcfg, out, grids[0], sem)

    tcfg = TrainConfig(learning_rate=2e-3, use_ema=False,
                       grad_clip_value=1.0)
    state = TrainState.create(tcfg, params)
    step = jax.jit(make_train_step(tcfg, loss_fn), donate_argnums=0)
    for i in range(120):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(2), i),
                        None)
    ce1 = float(jax.device_get(m["struct1_ce"]))
    ce2 = float(jax.device_get(m["struct2_ce"]))
    assert ce1 < 0.35, ce1   # pre-fix plateau: ~0.57 (base rate)
    assert ce2 < 0.45, ce2
    assert int(jax.device_get(state.num_nan_skips)) == 0
