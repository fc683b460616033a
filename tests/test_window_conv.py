"""Window-GEMM sparse conv (ops/window_conv.py) vs the gather-GEMM path.

Runs in Pallas interpret mode on the CPU backend; numerics must match the
27-tap gather conv exactly (f32) on active voxels, including fallback pairs
and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.sparse import SparseConv3d
from infinicube_tpu.ops.window_conv import (
    build_window_plan, window_sparse_conv)
from tests.test_brick_conv import surface_points


@pytest.fixture(scope="module")
def setup():
    pts = surface_points(6000)
    g = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, len(pts)), bool),
                         0.25, 0.0, capacity=4096)
    nbr = neighbor_indexes(g, 3)
    plan = build_window_plan(g, block_rows=128, window_rows=256)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 4096, 16))
    feats = jnp.where(g.mask[..., None], feats, 0.0)
    w = jax.random.normal(jax.random.PRNGKey(2), (27, 16, 24)) * 0.1
    return g, nbr, plan, feats, w


def _gather_ref(feats, nbr, w):
    out = 0
    for t in range(27):
        idx = nbr[:, :, t]
        got = jax.vmap(lambda f, i: f[jnp.clip(i, 0)])(feats, idx)
        got = jnp.where((idx >= 0)[..., None], got, 0.0)
        out = out + jnp.einsum("bcf,fo->bco", got, w[t])
    return out


def test_forward_matches_gather(setup):
    g, nbr, plan, feats, w = setup
    ref = _gather_ref(feats, nbr, w)
    out = window_sparse_conv(plan, feats, w)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(out[0])[m],
                               jax.device_get(ref[0])[m], atol=1e-4)


def test_misses_handled_exactly(setup):
    """A tiny window forces many fallback pairs; result must stay exact."""
    g, nbr, plan, feats, w = setup
    small = build_window_plan(g, block_rows=128, window_rows=128,
                              miss_capacity=1 << 16)
    assert int(jax.device_get(small.num_missed)[0]) > 0
    assert not bool(jax.device_get(small.overflowed)[0])
    ref = _gather_ref(feats, nbr, w)
    out = window_sparse_conv(small, feats, w)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(out[0])[m],
                               jax.device_get(ref[0])[m], atol=1e-4)


def test_overflow_surfaced(setup):
    g, nbr, plan, feats, w = setup
    tiny = build_window_plan(g, block_rows=128, window_rows=128,
                             miss_capacity=128)
    if int(jax.device_get(tiny.num_missed)[0]) > 128:
        assert bool(jax.device_get(tiny.overflowed)[0])


def test_overflow_poisons_output(setup):
    """An overflowed plan must fail LOUDLY: outputs NaN-poisoned, never a
    silently inexact conv (ADVICE round 2, window_conv.py miss_capacity)."""
    import dataclasses
    g, nbr, plan, feats, w = setup
    assert not bool(jax.device_get(plan.overflowed)[0])
    clean = window_sparse_conv(plan, feats, w)
    assert not bool(jnp.isnan(clean).any())
    cap = plan.miss_out.shape[1]
    forced = dataclasses.replace(
        plan, num_missed=jnp.full_like(plan.num_missed, cap + 1))
    poisoned = window_sparse_conv(forced, feats, w)
    assert bool(jnp.isnan(poisoned).all())


def test_default_miss_capacity_scales_with_grid(setup):
    """conv_plan's window default sizes the fallback list from grid capacity
    (max(4096, C//8)) instead of a fixed 4096."""
    g, nbr, plan, feats, w = setup
    auto = build_window_plan(g)
    assert auto.miss_out.shape[1] == max(4096, g.mask.shape[1] // 8)


def test_gradients_match_gather(setup):
    g, nbr, plan, feats, w = setup
    cot = jax.random.normal(jax.random.PRNGKey(3), (1, 4096, 24))
    cot = jnp.where(g.mask[..., None], cot, 0.0)

    def loss_win(f, w):
        return jnp.sum(window_sparse_conv(plan, f, w) * cot)

    def loss_ref(f, w):
        return jnp.sum(_gather_ref(f, nbr, w) * cot)

    gw = jax.grad(loss_win, argnums=(0, 1))(feats, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(gw[0][0])[m],
                               jax.device_get(gr[0][0])[m], atol=1e-3)
    np.testing.assert_allclose(jax.device_get(gw[1]), jax.device_get(gr[1]),
                               rtol=2e-3, atol=1e-3)


def test_sparse_conv_module_dispatch(setup):
    """SparseConv3d accepts a WindowPlan as its plan argument."""
    g, nbr, plan, feats, w = setup
    conv = SparseConv3d(24)
    params = conv.init(jax.random.PRNGKey(4), feats, nbr)
    ref = conv.apply(params, feats, nbr)
    out = conv.apply(params, feats, plan)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(out[0])[m],
                               jax.device_get(ref[0])[m], atol=1e-4)


def test_conv_plan_dispatch(setup):
    """conv_plan returns the right plan type per backend and 'auto' follows
    the platform (gather on CPU)."""
    import jax
    from infinicube_tpu.nn.brick import BrickPlan
    from infinicube_tpu.nn.sparse import conv_plan
    from infinicube_tpu.ops.window_conv import WindowPlan
    g, nbr, plan, feats, w = setup
    assert isinstance(conv_plan(g, "window"), WindowPlan)
    assert isinstance(conv_plan(g, "brick"), BrickPlan)
    import jax.numpy as jnp
    assert isinstance(conv_plan(g, "gather"), jnp.ndarray)
    auto = conv_plan(g, "auto")
    if jax.devices()[0].platform == "tpu":
        assert isinstance(auto, WindowPlan)
    else:
        assert isinstance(auto, jnp.ndarray)


def test_dense_bounds_lookup_matches_searchsorted(setup):
    """dense_bounds plan build (scatter+gather slot volume) must reproduce
    the searchsorted neighbor table and the resulting plan exactly; bounds
    violations must trip plan.overflowed (NaN-poison policy)."""
    from infinicube_tpu.grid.ops import dense_bounds_violations
    g, nbr, plan, feats, w = setup
    db = ((-40, -40, -40), (80, 80, 80))
    assert int(jax.device_get(dense_bounds_violations(g, *db)).max()) == 0
    dn = neighbor_indexes(g, 3, dense_bounds=db)
    np.testing.assert_array_equal(jax.device_get(dn), jax.device_get(nbr))
    p2 = build_window_plan(g, block_rows=128, window_rows=256,
                           dense_bounds=db)
    for f in ("starts", "pos", "miss_out", "miss_in", "miss_tap",
              "num_missed"):
        np.testing.assert_array_equal(jax.device_get(getattr(p2, f)),
                                      jax.device_get(getattr(plan, f)))
    # a cube that excludes active voxels must fail LOUDLY, never silently
    viol = build_window_plan(g, block_rows=128, window_rows=256,
                             dense_bounds=((-2, -2, -2), (4, 4, 4)))
    assert bool(jax.device_get(viol.overflowed).all())


def test_vae_config_level_dense_bounds():
    """Per-level bounds follow the floor-div coarsening: every voxel
    coarsened from an in-bounds fine voxel stays in bounds."""
    from infinicube_tpu.models.vae import SparseVAEConfig
    cfg = SparseVAEConfig()
    mn0, dm0 = cfg.level_dense_bounds(0)
    assert mn0 == cfg.dense_lookup_ijk_min and dm0 == cfg.dense_lookup_dims
    for lvl in (1, 2):
        mn, dm = cfg.level_dense_bounds(lvl)
        f = np.prod([np.asarray(x) for x in cfg.pooling_factors[:lvl]],
                    axis=0)
        lo = np.floor_divide(np.asarray(mn0), f)
        hi = np.floor_divide(np.asarray(mn0) + np.asarray(dm0) - 1, f)
        assert tuple(lo) == mn
        assert tuple(hi - lo + 1) == dm
    assert SparseVAEConfig(dense_lookup=False).level_dense_bounds(0) is None
