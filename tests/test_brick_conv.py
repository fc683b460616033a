"""Brick-dense sparse conv (nn/brick.py) vs the gather-GEMM reference path.

The two backends share parameters; on active voxels they must agree exactly
(same contraction, different data movement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.grid.ops import neighbor_indexes
from infinicube_tpu.nn.brick import (
    BrickPlan, brick_sparse_conv, build_brick_plan, from_bricks, to_bricks)
from infinicube_tpu.nn.sparse import SparseConv3d, SparseResBlock


def surface_points(n=4000, seed=0):
    """Ground plane + wall + scattered blobs (brick-occupancy realistic)."""
    rng = np.random.default_rng(seed)
    ground = np.stack([rng.uniform(-6, 6, n // 2), rng.uniform(-6, 6, n // 2),
                       rng.normal(0, 0.05, n // 2)], -1)
    wall = np.stack([rng.normal(3, 0.05, n // 4), rng.uniform(-6, 6, n // 4),
                     rng.uniform(0, 3, n // 4)], -1)
    blobs = rng.normal(0, 1.0, (n - n // 2 - n // 4, 3)) + [-2, 2, 1]
    return np.concatenate([ground, wall, blobs], 0).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    pts = surface_points()
    g = grid_from_points(jnp.asarray(pts)[None], jnp.ones((1, len(pts)), bool),
                         0.25, 0.0, capacity=4096)
    nbr = neighbor_indexes(g, 3)
    plan = build_brick_plan(g, (4, 4, 4), brick_capacity=1024)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 4096, 16))
    feats = jnp.where(g.mask[..., None], feats, 0.0)
    return g, nbr, plan, feats


def test_plan_no_overflow(setup):
    g, nbr, plan, feats = setup
    assert int(jax.device_get(plan.num_dropped)[0]) == 0
    # every active voxel maps to a unique dense slot and back
    vd = jax.device_get(plan.voxel_dst[0])
    act = jax.device_get(g.mask[0])
    slots = vd[act]
    assert (slots >= 0).all() and len(np.unique(slots)) == len(slots)


def test_roundtrip(setup):
    g, nbr, plan, feats = setup
    back = from_bricks(plan, to_bricks(plan, feats))
    np.testing.assert_allclose(jax.device_get(back), jax.device_get(feats))


@pytest.mark.parametrize("impl", ["taps", "xla"])
def test_conv_matches_gather(setup, impl):
    g, nbr, plan, feats = setup
    conv = SparseConv3d(24, brick_impl=impl)
    params = conv.init(jax.random.PRNGKey(2), feats, nbr)
    ref = conv.apply(params, feats, nbr)
    out = conv.apply(params, feats, plan)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(out[0])[m],
                               jax.device_get(ref[0])[m], atol=2e-5)


def test_resblock_matches_gather(setup):
    g, nbr, plan, feats = setup
    blk = SparseResBlock(32)
    params = blk.init(jax.random.PRNGKey(3), feats, nbr, g.mask)
    ref = blk.apply(params, feats, nbr, g.mask)
    out = blk.apply(params, feats, plan, g.mask)
    m = jax.device_get(g.mask[0])
    np.testing.assert_allclose(jax.device_get(out[0])[m],
                               jax.device_get(ref[0])[m], atol=1e-4)


def test_overflow_surfaced(setup):
    g, nbr, plan, feats = setup
    small = build_brick_plan(g, (4, 4, 4), brick_capacity=32)
    assert int(jax.device_get(small.num_dropped)[0]) > 0
    out = brick_sparse_conv(small, feats,
                            jnp.ones((27, 16, 8), jnp.float32))
    # dropped voxels produce zeros, not garbage
    vd = jax.device_get(small.voxel_dst[0])
    act = jax.device_get(g.mask[0])
    dropped = act & (vd < 0)
    assert dropped.any()
    np.testing.assert_array_equal(jax.device_get(out[0])[dropped], 0.0)


def test_grad_flows(setup):
    g, nbr, plan, feats = setup
    conv = SparseConv3d(8)
    params = conv.init(jax.random.PRNGKey(4), feats, nbr)

    def loss(p, f):
        return jnp.sum(conv.apply(p, f, plan) ** 2)

    gr = jax.grad(loss)(params, feats)
    assert np.isfinite(
        jax.device_get(gr["params"]["kernel"])).all()
