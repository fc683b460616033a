"""Pallas implicit-GEMM 3x3x3 conv (ops/dense_conv.py) vs the XLA conv
oracle — forward, backward, module param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.ops.dense_conv import (
    Conv3x3x3, conv3x3x3, conv_plan_feasible, _xla_conv)


def _rand(shape, scale=1.0, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


SHAPES = [
    (1, 4, 16, 16, 64, 64),    # square plane
    (2, 4, 16, 8, 64, 128),    # batched, wide O (O-chunking exercised)
    (1, 3, 32, 8, 128, 64),    # C > O (decoder concat shape, scaled)
]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(shape):
    B, D, H, W, C, O = shape
    x = _rand((B, D, H, W, C))
    w = _rand((3, 3, 3, C, O), 0.05, seed=1)
    b = _rand((O,), seed=2)
    plan = conv_plan_feasible((B, D, H, W), C, O, x.dtype)
    assert plan is not None, "shape should engage the kernel"
    ref = _xla_conv(x, w, b)
    got = conv3x3x3(x, w, b, plan, True)  # interpret mode off-TPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_gradients_match_xla():
    B, D, H, W, C, O = 1, 4, 16, 16, 64, 64
    x = _rand((B, D, H, W, C))
    w = _rand((3, 3, 3, C, O), 0.05, seed=1)
    b = _rand((O,), seed=2)
    tgt = _rand((B, D, H, W, O), seed=3)
    plan = conv_plan_feasible((B, D, H, W), C, O, x.dtype)

    def loss(f):
        return lambda x, w, b: jnp.sum((f(x, w, b) - tgt) ** 2)

    gr = jax.grad(loss(_xla_conv), (0, 1, 2))(x, w, b)
    gg = jax.grad(loss(lambda x, w, b: conv3x3x3(x, w, b, plan, True)),
                  (0, 1, 2))(x, w, b)
    for a, c in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   atol=2e-3 * float(jnp.abs(a).max()),
                                   rtol=1e-3)


def test_infeasible_shapes_fall_back():
    # small channels (in_conv / out_conv), tiny spatial (level 3) -> XLA
    assert conv_plan_feasible((1, 64, 64, 64), 16, 192, jnp.bfloat16) is None
    assert conv_plan_feasible((1, 64, 64, 64), 192, 8, jnp.bfloat16) is None
    assert conv_plan_feasible((2, 8, 8, 8), 768, 768, jnp.bfloat16) is None


def test_release_shapes_have_plans():
    # every 3x3x3 stride-1 shape the 750M UNet runs at 64^3/32^3/16^3
    # must engage the kernel (wide layers via O- and C-chunking)
    for shape, C, O in [((2, 64, 64, 64), 192, 192),
                        ((2, 64, 64, 64), 384, 192),   # decoder concat
                        ((2, 64, 64, 64), 384, 384),   # up1
                        ((2, 32, 32, 32), 384, 384),
                        ((2, 32, 32, 32), 768, 384),   # decoder concat
                        ((2, 32, 32, 32), 768, 768)]:  # up2
        plan = conv_plan_feasible(shape, C, O, jnp.bfloat16)
        assert plan is not None, (shape, C, O)
        by, oblk, cblk = plan
        assert shape[2] % by == 0 and O % oblk == 0 and C % cblk == 0
        assert oblk == O or oblk % 128 == 0     # Mosaic block rule
        assert cblk == C or cblk % 128 == 0
    # 8^3 planes are too small for an MXU tile -> XLA; 16^3 wide layers
    # are weight-traffic-bound under chunking (measured parity) -> XLA
    assert conv_plan_feasible((2, 8, 8, 8), 768, 768, jnp.bfloat16) is None
    assert conv_plan_feasible((2, 16, 16, 16), 768, 768, jnp.bfloat16) is None


def test_module_matches_nn_conv_params_and_xla_path():
    import flax.linen as nn
    x = _rand((1, 4, 8, 8, 32))
    ours = Conv3x3x3(48, impl="xla")
    theirs = nn.Conv(48, (3, 3, 3))
    p1 = ours.init(jax.random.PRNGKey(7), x)
    p2 = theirs.init(jax.random.PRNGKey(7), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        assert a.shape == b.shape
    # same params -> same output as nn.Conv
    o1 = ours.apply(p2, x)
    o2 = theirs.apply(p2, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-5)


def test_module_pallas_interpret_matches_xla():
    x = _rand((1, 4, 16, 16, 64))
    mod_x = Conv3x3x3(64, impl="xla")
    mod_p = Conv3x3x3(64, impl="pallas")
    p = mod_x.init(jax.random.PRNGKey(3), x)
    np.testing.assert_allclose(np.asarray(mod_p.apply(p, x)),
                               np.asarray(mod_x.apply(p, x)),
                               atol=2e-4, rtol=1e-4)


def _cosine(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_int8_forward_cosine_gate():
    """int8 MXU path: per-input-channel activation scales folded into
    per-column weight quantization — cosine >= 0.999 vs the f32 oracle."""
    B, D, H, W, C, O = 1, 4, 8, 32, 128, 128
    x = _rand((B, D, H, W, C))
    w = _rand((3, 3, 3, C, O), 0.05, seed=1)
    b = _rand((O,), seed=2)
    plan = conv_plan_feasible((B, D, H, W), C, O, jnp.int8, quant=True)
    assert plan is not None and plan[0] * W % 32 == 0
    ref = _xla_conv(x, w, b)
    got = conv3x3x3(x, w, b, plan, True, True)
    assert _cosine(got, ref) >= 0.999


def test_int8_module_and_grads_fall_back_to_full_precision():
    """quant module forward stays close; gradients come from the
    full-precision kernel (serving path: straight-through)."""
    x = _rand((1, 4, 8, 32, 64))
    mod_x = Conv3x3x3(64, impl="xla")
    mod_q = Conv3x3x3(64, impl="pallas", quant=True)
    p = mod_x.init(jax.random.PRNGKey(3), x)
    assert _cosine(mod_q.apply(p, x), mod_x.apply(p, x)) >= 0.999
    g_q = jax.grad(lambda xx: jnp.sum(mod_q.apply(p, xx) ** 2))(x)
    g_x = jax.grad(lambda xx: jnp.sum(mod_x.apply(p, xx) ** 2))(x)
    # cotangent carries the (quantized) forward output, so allow the same
    # relative error budget as the forward gate
    assert _cosine(g_q, g_x) >= 0.999
