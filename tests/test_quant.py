"""int8 serving path quality gates (nn/quant.py + ops/flash_attention.py).

The VERDICT round-2 perf directive: the quantized DiT path must hold output
cosine >= 0.999 against the bf16 path. Runs on CPU (Pallas interpret mode);
the speed claims are measured on the chip (docs/PERF.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from infinicube_tpu.nn.quant import QuantDense, int8_matmul
from infinicube_tpu.ops.attention import _einsum_attention
from infinicube_tpu.ops.flash_attention import mha_quantized


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def test_int8_matmul_close():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 192), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (192, 128), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    out = int8_matmul(x, w, b)
    ref = x @ w + b
    assert _cos(out, ref) > 0.9995


def test_quant_dense_param_tree_matches_dense():
    import flax.linen as nn
    x = jnp.ones((4, 16))
    pd = jax.jit(QuantDense(24).init)(jax.random.PRNGKey(0), x)
    pn = jax.jit(nn.Dense(24).init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pn)
    assert all(
        a.shape == b.shape for a, b in zip(jax.tree_util.tree_leaves(pd),
                                           jax.tree_util.tree_leaves(pn)))


@pytest.mark.parametrize("quant", ["none", "qk", "qkv"])
def test_flash_attention_matches_einsum(quant):
    key = jax.random.PRNGKey(0)
    B, N, h, d = 2, 300, 4, 128
    q = jax.random.normal(key, (B, N, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, h, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, h, d), jnp.float32)
    ref = _einsum_attention(q, k, v, 1.0 / np.sqrt(d))
    out = mha_quantized(q, k, v, quant=quant)
    c = _cos(out, ref)
    if quant == "none":
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
    else:
        assert c > 0.999, c


def test_dit_quant_path_cosine_gate():
    """End-to-end tiny Wan DiT: quantized linears + int8 attention must stay
    cosine >= 0.999 against the bf16 forward (same params)."""
    from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig

    base = dict(dim=256, ffn_dim=512, num_layers=2, num_heads=2,
                text_dim=64, scan_layers=False)
    cfg_b = WanDiTConfig(**base)
    # exactly the bench's serving config: int8 attention+linears, bf16 carry
    cfg_q = WanDiTConfig(**base, attn_quant="qk", quant_linear=True,
                         residual_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(rng, (1, 2, 8, 8, 16), jnp.float32)
    buf = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 32),
                            jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 64), jnp.float32)
    t = jnp.full((1,), 400.0)

    model_b = WanDiT(cfg_b)
    params = model_b.init(rng, lat, t, txt, buf)
    # the head is zero-init (output would be identically 0) — randomize it
    # so the gate actually measures the stack
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                       x.dtype) * 0.02
        if any(getattr(k, "key", None) == "head" for k in p) else x, params)
    ref = model_b.apply(params, lat, t, txt, buf)
    out = WanDiT(cfg_q).apply(params, lat, t, txt, buf)
    c = _cos(out, ref)
    assert c > 0.999, c


def test_unet3d_conv_quant_cosine_gate():
    """Voxel UNet with int8 Pallas convs (DiffusionConfig.serve_quant) must
    stay cosine >= 0.999 against the full-precision forward (same params).
    Small cube, Pallas interpret mode on CPU."""
    from infinicube_tpu.models.diffusion.unet3d import UNet3D

    base = dict(out_channels=4, model_channels=64, channel_mult=(1, 2),
                num_res_blocks=1, attention_ds=(2,), num_heads=4,
                transformer_depth=1, dtype=jnp.float32)
    net_b = UNet3D(**base, conv_impl="pallas")
    net_q = UNet3D(**base, conv_impl="pallas", conv_quant=True)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4, 8, 32, 8), jnp.float32)
    t = jnp.array([500])
    params = net_b.init(rng, x, t)
    # zero-init output/residual kernels would make both outputs identically
    # zero — randomize them so the gate measures the stack
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jax.random.normal(jax.random.PRNGKey(3), v.shape,
                                       v.dtype) * 0.02
        if v.ndim > 1 and not np.any(np.asarray(v)) else v, params)
    c = _cos(net_q.apply(params, x, t), net_b.apply(params, x, t))
    assert c > 0.999, c
