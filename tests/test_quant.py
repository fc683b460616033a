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


def test_dit_quant_50step_cfg_drift_gate():
    """Cumulative int8 drift through the REAL serving loop shape: a 50-step
    CFG flow-match euler denoise (the loop bench.py and the e2e run), int8
    path vs bf16 path from the same start noise and params. Gates the FINAL
    latents at cosine >= 0.99 (round-4 VERDICT directive: one-forward gates
    do not bound 50-step accumulation) and checks the per-step drift curve
    is bounded (no blow-up mid-trajectory). Measured drift on this tiny
    config and on-chip at release shapes is recorded in docs/PERF.md."""
    from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig
    from infinicube_tpu.models.wan.flow_match import (
        FlowMatchSchedule, euler_sample)

    base = dict(dim=256, ffn_dim=512, num_layers=2, num_heads=2,
                text_dim=64, scan_layers=False)
    cfg_b = WanDiTConfig(**base)
    cfg_q = WanDiTConfig(**base, attn_quant="qk", quant_linear=True,
                         residual_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 2, 8, 8, 16), jnp.float32)
    buf = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 32),
                            jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 64), jnp.float32)
    t0 = jnp.zeros((1,), jnp.float32)
    model_b, model_q = WanDiT(cfg_b), WanDiT(cfg_q)
    params = model_b.init(rng, lat, t0, txt, buf)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                       x.dtype) * 0.02
        if any(getattr(k, "key", None) == "head" for k in p) else x, params)

    def cfg_fn(model):
        def fn(x, t):
            xx = jnp.concatenate([x, x])
            out = model.apply(params, xx, jnp.concatenate([t, t]),
                              jnp.concatenate([txt, jnp.zeros_like(txt)]),
                              jnp.concatenate([buf, buf]))
            c, u = jnp.split(out, 2, axis=0)
            return (u + 5.0 * (c - u)).astype(x.dtype)
        return fn

    sched = FlowMatchSchedule()
    x_T = jax.random.normal(jax.random.PRNGKey(4), lat.shape, jnp.float32)

    # per-step drift curve: run both trajectories step-by-step from the SAME
    # running int8 state isn't the gate (errors would cancel) — accumulate
    # each independently, as serving does, and measure divergence
    sig = sched.sigmas(50)
    ts = sig[:-1] * sched.num_train_timesteps
    fb, fq = cfg_fn(model_b), cfg_fn(model_q)
    xb = xq = x_T
    drift = []
    jb = jax.jit(lambda x, t, ds: x + ds * fb(x, jnp.full((1,), t)))
    jq = jax.jit(lambda x, t, ds: x + ds * fq(x, jnp.full((1,), t)))
    for i in range(50):
        ds = sig[i + 1] - sig[i]
        xb = jb(xb, ts[i], ds)
        xq = jq(xq, ts[i], ds)
        if i % 10 == 9 or i == 0:
            drift.append(1.0 - _cos(xq, xb))
    final_cos = _cos(xq, xb)
    assert final_cos > 0.99, (final_cos, drift)
    # the drift curve must stay bounded (monotone-ish accumulation, no
    # mid-trajectory blow-up): every checkpoint within 10x of the final
    assert max(drift) < 10 * max(1.0 - final_cos, 1e-6) + 1e-4, drift
    # cross-check the scan-based sampler agrees with the python loop
    # (different XLA fusion under scan -> small f32 reassociation drift over
    # 50 steps; measured max |diff| 2.7e-3 on this config)
    xb_scan = euler_sample(sched, fb, x_T, 50)
    np.testing.assert_allclose(np.asarray(xb_scan), np.asarray(xb),
                               atol=1e-2)
    assert _cos(xb_scan, xb) > 0.9999


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
