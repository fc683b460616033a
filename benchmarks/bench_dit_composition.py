"""Itemize the Wan 1.3B DiT denoise step beyond attention (VERDICT r4 #6).

The headline step (93f @ 480p, CFG, int8 serving path) is ~3.9 s; the flash
kernel has a measured VMEM-structural roofline (docs/PERF.md) but the other
~60% of the step never got one. This bench times each block component in
isolation at the exact serving shapes (B=2 CFG pair), multiplies by the 30
blocks, and reports the composition next to the measured full step — the
unattributed remainder is XLA fusion overlap + embed/head + dispatch.

Also prints the sequential-CFG (cfg_batch=False, two B=1 forwards — the
program serving actually runs, pipeline.py:61-77) steps/s so the bench and
serving programs are both on record.

Timing: K back-to-back enqueues then one in-order fence (block_until_ready
does not block under the axon tunnel).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from infinicube_tpu.models.wan.dit import (WanDiT, WanDiTConfig, apply_rope,
                                           rope_3d)
from infinicube_tpu.nn.quant import QuantDense
from infinicube_tpu.ops.flash_attention import mha_quantized
from infinicube_tpu.ops.attention import multi_head_attention

cfg = WanDiTConfig.wan_1_3b(attn_quant="qk", quant_linear=True,
                            residual_dtype=jnp.bfloat16)
C, H, HD, FFN, L = cfg.dim, cfg.num_heads, cfg.dim // cfg.num_heads, \
    cfg.ffn_dim, 512
GT, GH, GW = 24, 30, 52          # 93f @ 480p latents, patch (1,2,2)
N = GT * GH * GW                 # 37,440 tokens
B = 2                            # CFG pair
NBLOCKS = cfg.num_layers

rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, N, C), jnp.bfloat16)
ctx = jax.random.normal(rng, (B, L, C), jnp.bfloat16)
qh = jax.random.normal(rng, (B, N, H, HD), jnp.bfloat16)
angles = rope_3d((GT, GH, GW), HD)


def fence():
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])


def timed(label, fn, *args, reps=8, flops=None):
    f = jax.jit(fn)
    f(*args)
    fence()
    t0 = time.perf_counter()
    for _ in range(reps):
        f(*args)
    fence()
    dt = (time.perf_counter() - t0) / reps
    tf = f" {flops/dt/1e12:7.1f} TF/s" if flops else ""
    print(f"[dit-comp] {label:34s} {dt*1e3:8.2f} ms{tf}", flush=True)
    return dt


def dense_mod(mod, shape):
    p = jax.jit(mod.init)(jax.random.PRNGKey(1), jnp.zeros(shape,
                                                           jnp.bfloat16))
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                     if a.dtype == jnp.float32 else a, p)
    return p


def main():
    print(f"[dit-comp] shapes: B={B} N={N} C={C} heads={H} ffn={FFN} "
          f"blocks={NBLOCKS}", flush=True)
    comp = {}

    # --- matmuls (int8 serving path) --------------------------------------
    qkv = QuantDense(3 * C)
    p_qkv = dense_mod(qkv, (1, 1, C))
    comp["qkv_proj"] = timed("qkv proj int8 [C->3C]",
                             lambda p, a: qkv.apply(p, a), p_qkv, x,
                             flops=2 * B * N * C * 3 * C)
    o = QuantDense(C)
    p_o = dense_mod(o, (1, 1, C))
    comp["o_proj"] = timed("o proj int8 [C->C]",
                           lambda p, a: o.apply(p, a), p_o, x,
                           flops=2 * B * N * C * C)
    ffn_in = QuantDense(FFN)
    p_fi = dense_mod(ffn_in, (1, 1, C))
    ffn_out = QuantDense(C)
    p_fo = dense_mod(ffn_out, (1, 1, FFN))

    def ffn_fn(pi, po, a):
        hh = nn.gelu(ffn_in.apply(pi, a), approximate=True)
        return ffn_out.apply(po, hh)

    comp["ffn"] = timed("ffn int8 [C->FFN->C] + gelu", ffn_fn, p_fi, p_fo, x,
                        flops=2 * B * N * C * FFN * 2)

    # --- self attention core ----------------------------------------------
    comp["self_attn"] = timed(
        "self flash attn int8-QK", lambda a, b2, c2: mha_quantized(
            a, b2, c2, quant="qk"), qh, qh, qh,
        flops=4 * B * H * N * N * HD)

    # --- q/k RMSNorm + rope (f32 norms over the full dim) ------------------
    rms = nn.RMSNorm(dtype=jnp.float32)
    p_rms = rms.init(jax.random.PRNGKey(2), jnp.zeros((1, 1, C)))

    def norm_rope(p, a):
        q = rms.apply(p, a).reshape(B, N, H, HD)
        k = rms.apply(p, a).reshape(B, N, H, HD)
        q = apply_rope(q, angles).astype(jnp.bfloat16)
        k = apply_rope(k, angles).astype(jnp.bfloat16)
        return q, k

    comp["qk_norm_rope"] = timed("q/k RMSNorm f32 + rope", norm_rope,
                                 p_rms, x)

    # --- cross attention (bf16 kernel at N x 512) --------------------------
    cq = QuantDense(C)
    p_cq = dense_mod(cq, (1, 1, C))
    ckv = nn.Dense(2 * C, dtype=jnp.bfloat16)
    p_ckv = dense_mod(ckv, (1, 1, C))

    def cross_fn(pq, pkv, po, a, cc):
        q = cq.apply(pq, a).reshape(B, N, H, HD)
        kv = ckv.apply(pkv, cc)
        k, v = jnp.split(kv, 2, axis=-1)
        out = multi_head_attention(q, k.reshape(B, L, H, HD),
                                   v.reshape(B, L, H, HD))
        return o.apply(po, out.reshape(B, N, C))

    comp["cross_attn"] = timed("cross attn (proj+kernel+o)", cross_fn,
                               p_cq, p_ckv, p_o, x, ctx,
                               flops=2 * B * N * C * C * 2 +
                               4 * B * H * N * L * HD)

    # --- layernorms + adaLN modulation + residuals (per block: 3 LN f32) ---
    mod = jax.random.normal(rng, (B, 6, C), jnp.float32)

    def ln_mod(a, m):
        sh1, sc1, g1, sh2, sc2, g2 = [m[:, i, None, :] for i in range(6)]

        def ln(v):  # param-free LN (a bound nn.LayerNorm can't be called here)
            v32 = v.astype(jnp.float32)
            mu = v32.mean(-1, keepdims=True)
            var = v32.var(-1, keepdims=True)
            return (v32 - mu) * jax.lax.rsqrt(var + 1e-6)
        h1 = (ln(a) * (1 + sc1) + sh1).astype(jnp.bfloat16)
        a = a + (g1 * h1.astype(jnp.float32)).astype(jnp.bfloat16)
        h2 = ln(a).astype(jnp.bfloat16)
        a = a + h2
        h3 = (ln(a) * (1 + sc2) + sh2).astype(jnp.bfloat16)
        return (a + (g2 * h3.astype(jnp.float32)).astype(jnp.bfloat16)
                ).astype(jnp.bfloat16)

    comp["ln_mod"] = timed("3x LN f32 + modulation + residuals",
                           lambda a, m: ln_mod(a, m), x, mod)

    per_block = sum(comp.values())
    attrib = per_block * NBLOCKS
    print(f"[dit-comp] per-block sum {per_block*1e3:.2f} ms x {NBLOCKS} "
          f"blocks = {attrib:.3f} s", flush=True)

    # --- full step, CFG pair (bench.py program) ----------------------------
    model = WanDiT(cfg)
    lat = jnp.zeros((1, GT, GH * 2, GW * 2, cfg.in_channels), jnp.bfloat16)
    buf = jnp.zeros((1, GT, GH * 2, GW * 2, cfg.buffer_channels),
                    jnp.bfloat16)
    txt = jnp.zeros((1, L, cfg.text_dim), jnp.bfloat16)
    t1 = jnp.zeros((1,), jnp.float32)
    params = jax.jit(model.init)(rng, lat, t1, txt, buf)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, params)

    lat2 = jnp.concatenate([lat, lat])
    buf2 = jnp.concatenate([buf, buf])
    txt2 = jnp.concatenate([txt, jnp.zeros_like(txt)])
    t2 = jnp.zeros((2,), jnp.float32)
    t_pair = timed("FULL step (CFG pair, B=2)",
                   lambda p: model.apply(p, lat2, t2, txt2, buf2), params,
                   reps=3)

    # --- sequential CFG: the serving program (cfg_batch=False) -------------
    fwd1 = jax.jit(lambda p, tx: model.apply(p, lat, t1, tx, buf))
    fwd1(params, txt)
    fence()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        fwd1(params, txt)
        fwd1(params, jnp.zeros_like(txt))
    fence()
    t_seq = (time.perf_counter() - t0) / reps
    print(f"[dit-comp] FULL step (sequential CFG, 2x B=1)   "
          f"{t_seq*1e3:8.2f} ms", flush=True)

    print(f"[dit-comp] composition: attributed {attrib:.3f} s of "
          f"{t_pair:.3f} s pair step "
          f"({100*attrib/t_pair:.0f}%); remainder = embed/head + fusion "
          f"overlap + dispatch", flush=True)
    import json
    print(json.dumps({
        "pair_step_s": round(t_pair, 4),
        "seq_step_s": round(t_seq, 4),
        "pair_steps_per_s": round(1 / t_pair, 4),
        "seq_steps_per_s": round(1 / t_seq, 4),
        "per_block_ms": {k: round(v * 1e3, 2) for k, v in comp.items()},
        "attributed_s": round(attrib, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
