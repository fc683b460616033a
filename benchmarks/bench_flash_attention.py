"""Flash-attention kernel roofline probe at the Wan bench shape.

Round-4 agenda (VERDICT r3 weak #1 / next #3): the int8-QK fixed-max kernel
runs 197.7 TF/s-effective vs a ~260 TF/s arithmetic floor (int8 QK^T at the
394 TOPS MXU + bf16 PV at 197 TF/s are BOTH MXU ops and cannot overlap each
other; the ~40 ms of VPU softmax can in principle hide behind them). This
bench measures the full kernel against its ablations to locate the gap:

- full            : the serving kernel (quant="qk", fixed_max)
- bf16 / bf16-run : bf16 QK^T kernels (fixed-max and running-max)
- variants        : block-shape sweep, incl. asymmetric q/k blocks

Each timing is host-fetch fenced (block_until_ready does not block under
the axon tunnel). TF/s are bf16-equivalent: 4*N^2*d per batch*head row,
using the REAL n_real token count (padded work is overhead, not credit).

Usage: python benchmarks/bench_flash_attention.py [quick]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.ops.flash_attention import flash_attention

B, H, N, D = 2, 12, 37440, 128   # CFG pair, Wan 1.3B heads, 93f@480p tokens
BH = B * H
REPS = 3

rng = np.random.default_rng(0)


def make_qkv(n_pad):
    # RMSNormed-like rows (uniform norms), zero pad rows per the contract.
    # Seeded per call: variants must see the SAME data or the cosine
    # check compares attention outputs of different inputs (~0 cosine).
    def mk(seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal((BH, N, D), np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True) / np.sqrt(D)
        x = np.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))
        return jnp.asarray(x, jnp.bfloat16)
    return mk(0), mk(1), mk(2)


def bench(label, fn, *args):
    out = fn(*args)
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])  # in-order fence; ravel on big outputs hits the tile-padding relayout trap          # compile + first exec
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(jnp.zeros((1,), jnp.float32)[0])  # in-order fence; ravel on big outputs hits the tile-padding relayout trap
    dt = (time.perf_counter() - t0) / REPS
    flops = 4.0 * N * N * D * BH
    print(f"{label:44s} {dt * 1e3:8.1f} ms  {flops / dt / 1e12:6.1f} TF/s",
          flush=True)
    return dt


def run(block_q, block_k, quant, fixed_max, pdtype="f32", f32_acc=False,
        ref_out=None):
    n_pad = -(-N // max(block_q, block_k)) * max(block_q, block_k)
    q, k, v = make_qkv(n_pad)
    import functools
    f = jax.jit(functools.partial(
        flash_attention, sm_scale=1.0 / np.sqrt(D), n_real=N,
        block_q=block_q, block_k=block_k, quant=quant, fixed_max=fixed_max,
        pdtype=pdtype, f32_acc=f32_acc))
    tag = f"{quant or 'bf16'} fm={fixed_max} bq={block_q} bk={block_k}"
    if pdtype != "f32":
        tag += f" p={pdtype}"
    if f32_acc:
        tag += " f32acc"
    dt = bench(tag, f, q, k, v)
    if ref_out is not None:
        a = np.asarray(f(q, k, v)[:, :N], np.float32).ravel()
        b = np.asarray(ref_out[:, :N], np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        print(f"  cosine vs serving kernel: {cos:.6f}", flush=True)
    return dt, f(q, k, v)


quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
mode = sys.argv[1] if len(sys.argv) > 1 else "full"
print(f"shape: BH={BH} N={N} D={D}; bf16-equiv TF/s", flush=True)
_, base_out = run(1536, 1536, "qk", True)      # the serving kernel
if mode == "variants":
    # round-4 softmax-tail variants (VPU-bound kernel; see the roofline
    # note in docs/PERF.md): f32 MXU accumulation elides the int32->f32
    # cast; bf16 exp2+lane-adds win only if the VPU runs bf16 2x
    os.environ["FLASH_ROOFLINE_PROBES"] = "1"   # wrong-math ablation gate
    for kw in (dict(f32_acc=True), dict(pdtype="bf16"),
               dict(pdtype="probe-noexp"), dict(pdtype="probe-noadd")):
        try:
            run(1536, 1536, "qk", True,
                ref_out=None if "probe" in str(kw) else base_out, **kw)
        except Exception as e:
            print(f"variant {kw}: FAILED {type(e).__name__}: {e}",
                  flush=True)
elif not quick:
    run(1536, 1536, "none", True)     # bf16 fixed-max
    run(1024, 1024, "qk", True)
    # asymmetric blocks (VMEM: p tile = bq*bk*4 bytes is the binding term)
    for bq, bk in ((2048, 1024), (1024, 2048), (2560, 768),
                   (1280, 1280), (1920, 1280)):
        try:
            run(bq, bk, "qk", True)
        except Exception as e:
            print(f"qk bq={bq} bk={bk}: FAILED {type(e).__name__}",
                  flush=True)
