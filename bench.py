"""Headline benchmark: Wan DiT denoise steps/sec/chip (buffer-conditioned,
93 frames @ 480p, CFG pair per step) on the local accelerator.

Baseline anchor (BASELINE.md): the reference generates 93f@480p with
Wan2.1-14B in ~20 min / 50 denoise steps on 1x A100 (README.md:65) =>
0.0417 steps/s with CFG. This bench runs the 1.3B config (fits one chip);
vs_baseline is parameter-normalized against the A100 anchor:
    baseline_1_3b_equiv = 0.0417 * (14 / 1.3) = 0.449 steps/s.
(Conservative for us: 14B attention costs more than 14/1.3 x of 1.3B.)

Env overrides: BENCH_FRAMES (default 93), BENCH_STEPS (timed steps, default 3),
BENCH_HW ("480x832"), BENCH_PRECISION ("int8" default | "bf16").
Prints ONE JSON line.

Precision note: the serving path runs the DiT projections/FFN and the
attention QK^T on the v5e's int8 MXU (measured 1.5x bf16) with a fixed-max
int8 flash kernel; quality is gated at output cosine >= 0.999 vs the bf16
path (tests/test_quant.py) — the standard quantized-serving practice the
chip is built for. BENCH_PRECISION=bf16 reports the pure-bf16 number
(attention-wall-bound at ~64% of the chip's 197 TF/s peak; see
docs/PERF.md "bf16 attention wall").
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig


def main():
    frames = int(os.environ.get("BENCH_FRAMES", "93"))
    try:
        _run(frames)
    except Exception:
        # defensive fallback for smaller chips: halve the clip, but say so
        # LOUDLY — a silent fallback would make a chip-side OOM regression
        # look like a plausible benchmark result
        import sys
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(f"[bench] DEGRADED: full {frames}-frame run failed; "
              f"re-running at half clip", file=sys.stderr)
        _run(max(1 + (frames - 1) // 2, 5), degraded=True)


def _run(frames: int, degraded: bool = False):
    timed_steps = int(os.environ.get("BENCH_STEPS", "3"))
    h, w = (int(x) for x in os.environ.get("BENCH_HW", "480x832").split("x"))
    precision = os.environ.get("BENCH_PRECISION", "int8")
    T, H, W = 1 + (frames - 1) // 4, h // 8, w // 8

    quant = dict(attn_quant="qk", quant_linear=True,
                 residual_dtype=jnp.bfloat16) \
        if precision == "int8" else {}
    cfg = WanDiTConfig.wan_1_3b(**quant)
    model = WanDiT(cfg)
    rng = jax.random.PRNGKey(0)

    lat = jnp.zeros((1, T, H // 2 * 2, W // 2 * 2, cfg.in_channels),
                    jnp.bfloat16)
    buf = jnp.zeros((1, T, lat.shape[2], lat.shape[3], cfg.buffer_channels),
                    jnp.bfloat16)
    txt = jnp.zeros((1, 512, cfg.text_dim), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.float32)

    params = jax.jit(model.init)(rng, lat, t, txt, buf)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    def denoise_step(p, x, tt, ctx, bl):
        # CFG: conditional + unconditional in one doubled batch
        xx = jnp.concatenate([x, x])
        out = model.apply(p, xx, jnp.concatenate([tt, tt]),
                          jnp.concatenate([ctx, jnp.zeros_like(ctx)]),
                          jnp.concatenate([bl, bl]))
        c, u = jnp.split(out, 2, axis=0)
        return (u + 5.0 * (c - u)).astype(x.dtype)

    @functools.partial(jax.jit, static_argnums=(4,))
    def denoise(p, x, ctx, bl, steps):
        # the WHOLE denoise loop runs on device (lax.scan), as serving
        # does — a per-step Python dispatch through the axon tunnel costs
        # ~0.1 s/step of pure host overhead that is not model time
        def body(xc, i):
            return denoise_step(p, xc, t + i, ctx, bl), None
        return jax.lax.scan(body, x, jnp.arange(steps, dtype=jnp.float32))[0]

    x = jax.random.normal(rng, lat.shape, jnp.bfloat16)
    # warmup/compile with the SAME static step count as the timed call
    # (steps is static, so a different count is a different program); under
    # the axon tunnel block_until_ready does not actually block — a host
    # fetch is the only reliable fence
    o = denoise(params, x, txt, buf, timed_steps)
    _ = jax.device_get(o[0, 0, 0, 0])

    t0 = time.perf_counter()
    o = denoise(params, x, txt, buf, timed_steps)
    _ = jax.device_get(o[0, 0, 0, 0])
    dt = time.perf_counter() - t0

    steps_per_sec = timed_steps / dt
    baseline = 0.0417 * (14.0 / 1.3)
    tag = "" if precision == "int8" else f"_{precision}"
    rec = {
        "metric": f"wan_dit_1.3b_denoise_steps_per_sec_{frames}f{h}p_cfg"
                  f"{tag}",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec / baseline, 3),
    }
    if degraded:
        rec["degraded"] = True
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
