"""Full Wan video stage (stage 2.5) phase breakdown on the chip.

Runs WanVideoGenerator.generate twice in-process (cold incl. compiles,
then steady) with WAN_PHASE_TIMING=1 so the per-phase wall clock
(text encode / buffer encode x2 / denoise / tiled decode) is itemized —
the round-4 agenda is cutting the ~125 s of non-denoise overhead
(VERDICT r3 weak #2). BENCH_FRAMES/BENCH_STEPS env override."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("WAN_PHASE_TIMING", "1")

import jax
import numpy as np

from infinicube_tpu.models.wan.pipeline import (
    WanPipelineConfig, WanVideoGenerator)

frames = int(os.environ.get("BENCH_FRAMES", "93"))
steps = int(os.environ.get("BENCH_STEPS", "50"))
# int8 serving profile by default (the path bench.py measures);
# BENCH_PRECISION=bf16 for the full-precision towers
if os.environ.get("BENCH_PRECISION", "int8") == "int8":
    cfg = WanPipelineConfig.serving(num_frames=frames, num_steps=steps)
else:
    cfg = WanPipelineConfig(num_frames=frames, num_steps=steps)
if os.environ.get("BENCH_TINY_T5") == "1":
    # iteration mode: a 2-layer host T5 (same d_model -> same embedding
    # shape) makes init ~10 min faster; the text-encode phase number is
    # only meaningful on the full umt5-xxl run
    import dataclasses
    cfg = dataclasses.replace(cfg, t5=dataclasses.replace(
        cfg.t5, num_layers=2))
gen = WanVideoGenerator(cfg)
print("[bench] init params...", flush=True)
gen.params = gen.init_params(jax.random.PRNGKey(0))
gen.cast_params_bf16()

rng = np.random.default_rng(0)
sem = rng.integers(0, 255, (frames, cfg.height, cfg.width, 3), np.uint8)
coo = rng.integers(0, 255, (frames, cfg.height, cfg.width, 3), np.uint8)

for label in ("cold", "steady"):
    t0 = time.perf_counter()
    out = gen.generate(sem, coo, "a realistic driving scene", seed=0)
    dt = time.perf_counter() - t0
    print(f"[bench] {label}: {dt:.1f} s total, out {out.shape}", flush=True)
