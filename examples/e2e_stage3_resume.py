"""Resume stage 3 (GSM) of a release-profile e2e run from its artifacts.

The release e2e writes world.npz + buffers/ + video/ before stage 3; this
script replays ONLY stage 3 (release GSMConfig, 16 key views — the
reference's every-6th-frame selection, /root/reference/infinicube/
inference/scene_gaussian_generation.py:225-236) against those artifacts,
so a stage-3 failure doesn't repay the ~25 min of stages 1-2.5.

Usage: [E2E_STEADY=1] python examples/e2e_stage3_resume.py [outdir]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

STEADY = os.environ.get("E2E_STEADY", "0") == "1"


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    cold = time.perf_counter() - t0
    if STEADY:
        t0 = time.perf_counter()
        out = fn()
        warm = time.perf_counter() - t0
        print(f"[{label}] cold {cold:.1f}s -> steady {warm:.1f}s", flush=True)
    else:
        print(f"[{label}] {cold:.1f}s", flush=True)
    return out


def main(outdir="out/e2e_release"):
    outdir = Path(outdir)
    from PIL import Image

    from infinicube_tpu.inference.scene_gaussian_generation import (
        load_buffer_folder, reconstruct_scene)
    from infinicube_tpu.models.gsm.model import GSMConfig
    from infinicube_tpu.utils.gaussian_io import save_pkl, save_splat

    n_frames, stride, n_views = 16, 6, 16
    gcfg = GSMConfig(dense_dims=(512, 256, 64),
                     dense_ijk_min=(-32, -128, -16))
    data = load_buffer_folder(outdir / "buffers", num_frames=n_frames,
                              stride=stride)
    vdir = outdir / "video"
    if vdir.is_dir():
        frames = sorted(vdir.glob("*.png"))
        video = np.stack([np.asarray(Image.open(f), np.float32) / 255.0
                          for f in frames])
        data["video"] = video[::stride][: data["depth"].shape[0]]
    else:
        rng = np.random.default_rng(0)
        data["video"] = rng.uniform(
            size=data["depth"].shape + (3,)).astype(np.float32)

    static_gs, object_gs, out, _, _ = timed(
        f"stage3 GSM (release: {n_views} views)",
        lambda: reconstruct_scene(data, cfg=gcfg, max_views=n_views))
    print(f"[stage3] {len(static_gs['means'])} gaussians", flush=True)
    save_pkl(outdir / "decoded_gs_static.pkl", static_gs)
    save_splat(outdir / "decoded_gs_static.splat", static_gs)
    Image.fromarray((np.clip(np.asarray(out["render"]["rgb"][0]), 0, 1)
                     * 255).astype(np.uint8)).save(outdir / "render0.png")
    print(f"[stage3-resume] done -> {outdir}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
