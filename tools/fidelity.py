"""Fidelity harness (SURVEY §7.3's north-star config-1 bar).

Two modes:

1. **golden** (default): deterministic synthetic scene -> guidance buffers +
   feedforward reconstruction with held-out-view PSNR/SSIM; compares buffer
   tensors bit-approximately against committed goldens
   (tests/golden/fidelity_golden.npz) and writes tests/golden/metrics.json.
   This is the regression harness the tolerance test
   (tests/test_fidelity.py) enforces.
2. **--reference-dir**: diff OUR buffer tars against reference-produced tars
   in the reference converter layout (semantic_buffer / voxel_depth_100 /
   instance_buffer members {frame:06d}.png). The reference's released
   sample clips are an online download
   (/root/reference/README.md quick start); this mode exists so the same
   harness consumes them wherever they are available — the offline CI bar
   is mode 1.

Reference behaviour mirrored: buffers rendered from a voxel world along a
camera trajectory (inference/guidance_buffer_generation.py:591-791) and
PSNR/SSIM of reconstruction on views unseen by the model
(gsm training val, train.py:307-315)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
GOLDEN_DIR = REPO / "tests" / "golden"


def synthetic_scene(seed: int = 0):
    """Deterministic Waymo-like surface scene + trajectory + views."""
    rng = np.random.default_rng(seed)
    n = 60_000
    ground = np.stack([rng.uniform(-30, 30, n // 2),
                       rng.uniform(-12, 12, n // 2),
                       rng.normal(0.0, 0.05, n // 2)], -1)
    wall = np.stack([rng.uniform(-30, 30, n // 4),
                     np.sign(rng.normal(size=n // 4)) *
                     rng.normal(10, 0.1, n // 4),
                     rng.uniform(0, 6, n // 4)], -1)
    blobs = rng.normal(0, 1.0, (n - n // 2 - n // 4, 3)) * [1.5, 1.5, 0.8] \
        + np.stack([rng.uniform(-25, 25, n // 4),
                    rng.uniform(-8, 8, n // 4), np.full(n // 4, 1.0)], -1)
    pts = np.concatenate([ground, wall, blobs]).astype(np.float32)
    sem = np.concatenate([np.full(n // 2, 18), np.full(n // 4, 14),
                          rng.integers(1, 12, n - n // 2 - n // 4)]
                         ).astype(np.int32)
    # straight trajectory along +x, FLU camera
    poses = []
    for i in range(8):
        T = np.eye(4, dtype=np.float64)
        T[:3, 3] = [-20 + 5 * i, 0, 1.8]
        poses.append(T)
    return pts, sem, np.stack(poses)


def run_buffers(num_frames: int = 8, hw=(120, 160)):
    from infinicube_tpu.camera.pinhole import PinholeCamera
    from infinicube_tpu.inference.guidance_buffer_generation import (
        generate_buffers_for_world)
    from infinicube_tpu.utils.world_grid import WorldGrid

    pts, sem, poses = synthetic_scene()
    world = WorldGrid(voxel_size=0.2)
    world.merge_points(pts, sem)
    h, w = hw
    cam = PinholeCamera(fx=140.0, fy=140.0, cx=w / 2, cy=h / 2, w=w, h=h)
    buffers = generate_buffers_for_world(world, poses[:num_frames],
                                         camera=cam)
    return {k: np.asarray(v) for k, v in buffers.items()}, poses


def run_reconstruction(hw=(96, 128)):
    """Feedforward reconstruction on 3 input views; PSNR/SSIM evaluated on
    one HELD-OUT target view (the reference's val metric,
    train.py:307-315)."""
    import jax.numpy as jnp
    from infinicube_tpu.grid.build import grid_from_points
    from infinicube_tpu.inference.feedforward_reconstruction import (
        reconstruct)
    from infinicube_tpu.models.gsm.loss import psnr, ssim

    pts, sem, poses = synthetic_scene(1)
    h, w = hw
    K = np.array([[90.0, 0, w / 2], [0, 90, h / 2], [0, 0, 1]], np.float32)
    views = poses[[0, 2, 4, 6]].astype(np.float32)
    grid = grid_from_points(jnp.asarray(pts)[None],
                            jnp.ones((1, len(pts)), bool), 0.4, 0.2,
                            capacity=1 << 15)
    rng = np.random.default_rng(2)
    images = rng.uniform(size=(4, h, w, 3)).astype(np.float32)
    batch = {
        "grid": grid,
        "images": jnp.asarray(images[:3]),
        "masks": jnp.ones((3, h, w, 4), jnp.float32),
        "Ks": jnp.asarray(np.stack([K] * 3)),
        "cam_to_worlds": jnp.asarray(views[:3]),
        "depth_prior": jnp.zeros((3, h, w, 1)),
        "target_Ks": jnp.asarray(K)[None],
        "target_poses": jnp.asarray(views[3:4]),
    }
    out, _, _, _ = reconstruct(batch, mode="dual")
    ren = out["render"]["rgb"]
    gt = jnp.asarray(images[3:4])
    return {"held_out_psnr": float(psnr(ren, gt)),
            "held_out_ssim": float(ssim(ren, gt))}


def compare_to_reference(ref_dir: Path, buffers: dict) -> dict:
    """Diff our buffers against reference tars (reference layout)."""
    from infinicube_tpu.data.codec import decode_member
    from infinicube_tpu.data.tario import TarReader
    report = {}
    for attr, key in (("semantic_buffer", "semantic"),
                      ("voxel_depth_100", "depth")):
        tars = sorted((ref_dir / attr).glob("*.tar"))
        if not tars or key not in buffers:
            continue
        with TarReader(tars[0]) as r:
            names = sorted(n for n in r.names() if n.endswith(".png"))
            diffs = []
            for i, n in enumerate(names[:len(buffers[key])]):
                ref = np.asarray(decode_member("png", r.read(n)), np.float32)
                ours = np.asarray(buffers[key][i], np.float32)
                if attr == "voxel_depth_100":
                    ref = ref / 100.0
                if ref.shape != ours.shape[:2]:
                    report[attr] = "shape-mismatch"
                    break
                diffs.append(float(np.abs(ref - ours).mean()))
            else:
                report[attr] = {"mean_abs_diff": float(np.mean(diffs))}
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--write-golden", action="store_true",
                    help="(re)write the committed golden tensors")
    ap.add_argument("--reference-dir", default=None,
                    help="diff against reference-produced buffer tars")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (goldens are CPU-generated "
                    "so the tolerance test compares like-for-like)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    buffers, _ = run_buffers()
    metrics = {"reconstruction": run_reconstruction()}
    for k, v in buffers.items():
        metrics[f"buffer_{k}_mean"] = float(np.mean(v))
        metrics[f"buffer_{k}_nonzero"] = float(np.mean(v != 0))

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    gfile = GOLDEN_DIR / "fidelity_golden.npz"
    if args.write_golden or not gfile.exists():
        np.savez_compressed(gfile, **{k: v[:2] for k, v in buffers.items()})
        print(f"wrote {gfile}")
    else:
        golden = np.load(gfile)
        for k in golden.files:
            ours = buffers[k][:2]
            d = np.abs(ours.astype(np.float64) -
                       golden[k].astype(np.float64))
            metrics[f"golden_{k}_max_abs"] = float(d.max())
            metrics[f"golden_{k}_mismatch_frac"] = float((d > 1e-3).mean())

    if args.reference_dir:
        metrics["reference_diff"] = compare_to_reference(
            Path(args.reference_dir), buffers)

    out = GOLDEN_DIR / "metrics.json"
    out.write_text(json.dumps(metrics, indent=2, sort_keys=True))
    print(json.dumps(metrics, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
