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


def make_segformer_sky_segmenter(params, cfg=None):
    """Build a sky segmenter from converted SegFormer weights
    (models/gsm/segformer.py; the reference runs the cityscapes-pretrained
    mmseg SegFormer, :65). Usage:
        params = convert_segformer_hf(torch.load(...), SegformerConfig.b0())
        register_sky_segmenter(make_segformer_sky_segmenter(params))
    """
    import jax
    import jax.numpy as jnp
    from infinicube_tpu.models.gsm.segformer import (
        Segformer, SegformerConfig, sky_mask_from_logits)
    cfg = cfg or SegformerConfig.b0()
    model = Segformer(cfg)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)

    @jax.jit
    def fwd(x):
        logits = model.apply(params, x)
        return sky_mask_from_logits(logits, x.shape[1:3])

    def segment(image: np.ndarray) -> np.ndarray:
        x = np.asarray(image, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        x = (x - mean) / std
        return np.asarray(jax.device_get(fwd(jnp.asarray(x)[None])))[0]

    return segment


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


def _read_polylines(root: Path, clip: str, kind: str) -> list:
    """[Ni, 3] world polylines from a 3d_{kind}/{clip}.tar written by
    waymo2shards (member '{kind}.json'); [] when absent."""
    tar = root / f"3d_{kind}" / f"{clip}.tar"
    if not tar.exists():
        return []
    with TarReader(tar) as r:
        name = f"{kind}.json"
        if name not in r:
            return []
        polys = decode_member("json", r.read(name))
    return [np.asarray(p, np.float32) for p in polys if len(p) >= 2]


def generate_discrete_map_points(root: Path, clip: str,
                                 spacing: float = 0.25) -> dict:
    """3d_{lane,road_edge,road_line} polylines -> 0.25 m discrete point tars
    3d_{kind}_voxelsize_025/{clip}.tar member '{kind}.npy' (reference :228),
    plus the 0.4 m road surface tar (reference :299). Returns the point
    arrays (also used by the car-removed cloud below)."""
    from infinicube_tpu.data_process.road_surface import (
        densify_polylines, estimate_road_surface)
    out = {}
    for kind in ("lane", "road_edge", "road_line"):
        polys = _read_polylines(root, clip, kind)
        pts = densify_polylines(polys, spacing) if polys else \
            np.zeros((0, 3), np.float32)
        pts = discretize_points(pts.astype(np.float32), spacing)
        out[kind] = pts
        with TarWriter(root / f"3d_{kind}_voxelsize_025" /
                       f"{clip}.tar") as w:
            w.add(f"{kind}.npy", encode_member("npy", pts))
    edge_polys = _read_polylines(root, clip, "road_edge")
    if len(out["lane"]) and edge_polys:
        surface = estimate_road_surface(edge_polys, lattice_spacing=0.4)
    else:
        surface = np.zeros((0, 3), np.float32)
    out["road_surface"] = surface.astype(np.float32)
    with TarWriter(root / "3d_road_surface_voxelsize_04" /
                   f"{clip}.tar") as w:
        w.add("road_surface.npy", encode_member("npy", out["road_surface"]))
    return out


def car_removed_cloud(points: np.ndarray, semantics: np.ndarray,
                      map_points: dict) -> tuple[np.ndarray, np.ndarray]:
    """Map-augmented car-removed scene cloud (reference :346-414): append
    road-line points as LANE_MARKER semantics, drop car/pedestrian points
    (CAD models re-add them in the dataloader)."""
    from infinicube_tpu.utils.semantic import WAYMO_CATEGORY_NAMES
    road_line = map_points.get("road_line", np.zeros((0, 3), np.float32))
    lane_marker = WAYMO_CATEGORY_NAMES.index("LANE_MARKER")
    pts = np.concatenate([points, road_line]).astype(np.float32)
    sem = np.concatenate([semantics,
                          np.full(len(road_line), lane_marker, np.int32)])
    pts, sem = remove_car_points(pts, sem)
    return pts, sem


def generate_voxel_buffers(root: Path, clip: str, poses: np.ndarray,
                           K: np.ndarray, hw: tuple[int, int],
                           points: np.ndarray, semantics: np.ndarray,
                           voxel_size: float = 0.2,
                           capacity: int = 1 << 20):
    """Voxel depth/semantic/instance buffer tars at 0.2 m (reference :417):
    voxelize the accumulated car-removed cloud and splat-render every frame.
    Writes voxel_depth_100 (uint16, x100), semantic_buffer and
    instance_buffer (uint16) tars."""
    from infinicube_tpu.grid.build import grid_from_points
    from infinicube_tpu.utils.buffers import generate_guidance_buffers
    from infinicube_tpu.grid.ops import majority_label

    pts = jnp.asarray(points, jnp.float32)[None]
    mask = jnp.ones(pts.shape[:2], bool)
    origin = jnp.asarray(points.mean(0) if len(points) else np.zeros(3),
                         jnp.float32)
    grid = grid_from_points(pts, mask, voxel_size, origin, capacity=capacity)
    vox_sem = majority_label(grid, pts, jnp.asarray(semantics, jnp.int32
                                                    )[None], mask, 23)
    cam = PinholeCamera.from_intrinsics_matrix(K, hw[1], hw[0])
    bufs = generate_guidance_buffers(
        grid, vox_sem[0], jnp.zeros_like(vox_sem[0]), cam,
        jnp.asarray(poses, jnp.float32))
    depth = np.asarray(bufs["depth"])
    sem = np.asarray(bufs["semantic"])
    inst = np.asarray(bufs["instance"])
    with TarWriter(root / "voxel_depth_100" / f"{clip}.tar") as wd, \
            TarWriter(root / "semantic_buffer" / f"{clip}.tar") as ws, \
            TarWriter(root / "instance_buffer" / f"{clip}.tar") as wi:
        for i in range(depth.shape[0]):
            key = f"{i:06d}.png"
            wd.add(key, encode_member(
                "png", np.clip(depth[i] * 100, 0, 65535).astype(np.uint16)))
            ws.add(key, encode_member(
                "png", sem[i].astype(np.uint16)))
            wi.add(key, encode_member(
                "png", inst[i].astype(np.uint16)))


def process_clip(root: Path, clip: str, camera: PinholeCamera | None = None,
                 write_buffers: bool = True, write_map_attrs: bool = True,
                 buffer_capacity: int = 1 << 20):
    """Generate the full per-clip attribute set (reference :65-417):
    skymask, lidar_depth, discretized map points + road surface,
    map-augmented car-removed cloud, and (write_buffers) the voxel
    depth/semantic/instance buffers."""
    readers = {a: TarReader(root / a / f"{clip}.tar")
               for a in ("pose", "intrinsic", "pc")
               if (root / a / f"{clip}.tar").exists()}
    img_reader = TarReader(root / "image" / f"{clip}.tar") \
        if (root / "image" / f"{clip}.tar").exists() else None
    frames = sorted({n.partition(".")[0] for n in readers["pose"].names()})
    out_sky = TarWriter(root / "skymask" / f"{clip}.tar")
    out_dep = TarWriter(root / "lidar_depth" / f"{clip}.tar")
    map_points = generate_discrete_map_points(root, clip) \
        if write_map_attrs else {}
    out_nocar = TarWriter(root / "pc_with_map_without_car" / f"{clip}.tar")
    all_pts, all_sem = [], []
    poses, K0 = [], None
    hw = None
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
            sem = np.asarray(pc.get("semantic",
                                    np.zeros(len(pc["xyz"]), np.int32)))
            pts_nc, sem_nc = car_removed_cloud(
                np.asarray(pc["xyz"], np.float32), sem.astype(np.int32),
                map_points)
            out_nocar.add(f"{key}.npz", encode_member(
                "npz", {"xyz": pts_nc, "semantic": sem_nc}))
            all_pts.append(pts_nc)
            all_sem.append(sem_nc)
            poses.append(pose)
            K0 = K if K0 is None else K0
            hw = (cam.h, cam.w)
    finally:
        out_sky.close()
        out_dep.close()
        out_nocar.close()
        for r in readers.values():
            r.close()
        if img_reader:
            img_reader.close()
    if write_buffers and all_pts and K0 is not None:
        generate_voxel_buffers(
            root, clip, np.stack(poses), K0, hw,
            np.concatenate(all_pts), np.concatenate(all_sem),
            capacity=buffer_capacity)


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
