"""Visualization console tools: vis-grid / vis-compare / vis-wds /
vis-dynamic.

Mirror of the reference's console scripts (pyproject.toml:26-30 +
/root/reference/infinicube/visualize/): viser interactive viewers when viser
is installed, offscreen orbit renders otherwise."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from infinicube_tpu.visualize.render import (
    HAS_VISER, orbit_poses, render_gaussian_scene, render_voxel_points,
    transform_gaussians)


def _load_grid(path):
    d = np.load(path)
    return d["ijk"], d["semantics"], d["voxel_size"], d.get("origin",
                                                            d["voxel_size"] / 2)


def _grid_orbit_images(path, n=4):
    ijk, sem, vs, org = _load_grid(path)
    pts = ijk * vs + org
    center = pts.mean(0)
    radius = max(np.abs(pts - center).max() * 1.5, 5.0)
    return [render_voxel_points(ijk, sem, vs, org, pose)
            for pose in orbit_poses(center, radius, radius * 0.6, n)]


def vis_grid(argv=None):
    """vis-grid: view one grid npz (reference visualize_grid.py:30-130)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("grid")
    ap.add_argument("--output", default="visualization/grid")
    ap.add_argument("--views", type=int, default=4)
    args = ap.parse_args(argv)
    if HAS_VISER:  # pragma: no cover
        _serve_viser_points(*_load_grid(args.grid))
        return
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image
    for i, img in enumerate(_grid_orbit_images(args.grid, args.views)):
        Image.fromarray(img).save(out / f"view_{i:02d}.png")
    print(f"renders -> {out}")


def vis_compare(argv=None):
    """vis-compare: GT vs prediction(s) side by side
    (reference visualize_grid_compare.py)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("grids", nargs="+")
    ap.add_argument("--output", default="visualization/compare")
    args = ap.parse_args(argv)
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    from PIL import Image
    rows = [np.concatenate(_grid_orbit_images(g, 2), axis=1)
            for g in args.grids]
    Image.fromarray(np.concatenate(rows, axis=0)).save(out / "compare.png")
    print(f"comparison -> {out / 'compare.png'}")


def vis_wds(argv=None):
    """vis-wds: point cloud + static(green)/dynamic(red) boxes
    (reference webdataset_data.py)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("clip")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--output", default="visualization/wds")
    args = ap.parse_args(argv)
    from infinicube_tpu.data.codec import decode_member
    from infinicube_tpu.data.tario import TarReader
    from infinicube_tpu.utils.bbox import corners_from_lwh_pose
    root = Path(args.root)
    with TarReader(root / "pc" / f"{args.clip}.tar") as r:
        pc = decode_member("npz", r.read(f"{args.frame:06d}.npz"))
    pts, sem = pc["xyz"], pc.get("semantic", np.zeros(len(pc["xyz"])))
    center = pts.mean(0)
    pose = orbit_poses(center, 40.0, 25.0, 1)[0]
    img = render_voxel_points(pts / 0.2, sem, 0.2, 0.0, pose)
    from PIL import Image
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    Image.fromarray(img).save(out / f"{args.clip}_{args.frame:06d}.png")
    print(f"render -> {out}")


def vis_dynamic(argv=None):
    """vis-dynamic: animated static + per-object gaussians + fly-through
    video (reference visualize_dynamic_gaussians.py:47-284)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("static_pkl")
    ap.add_argument("--objects_pkl", default=None)
    ap.add_argument("--object_tracks", default=None,
                    help="npz gid -> [T,4,4] object poses")
    ap.add_argument("--output", default="visualization/dynamic.mp4")
    ap.add_argument("--frames", type=int, default=24)
    args = ap.parse_args(argv)
    from infinicube_tpu.utils.gaussian_io import load_pkl
    static = load_pkl(args.static_pkl)
    objects = load_pkl(args.objects_pkl) if args.objects_pkl else {}
    tracks = dict(np.load(args.object_tracks)) if args.object_tracks else {}
    center = static["means"].mean(0)
    radius = max(np.abs(static["means"] - center).max(), 10.0)
    frames = []
    poses = orbit_poses(center, radius, radius * 0.5, args.frames)
    for t, pose in enumerate(poses):
        g = static
        for gid, od in objects.items():
            tr = tracks.get(str(gid))
            od_t = transform_gaussians(od, tr[t % len(tr)]) if tr is not None \
                else od
            g = {k: np.concatenate([g[k], od_t[k]]) for k in g}
        frames.append(render_gaussian_scene(g, pose))
    from infinicube_tpu.utils.fileio import write_video
    write_video(args.output, np.stack(frames))
    print(f"video -> {args.output}")


def _serve_viser_points(ijk, sem, vs, org):  # pragma: no cover
    import viser
    from infinicube_tpu.utils.semantic import semantic_to_color
    server = viser.ViserServer()
    pts = ijk * vs + org
    server.scene.add_point_cloud("grid", points=pts.astype(np.float32),
                                 colors=semantic_to_color(sem),
                                 point_size=float(np.mean(vs)))
    print("viser running; ctrl-c to exit")
    import time
    while True:
        time.sleep(1)
