"""Stage-2 CLI: render guidance buffers from a voxel world, then (optionally)
drive the Wan video model.

Mirror of the reference's guidance_buffer_generation
(/root/reference/infinicube/inference/guidance_buffer_generation.py:591-1143):
load the stage-1 voxel world, build the camera trajectory (resampled by
frame/meter offset or interpolated from recorded keyframes), render
depth/semantic/instance buffers + the coordinate buffer, write tars
(depth x100 uint16 png, instance uint16 png, pose npy, intrinsic npy,
dynamic_object_info json) and preview mp4s, then call the video generator on
the first ``max_frames`` (93) frames.

Usage:
  python -m infinicube_tpu.inference.guidance_buffer_generation \
      --voxel_world out/world.npz --output out/buffers --num_frames 93
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera.conventions import flu_to_opencv, opencv_to_flu
from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.data.codec import encode_member
from infinicube_tpu.data.tario import TarWriter
from infinicube_tpu.grid.build import grid_from_ijk
from infinicube_tpu.utils.buffers import (
    DynamicObjects, generate_coordinate_buffer, generate_guidance_buffers)
from infinicube_tpu.utils.semantic import generate_rgb_semantic_buffer
from infinicube_tpu.utils.world_grid import WorldGrid


DEFAULT_CAMERA = PinholeCamera(fx=480.0, fy=480.0, cx=416.0, cy=240.0,
                               w=832, h=480)  # 480p (reference 480x832)


def load_voxel_world(path: str | Path) -> WorldGrid:
    """Load a stage-1 world (.npz with ijk/semantics/voxel_size/origin)."""
    d = np.load(path)
    w = WorldGrid(d["voxel_size"], d.get("origin"))
    w.merge_ijk(d["ijk"].astype(np.int64), d["semantics"].astype(np.int32))
    return w


def save_voxel_world(path: str | Path, world: WorldGrid):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, ijk=world.ijk(), semantics=world.semantics,
                        voxel_size=world.voxel_size, origin=world.origin)


def resample_trajectory(poses: np.ndarray, num_frames: int,
                        frame_offset: int = 0, meter_offset: float = 0.0
                        ) -> np.ndarray:
    """Key-pose selection by frame/meter offset + interpolation to
    num_frames (reference :840-854 + interpolate to N)."""
    from infinicube_tpu.utils.interpolate import inter_poses
    poses = np.asarray(poses)[frame_offset:]
    if meter_offset > 0:
        d = np.concatenate([[0], np.cumsum(np.linalg.norm(
            np.diff(poses[:, :3, 3], axis=0), axis=-1))])
        poses = poses[d >= meter_offset]
    return inter_poses(poses, num_frames, smoothness=1.0)


def stamp_static_instances(world: WorldGrid,
                           static_object_info: dict,
                           enlarge: float = 1.2) -> np.ndarray:
    """Instance ids for the world's car-like voxels from parked-object boxes
    (reference get_instance_id_for_fvdb_scene_points, fvdb_utils.py:299-385).
    static_object_info: {gid: {object_to_world, object_lwh, object_id_int}}."""
    from infinicube_tpu.utils.bbox import assign_instance_ids
    from infinicube_tpu.utils.semantic import CAR_LIKE_IDS
    objs = list(static_object_info.values())
    if not objs:
        return np.zeros(world.num_voxels, np.int32)
    poses = np.asarray([o["object_to_world"] for o in objs], np.float64)
    lwhs = np.asarray([o["object_lwh"] for o in objs], np.float64)
    ids = np.asarray([o["object_id_int"] for o in objs], np.int64)
    return assign_instance_ids(world.points(), world.semantics, poses, lwhs,
                               ids, CAR_LIKE_IDS, enlarge).astype(np.int32)


def generate_buffers_for_world(world: WorldGrid, cam_to_worlds_flu: np.ndarray,
                               camera: PinholeCamera = DEFAULT_CAMERA,
                               objects: DynamicObjects | None = None,
                               instance_ids: np.ndarray | None = None,
                               device_capacity: int = 2_000_000):
    """Render all buffers. cam_to_worlds_flu [T, 4, 4] FLU camera poses in
    the world frame; converted to OpenCV for ray generation.
    instance_ids: optional per-voxel ids aligned with world.ijk() (from
    stamp_static_instances)."""
    ijk = world.ijk()
    sem = world.semantics
    inst = instance_ids if instance_ids is not None else \
        np.zeros(len(ijk), np.int32)
    if len(ijk) > device_capacity:
        sel = np.linspace(0, len(ijk) - 1, device_capacity).astype(int)
        ijk, sem, inst = ijk[sel], sem[sel], inst[sel]
    cap = 1 << int(np.ceil(np.log2(max(len(ijk), 2))))
    grid = grid_from_ijk(jnp.asarray(ijk, jnp.int32)[None],
                         jnp.ones((1, len(ijk)), bool),
                         jnp.asarray(world.voxel_size, jnp.float32),
                         jnp.asarray(world.origin, jnp.float32), capacity=cap)
    # grid slots are sorted lexicographically by (i, j, k); align attributes
    order = np.lexsort((ijk[:, 2], ijk[:, 1], ijk[:, 0]))
    sem_dev = jnp.zeros((cap,), jnp.int32).at[:len(ijk)].set(
        jnp.asarray(sem[order], jnp.int32))
    inst_dev = jnp.zeros((cap,), jnp.int32).at[:len(ijk)].set(
        jnp.asarray(inst[order], jnp.int32))
    poses_cv = np.stack([flu_to_opencv(p) for p in cam_to_worlds_flu])
    return generate_guidance_buffers(
        grid, sem_dev, inst_dev, camera, jnp.asarray(poses_cv, jnp.float32),
        objects=objects)


def write_buffer_tars(output: Path, buffers: dict, poses_flu: np.ndarray,
                      camera: PinholeCamera,
                      dynamic_object_info: dict | None = None):
    """Write the reference's on-disk buffer format (:645-737)."""
    output.mkdir(parents=True, exist_ok=True)
    depth = np.asarray(buffers["depth"])
    sem = np.asarray(buffers["semantic"])
    inst = np.asarray(buffers["instance"])
    T = depth.shape[0]
    with TarWriter(output / "depth.tar") as wd, \
            TarWriter(output / "instance.tar") as wi, \
            TarWriter(output / "semantic.tar") as ws, \
            TarWriter(output / "pose.tar") as wp, \
            TarWriter(output / "intrinsic.tar") as wk, \
            TarWriter(output / "dynamic_object_info.tar") as wo:
        K = np.asarray(camera.intrinsics_matrix())
        for t in range(T):
            wd.add(f"{t:06d}.png", encode_member(
                "png", np.clip(depth[t] * 100.0, 0, 65535).astype(np.uint16)))
            wi.add(f"{t:06d}.png", encode_member(
                "png", inst[t].astype(np.uint16)))
            ws.add(f"{t:06d}.png", encode_member(
                "png", sem[t].astype(np.uint8)))
            wp.add(f"{t:06d}.npy", encode_member(
                "npy", flu_to_opencv(poses_flu[t]).astype(np.float32)))
            wk.add(f"{t:06d}.npy", encode_member("npy", K.astype(np.float32)))
            info = (dynamic_object_info or {}).get(t, {})
            wo.add(f"{t:06d}.dynamic_object_info.json",
                   encode_member("json", info))


def write_preview_videos(output: Path, buffers: dict):
    from infinicube_tpu.utils.fileio import write_video
    from infinicube_tpu.utils.depth_vis import vis_depth
    sem_rgb = generate_rgb_semantic_buffer(np.asarray(buffers["semantic"]),
                                           np.asarray(buffers["instance"]))
    write_video(output / "semantic.mp4", (sem_rgb * 255).astype(np.uint8))
    dep = np.stack([vis_depth(d) for d in np.asarray(buffers["depth"])])
    write_video(output / "depth.mp4", dep)
    coord = (np.asarray(buffers["coordinate"]) * 255).astype(np.uint8)
    write_video(output / "coordinate.mp4", coord)
    return sem_rgb, coord


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--voxel_world", required=True)
    ap.add_argument("--static_objects", default=None,
                    help="json {gid: {object_to_world, object_lwh, "
                         "object_id_int}} for parked-car instance ids")
    ap.add_argument("--poses", default=None,
                    help="npy [T,4,4] FLU poses; default: straight-line")
    ap.add_argument("--keyframes", default=None,
                    help="npy [K,4,4] keyframe poses -> smooth trajectory "
                         "(the reference's viser-recorded capture; "
                         "visualize.recorder.TrajectoryRecorder)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--num_frames", type=int, default=93)
    ap.add_argument("--frame_offset", type=int, default=0)
    ap.add_argument("--meter_offset", type=float, default=0.0)
    ap.add_argument("--run_video", action="store_true")
    ap.add_argument("--ckpt", default=None,
                    help="converter-written checkpoint dir (python -m "
                         "infinicube_tpu.convert) holding real Wan weights; "
                         "default: random-init pipeline")
    ap.add_argument("--prompt", default="a realistic driving scene")
    args = ap.parse_args(argv)

    world = load_voxel_world(args.voxel_world)
    if args.keyframes:
        from infinicube_tpu.visualize.recorder import TrajectoryRecorder
        rec = TrajectoryRecorder()
        for T in np.load(args.keyframes):
            rec.add_keyframe(pose=T)
        poses = rec.interpolate(args.num_frames)
    elif args.poses:
        poses = np.load(args.poses)
    else:
        poses = np.tile(np.eye(4), (args.num_frames, 1, 1))
        poses[:, 0, 3] = np.linspace(0, 40, args.num_frames)
        poses[:, 2, 3] = 1.8
    poses = resample_trajectory(poses, args.num_frames, args.frame_offset,
                                args.meter_offset)
    out = Path(args.output)
    inst = None
    if args.static_objects:
        import json
        inst = stamp_static_instances(
            world, json.loads(Path(args.static_objects).read_text()))
    buffers = generate_buffers_for_world(world, poses, instance_ids=inst)
    write_buffer_tars(out, buffers, poses, DEFAULT_CAMERA)
    sem_rgb, coord = write_preview_videos(out, buffers)

    if args.run_video:
        from infinicube_tpu.models.wan.pipeline import (
            WanPipelineConfig, WanVideoGenerator)
        import jax
        if args.ckpt:
            gen = WanVideoGenerator.from_checkpoint(args.ckpt)
        else:
            gen = WanVideoGenerator(WanPipelineConfig())
            gen.params = gen.init_params(jax.random.PRNGKey(0))
        frames = gen.generate((sem_rgb[:93] * 255).astype(np.uint8),
                              coord[:93], args.prompt)
        from infinicube_tpu.utils.fileio import write_video
        write_video(out / "video.mp4", frames)
    print(f"buffers written to {out}")


if __name__ == "__main__":
    main()
