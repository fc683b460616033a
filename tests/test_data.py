import json
import numpy as np
import pytest

from infinicube_tpu.data.codec import (
    decode_member, decode_sample, encode_member, group_samples)
from infinicube_tpu.data.specs import DatasetSpec, list_collate, pad_collate
from infinicube_tpu.data.tario import TarReader, TarWriter, get_sample
from infinicube_tpu.data.waymo_dataset import (
    WaymoClipDataset, WaymoDatasetConfig)
from infinicube_tpu.utils.gaussian_io import (
    gaussians_to_dict, load_ply, load_splat, save_ply, save_splat)


def test_tar_roundtrip_native(tmp_path):
    p = tmp_path / "shard.tar"
    payloads = {"000000.npy": encode_member("npy", np.arange(5)),
                "000000.json": encode_member("json", {"a": 1}),
                "000001.npy": encode_member("npy", np.ones((2, 3)))}
    with TarWriter(p) as w:
        for k, v in payloads.items():
            w.add(k, v)
    with TarReader(p) as r:
        names = r.names()
        assert set(names) == set(payloads)
        for k, v in payloads.items():
            assert r.read(k) == v
        assert "000000.npy" in r and "zzz" not in r
    # stdlib tarfile can read what the native writer wrote
    import tarfile
    with tarfile.open(p) as tf:
        assert set(m.name for m in tf.getmembers()) == set(payloads)
    s = get_sample(p, "000000")
    assert set(s) == {"npy", "json"}


def test_codec_uint16_png_and_npz():
    depth = (np.random.default_rng(0).uniform(0, 600, (16, 24)) * 100)
    depth = depth.astype(np.uint16)
    data = encode_member("png", depth)
    back = decode_member("png", data)
    np.testing.assert_array_equal(np.asarray(back, np.uint16), depth)
    d = {"xyz": np.ones((4, 3), np.float32), "semantic": np.arange(4)}
    back = decode_member("npz", encode_member("npz", d))
    np.testing.assert_array_equal(back["xyz"], d["xyz"])
    groups = group_samples(["a.npy", "a.json", "b.npy"])
    assert set(groups) == {"a", "b"} and len(groups["a"]) == 2


def test_collate():
    s1 = {DatasetSpec.INPUT_PC: np.ones((5, 3)), DatasetSpec.CLASS: 1}
    s2 = {DatasetSpec.INPUT_PC: np.ones((3, 3)), DatasetSpec.CLASS: 2}
    lc = list_collate([s1, s2])
    assert len(lc[DatasetSpec.INPUT_PC]) == 2
    pc = pad_collate([s1, s2])
    assert pc["input_pc"].shape == (2, 5, 3)
    assert pc["input_pc_mask"].sum() == 8
    assert pc["class"] == [1, 2]


def make_clip(tmp_path, scene="clip0", frames=3):
    rng = np.random.default_rng(0)
    for attr in ("pose", "intrinsic", "pc", "map", "static_object_info"):
        with TarWriter(tmp_path / attr / f"{scene}.tar") as w:
            for f in range(frames):
                if attr == "pose":
                    T = np.eye(4)
                    # OpenCV camera: forward +z -> world +x
                    T[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]]).T
                    T[:3, 3] = [f * 2.0, 0, 1.5]
                    w.add(f"{f:06d}.npy", encode_member("npy", T))
                elif attr == "intrinsic":
                    w.add(f"{f:06d}.npy", encode_member(
                        "npy", np.array([[100.0, 0, 40], [0, 100, 30],
                                         [0, 0, 1]])))
                elif attr == "pc":
                    pts = rng.uniform(-20, 20, (500, 3))
                    w.add(f"{f:06d}.npz", encode_member(
                        "npz", {"xyz": pts.astype(np.float32),
                                "semantic": rng.integers(0, 23, 500)}))
                elif attr == "map":
                    w.add(f"{f:06d}.npz", encode_member(
                        "npz", {"road_edge": rng.uniform(-20, 20, (50, 3))
                                .astype(np.float32),
                                "road_line": np.zeros((0, 3), np.float32),
                                "road_surface": rng.uniform(-20, 20, (80, 3))
                                .astype(np.float32)}))
                else:
                    info = {"obj1": {
                        "object_to_world": np.eye(4).tolist(),
                        "object_lwh": [4.5, 2.0, 1.6],
                        "object_is_moving": False,
                        "object_id_int": 1}}
                    w.add(f"{f:06d}.json", encode_member("json", info))


def test_waymo_dataset_iteration(tmp_path):
    make_clip(tmp_path)
    cfg = WaymoDatasetConfig(root=str(tmp_path), frame_start=0, frame_end=2,
                             samples_per_shard=2)
    ds = WaymoClipDataset(cfg, host_index=0, num_hosts=1)
    samples = list(ds)
    assert len(samples) == 2
    s = samples[0]
    pc = s[DatasetSpec.INPUT_PC]
    assert pc.ndim == 2 and pc.shape[1] == 3
    lo, hi = s[DatasetSpec.GRID_CROP_RANGE]
    assert (pc >= lo - 1e-4).all() and (pc <= hi + 1e-4).all()
    assert set(s[DatasetSpec.MAPS_3D]) == {"road_edge", "road_line",
                                           "road_surface"}
    assert s[DatasetSpec.BOXES_3D]["poses"].shape[-2:] == (4, 4)
    # host sharding splits scenes
    ds0 = WaymoClipDataset(cfg, host_index=0, num_hosts=2)
    ds1 = WaymoClipDataset(cfg, host_index=1, num_hosts=2)
    assert len(ds0.scenes) + len(ds1.scenes) == 1


def test_waymo_split_list_and_val_semantics(tmp_path):
    """Train/val split parity with the reference's assets/waymo_split/*.json
    workflow (waymo_wds.py:95,107-116,444): a JSON clip-name list restricts
    the dataset; split='train' shuffles clip order with the seed and draws
    samples_per_shard random starts; split='val' is deterministic — one
    sample per clip at val_starting_frame, list order preserved."""
    import json as _json
    for scene in ("clipA", "clipB", "clipC"):
        make_clip(tmp_path, scene=scene, frames=4)
    split = tmp_path / "official_val_static_scene.json"
    split.write_text(_json.dumps(["clipC", "clipA"]))

    base = dict(root=str(tmp_path), scene_list_file=str(split),
                frame_start=0, frame_end=4, samples_per_shard=3)
    val = WaymoClipDataset(WaymoDatasetConfig(
        **base, split="val", val_starting_frame=1))
    # list order preserved, non-listed clipB excluded
    assert val.scenes == ["clipC", "clipA"]
    vs = list(val)
    assert len(vs) == 2  # ONE deterministic sample per clip
    vs2 = list(WaymoClipDataset(WaymoDatasetConfig(
        **base, split="val", val_starting_frame=1)))
    np.testing.assert_array_equal(vs[0][DatasetSpec.INPUT_PC],
                                  vs2[0][DatasetSpec.INPUT_PC])

    tr = WaymoClipDataset(WaymoDatasetConfig(**base, split="train", seed=3))
    assert sorted(tr.scenes) == ["clipA", "clipC"]  # shuffled, same set
    assert len(list(tr)) == 6  # samples_per_shard per clip
    # the seed keys the clip-order shuffle deterministically
    tr2 = WaymoClipDataset(WaymoDatasetConfig(**base, split="train", seed=3))
    assert tr.scenes == tr2.scenes


def test_gaussian_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 20
    g = gaussians_to_dict(rng.normal(size=(n, 3)),
                          rng.uniform(0.01, 0.5, (n, 3)),
                          rng.normal(size=(n, 4)),
                          rng.uniform(0.1, 0.9, n),
                          rng.uniform(0, 1, (n, 3)))
    save_splat(tmp_path / "g.splat", g)
    back = load_splat(tmp_path / "g.splat")
    np.testing.assert_allclose(back["means"], g["means"], atol=1e-6)
    np.testing.assert_allclose(back["opacities"], g["opacities"], atol=0.01)
    save_ply(tmp_path / "g.ply", g)
    back = load_ply(tmp_path / "g.ply")
    np.testing.assert_allclose(back["means"], g["means"], atol=1e-5)
    np.testing.assert_allclose(back["scales"], g["scales"], rtol=1e-4)
    np.testing.assert_allclose(back["opacities"], g["opacities"], atol=1e-4)
    np.testing.assert_allclose(back["colors"], g["colors"], atol=1e-4)


def test_tario_rejects_truncated_and_malformed_members(tmp_path):
    """A member whose declared size runs past EOF, or whose size field is
    not octal/base-256, must not be served (no out-of-bounds reads from the
    native mmap path; same behavior in the tarfile fallback)."""
    import struct

    def header(name, size_field, typeflag=b"0"):
        hdr = bytearray(512)
        hdr[0:len(name)] = name
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = size_field
        hdr[136:148] = b"00000000000\x00"
        hdr[156:157] = typeflag
        hdr[257:262] = b"ustar"
        hdr[148:156] = b"        "
        chk = sum(hdr)
        hdr[148:156] = ("%06o" % chk).encode() + b"\x00 "
        return bytes(hdr)

    # truncated: claims 1 MiB payload, file ends after 10 bytes
    p = tmp_path / "trunc.tar"
    p.write_bytes(header(b"big.bin", b"00004000000\x00") + b"0123456789")
    with TarReader(p) as r:
        assert "big.bin" not in r.names()

    # malformed size field (non-octal garbage)
    p2 = tmp_path / "garbage.tar"
    p2.write_bytes(header(b"bad.bin", b"zzzzzzzzzzz\x00") + b"\x00" * 1024)
    with TarReader(p2) as r:
        assert "bad.bin" not in r.names()

    # healthy member after rebuild still reads fine
    p3 = tmp_path / "ok.tar"
    payload = b"hello world!"
    with TarWriter(p3) as w:
        w.add("ok.txt", payload)
    with TarReader(p3) as r:
        assert r.read("ok.txt") == payload


def make_clip_full(tmp_path, scene="clipX", frames=3):
    """Clip with dynamic objects, canonical points, images, skymask, depth."""
    rng = np.random.default_rng(1)
    make_clip(tmp_path, scene, frames)
    car_id = 1  # WAYMO CAR
    with TarWriter(tmp_path / "dynamic_object_info" / f"{scene}.tar") as w:
        for f in range(frames):
            info = {"dyn1": {
                "object_to_world": [[1, 0, 0, 5.0 + f], [0, 1, 0, 2.0],
                                    [0, 0, 1, 1.0], [0, 0, 0, 1]],
                "object_lwh": [4.0, 2.0, 1.5],
                "object_is_moving": True, "object_id_int": 10000}}
            w.add(f"{f:06d}.json", encode_member("json", info))
    with TarWriter(tmp_path / "dynamic_object_points_canonical" /
                   f"{scene}.tar") as w:
        pts = rng.uniform(-0.5, 0.5, (200, 3)) * [4.0, 2.0, 1.5]
        w.add("points.npz", encode_member(
            "npz", {"dyn1_xyz": pts.astype(np.float32),
                    "dyn1_semantic": np.int32(car_id)}))
    for attr, enc in (("image", "png"), ("skymask", "png"),
                      ("lidar_depth", "png")):
        with TarWriter(tmp_path / attr / f"{scene}.tar") as w:
            for f in range(frames):
                if attr == "image":
                    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
                elif attr == "skymask":
                    img = np.zeros((60, 80), np.uint8)
                    img[:10] = 1  # sky band at top
                else:
                    img = (rng.uniform(0, 500, (60, 80)) * 100).astype(
                        np.uint16)
                w.add(f"{f:06d}.{enc}", encode_member(enc, img))


def test_waymo_transform_depth(tmp_path):
    make_clip_full(tmp_path)
    cfg = WaymoDatasetConfig(root=str(tmp_path), frame_start=0, frame_end=2,
                             samples_per_shard=1, seed=3)
    s = next(iter(WaymoClipDataset(cfg)))
    # crop frame is RE-CENTERED: crop range symmetric about origin
    cr = s[DatasetSpec.GRID_CROP_RANGE]
    np.testing.assert_allclose(cr[0], -cr[1])
    # grid_to_first_camera_flu carries the center offset (not identity)
    g2c = s[DatasetSpec.GRID_TO_FIRST_CAMERA_FLU]
    assert abs(g2c[2, 3] - ((-6.4 + 19.2) / 2)) < 1e-5
    # dynamic merge added CAR-semantic points near the posed box
    assert (s[DatasetSpec.GT_SEMANTIC] == 1).sum() > 50
    # boxes: static + dynamic with healthy filtering
    assert s[DatasetSpec.BOXES_3D]["poses"].shape[0] == 2
    # 4-channel mask: ch0 sky zeroed, ch1/2 ones
    m = s[DatasetSpec.IMAGES_INPUT_MASK]
    assert m.shape[-1] == 4
    assert m[0, :10, :, 0].max() == 0.0 and m[0, 20:, :, 0].min() == 1.0
    assert m[..., 1].min() == 1.0 and m[..., 2].min() == 1.0
    # depth loaded and scaled /100
    d = s[DatasetSpec.IMAGES_INPUT_DEPTH]
    assert d.shape == (1, 60, 80, 1) and 0 <= float(d.max()) <= 660


def test_waymo_cad_replacement(tmp_path):
    make_clip_full(tmp_path, scene="clipC")
    cfg = WaymoDatasetConfig(root=str(tmp_path), frame_start=0, frame_end=2,
                             samples_per_shard=1, seed=3,
                             replace_all_car_with_cad=True)
    s = next(iter(WaymoClipDataset(cfg)))
    # CAD stamping: CAR-semantic points present at both object boxes
    pts = s[DatasetSpec.INPUT_PC]
    sem = s[DatasetSpec.GT_SEMANTIC]
    car_pts = pts[sem == 1]
    assert len(car_pts) > 100
    # stamped cars sit near the two box centers (crop frame ~ camera FLU
    # recentered); dyn1 at world x=5+f -> crop coords inside the crop
    assert np.abs(car_pts).max() < 26.0


def test_healthy_box_filter():
    from infinicube_tpu.data.waymo_dataset import healthy_boxes
    half = np.array([25.6, 25.6, 12.8])
    poses = np.stack([np.eye(4)] * 4)
    poses[1, :3, 3] = [100, 0, 0]          # far outside crop
    poses[2] = np.nan                       # broken pose
    lwhs = np.array([[4, 2, 1.5], [4, 2, 1.5], [4, 2, 1.5], [0, 2, 1.5]])
    ok = healthy_boxes(poses, lwhs, half)
    np.testing.assert_array_equal(ok, [True, False, False, False])


def test_multiview_converter_and_dataset(tmp_path):
    """convert_clip writes per-view pose/intrinsic/image members; the
    dataset's views config consumes them with side-view padding."""
    from infinicube_tpu.data_process.waymo2shards import (
        FrameRecord, convert_clip)
    from infinicube_tpu.data.tario import TarReader

    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, 40], [0, 60, 30], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]]).T
    T[:3, 3] = [0, 0, 1.5]
    frames = []
    for f in range(2):
        cams = {}
        for view, h in (("front", 60), ("front_left", 60),
                        ("side_left", 40)):  # side views are shorter
            cams[view] = {
                "pose": T, "intrinsic": K,
                "image": rng.integers(0, 255, (h, 80, 3)).astype(np.uint8)}
        frames.append(FrameRecord(
            index=f, cam_to_world_opencv=T, intrinsic=K,
            image=cams["front"]["image"],
            points=rng.uniform(-20, 20, (400, 3)).astype(np.float32),
            point_semantics=np.zeros(400, np.int32),
            objects={}, map_points={}, map_polylines={}, cameras=cams))

    class Src:
        def clips(self):
            return ["mv0"]

        def frames(self, cid):
            return frames

    convert_clip(Src(), "mv0", tmp_path)
    with TarReader(tmp_path / "pose" / "mv0.tar") as r:
        names = set(r.names())
    assert "000000.npy" in names                       # legacy front
    assert "000000.front_left.npy" in names
    assert "000000.side_left.npy" in names

    from infinicube_tpu.data.waymo_dataset import (
        WaymoClipDataset, WaymoDatasetConfig)
    cfg = WaymoDatasetConfig(root=str(tmp_path), frame_start=0, frame_end=1,
                             samples_per_shard=1,
                             views=("front", "front_left", "side_left"))
    s = next(iter(WaymoClipDataset(cfg)))
    imgs = s[DatasetSpec.IMAGES_INPUT]
    masks = s[DatasetSpec.IMAGES_INPUT_MASK]
    assert imgs.shape == (3, 60, 80, 3)                # side view padded
    assert masks[2, 40:, :, 2].max() == 0.0            # padding mask ch2
    assert masks[0, :, :, 2].min() == 1.0


def test_split_caption_metadata_workflow(tmp_path):
    """The reference's split -> caption -> metadata workflow end-to-end on
    the sample data shape (assets/waymo_split/*.json via
    WaymoDatasetConfig.scene_list_file -> generate_captions ->
    generate_metadata_csv, mirroring
    /root/reference/infinicube/data_process/generate_caption.py and
    generate_metadata_csv.py), using the IN-TREE demo split assets."""
    import csv
    from pathlib import Path

    from infinicube_tpu.data_process.captions import (
        DistributedProcessor, generate_captions, generate_metadata_csv,
        register_captioner)

    split_dir = (Path(__file__).parent.parent / "infinicube_tpu" / "assets"
                 / "waymo_split")
    train_list = json.loads(
        (split_dir / "demo_train_static_scene.json").read_text())
    val_list = json.loads(
        (split_dir / "demo_val_static_scene.json").read_text())
    assert train_list and val_list and not set(train_list) & set(val_list)

    for scene in train_list + val_list:
        make_clip(tmp_path, scene=scene, frames=3)

    # the split list restricts the dataset to its clips, order preserved
    ds = WaymoClipDataset(WaymoDatasetConfig(
        root=str(tmp_path),
        scene_list_file=str(split_dir / "demo_val_static_scene.json"),
        frame_start=0, frame_end=3, split="val"))
    assert ds.scenes == val_list
    assert len(list(ds)) == len(val_list)

    # caption each TRAIN clip's video and emit the DiffSynth metadata.csv
    register_captioner(None)  # template captioner (VLM is weight-gated)
    videos = [tmp_path / "video" / f"{s}.mp4" for s in train_list]
    caps = generate_captions(videos, tmp_path / "captions.json",
                             DistributedProcessor())
    generate_metadata_csv(caps, tmp_path / "metadata.csv")
    with open(tmp_path / "metadata.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["file_name", "text"]
    assert sorted(r[0] for r in rows[1:]) == \
        sorted(f"{s}.mp4" for s in train_list)
    assert all(r[1] for r in rows[1:])
