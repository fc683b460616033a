import numpy as np
import pytest

from infinicube_tpu.data_process.captions import (
    DistributedProcessor, generate_captions, generate_metadata_csv)
from infinicube_tpu.data_process.generate_additional_attributes import (
    discretize_points, remove_car_points, sky_mask_fallback)
from infinicube_tpu.data_process.road_surface import estimate_road_surface
from infinicube_tpu.data_process.waymo2shards import (
    FrameRecord, FrameSource, classify_objects_dynamic, convert)
from infinicube_tpu.utils.model_merge import merge_gsm_params
from infinicube_tpu.utils.profiling import (
    AverageMeter, RunningAverageMeter, Timer, TimerCollection, profile_named)
from infinicube_tpu.visualize.render import (
    orbit_poses, render_voxel_points, transform_gaussians)
from infinicube_tpu.weights.convert import (
    convert_conv3d, convert_linear, convert_sparse_conv3d)


def test_profiling_utils():
    with profile_named("noop"):
        pass
    t = Timer()
    assert t.elapsed() >= 0
    tc = TimerCollection()
    with tc.time("a"):
        pass
    assert tc.report()["a"]["count"] == 1
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0
    r = RunningAverageMeter(0.5)
    r.update(2.0)
    r.update(4.0)
    assert 2.0 < r.val < 4.0


def test_weight_conversion_layouts():
    sd = {"lin.weight": np.ones((4, 3)), "lin.bias": np.zeros(4),
          "c3.weight": np.ones((8, 2, 3, 3, 3)),
          "sc.weight": np.arange(8 * 2 * 27).reshape(8, 2, 3, 3, 3)}
    l = convert_linear(sd, "lin")
    assert l["kernel"].shape == (3, 4)
    c = convert_conv3d(sd, "c3")
    assert c["kernel"].shape == (3, 3, 3, 2, 8)
    s = convert_sparse_conv3d(sd, "sc")
    assert s["kernel"].shape == (27, 2, 8)
    # tap order: row-major over the window
    w = np.asarray(sd["sc.weight"])
    np.testing.assert_array_equal(s["kernel"][5], w[:, :, 0, 1, 2].T)


def test_model_merge():
    dual = {"params": {"voxel_branch": {"w": np.zeros(2)},
                       "pixel_branch": {"w": np.zeros(2)},
                       "sky": {"w": np.zeros(2)},
                       "encoder": {"w": np.zeros(2)}}}
    vox = {"params": {"voxel_branch": {"w": np.ones(2)},
                      "sky": {"w": np.full(2, 3.0)},
                      "encoder": {"w": np.full(2, 4.0)}}}
    pix = {"params": {"pixel_branch": {"w": np.full(2, 2.0)}}}
    merged = merge_gsm_params(dual, vox, pix)
    np.testing.assert_array_equal(merged["params"]["voxel_branch"]["w"],
                                  np.ones(2))
    np.testing.assert_array_equal(merged["params"]["pixel_branch"]["w"],
                                  np.full(2, 2.0))
    np.testing.assert_array_equal(merged["params"]["sky"]["w"],
                                  np.full(2, 3.0))


def test_dataproc_helpers(tmp_path):
    assert sky_mask_fallback(np.array([[0.0, 5.0]]))[0].tolist() == [1, 0]
    pts = np.array([[0.0, 0, 0], [0.05, 0, 0], [1.0, 0, 0]])
    d = discretize_points(pts, 0.25)
    assert len(d) == 2
    p, s = remove_car_points(np.zeros((3, 3)), np.array([1, 18, 2]))
    assert len(p) == 1  # CAR(1) and TRUCK(2) removed, ROAD kept
    # road surface fill between two straight edges
    e1 = np.stack([np.linspace(0, 10, 6), np.zeros(6), np.zeros(6)], -1)
    e2 = np.stack([np.linspace(0, 10, 6), np.full(6, 4.0), np.full(6, 0.5)],
                  -1)
    surf = estimate_road_surface([e1, e2], lattice_spacing=0.5)
    assert len(surf) > 50
    assert surf[:, 2].min() >= -0.01 and surf[:, 2].max() <= 0.51


class FakeSource(FrameSource):
    def clips(self):
        return ["c0", "c1"]

    def frames(self, clip_id):
        for i in range(2):
            pose_static = np.eye(4)
            pose_moving = np.eye(4)
            pose_moving[:3, 3] = [i * 1.0, 0, 0]
            yield FrameRecord(
                index=i, cam_to_world_opencv=np.eye(4),
                intrinsic=np.eye(3), image=None,
                points=np.zeros((10, 3), np.float32),
                point_semantics=np.zeros(10, np.int32),
                objects={"a": {"pose": pose_static, "lwh": [4, 2, 1.5]},
                         "b": {"pose": pose_moving, "lwh": [4, 2, 1.5]}},
                map_points={"road_edge": np.zeros((5, 3), np.float32)})


def test_waymo_converter_and_dynamic_classification(tmp_path):
    src = FakeSource()
    frames = list(src.frames("c0"))
    dyn = classify_objects_dynamic(frames)
    assert dyn == {"b"}
    convert(src, tmp_path, node_rank=0, num_nodes=2)  # only c0
    assert (tmp_path / "pose" / "c0.tar").exists()
    assert not (tmp_path / "pose" / "c1.tar").exists()
    from infinicube_tpu.data.tario import TarReader
    from infinicube_tpu.data.codec import decode_member
    with TarReader(tmp_path / "dynamic_object_info" / "c0.tar") as r:
        info = decode_member("json", r.read("000000.json"))
    assert "b" in info and info["b"]["object_id_int"] >= 10000


def test_captions_and_metadata(tmp_path):
    caps = generate_captions(["a.mp4", "b.mp4"], tmp_path / "caps.json",
                             DistributedProcessor(0, 1))
    assert len(caps) == 2
    generate_metadata_csv(caps, tmp_path / "metadata.csv")
    text = (tmp_path / "metadata.csv").read_text()
    assert "file_name" in text and "a.mp4" in text


def test_visualize_offscreen():
    rng = np.random.default_rng(0)
    ijk = rng.integers(-20, 20, (200, 3))
    sem = rng.integers(0, 23, 200)
    pose = orbit_poses(np.zeros(3), 20.0, 10.0, 2)[0]
    img = render_voxel_points(ijk, sem, 0.5, 0.25, pose)
    assert img.shape == (480, 640, 3) and img.dtype == np.uint8
    # some voxels actually rendered (not all background)
    assert (img < 250).any()
    g = {"means": rng.normal(size=(5, 3)), "quats": np.tile([1.0, 0, 0, 0],
                                                            (5, 1)),
         "scales": np.full((5, 3), 0.1), "opacities": np.full(5, 0.5),
         "colors": rng.uniform(0, 1, (5, 3))}
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    g2 = transform_gaussians(g, T)
    np.testing.assert_allclose(g2["means"], g["means"] + [1, 2, 3])
