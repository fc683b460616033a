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


def test_qwen2vl_captioner_hook(tmp_path, monkeypatch):
    """The VLM caption hook (reference: Qwen2-VL under torchrun,
    generate_caption.py:110-333) — exercised via the injection seam (no VLM
    weights in this image): frame sampling, chat template, generate, and
    prompt-token stripping."""
    import numpy as np
    import infinicube_tpu.utils.fileio as fileio
    from infinicube_tpu.data_process.captions import (
        caption_video, make_qwen2vl_captioner, register_captioner)

    vid = tmp_path / "clip.mp4"
    # decouple from the environment's video codecs
    monkeypatch.setattr(fileio, "read_video",
                        lambda p: np.zeros((6, 16, 16, 3), np.uint8))

    class FakeTensorDict(dict):
        pass

    class FakeProcessor:
        def apply_chat_template(self, messages, tokenize, add_generation_prompt):
            assert messages[0]["content"][0]["type"] == "video"
            return "PROMPT"

        def __call__(self, text, videos, return_tensors):
            assert len(videos[0]) == 4   # num_frames sampling
            import torch
            return FakeTensorDict(input_ids=torch.ones((1, 3),
                                                       dtype=torch.long))

        def batch_decode(self, ids, skip_special_tokens):
            assert ids.shape[1] == 2     # prompt tokens stripped
            return ["a foggy highway at dusk"]

    class FakeModel:
        def generate(self, input_ids=None, max_new_tokens=None, **kw):
            import torch
            return torch.ones((1, input_ids.shape[1] + 2), dtype=torch.long)

    cap = make_qwen2vl_captioner("unused", num_frames=4,
                                 model=FakeModel(), processor=FakeProcessor())
    register_captioner(cap)
    try:
        assert caption_video(vid) == "a foggy highway at dusk"
    finally:
        register_captioner(None)


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


def test_range_image_round_trip():
    """Synthesize a range image from known spherical coordinates and verify
    range_image_to_points inverts it (the core waymo frame_utils math)."""
    from infinicube_tpu.data_process.waymo2shards import (
        range_image_polar_angles, range_image_to_points)

    H, W = 8, 16
    extrinsic = np.eye(4)
    extrinsic[:3, 3] = [1.0, -2.0, 3.0]
    incl_calib = np.linspace(-0.3, 0.1, H)  # bottom-to-top
    rng = np.random.default_rng(0)
    r = rng.uniform(2.0, 50.0, (H, W)).astype(np.float32)
    r[0, 0] = 0.0  # one no-return pixel

    pts, valid = range_image_to_points(r, extrinsic, incl_calib)
    assert pts.shape == (H * W - 1, 3)
    # reconstruct expected from polar angles directly
    incl, az = range_image_polar_angles(H, W, extrinsic, incl_calib)
    exp = np.stack([
        r * np.cos(incl[:, None]) * np.cos(az[None]),
        r * np.cos(incl[:, None]) * np.sin(az[None]),
        r * np.sin(incl[:, None]),
    ], -1) + extrinsic[:3, 3]
    np.testing.assert_allclose(pts, exp[valid], atol=1e-4)
    # ranges recoverable: |p - sensor origin| == r
    np.testing.assert_allclose(np.linalg.norm(pts - extrinsic[:3, 3], axis=-1),
                               r[valid], rtol=1e-5)


def test_range_image_pixel_pose_identity():
    """When every pixel pose equals the frame pose, per-pixel correction is
    a no-op (points come back in the same vehicle frame)."""
    from infinicube_tpu.data_process.waymo2shards import (
        range_image_to_points, rpy_to_matrix)

    H, W = 4, 8
    extrinsic = np.eye(4)
    incl = np.linspace(-0.2, 0.2, H)
    r = np.full((H, W), 10.0, np.float32)
    yaw = 0.7
    frame_pose = np.eye(4)
    frame_pose[:3, :3] = rpy_to_matrix(np.array([0.0, 0.0, yaw]))
    frame_pose[:3, 3] = [5.0, 6.0, 0.0]
    pp = np.zeros((H, W, 6))
    pp[..., 2] = yaw
    pp[..., 3:] = frame_pose[:3, 3]
    base, _ = range_image_to_points(r, extrinsic, incl)
    corrected, _ = range_image_to_points(r, extrinsic, incl,
                                         pixel_pose=pp, frame_pose=frame_pose)
    np.testing.assert_allclose(corrected, base, atol=1e-4)


def test_waymo_box_pose():
    from infinicube_tpu.data_process.waymo2shards import waymo_box_to_pose_lwh

    v2w = np.eye(4)
    v2w[:3, 3] = [100.0, 50.0, 2.0]
    pose, lwh = waymo_box_to_pose_lwh(
        np.array([10.0, 0.0, 1.0]), np.pi / 2, np.array([4.0, 2.0, 1.5]), v2w)
    np.testing.assert_allclose(pose[:3, 3], [110.0, 50.0, 3.0], atol=1e-9)
    # heading pi/2: box x-axis points along vehicle +y
    np.testing.assert_allclose(pose[:3, 0], [0.0, 1.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(lwh, [4.0, 2.0, 1.5])


def test_attribute_generator_full_set(tmp_path):
    """process_clip must produce the complete reference attribute set
    (skymask, lidar_depth, discretized map + road surface, car-removed
    cloud, voxel buffers) from a synthetic converted clip (reference
    generate_additional_attributes.py:65-417)."""
    from infinicube_tpu.data_process.generate_additional_attributes import (
        process_clip)
    from infinicube_tpu.data.tario import TarReader
    from infinicube_tpu.data.codec import decode_member

    class MapSource(FakeSource):
        def frames(self, clip_id):
            rng = np.random.default_rng(0)
            pts = rng.uniform([-5, -5, 0], [15, 9, 2], (400, 3)
                              ).astype(np.float32)
            sem = np.full(400, 17, np.int32)        # ROAD
            sem[:40] = 1                            # CAR points to strip
            e1 = np.stack([np.linspace(0, 10, 8), np.zeros(8),
                           np.zeros(8)], -1)
            e2 = np.stack([np.linspace(0, 10, 8), np.full(8, 4.0),
                           np.zeros(8)], -1)
            for i in range(2):
                # OpenCV cam at (i-2, 2, 1) looking along world +x (z-up):
                # columns = world dirs of camera right/down/forward axes
                pose = np.eye(4, dtype=np.float32)
                pose[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]],
                                        np.float32)
                pose[:3, 3] = [i * 1.0 - 2.0, 2.0, 1.0]
                K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]],
                             np.float32)
                yield FrameRecord(
                    index=i, cam_to_world_opencv=pose, intrinsic=K,
                    image=None, points=pts, point_semantics=sem,
                    objects={}, map_points={"road_edge": e1},
                    map_polylines={"lane": [e1 + [0, 2, 0]],
                                   "road_edge": [e1, e2],
                                   "road_line": [e1 + [0, 1, 0]]}
                    if i == 0 else None)

    src = MapSource()
    convert(src, tmp_path, node_rank=0, num_nodes=1)
    assert (tmp_path / "3d_lane" / "c0.tar").exists()
    process_clip(tmp_path, "c0", buffer_capacity=4096)

    for attr in ("skymask", "lidar_depth", "3d_lane_voxelsize_025",
                 "3d_road_edge_voxelsize_025", "3d_road_line_voxelsize_025",
                 "3d_road_surface_voxelsize_04", "pc_with_map_without_car",
                 "voxel_depth_100", "semantic_buffer", "instance_buffer"):
        assert (tmp_path / attr / "c0.tar").exists(), attr

    with TarReader(tmp_path / "3d_road_surface_voxelsize_04" / "c0.tar") as r:
        surf = decode_member("npy", r.read("road_surface.npy"))
    assert len(surf) > 20
    with TarReader(tmp_path / "pc_with_map_without_car" / "c0.tar") as r:
        nc = decode_member("npz", r.read("000000.npz"))
    assert not np.isin(nc["semantic"], [1, 2]).any()     # cars stripped
    assert (nc["semantic"] == 19).sum() > 0              # lane markers added
    with TarReader(tmp_path / "voxel_depth_100" / "c0.tar") as r:
        d = decode_member("png", r.read("000000.png"))
    assert d.dtype == np.uint16 and (d > 0).any()


def test_convert_clip_canonical_dynamic_points(tmp_path):
    """convert_clip accumulates per-dynamic-object canonical points across
    frames and writes dynamic_object_points_canonical/points.npz."""
    from infinicube_tpu.data.codec import decode_member
    from infinicube_tpu.data.tario import TarReader
    from infinicube_tpu.data_process.waymo2shards import (
        FrameRecord, convert_clip)

    rng = np.random.default_rng(0)
    frames = []
    for f in range(3):
        # a moving object along +x, with points on its roof each frame
        pose = np.eye(4)
        pose[:3, 3] = [5.0 + 2 * f, 1.0, 0.5]
        local = rng.uniform(-0.4, 0.4, (50, 3)) * [4.0, 2.0, 1.4]
        pts_obj = local @ pose[:3, :3].T + pose[:3, 3]
        bg = rng.uniform(-30, 30, (100, 3))
        frames.append(FrameRecord(
            index=f, cam_to_world_opencv=np.eye(4, dtype=np.float32),
            intrinsic=np.eye(3, dtype=np.float32), image=None,
            points=np.concatenate([pts_obj, bg]).astype(np.float32),
            point_semantics=np.concatenate(
                [np.full(50, 1), np.zeros(100)]).astype(np.int32),
            objects={"car_a": {"pose": pose, "lwh": [4.0, 2.0, 1.5],
                               "type": "car"}},
            map_points={}, map_polylines={}))

    class Src:
        def clip_ids(self):
            return ["c0"]

        def frames(self, cid):
            return frames

    convert_clip(Src(), "c0", tmp_path, write_images=False)
    p = tmp_path / "dynamic_object_points_canonical" / "c0.tar"
    assert p.exists()
    with TarReader(p) as r:
        canon = decode_member("npz", r.read("points.npz"))
    xyz = canon["car_a_xyz"]
    assert 120 <= len(xyz) <= 160          # ~50 x 3 frames, inside-box only
    assert np.all(np.abs(xyz) <= np.array([2.05, 1.05, 0.8]) + 1e-5)
    assert int(canon["car_a_semantic"]) == 1


def test_depth_alignment_suite():
    """align_depth_to_depth / align_inv_depth_to_depth recover a known
    affine map under outliers (reference depth_utils.py:225-400)."""
    from infinicube_tpu.utils.depth_vis import (
        align_depth_to_depth, align_depth_to_depth_batch,
        align_inv_depth_to_depth, normalize_pointmap)
    rng = np.random.default_rng(0)
    gt = rng.uniform(5, 50, (40, 60))
    src = (gt - 2.0) / 1.5                     # gt = 1.5 * src + 2
    src[0, :5] = 0                              # invalid stays invalid
    gt_sparse = np.where(rng.uniform(size=gt.shape) < 0.3, gt, 0.0)
    out = align_depth_to_depth(src, gt_sparse)
    m = (src > 0) & (gt_sparse > 0)
    np.testing.assert_allclose(out[m], gt[m], rtol=1e-3)
    assert (out[0, :5] == 0).all()
    s, b = align_depth_to_depth(src, gt_sparse, return_scale=True)
    assert abs(s - 1.5) < 1e-3 and abs(b - 2.0) < 1e-2

    # inverse-depth: inv_src = a / gt + c -> recoverable
    inv_src = 1.0 / gt * 2.0 + 0.001
    out = align_inv_depth_to_depth(inv_src, gt_sparse)
    band = m & (gt > np.quantile(gt, 0.15)) & (gt < np.quantile(gt, 0.85))
    np.testing.assert_allclose(out[band], gt[band], rtol=1e-2)

    outb = align_depth_to_depth_batch(src[None], gt_sparse[None])
    np.testing.assert_allclose(outb[0][m], gt[m], rtol=1e-3)

    pts = rng.normal(size=(8, 8, 3)) * 10
    norm, scale = normalize_pointmap(pts)
    assert abs(np.linalg.norm(norm.reshape(-1, 3), axis=-1).mean() - 1.0) \
        < 1e-6


def test_skybox_read_render_api(tmp_path):
    """read_skybox + render_sky_api dispatch (reference sky_utils:504-640):
    panorama (full + hemi), cubemap, modulator, and fallbacks."""
    import jax
    from infinicube_tpu.utils.sky_math import (
        read_skybox, render_sky_api, sample_cubemap,
        cubemap_face_uv_to_direction)

    # fallback: black / white_bg
    d = read_skybox(tmp_path / "model.ply")
    assert d["type"] == "rgb_panorama" and d["panorama"].max() == 0
    assert read_skybox(tmp_path / "model.ply",
                       white_bg=True)["panorama"].min() == 1

    # full latlong panorama (H x 2H): constant color renders constant
    pano = np.full((32, 64, 3), 0.25, np.float32)
    np.savez_compressed(tmp_path / "model_pano.npz", panorama=pano)
    d = read_skybox(tmp_path / "model.ply")
    img = render_sky_api(d, np.eye(4), 24, 32, 60.0, 80.0)
    assert img.shape == (24, 32, 3)
    np.testing.assert_allclose(img, 0.25, atol=1e-5)

    # cubemap: sampling along a face center returns that face's center color
    faces = np.zeros((6, 16, 16, 3), np.float32)
    for f in range(6):
        faces[f] = (f + 1) / 10.0
    got = sample_cubemap(faces, np.array([[1.0, 0, 0], [-1.0, 0, 0],
                                          [0, 1.0, 0], [0, -1.0, 0],
                                          [0, 0, 1.0], [0, 0, -1.0]]))
    np.testing.assert_allclose(got[:, 0], np.arange(1, 7) / 10.0, atol=1e-5)
    # round trip: direction -> face uv -> direction
    for f in range(6):
        uv = np.array([[0.3, 0.7]])
        dd = cubemap_face_uv_to_direction(f, uv)
        back = sample_cubemap(faces, dd)
        assert abs(float(back[0, 0]) - (f + 1) / 10.0) < 1e-5

    (tmp_path / "c").mkdir()
    np.savez_compressed(tmp_path / "c" / "m_cubemap.npz", faces=faces)
    d = read_skybox(tmp_path / "c" / "m.ply")
    assert d["type"] == "rgb_cubemap"
    img = render_sky_api(d, np.eye(4), 16, 16, 60.0, 60.0)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()

    # modulator: init a tiny MLP modulator, save token+params, render
    import jax.numpy as jnp
    from infinicube_tpu.models.gsm.sky import SkyConfig, SkyboxMlpModulator
    cfg = SkyConfig(embed_dim=16, num_layers=1, num_heads=2)
    mod = SkyboxMlpModulator(cfg)
    tok = np.zeros((16,), np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(tok),
                      jnp.ones((4, 3)), method=SkyboxMlpModulator.sample)
    (tmp_path / "s").mkdir()
    np.save(tmp_path / "s" / "m_sky_token.npy", tok)
    np.savez(tmp_path / "s" / "m_modulator.npz", params=params["params"])
    d = read_skybox(tmp_path / "s" / "m.pkl")
    assert d["type"] == "sky_modulator"
    d["config"] = cfg
    img = render_sky_api(d, np.eye(4), 8, 12, 60.0, 80.0)
    assert img.shape == (8, 12, 3) and np.isfinite(img).all()


def test_box3d_overlap_exact():
    """Exact OBB intersection volume + IoU (pytorch3d box3d_overlap
    semantics, SURVEY §2.1 N5) on analytic and Monte-Carlo-checked cases."""
    from infinicube_tpu.utils.bbox import box3d_overlap, points_in_obb

    def pose(t, yaw=0.0):
        T = np.eye(4)
        c, s = np.cos(yaw), np.sin(yaw)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = t
        return T

    # identical boxes
    v, iou = box3d_overlap([4, 2, 1.5], pose([0, 0, 0]),
                           [4, 2, 1.5], pose([0, 0, 0]))
    np.testing.assert_allclose(v, 12.0, rtol=1e-9)
    np.testing.assert_allclose(iou, 1.0, rtol=1e-9)
    # disjoint
    v, iou = box3d_overlap([2, 2, 2], pose([0, 0, 0]),
                           [2, 2, 2], pose([10, 0, 0]))
    assert v == 0.0 and iou == 0.0
    # axis-aligned half overlap: shift by half the length
    v, _ = box3d_overlap([2, 2, 2], pose([0, 0, 0]),
                         [2, 2, 2], pose([1, 0, 0]))
    np.testing.assert_allclose(v, 4.0, rtol=1e-9)
    # rotated case vs Monte Carlo
    p1, p2 = pose([0, 0, 0]), pose([0.8, 0.3, 0.2], yaw=0.6)
    l1, l2 = [3.0, 1.6, 1.2], [2.5, 2.0, 1.0]
    v, _ = box3d_overlap(l1, p1, l2, p2)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, (400_000, 3))
    import jax.numpy as jnp
    m = np.asarray(points_in_obb(jnp.asarray(pts), jnp.asarray(p1),
                                 jnp.asarray(l1))) & \
        np.asarray(points_in_obb(jnp.asarray(pts), jnp.asarray(p2),
                                 jnp.asarray(l2)))
    mc = m.mean() * 6.0 ** 3
    np.testing.assert_allclose(v, mc, rtol=0.05)
    # contained box
    v, _ = box3d_overlap([4, 4, 4], pose([0, 0, 0]),
                         [1, 1, 1], pose([0.5, 0.5, 0.5], yaw=0.3))
    np.testing.assert_allclose(v, 1.0, rtol=1e-6)


def test_trajectory_recorder(tmp_path):
    """Keyframes -> interpolated trajectory -> rendered frames + persistence
    (record_utils parity, visualize/recorder.py)."""
    from infinicube_tpu.visualize.recorder import (
        TrajectoryRecorder, pose_from_wxyz_position)

    rec = TrajectoryRecorder()
    # viser-style keyframe (identity quat wxyz=(1,0,0,0))
    rec.add_keyframe(wxyz=[1, 0, 0, 0], position=[0, 0, 0])
    one = rec.interpolate(10)
    assert one.shape == (1, 4, 4)          # single pose -> still
    rec.add_keyframe(pose=pose_from_wxyz_position([1, 0, 0, 0], [10, 0, 0]))
    two = rec.interpolate(12)
    assert two.shape == (12, 4, 4)
    np.testing.assert_allclose(two[0, :3, 3], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(two[-1, :3, 3], [10, 0, 0], atol=1e-9)
    rec.add_keyframe(pose=pose_from_wxyz_position([1, 0, 0, 0], [10, 5, 0]))
    tri = rec.interpolate(24)
    assert tri.shape[0] == 24
    # rotations stay orthonormal through the spline
    RtR = np.einsum("nij,nik->njk", tri[:, :3, :3], tri[:, :3, :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-6)

    poses = rec.save_poses(tmp_path / "traj.npy")
    np.testing.assert_allclose(TrajectoryRecorder.load_poses(
        tmp_path / "traj.npy"), poses.astype(np.float32))

    frames, used = rec.record(
        lambda T: np.full((8, 12, 3), min(T[0, 3] / 10, 1.0)),
        num_frames=6, out_path=tmp_path / "video")
    assert frames.shape[0] == used.shape[0] == 24 or frames.shape[0] == 6
    assert (tmp_path / "video.mp4").exists() or \
        (tmp_path / "video.npz").exists()
