"""Camera drawing suite (camera/draw.py) vs reference semantics
(base.py:266-312, 728-1075)."""

import numpy as np

from infinicube_tpu.camera.draw import (
    clip_polyline_to_image_plane, convex_hull_2d, draw_hull_depth,
    draw_line_depth, project_hull_depth, project_line_depth)
from infinicube_tpu.camera.pinhole import PinholeCamera

CAM = PinholeCamera(fx=60.0, fy=60.0, cx=40, cy=30, w=80, h=60)
POSE = np.eye(4)


def test_clip_polyline_crossing():
    poly = np.array([[0, 0, -2.0], [0, 0, 2.0], [1, 0, 4.0]])
    c = clip_polyline_to_image_plane(poly)
    # behind-camera vertex replaced by an intersection near z=0
    assert c.shape == (3, 3)
    assert (c[:, 2] >= 0).all() and c[0, 2] < 0.5
    # fully behind -> empty
    assert clip_polyline_to_image_plane(
        np.array([[0, 0, -1.0], [1, 0, -2.0]])).shape == (0, 3)
    # fully in front -> unchanged
    ok = np.array([[0, 0, 1.0], [1, 0, 2.0]])
    np.testing.assert_allclose(clip_polyline_to_image_plane(ok), ok)


def test_line_depth_coding():
    near = draw_line_depth(CAM, POSE, [np.array([[-1, 0, 5.0], [1, 0, 5.0]])])
    far = draw_line_depth(CAM, POSE, [np.array([[-1, 0, 60.0], [1, 0, 60.0]])])
    assert near.shape == (60, 80, 3)
    # reference coding: value = 2 * (depth_max - depth) -> nearer = brighter
    assert near.max() > far.max() > 0
    exp_near = int(np.uint8(255 * 2 * (122.5 - 5.0) / 255))
    assert near.max() == exp_near


def test_line_segments_project():
    segs = project_line_depth(CAM, POSE,
                              [np.array([[0, 0, -1.0], [0, 0, 10.0]])])
    assert len(segs) == 1 and len(segs[0]) >= 1
    (u1, v1, d1), (u2, v2, d2) = segs[0][0]
    assert d1 >= 0 and d2 >= 0


def test_convex_hull_and_fill():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]])
    h = convex_hull_2d(pts)
    assert h.shape == (4, 2)          # interior points removed
    hull3d = np.array([[-1, -1, 6.0], [1, -1, 6.0], [1, 1, 6.0],
                       [-1, 1, 6.0], [0, 0, 6.0]])
    img = draw_hull_depth(CAM, POSE, [hull3d])
    # filled region is a solid block around the principal point
    assert (img[:, :, 0] > 0).sum() > 200
    items = project_hull_depth(CAM, POSE, [hull3d])
    assert len(items[0]) == 1 and items[0][0].shape[1] == 3


def test_behind_camera_hull_skipped():
    hull = np.array([[-1, -1, -6.0], [1, -1, -6.0], [1, 1, -6.0]])
    img = draw_hull_depth(CAM, POSE, [hull])
    assert img.max() == 0
