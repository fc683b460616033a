import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera import PinholeCamera, opencv_to_flu, flu_to_opencv
from infinicube_tpu.camera import projection as P
from infinicube_tpu.camera.conventions import invert_pose, transform_points


def make_cam():
    return PinholeCamera(fx=200.0, fy=210.0, cx=64.0, cy=48.0, w=128, h=96)


def test_convention_roundtrip_and_frame_mapping():
    rng = np.random.default_rng(0)
    # random valid SE(3)
    q = rng.normal(size=(3, 3))
    u, _, vt = np.linalg.svd(q)
    R = (u @ vt).astype(np.float32)
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, rng.normal(size=3)
    np.testing.assert_allclose(flu_to_opencv(opencv_to_flu(T)), T, atol=1e-6)
    # OpenCV +z (forward) must map to FLU +x (forward)
    flu = opencv_to_flu(T)
    np.testing.assert_allclose(flu[:3, 0], T[:3, 2], atol=1e-6)   # x_flu = z_cv
    np.testing.assert_allclose(flu[:3, 1], -T[:3, 0], atol=1e-6)  # y_flu = -x_cv
    np.testing.assert_allclose(flu[:3, 2], -T[:3, 1], atol=1e-6)  # z_flu = -y_cv


def test_pixel_ray_roundtrip():
    cam = make_cam()
    px = jnp.array([[10.0, 20.0], [64.0, 48.0], [100.0, 5.0]])
    rays = cam.pixel2ray(px)
    back = cam.ray2pixel(rays)
    np.testing.assert_allclose(np.asarray(back), np.asarray(px), atol=1e-4)
    # principal point ray is the optical axis
    np.testing.assert_allclose(np.asarray(rays[1]), [0, 0, 1], atol=1e-6)


def test_rays_are_normalized_and_distance_zdepth():
    cam = make_cam()
    rays = cam.get_rays()
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(rays, axis=-1)), 1.0,
                               atol=1e-5)
    dist = jnp.full((cam.h, cam.w), 5.0)
    zd = cam.distance_to_zdepth(dist)
    back = cam.zdepth_to_distance(zd)
    np.testing.assert_allclose(np.asarray(back), 5.0, atol=1e-4)
    # z-depth at the principal pixel equals distance
    assert np.isclose(float(zd[48, 64]), 5.0, atol=1e-4)


def test_project_points_consistency():
    cam = make_cam()
    rng = np.random.default_rng(1)
    # points along known pixel rays at known depths, identity pose
    px = jnp.asarray(rng.uniform([0, 0], [127, 95], size=(50, 2)), jnp.float32)
    z = jnp.asarray(rng.uniform(1, 10, size=(50,)), jnp.float32)
    pts = cam.pixel2ray(px) * z[:, None]
    pose = jnp.eye(4)
    uv, zout, valid = P.project_points(pts, pose, cam.intrinsics_matrix(),
                                       (cam.h, cam.w))
    np.testing.assert_allclose(np.asarray(uv), np.asarray(px), atol=1e-3)
    np.testing.assert_allclose(np.asarray(zout), np.asarray(z), atol=1e-5)
    assert bool(valid.all())
    # with a camera pose, world points transform consistently
    T = jnp.array([[0, -1, 0, 2], [1, 0, 0, -1], [0, 0, 1, 0.5], [0, 0, 0, 1]],
                  jnp.float32)
    world = transform_points(pts, T)
    uv2, z2, _ = P.project_points(world, T, cam.intrinsics_matrix(), (cam.h, cam.w))
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(px), atol=1e-3)


def test_zdepth_map_from_points_takes_min():
    cam = make_cam()
    # two points on the same pixel ray at different depths
    px = jnp.array([[30.0, 30.0]])
    p_near = cam.pixel2ray(px)[0] * 2.0
    p_far = cam.pixel2ray(px)[0] * 7.0
    pts = jnp.stack([p_far, p_near])
    zmap = P.zdepth_map_from_points(pts, jnp.ones(2, bool), jnp.eye(4),
                                    cam.intrinsics_matrix(), (cam.h, cam.w))
    assert np.isclose(float(zmap[30, 30]), 2.0, atol=1e-4)
    assert float(zmap[0, 0]) == 0.0


def test_unproject_roundtrip():
    cam = make_cam()
    rng = np.random.default_rng(2)
    zd = jnp.asarray(rng.uniform(1, 10, size=(cam.h, cam.w)), jnp.float32)
    T = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 2.0, 3.0]))
    world = P.unproject_depth(zd, cam.intrinsics_matrix(), T)
    uv, z, valid = P.project_points(world.reshape(-1, 3), T,
                                    cam.intrinsics_matrix(), (cam.h, cam.w))
    np.testing.assert_allclose(np.asarray(z), np.asarray(zd).ravel(), atol=1e-4)


def test_invert_pose():
    T = jnp.array([[0, -1, 0, 2], [1, 0, 0, -1], [0, 0, 1, 0.5], [0, 0, 0, 1]],
                  jnp.float32)
    np.testing.assert_allclose(np.asarray(invert_pose(T) @ T), np.eye(4), atol=1e-6)
