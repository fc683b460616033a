import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera import PinholeCamera
from infinicube_tpu.grid import grid_from_points
from infinicube_tpu.utils.buffers import (
    DynamicObjects, build_static_blocks, generate_coordinate_buffer,
    generate_guidance_buffers, render_frame,
)
from infinicube_tpu.utils.semantic import WAYMO_CATEGORY_NAMES

ROAD = WAYMO_CATEGORY_NAMES.index("ROAD")
BUILDING = WAYMO_CATEGORY_NAMES.index("BUILDING")
CAR = WAYMO_CATEGORY_NAMES.index("CAR")


def make_scene():
    """Flat road at z=0 (FLU world), wall at x=20."""
    rng = np.random.default_rng(0)
    ground = np.stack([rng.uniform(-5, 30, 4000), rng.uniform(-10, 10, 4000),
                       np.zeros(4000)], -1)
    wall = np.stack([np.full(2000, 20.0), rng.uniform(-10, 10, 2000),
                     rng.uniform(0, 6, 2000)], -1)
    pts = jnp.asarray(np.concatenate([ground, wall]), jnp.float32)[None]
    sem = jnp.asarray(np.concatenate([np.full(4000, ROAD),
                                      np.full(2000, BUILDING)]), jnp.int32)
    mask = jnp.ones((1, 6000), bool)
    vs = 0.4
    g = grid_from_points(pts, mask, vs, vs / 2, capacity=8192)
    # voxel semantics: majority vote
    from infinicube_tpu.grid.ops import majority_label
    vox_sem = majority_label(g, pts, sem[None], mask, 23)[0]
    return g, vox_sem


def camera_looking_forward():
    """OpenCV camera at (0, 0, 2) in FLU world looking along +x (forward)."""
    cam = PinholeCamera(fx=100.0, fy=100.0, cx=40.0, cy=30.0, w=80, h=60)
    # camera axes in world: x_cv(right) = -y_w, y_cv(down) = -z_w, z_cv(fwd) = +x_w
    T = np.eye(4, dtype=np.float32)
    T[:3, 0] = [0, -1, 0]
    T[:3, 1] = [0, 0, -1]
    T[:3, 2] = [1, 0, 0]
    T[:3, 3] = [0, 0, 2.0]
    return cam, jnp.asarray(T)


def test_static_buffers_ground_and_wall():
    g, vox_sem = make_scene()
    cam, pose = camera_looking_forward()
    blocks = build_static_blocks(g, vox_sem, jnp.zeros_like(vox_sem),
                                 (-20, -30, -5), (96, 60, 24))
    fb = render_frame(blocks, DynamicObjects.empty(1), 0,
                      cam.intrinsics_matrix(), pose, (cam.h, cam.w))
    depth = np.asarray(fb.depth)
    sem = np.asarray(fb.semantic)
    # center pixel looks at the wall at x=20 -> depth ~= 20
    assert abs(depth[30, 40] - 20.0) < 1.0
    assert sem[30, 40] == BUILDING
    # low pixels hit the road first
    assert sem[55, 40] == ROAD
    assert 0 < depth[55, 40] < 20.0
    # above-horizon pixels are sky
    assert sem[0, 40] == 0 and depth[0, 40] == 0.0


def test_dynamic_object_occludes_and_ids():
    g, vox_sem = make_scene()
    cam, pose = camera_looking_forward()
    # car 8m ahead, canonical x along world x
    obj_pose = np.eye(4, dtype=np.float32)
    obj_pose[:3, 3] = [8.0, 0.0, 0.8]
    objects = DynamicObjects(
        poses=jnp.asarray(obj_pose)[None, None],
        lwh=jnp.array([[4.5, 2.0, 1.6]]),
        ids=jnp.array([10001], jnp.int32),
        sem=jnp.array([CAR], jnp.int32),
        valid=jnp.ones((1, 1), bool))
    out = generate_guidance_buffers(g, vox_sem, jnp.zeros_like(vox_sem), cam,
                                    jnp.asarray(pose)[None], objects)
    sem = np.asarray(out["semantic"][0])
    ins = np.asarray(out["instance"][0])
    dep = np.asarray(out["depth"][0])
    # a slightly-downward ray (v=47) hits the car front face (x = 8 - 2.25)
    # before the road; the camera is at z=2, above the car roof (z=1.6)
    assert sem[47, 40] == CAR
    assert ins[47, 40] == 10001
    assert abs(dep[47, 40] - (8.0 - 4.5 / 2)) < 0.8
    # car pixels are marked dynamic by the >= 10000 convention
    assert (ins[sem == CAR] >= 10000).all()


def test_coordinate_buffer_normalization():
    cam, pose = camera_looking_forward()
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.uniform(2, 30, size=(3, cam.h, cam.w)), jnp.float32)
    depth = depth.at[:, :5, :].set(0.0)  # sky rows
    poses = jnp.broadcast_to(pose, (3, 4, 4))
    coord = generate_coordinate_buffer(depth, cam.intrinsics_matrix(), poses)
    c = np.asarray(coord)
    assert c.shape == (3, cam.h, cam.w, 3)
    assert np.all(c >= 0) and np.all(c <= 1)
    # sky pixels are white
    assert np.allclose(c[:, :5, :], 1.0)
    # valid pixels span most of the normalized range per axis
    valid = c[:, 5:, :, :].reshape(-1, 3)
    assert valid.min() < 0.05 and valid.max() > 0.95


def test_splat_matches_dda_depth():
    """The fast splat path agrees with exact DDA ray marching on a simple
    scene (depth within a voxel, same semantics) away from silhouettes."""
    g, vox_sem = make_scene()
    cam, pose = camera_looking_forward()
    poses = jnp.asarray(pose)[None]
    inst = jnp.zeros_like(vox_sem)
    out_dda = generate_guidance_buffers(g, vox_sem, inst, cam, poses,
                                        method="dda")
    out_spl = generate_guidance_buffers(g, vox_sem, inst, cam, poses,
                                        method="splat")
    d1 = np.asarray(out_dda["depth"][0])
    d2 = np.asarray(out_spl["depth"][0])
    s1 = np.asarray(out_dda["semantic"][0])
    s2 = np.asarray(out_spl["semantic"][0])
    both = (d1 > 0) & (d2 > 0)
    # depths agree within ~1 voxel + center-vs-entry offset for most pixels
    close = np.abs(d1[both] - d2[both]) < 1.0
    assert close.mean() > 0.85
    assert (s1[both] == s2[both]).mean() > 0.85
    # hit masks mostly agree
    assert ((d1 > 0) == (d2 > 0)).mean() > 0.9


def test_packed_splat_far_voxel_last_slot_is_not_a_miss():
    """Max quantized depth in the max slot must stay below the INT32_MAX miss
    sentinel (a far-clipped voxel previously aliased to 'no hit')."""
    import jax.numpy as jnp
    from infinicube_tpu.utils.buffers import _packed_splat

    slot = jnp.asarray([(1 << 20) - 1], jnp.int32)
    buf = _packed_splat(jnp.asarray([0]), jnp.asarray([1e9]), slot,
                        jnp.asarray([True]), 1, 1)
    assert int(buf[0]) != (1 << 31) - 1          # it's a hit...
    assert int(buf[0]) & ((1 << 20) - 1) == (1 << 20) - 1  # ...by that slot
