"""Stage-2 guidance-buffer benchmark: 93 frames @ 480p over a 300k-voxel
world with 8 dynamic cars (tracked config 1)."""

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).parent.parent))
import time

import numpy as np
import jax
import jax.numpy as jnp

from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.grid.build import grid_from_points
from infinicube_tpu.utils.buffers import DynamicObjects, render_sequence_splat


def main():
    rng = np.random.default_rng(0)
    n = 300_000
    pts = np.stack([rng.uniform(0, 150, n), rng.uniform(-40, 40, n),
                    rng.uniform(-2, 24, n)], -1)
    g = grid_from_points(jnp.asarray(pts, jnp.float32)[None],
                         jnp.ones((1, n), bool), 0.2, 0.1, capacity=1 << 19)
    sem = jnp.full((1 << 19,), 18, jnp.int32)
    ins = jnp.zeros((1 << 19,), jnp.int32)
    cam = PinholeCamera(fx=480.0, fy=480.0, cx=416.0, cy=240.0, w=832, h=480)
    T = 93
    poses = np.tile(np.array([[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 2],
                              [0, 0, 0, 1]], np.float32), (T, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 80, T)
    M = 8
    opose = np.tile(np.eye(4, dtype=np.float32), (T, M, 1, 1))
    opose[:, :, 0, 3] = np.linspace(5, 100, M)[None]
    objects = DynamicObjects(
        poses=jnp.asarray(opose), lwh=jnp.full((M, 3), 3.0),
        ids=jnp.arange(10001, 10001 + M, dtype=jnp.int32),
        sem=jnp.full((M,), 1, jnp.int32), valid=jnp.ones((T, M), bool))
    K = cam.intrinsics_matrix()
    fb = render_sequence_splat(g, sem, ins, objects, K, jnp.asarray(poses),
                               (cam.h, cam.w))
    _ = jax.device_get(fb.depth[0, 0, 0])
    t0 = time.perf_counter()
    fb = render_sequence_splat(g, sem, ins, objects, K, jnp.asarray(poses),
                               (cam.h, cam.w))
    _ = jax.device_get(fb.depth[0, 0, 0])
    dt = time.perf_counter() - t0
    print(f"93 frames @480p: {dt:.2f}s total, {dt/93*1e3:.1f} ms/frame, "
          f"{93*cam.h*cam.w/dt/1e6:.1f} Mpix/s")


if __name__ == "__main__":
    main()
