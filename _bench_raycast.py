import time, numpy as np, jax, jax.numpy as jnp
from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.utils.buffers import DynamicObjects, build_static_blocks, render_sequence
from infinicube_tpu.grid.build import grid_from_points

rng = np.random.default_rng(0)
n = 300_000
pts = np.stack([rng.uniform(0, 150, n), rng.uniform(-40, 40, n), rng.uniform(-2, 24, n)], -1)
g = grid_from_points(jnp.asarray(pts, jnp.float32)[None], jnp.ones((1, n), bool), 0.2, 0.1, capacity=1<<19)
sem = jnp.full((1<<19,), 18, jnp.int32)
blocks = build_static_blocks(g, sem, sem, (0, -200, -10), (768, 400, 132))
cam = PinholeCamera(fx=480.0, fy=480.0, cx=416.0, cy=240.0, w=832, h=480)
T = 93
poses = np.tile(np.array([[0,0,1,0],[-1,0,0,0],[0,-1,0,2],[0,0,0,1]], np.float32), (T,1,1))
poses[:, 0, 3] = np.linspace(0, 80, T)
objects = DynamicObjects.empty(T)
K = cam.intrinsics_matrix()
t0 = time.perf_counter()
fb = render_sequence(blocks, objects, K, jnp.asarray(poses), (cam.h, cam.w))
_ = jax.device_get(fb.depth[0,0,0])
print(f"compile+run: {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
fb = render_sequence(blocks, objects, K, jnp.asarray(poses), (cam.h, cam.w))
_ = jax.device_get(fb.depth[0,0,0])
dt = time.perf_counter()-t0
print(f"93 frames: {dt:.2f}s total, {dt/93*1e3:.1f} ms/frame, {93*cam.h*cam.w/dt/1e6:.1f} Mrays/s")
