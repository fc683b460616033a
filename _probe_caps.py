import numpy as np, jax, jax.numpy as jnp, time
from infinicube_tpu.ops.raycast import dda_first_hit, manhattan_distance_transform
rng = np.random.default_rng(0)
occ = jnp.zeros((768, 400, 132), bool).at[:, :, 10].set(True)
idx = rng.integers(0, [768, 400, 132], (300000, 3))
occ = occ.at[idx[:,0], idx[:,1], idx[:,2]].set(True)
sd = manhattan_distance_transform(occ)
_ = jax.device_get(sd[0,0,0])
n = 3_200_000
ro = jnp.asarray(np.stack([rng.uniform(1, 140, n), rng.uniform(-30, 30, n), np.full(n, 2.0)], -1), jnp.float32)
d = np.stack([rng.normal(size=n), rng.normal(size=n), rng.normal(size=n)*0.3], -1)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
rd = jnp.asarray(d, jnp.float32)
ref = dda_first_hit(occ, ro, rd, 0.2, 0.1, (0, -200, -10), max_steps=1303, skip_dist=sd)
ref_hit = np.asarray(jax.device_get(ref.hit))
for ms in (96, 192, 320):
    hit = dda_first_hit(occ, ro, rd, 0.2, 0.1, (0, -200, -10), max_steps=ms, skip_dist=sd)
    h = np.asarray(jax.device_get(hit.hit))
    t0 = time.perf_counter()
    hit = dda_first_hit(occ, ro, rd, 0.2, 0.1, (0, -200, -10), max_steps=ms, skip_dist=sd)
    _ = jax.device_get(hit.hit[0])
    dt = time.perf_counter()-t0
    print(f"ms={ms}: {dt:.2f}s {n/dt/1e6:.2f} Mrays/s, mismatch {np.mean(h != ref_hit)*100:.3f}%")
