"""Guidance-buffer generation: semantic / depth / instance / coordinate buffers
rendered from the semantic voxel world (pipeline stage 2, north-star config 1).

Behavioral mirror of the reference's
``generate_infinicube_buffer_from_fvdb_grid``
(/root/reference/infinicube/utils/fvdb_utils.py:388-618) and the coordinate
buffer (/root/reference/infinicube/utils/buffer_utils.py:180-265), re-designed
TPU-first (SURVEY.md §7.4):

- The reference rebuilds a 0.2 m fvdb grid of (scene points + posed car
  points) EVERY frame and raycasts it three times (depth, semantic, instance).
  Two TPU paths here, sharing one scene preparation:
  * **splat** (default): voxels + per-frame posed canonical-car points render
    by z-buffered point splatting — ONE packed scatter-min per frame
    ((depth << 20 | voxel slot) resolves z-buffer and winner together), a
    near-field footprint pass, and interior hole filling. 93 frames @ 480p
    over a 300k-voxel world run in ~2.8 s on one v5e (~90x the per-frame DDA).
  * **dda**: exact first-hit ray marching with Manhattan-distance empty-space
    skipping — reference-exact entry depths (used by the GSM lifter and as
    the golden path).
  Dynamic cars never trigger a scene rebuild: they are either splatted as
  posed canonical points or ray-traced in their canonical frames.

Buffer encodings (match reference inference.md + fvdb_utils):
- depth buffer: z-depth in meters, 0 = no hit (sky).
- semantic buffer: Waymo class id at first hit, 0 = background/sky.
- instance buffer: instance id at first hit, 0 = none (dynamic ids >= 10000,
  cf. scene_gaussian_generation.py instance >= 10000 => dynamic).
- coordinate buffer: frame-0-camera xyz normalized to [0,1] by global
  percentiles, no-hit pixels = 1.0 (white).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera.pinhole import PinholeCamera
from infinicube_tpu.camera import projection as proj
from infinicube_tpu.grid.grid import Grid
from infinicube_tpu.grid.ops import to_dense
from infinicube_tpu.ops.raycast import dda_first_hit, manhattan_distance_transform
from infinicube_tpu.utils.cad_car import canonical_car_occupancy


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StaticSceneBlocks:
    """Densified static world, built once per scene."""
    occ: jnp.ndarray        # bool [D, H, W]
    semantic: jnp.ndarray   # int32[D, H, W]
    instance: jnp.ndarray   # int32[D, H, W]
    skip: jnp.ndarray       # uint8[D, H, W] L1 distance field (space skipping)
    voxel_size: jnp.ndarray  # f32[3]
    origin: jnp.ndarray      # f32[3]
    ijk_min: jnp.ndarray     # int32[3]


def build_static_blocks(grid: Grid, semantics: jnp.ndarray,
                        instance: jnp.ndarray, ijk_min, dense_dims
                        ) -> StaticSceneBlocks:
    """grid: batch-1 Grid; semantics int32[C]; instance int32[C]."""
    occ = to_dense(grid, grid.mask[..., None].astype(jnp.int32),
                   ijk_min, dense_dims)[0, ..., 0] > 0
    sem = to_dense(grid, semantics[None, :, None], ijk_min, dense_dims)[0, ..., 0]
    ins = to_dense(grid, instance[None, :, None], ijk_min, dense_dims)[0, ..., 0]
    return StaticSceneBlocks(
        occ=occ, semantic=sem.astype(jnp.int32), instance=ins.astype(jnp.int32),
        skip=manhattan_distance_transform(occ),
        voxel_size=grid.voxel_size, origin=grid.origin,
        ijk_min=jnp.asarray(ijk_min, jnp.int32))


class DynamicObjects(NamedTuple):
    """Per-sequence dynamic (and optionally static CAD) car set.

    poses  f32[T, M, 4, 4] object-to-world per frame
    lwh    f32[M, 3]
    ids    int32[M]  (>= 10000 for dynamic objects by convention)
    sem    int32[M]  semantic class (CAR etc.)
    valid  bool[T, M]
    """
    poses: jnp.ndarray
    lwh: jnp.ndarray
    ids: jnp.ndarray
    sem: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(num_frames: int):
        return DynamicObjects(
            poses=jnp.zeros((num_frames, 1, 4, 4)).at[:, :, [0, 1, 2, 3],
                                                      [0, 1, 2, 3]].set(1.0),
            lwh=jnp.ones((1, 3)), ids=jnp.zeros((1,), jnp.int32),
            sem=jnp.zeros((1,), jnp.int32),
            valid=jnp.zeros((num_frames, 1), bool))


class FrameBuffers(NamedTuple):
    depth: jnp.ndarray      # f32 [H, W] z-depth, 0 = sky
    semantic: jnp.ndarray   # int32 [H, W]
    instance: jnp.ndarray   # int32 [H, W]


def _static_hit(blocks: StaticSceneBlocks, ray_o, ray_d, max_steps):
    hit = dda_first_hit(blocks.occ, ray_o, ray_d, blocks.voxel_size,
                        blocks.origin, blocks.ijk_min, max_steps=max_steps,
                        skip_dist=blocks.skip)
    rel = hit.ijk - blocks.ijk_min
    D, H, W = blocks.occ.shape
    rel = jnp.clip(rel, 0, jnp.array([D - 1, H - 1, W - 1]))
    sem = blocks.semantic[rel[:, 0], rel[:, 1], rel[:, 2]]
    ins = blocks.instance[rel[:, 0], rel[:, 1], rel[:, 2]]
    t = jnp.where(hit.hit, hit.t_entry, jnp.inf)
    return t, jnp.where(hit.hit, sem, 0), jnp.where(hit.hit, ins, 0)


def _object_hits(car_occ, objects_t, lwh, ray_o, ray_d, valid_t, max_steps):
    """First-hit t for every object. Returns t f32[M, N] (inf = miss)."""
    dims = jnp.asarray(car_occ.shape, jnp.float32)
    ijk_min = tuple(-(d // 2) for d in car_occ.shape)

    def per_object(pose, lwh_m, valid_m):
        R = pose[:3, :3]
        t = pose[:3, 3]
        o_loc = (ray_o - t) @ R  # R^T from the right
        d_loc = ray_d @ R
        vs = lwh_m / dims
        hit = dda_first_hit(car_occ, o_loc, d_loc, vs, vs / 2.0, ijk_min,
                            max_steps=max_steps)
        return jnp.where(hit.hit & valid_m, hit.t_entry, jnp.inf)

    return jax.vmap(per_object)(objects_t, lwh, valid_t)


@partial(jax.jit, static_argnames=("image_hw", "max_steps_static",
                                   "max_steps_obj"))
def render_frame(blocks: StaticSceneBlocks, objects: DynamicObjects,
                 frame_idx, K: jnp.ndarray, cam_to_world: jnp.ndarray,
                 image_hw: tuple[int, int], max_steps_static: int = 768,
                 max_steps_obj: int = 64) -> FrameBuffers:
    """Render one frame's depth/semantic/instance buffers."""
    h, w = image_hw
    ray_o, ray_d = proj.posed_rays_from_intrinsics(K, cam_to_world, image_hw)
    ray_o, ray_d = ray_o.reshape(-1, 3), ray_d.reshape(-1, 3)

    t_s, sem_s, ins_s = _static_hit(blocks, ray_o, ray_d, max_steps_static)

    car_occ = jnp.asarray(canonical_car_occupancy())
    t_o = _object_hits(car_occ, objects.poses[frame_idx], objects.lwh,
                       ray_o, ray_d, objects.valid[frame_idx], max_steps_obj)
    best_obj = jnp.argmin(t_o, axis=0)                    # [N]
    t_best_obj = jnp.min(t_o, axis=0)

    obj_wins = t_best_obj < t_s
    t = jnp.where(obj_wins, t_best_obj, t_s)
    sem = jnp.where(obj_wins, objects.sem[best_obj], sem_s)
    ins = jnp.where(obj_wins, objects.ids[best_obj], ins_s)
    hit = jnp.isfinite(t)

    # distance -> z-depth: rays are normalized; cos = d . optical_axis
    fwd = cam_to_world[:3, 2]
    cosang = ray_d @ fwd
    depth = jnp.where(hit, t * cosang, 0.0)
    return FrameBuffers(depth=depth.reshape(h, w),
                        semantic=jnp.where(hit, sem, 0).reshape(h, w).astype(jnp.int32),
                        instance=jnp.where(hit, ins, 0).reshape(h, w).astype(jnp.int32))


@partial(jax.jit, static_argnames=("image_hw", "max_steps_static",
                                   "max_steps_obj", "frame_chunk"))
def render_sequence(blocks: StaticSceneBlocks, objects: DynamicObjects,
                    K: jnp.ndarray, cam_to_worlds: jnp.ndarray,
                    image_hw: tuple[int, int], max_steps_static: int = 768,
                    max_steps_obj: int = 64,
                    frame_chunk: int = 8) -> FrameBuffers:
    """Render all frames. cam_to_worlds f32[T, 4, 4].

    The static-world DDA marches ~10^3 steps; running it per frame pays the
    per-step launch overhead T times on tiny work. Instead rays are batched
    ``frame_chunk`` frames at a time through the DDA (the static world is
    frame-invariant; chunking bounds the ray-state memory), and only the
    cheap per-object passes (<= max_steps_obj steps) scan over frames."""
    T = cam_to_worlds.shape[0]
    h, w = image_hw

    def frame_rays(pose):
        ro, rd = proj.posed_rays_from_intrinsics(K, pose, image_hw)
        return ro.reshape(-1, 3), rd.reshape(-1, 3)

    ray_o, ray_d = jax.vmap(frame_rays)(cam_to_worlds)   # [T, HW, 3]
    pad = (-T) % frame_chunk
    ro_p = jnp.pad(ray_o, ((0, pad), (0, 0), (0, 0)))
    rd_p = jnp.pad(ray_d, ((0, pad), (0, 0), (0, 0)), constant_values=1.0)
    n_chunks = (T + pad) // frame_chunk

    def chunk_hit(args):
        ro, rd = args
        return _static_hit(blocks, ro.reshape(-1, 3), rd.reshape(-1, 3),
                           max_steps_static)

    t_s, sem_s, ins_s = jax.lax.map(
        chunk_hit, (ro_p.reshape(n_chunks, -1, 3),
                    rd_p.reshape(n_chunks, -1, 3)))
    t_s = t_s.reshape(T + pad, -1)[:T]
    sem_s = sem_s.reshape(T + pad, -1)[:T]
    ins_s = ins_s.reshape(T + pad, -1)[:T]

    car_occ = jnp.asarray(canonical_car_occupancy())

    def step(_, inp):
        fi, pose, ro, rd, ts, sems, inss = inp
        t_o = _object_hits(car_occ, objects.poses[fi], objects.lwh,
                           ro, rd, objects.valid[fi], max_steps_obj)
        best_obj = jnp.argmin(t_o, axis=0)
        t_best_obj = jnp.min(t_o, axis=0)
        obj_wins = t_best_obj < ts
        t = jnp.where(obj_wins, t_best_obj, ts)
        sem = jnp.where(obj_wins, objects.sem[best_obj], sems)
        ins = jnp.where(obj_wins, objects.ids[best_obj], inss)
        hit = jnp.isfinite(t)
        cosang = rd @ pose[:3, 2]
        depth = jnp.where(hit, t * cosang, 0.0)
        return None, FrameBuffers(
            depth=depth.reshape(h, w),
            semantic=jnp.where(hit, sem, 0).reshape(h, w).astype(jnp.int32),
            instance=jnp.where(hit, ins, 0).reshape(h, w).astype(jnp.int32))

    _, out = jax.lax.scan(step, None, (jnp.arange(T), cam_to_worlds,
                                       ray_o, ray_d, t_s, sem_s, ins_s))
    return out


# ---------------------------------------------------------------------------
# splat rasterization path (default): voxels as z-buffered point splats
# ---------------------------------------------------------------------------
#
# Ray marching is gather-bound on TPU (hundreds of data-dependent gathers per
# ray). The splat formulation inverts the loop: every voxel projects ONCE and
# scatter-mins its depth into the frame with a footprint scaled to its
# projected size, followed by a winner-resolve scatter for attributes and a
# small min-depth dilation to close sub-pixel holes. One pass of
# O(voxels x footprint) scatters per frame -> orders of magnitude faster than
# per-ray DDA for the same buffers (depth/semantic/instance).

_STENCIL = 2          # (2R+1)^2 near-field footprint taps
_NEAR_CAP = 32768     # static budget of near voxels that get the footprint
_DEPTH_QUANTA = 0.2   # packed-depth resolution (m); 11 bits -> 409 m range


def _packed_splat(flat_px, z, slot, ok, h, w):
    """ONE scatter-min of (quantized depth << 20 | voxel slot) resolves both
    the z-buffer and the winning voxel (scatters are serial-ish on TPU via
    XLA — halving+packing them is the whole game).

    zq is clipped to 2046 (not 2047) so the maximum packed value
    2046<<20 | (2^20-1) stays strictly below the INT32_MAX miss sentinel —
    a far-clipped voxel in the last slot must not read back as a miss."""
    zq = jnp.clip((z / _DEPTH_QUANTA).astype(jnp.int32), 0, (1 << 11) - 2)
    packed = (zq << 20) | slot
    flat_safe = jnp.where(ok, flat_px, h * w)
    big = jnp.int32((1 << 31) - 1)
    buf = jnp.full((h * w,), big, jnp.int32).at[flat_safe].min(
        jnp.where(ok, packed, big), mode="drop")
    return buf


@partial(jax.jit, static_argnames=("image_hw",))
def splat_winner_slots(points: jnp.ndarray, valid: jnp.ndarray,
                       radius_world: jnp.ndarray, K: jnp.ndarray,
                       cam_to_world: jnp.ndarray,
                       image_hw: tuple[int, int]):
    """Project points and resolve the front-most point per pixel via the
    packed scatter-min (the z-buffer core of splat_frame, shared with the
    GSM lifter/visibility fast path). Returns (win_slot int32[h, w] with -1
    at misses, zdepth f32[h, w])."""
    h, w = image_hw
    C = points.shape[0]
    uv, z, vis = proj.project_points(points, cam_to_world, K, image_hw)
    vis = vis & valid & (z > 0.05)
    px = jnp.round(uv[:, 0]).astype(jnp.int32)
    py = jnp.round(uv[:, 1]).astype(jnp.int32)
    inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    ok = vis & inside
    slot = jnp.arange(C, dtype=jnp.int32)
    buf = _packed_splat(py * w + px, z, slot, ok, h, w)
    r_px = jnp.where(ok, K[0, 0] * radius_world / jnp.maximum(z, 1e-3), 0.0)
    near_rank = jnp.argsort(-r_px)[:_NEAR_CAP]
    n_ok = ok[near_rank] & (r_px[near_rank] > 0.75)
    taps = jnp.arange(-_STENCIL, _STENCIL + 1)
    du, dv = jnp.meshgrid(taps, taps, indexing="ij")
    du = du.reshape(-1)
    dv = dv.reshape(-1)
    S = du.shape[0]
    ix = px[near_rank][:, None] + du[None]
    iy = py[near_rank][:, None] + dv[None]
    infoot = (jnp.abs(du[None]) <= r_px[near_rank][:, None] + 0.5) & \
        (jnp.abs(dv[None]) <= r_px[near_rank][:, None] + 0.5)
    n_ok2 = n_ok[:, None] & infoot & (ix >= 0) & (ix < w) & (iy >= 0) & \
        (iy < h)
    buf_near = _packed_splat(
        (iy * w + ix).reshape(-1), jnp.repeat(z[near_rank], S),
        jnp.repeat(near_rank.astype(jnp.int32), S), n_ok2.reshape(-1), h, w)
    buf = jnp.minimum(buf, buf_near)
    hit = buf != jnp.int32((1 << 31) - 1)
    win = jnp.where(hit, jnp.clip(buf & ((1 << 20) - 1), 0, C - 1), -1)
    zd = jnp.where(hit, z[jnp.clip(win, 0)], 0.0)
    return win.reshape(h, w), zd.reshape(h, w)


@partial(jax.jit, static_argnames=("image_hw", "fill_iters"))
def splat_frame(points: jnp.ndarray, attrs: jnp.ndarray, valid: jnp.ndarray,
                radius_world: jnp.ndarray, K: jnp.ndarray,
                cam_to_world: jnp.ndarray, image_hw: tuple[int, int],
                fill_iters: int = 2) -> FrameBuffers:
    """points f32[C, 3] world (C <= 2^20); attrs int32[C, 2]
    (semantic, instance); radius_world f32[C] splat half-extent in meters.

    Far voxels (sub-pixel footprint) splat ONE tap; the nearest _NEAR_CAP
    voxels additionally splat a (2R+1)^2 footprint — entries stay ~C instead
    of C x 25."""
    h, w = image_hw
    C = points.shape[0]
    uv, z, vis = proj.project_points(points, cam_to_world, K, image_hw)
    vis = vis & valid & (z > 0.05)
    px = jnp.round(uv[:, 0]).astype(jnp.int32)
    py = jnp.round(uv[:, 1]).astype(jnp.int32)
    inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    ok = vis & inside
    slot = jnp.arange(C, dtype=jnp.int32)
    buf = _packed_splat(py * w + px, z, slot, ok, h, w)

    # near pass: voxels whose footprint exceeds one pixel
    r_px = jnp.where(ok, K[0, 0] * radius_world / jnp.maximum(z, 1e-3), 0.0)
    near_rank = jnp.argsort(-r_px)[:_NEAR_CAP]
    n_ok = ok[near_rank] & (r_px[near_rank] > 0.75)
    taps = jnp.arange(-_STENCIL, _STENCIL + 1)
    du, dv = jnp.meshgrid(taps, taps, indexing="ij")
    du = du.reshape(-1)
    dv = dv.reshape(-1)
    S = du.shape[0]
    ix = px[near_rank][:, None] + du[None]
    iy = py[near_rank][:, None] + dv[None]
    infoot = (jnp.abs(du[None]) <= r_px[near_rank][:, None] + 0.5) & \
        (jnp.abs(dv[None]) <= r_px[near_rank][:, None] + 0.5)
    n_ok2 = n_ok[:, None] & infoot & (ix >= 0) & (ix < w) & (iy >= 0) & \
        (iy < h)
    buf_near = _packed_splat(
        (iy * w + ix).reshape(-1), jnp.repeat(z[near_rank], S),
        jnp.repeat(near_rank.astype(jnp.int32), S), n_ok2.reshape(-1), h, w)
    buf = jnp.minimum(buf, buf_near)

    hit = buf != jnp.int32((1 << 31) - 1)
    win_slot = jnp.clip(buf & ((1 << 20) - 1), 0, C - 1)
    depth = jnp.where(hit, z[win_slot], 0.0).reshape(h, w)
    sem = jnp.where(hit, attrs[win_slot, 0], 0).reshape(h, w)
    ins = jnp.where(hit, attrs[win_slot, 1], 0).reshape(h, w)

    # hole fill: INTERIOR pinholes (empty pixels mostly surrounded by hits)
    # adopt the nearest-depth 3x3 neighbor; open sky stays 0
    def fill(carry, _):
        d, s, i = carry
        best = jnp.full_like(d, jnp.inf)
        bs, bi = s, i
        n_hit = jnp.zeros_like(d)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                dn = jnp.roll(jnp.roll(d, dy, 0), dx, 1)
                sn = jnp.roll(jnp.roll(s, dy, 0), dx, 1)
                inn = jnp.roll(jnp.roll(i, dy, 0), dx, 1)
                n_hit = n_hit + (dn > 0)
                better = (dn > 0) & ((dn < best) | (best == jnp.inf))
                best = jnp.where(better, dn, best)
                bs = jnp.where(better, sn, bs)
                bi = jnp.where(better, inn, bi)
        empty = (d == 0) & (n_hit >= 6) & jnp.isfinite(best)
        d2 = jnp.where(empty, best, d)
        s2 = jnp.where(empty, bs, s)
        i2 = jnp.where(empty, bi, i)
        return (d2, s2, i2), None

    (depth, sem, ins), _ = jax.lax.scan(fill, (depth, sem, ins), None,
                                        length=fill_iters)
    return FrameBuffers(depth=depth, semantic=sem.astype(jnp.int32),
                        instance=ins.astype(jnp.int32))


@partial(jax.jit, static_argnames=("image_hw", "fill_iters"))
def render_sequence_splat(grid: Grid, semantics: jnp.ndarray,
                          instance: jnp.ndarray, objects: DynamicObjects,
                          K: jnp.ndarray, cam_to_worlds: jnp.ndarray,
                          image_hw: tuple[int, int],
                          fill_iters: int = 2) -> FrameBuffers:
    """Splat-rasterized buffer sequence: static voxel centers + per-frame
    posed canonical-car points, z-buffered per frame under lax.scan."""
    from infinicube_tpu.utils.cad_car import canonical_car_points
    centers = grid.voxel_centers()[0]
    svalid = grid.mask[0]
    sattr = jnp.stack([semantics, instance], axis=-1).astype(jnp.int32)
    srad = jnp.full((centers.shape[0],),
                    0.5 * jnp.max(grid.voxel_size))
    car_pts = jnp.asarray(canonical_car_points())          # [P, 3] unit box
    P = car_pts.shape[0]
    M = objects.lwh.shape[0]

    def one_frame(_, inp):
        pose, obj_poses, obj_valid = inp

        def car_world(opose, lwh):
            return (car_pts * lwh) @ opose[:3, :3].T + opose[:3, 3]

        cpts = jax.vmap(car_world)(obj_poses, objects.lwh)  # [M, P, 3]
        cattr = jnp.stack([
            jnp.broadcast_to(objects.sem[:, None], (M, P)),
            jnp.broadcast_to(objects.ids[:, None], (M, P))], -1)
        crad = jnp.broadcast_to(
            (jnp.min(objects.lwh, -1) / 12.0)[:, None], (M, P))
        cvalid = jnp.broadcast_to(obj_valid[:, None], (M, P))
        pts = jnp.concatenate([centers, cpts.reshape(-1, 3)])
        att = jnp.concatenate([sattr, cattr.reshape(-1, 2)])
        rad = jnp.concatenate([srad, crad.reshape(-1)])
        val = jnp.concatenate([svalid, cvalid.reshape(-1)])
        fb = splat_frame(pts, att, val, rad, K, pose, image_hw, fill_iters)
        return None, fb

    _, out = jax.lax.scan(one_frame, None,
                          (cam_to_worlds, objects.poses, objects.valid))
    return out


def generate_coordinate_buffer(depth: jnp.ndarray, K: jnp.ndarray,
                               cam_to_worlds: jnp.ndarray,
                               percentile: float = 0.05) -> jnp.ndarray:
    """Point-map buffer: unproject z-depths into frame-0 CAMERA coordinates and
    normalize to [0,1] with global per-axis percentiles; no-hit -> 1.0.

    depth f32[T, H, W]; cam_to_worlds f32[T, 4, 4]. Returns f32[T, H, W, 3].
    (reference buffer_utils.generate_coordinate_buffer_from_memory_global_norm)
    """
    from infinicube_tpu.camera.conventions import invert_pose
    cam0_inv = invert_pose(cam_to_worlds[0])
    to_cam0 = jnp.einsum("ij,tjk->tik", cam0_inv, cam_to_worlds)
    pts = jax.vmap(lambda zd, T_: proj.unproject_depth(zd, K, T_))(
        depth, to_cam0)                                  # [T, H, W, 3]
    invalid = depth == 0.0
    flat = pts.reshape(-1, 3)
    vmask = ~invalid.reshape(-1)
    # masked per-axis quantiles: sort with invalids pushed to +inf
    def axis_q(x):
        xs = jnp.sort(jnp.where(vmask, x, jnp.inf))
        n = jnp.maximum(jnp.sum(vmask), 1)
        lo = xs[jnp.clip((percentile * n).astype(jnp.int32), 0, x.shape[0] - 1)]
        hi = xs[jnp.clip(((1 - percentile) * n).astype(jnp.int32), 0,
                         x.shape[0] - 1)]
        return lo, hi
    lo, hi = jax.vmap(axis_q, in_axes=1, out_axes=0)(flat)
    rng = jnp.maximum(hi - lo, 1e-7)
    norm = jnp.clip((pts - lo) / rng, 0.0, 1.0)
    return jnp.where(invalid[..., None], 1.0, norm)


def generate_guidance_buffers(grid: Grid, semantics: jnp.ndarray,
                              instance: jnp.ndarray, camera: PinholeCamera,
                              cam_to_worlds: jnp.ndarray,
                              objects: DynamicObjects | None = None,
                              ijk_min=None, dense_dims=None,
                              method: str = "splat"):
    """One-call stage-2 pipeline. Returns dict with depth/semantic/instance
    [T,H,W] + coordinate [T,H,W,3], all device arrays.

    method "splat" (default): z-buffered voxel splatting — the fast TPU path.
    method "dda": exact first-hit ray marching (reference semantics)."""
    T = cam_to_worlds.shape[0]
    if objects is None:
        objects = DynamicObjects.empty(T)
    if method == "splat":
        fb = render_sequence_splat(grid, semantics, instance, objects,
                                   camera.intrinsics_matrix(), cam_to_worlds,
                                   (camera.h, camera.w))
    else:
        if ijk_min is None or dense_dims is None:
            mn, mx = grid.bbox_ijk()
            mn = np.asarray(jax.device_get(mn))[0]
            mx = np.asarray(jax.device_get(mx))[0]
            ijk_min = tuple(int(v) for v in mn)
            dense_dims = tuple(int(v) for v in (mx - mn + 1))
        blocks = build_static_blocks(grid, semantics, instance, ijk_min,
                                     dense_dims)
        fb = render_sequence(blocks, objects, camera.intrinsics_matrix(),
                             cam_to_worlds, (camera.h, camera.w))
    coord = generate_coordinate_buffer(fb.depth, camera.intrinsics_matrix(),
                                       cam_to_worlds)
    return {"depth": fb.depth, "semantic": fb.semantic,
            "instance": fb.instance, "coordinate": coord}
