"""Release-shape smoke tests — one per subsystem, on the REAL chip.

VERDICT round-2 Weak #7: the CPU suite runs tiny shapes; nothing in CI
asserted behavior at release scale (131k-voxel VAE, 64^3 diffusion cube,
500k-gaussian render, tiled Wan-VAE seams, world-merge overflow). These
smokes run the exact release shapes the benchmarks use and assert
shapes / finiteness / overflow flags (not perf):

    INFINICUBE_TPU_TESTS=1 python -m pytest tests/ -m slow -q

Under the default CPU suite they auto-skip (conftest forces the CPU
platform unless INFINICUBE_TPU_TESTS=1; release shapes take hours on host).
Reference test strategy: SURVEY.md §4 (the reference exercises release
shapes only in its inference scripts; these make that coverage CI-shaped).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="release-shape smokes run on the TPU chip "
               "(INFINICUBE_TPU_TESTS=1 ... -m slow)"),
]


def _finite(x) -> bool:
    return bool(jax.device_get(jnp.isfinite(x).all()))


@pytest.fixture(scope="module")
def surface_scene():
    """Waymo-like synthetic surface scene (same construction as
    benchmarks/bench_vae_train.py): road plane + walls + objects, 300k
    points -> ~131k occupied finest voxels."""
    rng = np.random.default_rng(0)
    n = 300_000
    # extents tuned so the occupied set is release scale but FITS: 128,217
    # finest voxels against the 131,072 capacity (a larger scene overflows
    # the hash tree, which the first assertion below would flag)
    road = np.stack([rng.uniform(-14, 14, n // 2),
                     rng.uniform(-11, 11, n // 2),
                     rng.normal(0, 0.1, n // 2)], -1)
    walls = np.stack([rng.uniform(-14, 14, n // 4),
                      np.sign(rng.normal(size=n // 4)) *
                      rng.normal(9, 0.3, n // 4),
                      rng.uniform(0, 7, n // 4)], -1)
    objs = rng.normal(0, 1.2, (n // 4, 3)) * [1, 1, 0.8] + \
        np.stack([rng.uniform(-11, 11, n // 4),
                  rng.uniform(-6, 6, n // 4),
                  np.full(n // 4, 1.0)], -1)
    pts = np.concatenate([road, walls, objs]).astype(np.float32)[None]
    sem = rng.integers(0, 23, (1, n)).astype(np.int32)
    return jnp.asarray(pts), jnp.asarray(sem)


def test_vae_forward_131k_voxels(surface_scene):
    """Sparse VAE forward at release capacity (131072 finest voxels):
    hash-tree build must not overflow, the window conv plans must not
    overflow their miss capacity, and the teacher-forced recon must be
    finite at every head."""
    from infinicube_tpu.grid.ops import majority_label
    from infinicube_tpu.models.vae import (
        SparseStructureVAE, SparseVAEConfig, build_hash_tree)
    from infinicube_tpu.nn.sparse import conv_plan

    pts, sem_pts = surface_scene
    cfg = SparseVAEConfig(dtype=jnp.bfloat16)
    model = SparseStructureVAE(cfg)
    mask = jnp.ones(pts.shape[:2], bool)
    grids = build_hash_tree(cfg, pts, mask)
    for l, g in enumerate(grids):
        assert not bool(jax.device_get(g.overflowed.any())), \
            f"hash-tree level {l} overflowed its capacity"
        nv = int(jax.device_get(g.total_voxels.sum()))
        assert nv > 1000, f"level {l} suspiciously empty ({nv} voxels)"
    # release-scale window plan stays exact (ADVICE round-2 medium)
    plan = conv_plan(grids[0], "window")
    assert not bool(jax.device_get(plan.overflowed.any())), \
        "window plan fallback list overflowed at release scale"

    sem = majority_label(grids[0], pts, sem_pts, mask, cfg.num_semantic)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), grids, sem,
                                 jax.random.PRNGKey(1))
    out = jax.jit(model.apply)(params, grids, sem, jax.random.PRNGKey(2))
    assert out["semantic_logits"].shape == (1, cfg.capacities[0],
                                            cfg.num_semantic)
    assert _finite(out["mu"]) and _finite(out["logvar"])
    assert _finite(out["semantic_logits"])
    for logits, target, cand in out["struct"]:
        assert _finite(logits)


def test_vae_free_decode_structure_growth(surface_scene):
    """Structure-decoder GROWTH at release scale: free-running decode (no
    guide grids) from an encoded latent must grow a non-trivial,
    non-overflowing voxel hierarchy (VERDICT: 'structure-decoder growth at
    131k voxels')."""
    from infinicube_tpu.grid.ops import majority_label
    from infinicube_tpu.models.vae import (
        SparseStructureVAE, SparseVAEConfig, build_hash_tree)

    pts, sem_pts = surface_scene
    cfg = SparseVAEConfig(dtype=jnp.bfloat16)
    model = SparseStructureVAE(cfg)
    mask = jnp.ones(pts.shape[:2], bool)
    grids = build_hash_tree(cfg, pts, mask)
    sem = majority_label(grids[0], pts, sem_pts, mask, cfg.num_semantic)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), grids, sem,
                                 jax.random.PRNGKey(1))

    def encode_decode(p, gs, s):
        mu, _ = model.apply(p, gs, s, method=SparseStructureVAE.encode)
        return model.apply(p, mu, method=SparseStructureVAE.decode)

    out = jax.jit(encode_decode)(params, grids, sem)
    g = out["grid"]
    nv = int(jax.device_get(g.total_voxels.sum()))
    # random-weight decode growth is unpredictable in count but must stay
    # within capacity, keep a sane voxel set, and stay finite
    assert not bool(jax.device_get(g.overflowed.any()))
    assert 0 <= nv <= cfg.capacities[0]
    assert _finite(out["semantic_logits"])


def test_voxel_diffusion_release_sample_step():
    """Release 750M dense UNet (64^3 latent cube), two DDIM steps with CFG
    (the exact bench_voxel_ddim config): finite latents at the release
    output shape."""
    from infinicube_tpu.models.diffusion.model import (
        CondCubes, DiffusionConfig, VoxelDiffusion)

    cfg = DiffusionConfig()
    model = VoxelDiffusion(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    cond = CondCubes.null(1, cfg)
    out = model.sample(params, jax.random.PRNGKey(1), cond, num_steps=2,
                       guidance_scale=2.0)
    assert out.shape == (1, *cfg.cube_dims, cfg.latent_channels)
    assert _finite(out)


def test_gsplat_500k_render():
    """3DGS rasterizer at release scale (500k gaussians -> 480x832): image
    finite, alpha a valid transmittance in [0, 1]."""
    from infinicube_tpu.ops.gsplat import render_gaussians

    rng = np.random.default_rng(0)
    n = 500_000
    means = np.stack([rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                      rng.uniform(2, 80, n)], -1).astype(np.float32)
    quats = np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, (n, 3)).astype(np.float32)
    op = rng.uniform(0.2, 0.9, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    K = jnp.array([[480.0, 0, 416], [0, 480, 240], [0, 0, 1]])
    img, alpha, *_ = jax.jit(
        lambda *a: render_gaussians(*a, jnp.eye(4), K, (480, 832)))(
        *(jnp.asarray(x) for x in (means, quats, scales, op, col)))
    assert img.shape[:2] == (480, 832)
    assert _finite(img) and _finite(alpha)
    amin, amax = (float(jax.device_get(f(alpha)))
                  for f in (jnp.min, jnp.max))
    assert 0.0 <= amin and amax <= 1.0 + 1e-4
    assert amax > 0.5  # 500k gaussians over the frustum must hit pixels


def test_wan_vae_tiled_decode_matches_full():
    """Tiled serving decode vs whole-clip decode at release spatial size
    (60x104 latents -> 480x832) (VERDICT: 'tiled-VAE blend seams').

    What tiling guarantees, and what this asserts:
    - an axis covered by ONE tile decodes EXACTLY like the full clip
      (regression for the round-3 bug where the tile extent was padded to
      tile+overlap with edge-replicated latents even when one tile covered
      the axis);
    - multi-tile decode is approximate BY DESIGN — the decoder's mid-block
      attention is global per tile and the conv receptive field exceeds
      the blend overlap, exactly as in the upstream Wan2.1 tiled VAE.
      Random weights amplify this far beyond trained-weight levels, so the
      multi-tile assertions are distributional: finite, same range, small
      mean deviation, and a larger overlap must approximate better."""
    from infinicube_tpu.models.wan.vae3d import (
        VideoVAE, VideoVAEConfig, decode_tiled_host)

    cfg = VideoVAEConfig.wan21()
    vae = VideoVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0),
                          (1, 3, 60, 104, cfg.latent_channels))
    params = vae.init(jax.random.PRNGKey(1), z[:, :, :16, :16],
                      method=VideoVAE.decode)

    def full_decode(zz):
        return np.asarray(jax.device_get(jax.jit(
            lambda p, z: vae.apply(p, z, method=VideoVAE.decode))(
                params, zz)), np.float32)

    # single tile covers [48, 24] -> must be EXACT
    zs = z[:, :, :48, :24]
    d1 = np.abs(full_decode(zs)
                - np.asarray(decode_tiled_host(vae, params, zs,
                                               to_uint8=False), np.float32))
    assert float(d1.max()) < 1e-5, f"single-tile decode differs: {d1.max()}"

    # multi-tile at release shape: bounded approximation, monotone in overlap
    full_h = full_decode(z)
    means = {}
    for ov in (4, 16):
        t = np.asarray(decode_tiled_host(vae, params, z, overlap=ov,
                                         to_uint8=False), np.float32)
        assert t.shape == full_h.shape and np.isfinite(t).all()
        means[ov] = float(np.abs(full_h - t).mean())
    assert means[4] < 0.1, f"tiled decode deviates: mean {means[4]}"
    assert means[16] < means[4], \
        f"larger overlap must approximate better: {means}"


def test_world_merge_capacity_overflow_surfaced():
    """World-scale merge overflow must be LOUD: merging more voxels than
    device capacity sets Grid.overflowed (VERDICT: 'capacity-overflow
    surfacing at world-merge scale'); the host-side world grid (int64 keys)
    absorbs the same set without dropping."""
    from infinicube_tpu.grid.build import grid_from_ijk, merge_grids
    from infinicube_tpu.utils.world_grid import WorldGrid

    rng = np.random.default_rng(1)
    cap = 131072
    # two dense chunks whose union exceeds capacity
    a = np.unique(rng.integers(-400, 400, (cap, 3)).astype(np.int32),
                  axis=0)
    b = a + np.array([500, 0, 0], np.int32)   # disjoint -> union = 2x
    ga = grid_from_ijk(jnp.asarray(a[None]), jnp.ones((1, len(a)), bool),
                       capacity=cap, voxel_size=(0.2, 0.2, 0.2),
                       origin=(0.1, 0.1, 0.1))
    gb = grid_from_ijk(jnp.asarray(b[None]), jnp.ones((1, len(b)), bool),
                       capacity=cap, voxel_size=(0.2, 0.2, 0.2),
                       origin=(0.1, 0.1, 0.1))
    merged = merge_grids(ga, gb, capacity=cap)
    assert bool(jax.device_get(merged.overflowed.any())), \
        "device merge past capacity must surface overflow"

    world = WorldGrid((0.2, 0.2, 0.2), origin=(0.1, 0.1, 0.1))
    for ijk in (a, b):
        world.merge_ijk(ijk, np.zeros(len(ijk), np.int32))
    # a and b are NOT fully disjoint (a spans x in [-400, 400), b = a+500
    # spans [100, 900) — collisions where a holds both (x, y, z) and
    # (x+500, y, z)); the world grid must hold exactly the union
    expected = len(np.unique(np.concatenate([a, b]), axis=0))
    assert world.num_voxels == expected

def test_blocks_mode_map_scale():
    """Blocks mode at map scale (VERDICT r3 next #7): a 3x3-block release
    run (750M 64^3 UNet, 51.2 m chunks, 0.25 overlap -> ~128x128 m world)
    through the PACKED latent-ijk hash table + int64 world accumulation.
    Asserts the table dedupes overlap regions to exactly the unique world
    latent cells, later blocks actually receive SDEdit overlap, the world
    ijk stays inside the packed-key domain, and everything is finite.
    Mirrors /root/reference/infinicube/inference/voxel_world_generation.py:
    665-785 (latent_ijk_hash_table) + 857-925 (blocks mode). DDIM-4 keeps
    the smoke ~1 min steady; fidelity is the DDIM bench's job."""
    import time
    from infinicube_tpu.models.diffusion.model import (
        DiffusionConfig, VoxelDiffusion)
    from infinicube_tpu.inference.voxel_world_generation import (
        VoxelWorldGenerator, WorldGenConfig)

    dcfg = DiffusionConfig()               # the release 750M config
    diffusion = VoxelDiffusion(dcfg)
    params = jax.jit(diffusion.init)(jax.random.PRNGKey(0))

    def decode_fn(latents):
        # threshold decode (VAE-free): ch0 > 1 sigma -> voxel at 4x subdiv
        lat = np.asarray(jax.device_get(latents))[0]
        occ = lat[..., 0] > 1.0
        ii, jj, kk = np.meshgrid(*[np.arange(s) for s in lat.shape[:3]],
                                 indexing="ij")
        ijk = np.stack([ii, jj, kk], -1)[occ] + np.asarray(dcfg.cube_ijk_min)
        sem = np.where(lat[..., 1][occ] > 0, 18, 14).astype(np.int32)
        return (ijk * 4).astype(np.int64), sem

    gen = VoxelWorldGenerator(diffusion, params, decode_fn,
                              WorldGenConfig(ddim_steps=4,
                                             guidance_scale=2.0),
                              finest_voxel_size=0.2)
    maps = {"road_edge": np.stack([np.linspace(0, 120, 300),
                                   np.full(300, -4.0), np.zeros(300)], -1)}
    sdedit_blocks = []
    orig = gen._sdedit_from_table

    def spy(c2w):
        s = orig(c2w)
        sdedit_blocks.append(s is not None)
        return s

    gen._sdedit_from_table = spy
    t0 = time.perf_counter()
    world = gen.generate_blocks([0.0, 0.0], [90.0, 90.0], map_points=maps,
                                seed=0)
    dt = time.perf_counter() - t0
    n_blocks = len(gen._block_centers([0.0, 0.0], [90.0, 90.0]))
    assert n_blocks >= 9, n_blocks                      # >= 3x3 map tiling
    assert len(sdedit_blocks) == n_blocks
    assert not sdedit_blocks[0] and all(sdedit_blocks[1:]), \
        "every later block overlaps earlier generation (0.25 overlap)"
    # the packed table holds exactly the UNIQUE world latent cells
    cells = np.concatenate([gen._latent_world_ijk(
        np.concatenate([np.eye(4)[:3, :3], c[:, None]], 1))
        for c in gen._block_centers([0.0, 0.0], [90.0, 90.0])[:, :3]])
    uniq = len(np.unique(gen._pack_keys(cells)))
    assert len(gen._table_keys) == uniq, (len(gen._table_keys), uniq)
    assert len(gen._table_keys) < n_blocks * int(np.prod(dcfg.cube_dims))
    assert np.isfinite(gen._table_vals).all()
    # int64 world accumulation: non-empty, in pack64 domain, exact union
    assert world.num_voxels > 0
    from infinicube_tpu.utils.world_grid import pack64, unpack64
    np.testing.assert_array_equal(unpack64(pack64(world.ijk())), world.ijk())
    print(f"[blocks-smoke] {n_blocks} blocks, {world.num_voxels} voxels, "
          f"{len(gen._table_keys)} table cells, {dt:.1f}s")
