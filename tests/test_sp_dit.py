"""Sequence-parallel Wan DiT: ring attention over the mesh `seq` axis inside
the full model (cfg.sp_axis + sp_mesh), numerically identical to the local
flash/einsum path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig


@pytest.mark.parametrize("scan", [False, True])
def test_sp_dit_matches_local(scan):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(1, 8),
                ("data", "seq"))
    cfg = WanDiTConfig(dim=64, ffn_dim=128, num_layers=2, num_heads=4,
                       in_channels=4, out_channels=4, text_dim=32,
                       freq_dim=16, buffer_channels=8, dtype=jnp.float32,
                       sp_axis="seq", scan_layers=scan)
    m = WanDiT(cfg, sp_mesh=mesh)
    lat = jnp.ones((1, 4, 8, 16, 4)) * 0.1       # 128 tokens -> 16/device
    buf = jnp.full((1, 4, 8, 16, 8), 0.05)
    txt = jnp.ones((1, 8, 32))
    t = jnp.full((1,), 10.0)
    p = m.init(jax.random.PRNGKey(0), lat, t, txt, buf)
    out = jax.jit(lambda p, *a: m.apply(p, *a))(p, lat, t, txt, buf)
    m0 = WanDiT(WanDiTConfig(**{**cfg.__dict__, "sp_axis": None}))
    ref = m0.apply(p, lat, t, txt, buf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
