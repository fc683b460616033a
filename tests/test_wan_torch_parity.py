"""Numerics parity: torch Wan2.1 mirror -> converter -> JAX WanDiT.

Validates the full checkpoint path for the video DiT (the reference's entire
stage 2 runs on pretrained weights: /root/reference/infinicube/videogen/
inference.py:63-88): interleaved-pair RoPE handled by the converter's
channel permutation, full-dim q/k RMSNorm, per-block modulation bias, and
the Head's (modulation + t_emb) math.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig
from infinicube_tpu.weights.convert import convert_wan_dit

from torch_mirrors.wan_dit_torch import WanModelMirror


def _tiny_cfg(scan_layers):
    return WanDiTConfig(
        dim=64, ffn_dim=128, num_layers=2, num_heads=2, in_channels=4,
        out_channels=4, text_dim=32, freq_dim=32, patch_size=(1, 2, 2),
        buffer_channels=6, dtype=jnp.float32, scan_layers=scan_layers)


@pytest.mark.parametrize("scan_layers", [False, True])
def test_wan_dit_matches_torch_mirror(scan_layers):
    torch.manual_seed(0)
    mirror = WanModelMirror(dim=64, ffn_dim=128, num_layers=2, num_heads=2,
                            in_dim=4, out_dim=4, text_dim=32, freq_dim=32,
                            buffer_dim=6).eval()
    sd = mirror.state_dict()

    B, T, H, W = 1, 2, 4, 6
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(B, 4, T, H, W)).astype(np.float32)
    buf = rng.normal(size=(B, 6, T, H, W)).astype(np.float32)
    txt = rng.normal(size=(B, 7, 32)).astype(np.float32)
    t = np.array([700.0], np.float32)

    with torch.no_grad():
        ref = mirror(torch.from_numpy(lat), torch.from_numpy(t),
                     torch.from_numpy(txt), torch.from_numpy(buf)).numpy()

    cfg = _tiny_cfg(scan_layers)
    params = convert_wan_dit(sd, num_layers=2, num_heads=2,
                             scan_layers=scan_layers)
    out = WanDiT(cfg).apply(
        params, jnp.asarray(lat.transpose(0, 2, 3, 4, 1)), jnp.asarray(t),
        jnp.asarray(txt), jnp.asarray(buf.transpose(0, 2, 3, 4, 1)))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)

    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_rope_permutation_preserves_attention_logits():
    """q.k dot products must be identical under the converter's
    interleave->halfsplit channel permutation (sanity of the equivalence the
    converter relies on)."""
    from infinicube_tpu.weights.convert import _rope_interleave_to_halfsplit
    rng = np.random.default_rng(0)
    h, d = 2, 16
    q = rng.normal(size=(5, h * d)).astype(np.float32)
    k = rng.normal(size=(5, h * d)).astype(np.float32)
    qp = _rope_interleave_to_halfsplit(q, h)
    kp = _rope_interleave_to_halfsplit(k, h)
    per_head = lambda x: x.reshape(5, h, d)
    logits = np.einsum("qhd,khd->hqk", per_head(q), per_head(k))
    logits_p = np.einsum("qhd,khd->hqk", per_head(qp), per_head(kp))
    np.testing.assert_allclose(logits, logits_p, atol=1e-5)


def test_initialize_buffer_embedder_on_vanilla_checkpoint():
    """A plain T2V checkpoint (no buffer_embedding keys) + zero-init embedder
    must produce the identical output as the unconditioned model (reference
    initialize_buffer_embedder zero_init=True semantics)."""
    from infinicube_tpu.weights.convert import initialize_buffer_embedder
    torch.manual_seed(0)
    mirror = WanModelMirror(dim=64, ffn_dim=128, num_layers=2, num_heads=2,
                            in_dim=4, out_dim=4, text_dim=32, freq_dim=32,
                            buffer_dim=None).eval()
    cfg = _tiny_cfg(scan_layers=True)
    params = convert_wan_dit(mirror.state_dict(), num_layers=2, num_heads=2)
    params = initialize_buffer_embedder(params, cfg)

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 2, 4, 6, 4)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, 5, 32)), jnp.float32)
    buf = jnp.asarray(rng.normal(size=(1, 2, 4, 6, 6)), jnp.float32)
    t = jnp.asarray([100.0])
    with_buf = WanDiT(cfg).apply(params, lat, t, txt, buf)
    without = WanDiT(cfg).apply(params, lat, t, txt, None)
    np.testing.assert_allclose(np.asarray(with_buf), np.asarray(without),
                               atol=1e-6)
