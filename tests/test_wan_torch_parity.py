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


def test_wan_vae_matches_torch_mirror():
    """Converted Wan VAE weights must reproduce the torch mirror's encode
    and decode on a tiny config (checkpoint path for the video VAE;
    reference loads Wan2.1_VAE.pth, inference.py:63-81)."""
    from infinicube_tpu.models.wan.vae3d import VideoVAE, VideoVAEConfig
    from infinicube_tpu.weights.wan_convert import convert_wan_vae
    from torch_mirrors.wan_vae_torch import WanVAEMirror

    torch.manual_seed(0)
    mirror = WanVAEMirror(dim=8, z_dim=4, dim_mult=(1, 2, 2),
                          num_res_blocks=1,
                          temperal_downsample=(False, True)).eval()
    cfg = VideoVAEConfig(latent_channels=4, base_channels=8,
                         channel_mult=(1, 2, 2), num_res_blocks=1,
                         temporal_down=(False, True), dtype=jnp.float32)
    params = convert_wan_vae(mirror.state_dict())
    vae = VideoVAE(cfg)

    rng = np.random.default_rng(0)
    vid = rng.uniform(-1, 1, (1, 5, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        mu_t = mirror.encode(
            torch.from_numpy(vid.transpose(0, 4, 1, 2, 3))).numpy()
        dec_t = mirror.decode(torch.from_numpy(mu_t)).numpy()
    mu_j = vae.apply(params, jnp.asarray(vid), method=VideoVAE.encode)
    mu_j_t = np.asarray(mu_j).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(mu_j_t, mu_t, atol=2e-4, rtol=1e-3)
    assert mu_t.shape == (1, 4, 3, 4, 4)  # [B, z, 1+(T-1)/2, H/4, W/4]

    dec_j = vae.apply(params, mu_j, method=VideoVAE.decode)
    np.testing.assert_allclose(np.asarray(dec_j).transpose(0, 4, 1, 2, 3),
                               dec_t, atol=2e-4, rtol=1e-3)


def test_umt5_matches_transformers():
    """Converted HF UMT5 weights must reproduce UMT5EncoderModel numerics
    (the umt5-xxl conditioning tower, reference inference.py:63-88)."""
    from transformers import UMT5Config as HFCfg, UMT5EncoderModel
    from infinicube_tpu.models.wan.t5 import T5Config, T5Encoder
    from infinicube_tpu.weights.wan_convert import convert_umt5_hf

    torch.manual_seed(0)
    hf = UMT5EncoderModel(HFCfg(
        vocab_size=512, d_model=64, d_ff=128, num_layers=2, num_heads=4,
        d_kv=16, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False)).eval()
    cfg = T5Config.tiny(dtype=jnp.float32)
    params = convert_umt5_hf(hf.state_dict(), num_layers=2)

    ids = np.array([[5, 9, 200, 3, 1, 0, 0]], np.int64)
    mask = (ids != 0)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))
                 ).last_hidden_state.numpy()
    out = T5Encoder(cfg).apply(params, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask))
    out = np.asarray(out)
    # our encoder zeroes masked positions; compare valid tokens
    np.testing.assert_allclose(out[mask], ref[mask], atol=2e-4, rtol=1e-3)


def test_umt5_wan_layout_converts():
    """The Wan .pth key layout maps onto the same tree (synthesized state
    dict with Wan key names; gate.0 is the GELU branch)."""
    from infinicube_tpu.models.wan.t5 import T5Config, T5Encoder
    from infinicube_tpu.weights.wan_convert import (
        convert_umt5_hf, convert_umt5_wan)
    from transformers import UMT5Config as HFCfg, UMT5EncoderModel

    torch.manual_seed(1)
    hf = UMT5EncoderModel(HFCfg(
        vocab_size=512, d_model=64, d_ff=128, num_layers=2, num_heads=4,
        d_kv=16, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False)).eval()
    hsd = hf.state_dict()
    wan_sd = {"token_embedding.weight": hsd["shared.weight"],
              "norm.weight": hsd["encoder.final_layer_norm.weight"]}
    for i in range(2):
        b, hb = f"blocks.{i}", f"encoder.block.{i}"
        att = f"{hb}.layer.0.SelfAttention"
        wan_sd.update({
            f"{b}.norm1.weight": hsd[f"{hb}.layer.0.layer_norm.weight"],
            f"{b}.attn.q.weight": hsd[f"{att}.q.weight"],
            f"{b}.attn.k.weight": hsd[f"{att}.k.weight"],
            f"{b}.attn.v.weight": hsd[f"{att}.v.weight"],
            f"{b}.attn.o.weight": hsd[f"{att}.o.weight"],
            f"{b}.pos_embedding.embedding.weight":
                hsd[f"{att}.relative_attention_bias.weight"],
            f"{b}.norm2.weight": hsd[f"{hb}.layer.1.layer_norm.weight"],
            f"{b}.ffn.gate.0.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wi_0.weight"],
            f"{b}.ffn.fc1.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wi_1.weight"],
            f"{b}.ffn.fc2.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wo.weight"],
        })
    p_hf = convert_umt5_hf(hsd, 2)
    p_wan = convert_umt5_wan(wan_sd, 2)
    cfg = T5Config.tiny(dtype=jnp.float32)
    ids = jnp.asarray([[7, 3, 100]], jnp.int32)
    mask = jnp.ones((1, 3), bool)
    a = T5Encoder(cfg).apply(p_hf, ids, mask)
    b = T5Encoder(cfg).apply(p_wan, ids, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_rope_table_matches_upstream_formula():
    """Golden: the mirror's registered freqs buffer must equal an
    independently computed upstream table (wan/modules/model.py
    rope_params: polar(1, arange(L) x theta^(-2i/dim)), axis split
    [d-4(d//6), 2(d//6), 2(d//6)]), and the JAX rope_3d angles must equal
    the same table's angles on a 3D grid (half-split vs interleaved layouts
    agree on the underlying per-pair angles)."""
    import numpy as onp
    torch.manual_seed(0)
    mirror = WanModelMirror(dim=64, ffn_dim=128, num_layers=1, num_heads=2,
                            in_dim=4, out_dim=4, text_dim=32, freq_dim=32)
    d = 32  # head dim
    def axis_table(L, dim_axis):
        inv = 1.0 / (10000.0 ** (onp.arange(0, dim_axis, 2) / dim_axis))
        ang = onp.outer(onp.arange(L), inv)
        return onp.exp(1j * ang)
    golden = onp.concatenate([
        axis_table(1024, d - 4 * (d // 6)),
        axis_table(1024, 2 * (d // 6)),
        axis_table(1024, 2 * (d // 6))], axis=1)
    onp.testing.assert_allclose(mirror.freqs.numpy(), golden, atol=2e-4)

    # JAX side: rope_3d returns the same per-pair angles on a (T,H,W) grid
    from infinicube_tpu.models.wan.dit import rope_3d
    T, H, W = 3, 4, 5
    ang = onp.asarray(rope_3d((T, H, W), d))     # [T*H*W, d//2]
    c = d // 2
    split = [c - 2 * (c // 3), c // 3, c // 3]
    # rope_3d angles are unwrapped; compare on the unit circle (cis) where
    # both layouts are defined
    i = 0
    for t in range(T):
        for h in range(H):
            for w in range(W):
                expect = onp.concatenate([
                    golden[t, :split[0]],
                    golden[h, split[0]:split[0] + split[1]],
                    golden[w, split[0] + split[1]:]])
                onp.testing.assert_allclose(onp.exp(1j * ang[i]), expect,
                                            atol=1e-5)
                i += 1


def test_wan_latent_stats_golden():
    """Golden: the per-channel latent mean/std constants are the published
    Wan2.1 values (wan/modules/vae.py mean/std lists) and the VAE actually
    normalizes with them."""
    import numpy as onp
    from infinicube_tpu.models.wan.vae3d import (WAN_LATENT_MEAN,
                                                 WAN_LATENT_STD,
                                                 VideoVAEConfig)
    published_mean = [
        -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
        0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921]
    published_std = [
        2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
        3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160]
    onp.testing.assert_array_equal(onp.asarray(WAN_LATENT_MEAN),
                                   onp.asarray(published_mean))
    onp.testing.assert_array_equal(onp.asarray(WAN_LATENT_STD),
                                   onp.asarray(published_std))
    cfg = VideoVAEConfig.wan21()
    assert tuple(cfg.latent_mean) == tuple(published_mean)
    assert tuple(cfg.latent_std) == tuple(published_std)
