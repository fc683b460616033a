"""DAv2 feature tower vs the installed HuggingFace DepthAnything (torch).

Random tiny-config weights convert through convert_dav2_hf; the flax
forward must match transformers' forward_fusion-equivalent numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from infinicube_tpu.models.gsm.dav2 import (
    DAv2Config, DepthAnythingFeatures, convert_dav2_hf)


@pytest.fixture(scope="module")
def pair():
    from transformers import (
        DepthAnythingConfig, DepthAnythingForDepthEstimation, Dinov2Config)
    bc = Dinov2Config(hidden_size=32, num_hidden_layers=4,
                      num_attention_heads=2, intermediate_size=128,
                      patch_size=14, image_size=70,
                      out_indices=[1, 2, 3, 4],
                      out_features=["stage1", "stage2", "stage3", "stage4"],
                      reshape_hidden_states=False)
    hcfg = DepthAnythingConfig(backbone_config=bc, fusion_hidden_size=16,
                               neck_hidden_sizes=[8, 12, 16, 16],
                               patch_size=14, reassemble_hidden_size=32,
                               reassemble_factors=[4, 2, 1, 0.5])
    tm = DepthAnythingForDepthEstimation(hcfg).eval()
    cfg = DAv2Config.tiny()
    params = convert_dav2_hf(tm.state_dict(), cfg)
    return tm, cfg, params


def _torch_fusion(tm, x_t):
    """transformers>=4.40 has no forward_fusion; replicate it: backbone
    feature maps -> neck (the reference's forward_fusion,
    depth_anything_v2_hf.py:531-581)."""
    with torch.no_grad():
        outputs = tm.backbone.forward_with_filtered_kwargs(x_t)
        hs = list(outputs.feature_maps)
        _, _, H, W = x_t.shape
        p = tm.config.patch_size
        return [t.numpy() for t in tm.neck(hs, H // p, W // p)]


def test_dav2_matches_transformers(pair):
    tm, cfg, params = pair
    rng = np.random.default_rng(0)
    # native position-embedding grid (70x70 -> 5x5 patches): no pos interp
    x = rng.normal(size=(2, 70, 70, 3)).astype(np.float32)
    ref = _torch_fusion(tm, torch.tensor(x.transpose(0, 3, 1, 2)))
    model = DepthAnythingFeatures(cfg)
    out = model.apply(params, jnp.asarray(x))
    assert len(out) == len(ref) == 4
    for o, r in zip(out, ref):
        r = r.transpose(0, 2, 3, 1)
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-4)


def test_dav2_pos_interp_runs(pair):
    tm, cfg, params = pair
    # non-native grid exercises bicubic pos-embed interpolation (shape-only:
    # torch and jax bicubic kernels differ slightly)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 98, 70, 3)).astype(np.float32))
    out = DepthAnythingFeatures(cfg).apply(params, x)
    assert out[-1].shape == (1, 56, 40, 16)
    assert np.isfinite(np.asarray(out[-1])).all()


def test_unified_encoder_dav2_path(pair):
    """UnifiedEncoder with the dav2 kind: converted frozen tower params can
    be grafted under encoders['dav2']['features'] and gradients stay off the
    tower."""
    tm, cfg, params = pair
    from infinicube_tpu.models.gsm.encoders import (
        UnifiedEncoder, UnifiedEncoderConfig)
    ecfg = UnifiedEncoderConfig(encoders=("conv", "dav2"), dav2_width=8,
                                dav2_target_hw=(70, 70), dav2_config=cfg)
    enc = UnifiedEncoder(ecfg)
    imgs = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 2, 40, 56, 3)).astype(np.float32))
    masks = jnp.ones((1, 2, 40, 56, 4), jnp.float32)
    ep = enc.init(jax.random.PRNGKey(0), imgs, masks)
    # graft the converted tower
    ep["params"]["dav2"]["features"] = params["params"]
    out = enc.apply(ep, imgs, masks)
    assert out["features"].shape[:4] == (1, 2, 40, 56)
    assert np.isfinite(np.asarray(out["features"])).all()

    def loss(p):
        return jnp.sum(enc.apply(p, imgs, masks)["features"] ** 2)

    g = jax.grad(loss)(ep)
    tower_g = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util
                              .tree_leaves(g["params"]["dav2"]["features"])])
    refiner_g = np.asarray(g["params"]["dav2"]["up0"]["kernel"])
    assert np.abs(tower_g).max() == 0.0      # frozen
    assert np.abs(refiner_g).max() > 0.0     # trainable
