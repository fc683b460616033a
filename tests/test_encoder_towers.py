"""DINOv2 / ConvNeXt GSM-encoder towers vs the installed transformers
classes (the repo's converter pattern: checkpoint-shaped flax module + HF
parameter names + numerics test against the INSTALLED reference class).

Reference capability: the UnifiedEncoder ModuleDict's dinov2 / convnext
options (/root/reference/infinicube/voxelgen/modules/gsm_modules/encoder/
unified_encoder.py, dinov2_encoder.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_dinov2_backbone_matches_transformers():
    from transformers import Dinov2Config as HFCfg, Dinov2Model

    from infinicube_tpu.models.gsm.dav2 import (DAv2Config, Dinov2Backbone,
                                                convert_dinov2_hf)

    torch.manual_seed(0)
    hf = Dinov2Model(HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, patch_size=14, image_size=70,
        hidden_act="gelu", use_swiglu_ffn=False)).eval()
    cfg = DAv2Config(hidden_size=32, num_layers=2, num_heads=2,
                     out_indices=(2,), pos_tokens=(70 // 14) ** 2)
    params = convert_dinov2_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))
                 ).last_hidden_state.numpy()
    taps = Dinov2Backbone(cfg).apply(params, jnp.asarray(img))
    # our backbone applies the final layernorm to every tap (HF Backbone
    # semantics); compare against HF's normed last_hidden_state
    with torch.no_grad():
        ref_normed = hf.layernorm(torch.from_numpy(ref)).numpy()
    np.testing.assert_allclose(np.asarray(taps[-1]), ref_normed,
                               atol=2e-4, rtol=1e-3)


def test_convnext_tower_matches_transformers():
    from transformers import ConvNextConfig as HFCfg, ConvNextModel

    from infinicube_tpu.models.gsm.convnext import (ConvNextConfig,
                                                    ConvNextTower,
                                                    convert_convnext_hf)

    torch.manual_seed(0)
    hf = ConvNextModel(HFCfg(
        depths=[1, 1, 2, 1], hidden_sizes=[8, 12, 16, 24],
        num_channels=3)).eval()
    cfg = ConvNextConfig.tiny_test()
    params = convert_convnext_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))
                 ).last_hidden_state.numpy()
    out = ConvNextTower(cfg).apply(params, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4, rtol=1e-3)


def test_unified_encoder_dino_convnext_options():
    """The new encoder kinds slot into UnifiedEncoder and concatenate."""
    from infinicube_tpu.models.gsm.convnext import ConvNextConfig
    from infinicube_tpu.models.gsm.dav2 import DAv2Config
    from infinicube_tpu.models.gsm.encoders import (UnifiedEncoder,
                                                    UnifiedEncoderConfig)

    cfg = UnifiedEncoderConfig(
        encoders=("conv", "dino", "convnext"), conv_width=8, dino_width=8,
        dino_target_hw=(28, 28), dino_config=DAv2Config.tiny(),
        convnext_width=8,
        convnext_config=ConvNextConfig.tiny_test())
    enc = UnifiedEncoder(cfg)
    imgs = jnp.ones((1, 2, 32, 32, 3)) * 0.5
    masks = jnp.ones((1, 2, 32, 32, 4))
    params = enc.init(jax.random.PRNGKey(0), imgs, masks)
    out = enc.apply(params, imgs, masks)
    assert out["features"].shape == (1, 2, 32, 32, 24)
    assert np.isfinite(np.asarray(out["features"])).all()
