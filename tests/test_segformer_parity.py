"""Segformer (models/gsm/segformer.py) vs the installed transformers
implementation with random tiny-config weights through convert_segformer_hf."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from infinicube_tpu.models.gsm.segformer import (
    Segformer, SegformerConfig, convert_segformer_hf, sky_mask_from_logits)


@pytest.fixture(scope="module")
def pair():
    from transformers import (SegformerConfig as HFCfg,
                              SegformerForSemanticSegmentation)
    hcfg = HFCfg(num_channels=3, num_encoder_blocks=4, depths=[1, 1, 1, 1],
                 sr_ratios=[8, 4, 2, 1], hidden_sizes=[8, 16, 24, 32],
                 patch_sizes=[7, 3, 3, 3], strides=[4, 2, 2, 2],
                 num_attention_heads=[1, 2, 3, 4], mlp_ratios=[4, 4, 4, 4],
                 decoder_hidden_size=16, num_labels=19,
                 hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                 classifier_dropout_prob=0.0, drop_path_rate=0.0)
    tm = SegformerForSemanticSegmentation(hcfg).eval()
    cfg = SegformerConfig.tiny()
    params = convert_segformer_hf(tm.state_dict(), cfg)
    return tm, cfg, params


def test_segformer_matches_transformers(pair):
    tm, cfg, params = pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).logits.numpy()
    out = Segformer(cfg).apply(params, jnp.asarray(x))
    ref = ref.transpose(0, 2, 3, 1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4)


def test_sky_mask_shape(pair):
    tm, cfg, params = pair
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 64, 96, 3)).astype(np.float32))
    logits = Segformer(cfg).apply(params, x)
    m = sky_mask_from_logits(logits, (64, 96))
    assert m.shape == (1, 64, 96) and m.dtype == jnp.uint8
    assert set(np.unique(np.asarray(m))) <= {0, 1}


def test_sky_segmenter_hook(pair):
    """Converted SegFormer weights drive the attribute generator's skymask
    path end-to-end."""
    tm, cfg, params = pair
    from infinicube_tpu.data_process.generate_additional_attributes import (
        make_segformer_sky_segmenter, register_sky_segmenter, sky_mask)
    seg = make_segformer_sky_segmenter(params, cfg)
    img = (np.random.default_rng(0).uniform(
        size=(64, 96, 3)) * 255).astype(np.uint8)
    m = seg(img)
    assert m.shape == (64, 96) and m.dtype == np.uint8
    register_sky_segmenter(seg)
    try:
        out = sky_mask(img, np.zeros((64, 96)))
        np.testing.assert_array_equal(out, m)
    finally:
        register_sky_segmenter(None)
