"""LPIPS (models/gsm/lpips.py) vs the torch mirror of lpips.LPIPS(net='vgg')
with random weights through convert_lpips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from infinicube_tpu.models.gsm.lpips import LPIPS, convert_lpips
from tests.torch_mirrors.lpips_torch import LPIPSTorch


def test_lpips_matches_torch():
    tm = LPIPSTorch().eval()
    # small random weights keep activations bounded through 13 conv layers
    with torch.no_grad():
        for p in tm.parameters():
            p.mul_(0.2)
    params = convert_lpips(tm.state_dict())
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 48, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)),
                 torch.tensor(y.transpose(0, 3, 1, 2))).numpy()
    out = LPIPS().apply(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    # identical inputs -> zero distance
    z = LPIPS().apply(params, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-6)


def test_gsm_loss_uses_lpips():
    from infinicube_tpu.models.gsm.loss import GSMLossConfig, gsm_loss
    tm = LPIPSTorch().eval()
    params = convert_lpips(tm.state_dict())
    rng = np.random.default_rng(0)
    V, H, W = 2, 32, 32
    render = {"rgb": jnp.asarray(rng.uniform(size=(V, H, W, 3)),
                                 jnp.float32),
              "alpha": jnp.ones((V, H, W)), "depth": jnp.ones((V, H, W))}
    gt = jnp.asarray(rng.uniform(size=(V, H, W, 3)), jnp.float32)
    mask = jnp.ones((V, H, W), bool)
    sky = jnp.zeros((V, H, W), bool)
    l1, m1 = gsm_loss(GSMLossConfig(), render, gt, mask, sky,
                      lpips_params=params)
    l2, m2 = gsm_loss(GSMLossConfig(), render, gt, mask, sky)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert abs(float(m1["perceptual"]) - float(m2["perceptual"])) > 1e-6
