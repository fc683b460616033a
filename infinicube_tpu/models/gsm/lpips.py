"""Checkpoint-shaped LPIPS (VGG16) perceptual distance.

Mirror of the reference's ``lpips.LPIPS(net='vgg')``
(/root/reference/infinicube/voxelgen/modules/gsm_modules/loss/
unified_loss.py:39): a frozen VGG16 feature tower tapped at
relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit-normalized feature
differences squared, per-tap 1x1 linear heads, spatial mean, summed.

``convert_lpips`` maps the standard lpips-library state dict (which bundles
the torchvision VGG16 weights under ``net.sliceN.<idx>`` plus the
``linK.model.1`` heads) onto this module; numerics are validated against a
torch mirror (tests/torch_mirrors/lpips_torch.py) with random weights, so
the released ``lpips`` checkpoint converts mechanically."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (inputs in [-1, 1])
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# VGG16 conv layout: (features-index, out-channels) per slice
VGG_SLICES = (
    ((0, 64), (2, 64)),
    ((5, 128), (7, 128)),
    ((10, 256), (12, 256), (14, 256)),
    ((17, 512), (19, 512), (21, 512)),
    ((24, 512), (26, 512), (28, 512)),
)


class VGG16Features(nn.Module):
    """VGG16 feature tower returning the 5 LPIPS tap activations."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        for s, convs in enumerate(VGG_SLICES):
            if s > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for idx, ch in convs:
                x = nn.relu(nn.Conv(ch, (3, 3), name=f"conv{idx}")(x))
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='vgg') forward. Inputs NHWC in [-1, 1] (use
    ``from_unit_range`` for [0, 1] images). Returns per-sample distances."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        # constants in the INPUT dtype: f32 defaults would promote the
        # whole VGG back to f32 and silently defeat a bf16 serving/training
        # cast (measured: identical HBM peak with "bf16" params)
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        net = VGG16Features(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True),
                                1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True),
                                1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones,
                           (d.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
        return total

    @staticmethod
    def from_unit_range(img: jnp.ndarray) -> jnp.ndarray:
        return img * 2.0 - 1.0


def convert_lpips(sd) -> dict:
    """lpips-library state dict -> LPIPS params. Accepts torch tensors or
    numpy arrays."""
    def t2n(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach")
                          else x)

    params = {"net": {}}
    for s, convs in enumerate(VGG_SLICES):
        for idx, _ in convs:
            w = t2n(sd[f"net.slice{s + 1}.{idx}.weight"])
            params["net"][f"conv{idx}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(t2n(sd[f"net.slice{s + 1}.{idx}.bias"]))}
    for k in range(5):
        w = t2n(sd[f"lin{k}.model.1.weight"])      # [1, C, 1, 1]
        params[f"lin{k}"] = jnp.asarray(w.reshape(-1))
    return {"params": params}
