"""Dynamic int8 matmul path for big serving-time linears.

Measured on the v5e (docs/PERF.md round 3): XLA/Pallas int8 matmuls with a
fused dequant run at 176-180 TOP/s vs ~120 TF/s bf16 at Wan-DiT projection
shapes — a 1.5x MXU win wherever a linear is compute-bound. The scheme is
the standard serving recipe:

- activations: dynamic PER-ROW (per-token) scales — out[i,o] =
  sx[i] * sw[o] * sum_c x8[i,c] w8[c,o]; both scale factors sit outside the
  contraction, so dequantization is exact (the only error is the rounding of
  x and w themselves).
- weights: PER-OUTPUT-CHANNEL scales, quantized on the fly from the bf16
  params (costs one elementwise pass over the weights — ~5 ms/step for the
  whole 1.3B DiT — and keeps checkpoints/converters unchanged; no separate
  int8 checkpoint format).

Quality is gated end-to-end in tests/test_quant.py: DiT forward with
quantized linears (and quantized attention) must stay cosine >= 0.999
against the bf16 path.

Reference anchor: the A100 baseline serves bf16 (/root/reference/README.md:65);
int8 projections are the TPU-first equivalent of the TensorRT/FP8 serving
paths NVIDIA hardware would use, behind a config flag (off for training).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """x [..., K] @ w [K, N] on the int8 MXU with exact per-row/per-column
    dequant scales. Returns x.dtype."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    x8 = jnp.round(xf / sx).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True),
                     1e-8) * (1.0 / 127.0)
    w8 = jnp.round(wf / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class QuantDense(nn.Module):
    """Drop-in Dense with the int8 MXU matmul. Parameter names/shapes match
    nn.Dense exactly ('kernel' [K, F], 'bias' [F]) so checkpoints are
    interchangeable with the bf16 module; the partitioning metadata rides the
    same logical axes."""
    features: int
    axes: tuple = ()
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = self.kernel_init or nn.initializers.lecun_normal()
        if self.axes:
            init = nn.with_logical_partitioning(init, self.axes)
        k = self.param("kernel", init, (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None
        return int8_matmul(x.astype(self.dtype), k, b)
