"""Pallas implicit-GEMM 3x3x3 SAME conv for the dense voxel UNet.

Why: the voxel-diffusion DDIM step is conv-bound and XLA's conv3d runs
~56 TF/s at the release level-0 shape (64^3 cube, C=192) while the
equivalent matmul probes 92 TF/s (docs/PERF.md DDIM row) — the only
remaining lever for the 100-step DDIM chunk
(/root/reference/infinicube/inference/voxel_world_generation.py DDIM-100,
README.md:43).

Formulation (picked so every on-chip data movement is tile-aligned):

- Rows are merged ``(y, w)`` pairs: the input is zero-padded in z and y,
  reshaped to ``[B, D+2, (H+2)*W, C]``, and sliced into THREE dy-shifted
  views ``[:, :, dy*W : dy*W + H*W, :]``. A block of ``by`` output image
  rows is then ``R = by*W`` CONTIGUOUS rows of each view — the y taps of
  the conv become plain aligned row offsets, no halo BlockSpecs needed.
- The z taps are the same trick one level up: three operands per view with
  ``index_map d -> d + dz`` (block depth 1, so block index == plane index).
- In-kernel, the 9 ``[R, C]`` blocks concatenate along lanes into the
  im2col matrix ``[R, 9C]`` (VPU copies, ~1% of the matmul time) and hit
  the MXU ONCE per O-chunk: ``[R, 9C] @ [9C, 3*oblk] -> f32``. K = 9C
  (1728 at C=192) keeps the contraction long; N = 3*oblk groups the three
  x taps so N stays a near-multiple of 128 even though O=192 alone pads
  25%.
- The remaining x taps compose OUTSIDE the matmul: ``out = t1 +
  roll(t0, +1) + roll(t2, -1)`` over the row dim, with rows ``w == 0`` /
  ``w == W-1`` masked to zero — exactly the SAME-padding halo (rolled-in
  values at image borders are the zero pad; rolls across merged-row
  boundaries are masked by the same test). Sublane roll + iota compare =
  cheap VPU work.

The weight matrix is laid out ``[(dz dy c), (q dx oo)]`` so each O-chunk q
is a contiguous 2D block (wide layers chunk O to bound VMEM; the chunk
grid dim is innermost so input blocks are not re-fetched).

Backward (``jax.custom_vjp``): dx is the same kernel with the
spatially-flipped, in/out-transposed weights; dw is 27 tap einsums (one
[C, M] x [M, O] contraction each) left to XLA; db is a sum. Training and
sampling both run through this op.

The int8 path (``quant=True``) rides the v5e's double-rate int8 MXU with
dynamic per-input-channel activation scales folded into per-(dx, out)
weight scales — the factorization sum_c (x_c/s_c)(w_c s_c) is exact, so
the only error is int8 rounding (cosine >= 0.999 gate, tests). Serving
only: the custom_vjp backward keeps the full-precision kernel.

Measured (v5e, docs/PERF.md round 3): level-0 release conv
[2,64,64,64,192]->192 in bf16: XLA 18.9 ms, this kernel 10.9 ms (97 TF/s
vs 56); full tracked-config DDIM step numbers in docs/PERF.md.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# plan: pick (by, oblk) under the VMEM budget
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 12 * 1024 * 1024


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def conv_plan_feasible(shape, C: int, O: int, dtype,
                       quant: bool = False) -> tuple | None:
    """Return (by, oblk, cblk) for x [B, D, H, W, C] -> O, or None when the
    shape doesn't fit the kernel (then the caller falls back to XLA).

    oblk chunks the output channels (weight columns); cblk chunks the
    CONTRACTION (weight rows + input channels) with an f32 scratch
    accumulator across chunks — this is what lets the 768/1536-wide
    decoder layers fit the VMEM weight budget.

    ``quant=True`` sizes for the int8 path (1-byte input/weight tiles,
    int32 accumulator) and additionally requires 32-aligned row tiles
    (the int8 sublane tile)."""
    B, D, H, W = shape
    s = 1 if quant else jnp.dtype(dtype).itemsize
    if C < 64 or O < 64 or min(D, H, W) < 3:
        return None
    if C % 8 or O % 8 or W % 8:
        return None
    best = None
    # Mosaic block rule: a block's minor dim must be a multiple of 128 or
    # the whole array dim -> oblk == O or oblk % 128 == 0; same for cblk
    oblks = [O] + [o for o in _divisors_desc(O) if o % 128 == 0 and o < O]
    cblks = [C] + [c for c in _divisors_desc(C) if c % 128 == 0 and c < C]
    for oblk in oblks:
        for cblk in cblks:
            nq, ncc = O // oblk, C // cblk
            wbuf = 1 if nq * ncc == 1 else 2   # constant index map: one DMA
            for by in _divisors_desc(H):
                R = by * W
                if R < 128 or R > 4096:
                    continue
                if quant and R % 32:
                    continue
                # chunked weights re-DMA the full matrix once per (b,d,h)
                # group: arithmetic intensity wrt weights is R FLOP/byte,
                # so small planes go weight-bound (measured parity-or-worse
                # at 16^3) — require big row tiles when chunking
                if nq * ncc > 1 and R < 512:
                    continue
                so = 2 if quant else s          # output stays x.dtype
                vmem = (2 * 9 * R * cblk * s   # input blocks, double-buffered
                        + R * 9 * cblk * s     # im2col lhs
                        + wbuf * 9 * cblk * 3 * oblk * s   # weight chunk
                        + R * 3 * oblk * 4     # f32/i32 scratch accumulator
                        + R * 3 * oblk * 4     # rolled/masked temps
                        + 2 * R * oblk * so)   # output block
                if vmem <= _VMEM_BUDGET:
                    # prefer big M tiles, then unchunked K, then big chunks
                    score = (min(R, 1024), cblk, oblk)
                    if best is None or score > best[0]:
                        best = (score, (by, oblk, cblk))
    return None if best is None else best[1]


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _kernel(*refs, W: int, oblk: int, ncc: int, out_dtype, quant: bool):
    x_refs = refs[:9]                 # (dz, dy) row-major, each [1,1,R,cblk]
    if quant:
        # int8 MXU path: operands int8, int32 accumulator, per-column
        # dequant scales (activation per-channel scales are pre-folded into
        # the weight quantization, so the scale vector is exact to apply)
        w_ref, s_ref, b_ref, o_ref, acc_ref = refs[9:14]
    else:
        w_ref, b_ref, o_ref, acc_ref = refs[9], refs[10], refs[11], refs[12]
    lhs = jnp.concatenate([r[0, 0] for r in x_refs], axis=-1)   # [R, 9*cblk]
    part = jnp.dot(lhs, w_ref[...],
                   preferred_element_type=jnp.int32 if quant
                   else jnp.float32)                            # [R, 3*ob]
    cc = pl.program_id(4)

    @pl.when(cc == 0)
    def _init():
        acc_ref[...] = part

    @pl.when(cc > 0)
    def _accum():
        acc_ref[...] += part

    @pl.when(cc == ncc - 1)
    def _finish():
        acc = acc_ref[...]
        if quant:
            acc = acc.astype(jnp.float32) * s_ref[...]
        t0 = acc[:, :oblk]
        t1 = acc[:, oblk:2 * oblk]
        t2 = acc[:, 2 * oblk:]
        R = t1.shape[0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % W
        # dx taps: out[w] += in[w-1] @ K0 + in[w] @ K1 + in[w+1] @ K2.
        # roll(t0,+1)[m] = t0[m-1]; wrapped rows (w==0) are the zero halo.
        out = (t1
               + jnp.where(pos == 0, 0.0, pltpu.roll(t0, shift=1, axis=0))
               + jnp.where(pos == W - 1, 0.0,
                           pltpu.roll(t2, shift=R - 1, axis=0)))
        out = out + b_ref[...]
        o_ref[0, 0] = out.astype(out_dtype)


def _pallas_conv(x, w_mat, bias, *, H, W, O, by, oblk, cblk, interpret,
                 swx=None, out_dtype=None):
    """x [B, D, H, W, C]; w_mat [9C, 3O] in (cc dz dy c) x (q dx oo)
    order; bias [1, O] f32. ``swx`` [1, 3O] f32 per-column dequant scales
    switch the kernel to the int8 path (x/w_mat int8, int32 accumulate).
    Returns [B, D, H, W, O] in ``out_dtype`` (default x.dtype)."""
    B, D, _, _, C = x.shape
    out_dtype = out_dtype or x.dtype
    quant = swx is not None
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    xm = xp.reshape(B, D + 2, (H + 2) * W, C)
    xviews = [jax.lax.slice_in_dim(xm, dy * W, dy * W + H * W, axis=2)
              for dy in range(3)]
    nq, ncc = O // oblk, C // cblk
    grid = (B, D, H // by, nq, ncc)

    def x_map(dz):
        return lambda b, d, h, q, cc: (b, d + dz, h, cc)

    in_specs = [pl.BlockSpec((1, 1, by * W, cblk), x_map(dz))
                for dz in range(3) for _ in range(3)]
    in_specs.append(pl.BlockSpec((9 * cblk, 3 * oblk),
                                 lambda b, d, h, q, cc: (cc, q)))
    args = [xviews[dy] for dz in range(3) for dy in range(3)]
    args.append(w_mat)
    if quant:
        in_specs.append(pl.BlockSpec((1, 3 * oblk),
                                     lambda b, d, h, q, cc: (0, q)))
        args.append(swx)
    in_specs.append(pl.BlockSpec((1, oblk), lambda b, d, h, q, cc: (0, q)))
    args.append(bias)
    out_spec = pl.BlockSpec((1, 1, by * W, oblk),
                            lambda b, d, h, q, cc: (b, d, h, q))
    out = pl.pallas_call(
        functools.partial(_kernel, W=W, oblk=oblk, ncc=ncc,
                          out_dtype=out_dtype, quant=quant),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, D, H * W, O), out_dtype),
        scratch_shapes=[pltpu.VMEM((by * W, 3 * oblk),
                                   jnp.int32 if quant else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary",
                                 "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out.reshape(B, D, H, W, O)


def _pack_weights(w, oblk: int, cblk: int):
    """[3,3,3,C,O] -> [9C, 3O] with rows ordered (cc, dz, dy, c) and
    columns (q, dx, oo) so each (cc, q) chunk is one contiguous
    [9*cblk, 3*oblk] block."""
    C, O = w.shape[3], w.shape[4]
    nq, ncc = O // oblk, C // cblk
    w2 = w.transpose(0, 1, 3, 2, 4)                 # [dz, dy, C, dx, O]
    w3 = w2.reshape(3, 3, ncc, cblk, 3, nq, oblk)
    return w3.transpose(2, 0, 1, 3, 5, 4, 6).reshape(9 * C, 3 * O)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


def _xla_conv(x, w, bias):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def _quantize_for_conv(x, w):
    """Dynamic int8 quantization with PER-INPUT-CHANNEL activation scales
    folded into the weight quantization (exact factorization:
    sum_c (x_c/s_c)(w_c s_c) == sum_c x_c w_c) and per-(dx, out-channel)
    weight scales — the only rounding error is the int8 rounding itself.
    Returns x8 [B,D,H,W,C] int8, w8 [3,3,3,C,O] int8, sw [3, O] f32."""
    xf = x.astype(jnp.float32)
    sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=(0, 1, 2, 3)), 1e-8) / 127.0
    x8 = jnp.round(xf / sc).astype(jnp.int8)
    wf = w.astype(jnp.float32) * sc[None, None, None, :, None]
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 3)), 1e-8) / 127.0
    w8 = jnp.round(wf / sw[None, None, :, None, :]).astype(jnp.int8)
    return x8, w8, sw


def _fwd_impl(x, w, bias, plan, interpret, quant=False):
    if plan is None:
        return _xla_conv(x, w, bias)
    by, oblk, cblk = plan
    B, D, H, W, C = x.shape
    O = w.shape[-1]
    if quant:
        x8, w8, sw = _quantize_for_conv(x, w)
        w_mat = _pack_weights(w8, oblk, cblk)
        nq = O // oblk
        # column order (q, dx, oo) — match _pack_weights' column layout
        swx = sw.reshape(3, nq, oblk).transpose(1, 0, 2).reshape(1, 3 * O)
        return _pallas_conv(x8, w_mat, bias.astype(jnp.float32)[None],
                            H=H, W=W, O=O, by=by, oblk=oblk, cblk=cblk,
                            interpret=interpret, swx=swx, out_dtype=x.dtype)
    w_mat = _pack_weights(w.astype(x.dtype), oblk, cblk)
    return _pallas_conv(x, w_mat, bias.astype(jnp.float32)[None], H=H, W=W,
                        O=O, by=by, oblk=oblk, cblk=cblk,
                        interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3x3(x, w, bias, plan=None, interpret=False, quant=False):
    """3x3x3 stride-1 SAME conv, NDHWC x [B,D,H,W,C] @ w [3,3,3,C,O] +
    bias [O]. ``plan=(by, oblk, cblk)`` routes through the Pallas kernel;
    ``plan=None`` is the XLA path (used for infeasible shapes and as the
    numerics oracle in tests). ``quant=True`` runs the int8 MXU path
    (serving: dynamic per-channel quantization, quality-gated in
    tests/test_quant.py; gradients use the full-precision kernel)."""
    return _fwd_impl(x, w, bias, plan, interpret, quant)


def _conv_fwd(x, w, bias, plan, interpret, quant):
    return _fwd_impl(x, w, bias, plan, interpret, quant), (x, w)


def _conv_bwd(plan, interpret, quant, res, g):
    x, w = res
    C, O = w.shape[3], w.shape[4]
    # input grad: conv of g with the spatially-flipped, in/out-swapped
    # kernel (same Pallas kernel when the transposed shape has a plan)
    wf = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)        # [3,3,3,O,C]
    gplan = conv_plan_feasible(x.shape[:4], O, C, g.dtype) \
        if plan is not None else None
    dx = _fwd_impl(g, wf, jnp.zeros((C,), jnp.float32), gplan, interpret)
    # weight grad: 27 tap contractions, XLA einsums (tall-K matmuls)
    xq = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    B, D, H, W, _ = x.shape
    taps = []
    gf = g.astype(jnp.float32)
    for dz in range(3):
        for dy in range(3):
            for dxx in range(3):
                xs = jax.lax.dynamic_slice(
                    xq, (0, dz, dy, dxx, 0), (B, D, H, W, C))
                taps.append(jnp.einsum(
                    "bdhwc,bdhwo->co", xs.astype(jnp.float32), gf,
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(taps).reshape(3, 3, 3, C, O).astype(w.dtype)
    db = gf.sum((0, 1, 2, 3)).astype(jnp.float32)
    return dx.astype(x.dtype), dw, db


conv3x3x3.defvjp(_conv_fwd, _conv_bwd)


# ---------------------------------------------------------------------------
# flax module (drop-in for nn.Conv(features, (3,3,3)) — same param tree)
# ---------------------------------------------------------------------------

import flax.linen as nn
from flax.linen import dtypes as flax_dtypes


class Conv3x3x3(nn.Module):
    """nn.Conv(features, (3,3,3), SAME)-compatible module (identical
    'kernel'/'bias' params, promote-dtype semantics) that dispatches to the
    Pallas implicit-GEMM kernel on TPU when the shape fits.

    impl: "auto" (Pallas on TPU when feasible), "xla", or "pallas"
    (force; interpret-mode off-TPU — used by tests).

    quant: int8 MXU serving path (dynamic per-channel quantization; only
    takes effect where the Pallas plan is feasible)."""
    features: int
    dtype: Any = jnp.float32
    impl: str = "auto"
    quant: bool = False
    # plain lecun_normal: jax's variance_scaling counts the receptive
    # field into fan_in for rank-5 kernels, matching nn.Conv's default
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 3, C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = flax_dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        squeeze = x.ndim == 4
        if squeeze:                      # unbatched [D, H, W, C]
            x = x[None]
        plan, interpret = None, False
        if self.impl == "pallas" or (
                self.impl == "auto" and jax.default_backend() == "tpu"):
            plan = conv_plan_feasible(x.shape[:4], C, self.features, x.dtype,
                                      quant=self.quant)
            interpret = jax.default_backend() != "tpu"
        out = conv3x3x3(x, kernel, bias.astype(jnp.float32), plan, interpret,
                        self.quant and plan is not None)
        return out[0] if squeeze else out
