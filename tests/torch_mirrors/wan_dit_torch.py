"""Test-only torch mirror of the Wan2.1 T2V DiT (DiffSynth WanModel layout).

The reference delegates its video stage to an external DiffSynth fork
(/root/reference/infinicube/videogen/inference.py:26-88) which is NOT vendored
in the reference repo.  This file re-implements the publicly documented
Wan2.1 architecture (interleaved-pair RoPE via complex view, full-dim q/k
RMSNorm, shared-adaLN with per-block modulation bias, Head computing
``(modulation + t_emb).chunk(2)``) with the exact upstream state-dict key
names, so that `weights.convert.convert_wan_dit` can be validated
numerically against a real torch forward without network access.

This is a TEST FIXTURE, not part of the framework: the production path is
the JAX WanDiT in infinicube_tpu/models/wan/dit.py.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


def sinusoidal_embedding_1d(dim: int, position: torch.Tensor) -> torch.Tensor:
    """Public Wan2.1: wan/modules/model.py ``sinusoidal_embedding_1d`` —
    cos||sin concat over 10000^(-i/half) freqs (NOT interleaved)."""
    half = dim // 2
    freqs = torch.pow(
        10000.0, -torch.arange(half, dtype=torch.float32).div(half))
    args = torch.outer(position.float(), freqs)
    return torch.cat([torch.cos(args), torch.sin(args)], dim=1)


def rope_params(max_len: int, dim: int, theta: float = 10000.0):
    """Complex cis table [max_len, dim//2] for one axis. Public Wan2.1:
    wan/modules/model.py ``rope_params`` — torch.polar over
    arange(max_len) x theta^(-2i/dim); asserted as a golden table in
    tests/test_wan_torch_parity.py::test_rope_table_matches_upstream_formula."""
    inv = 1.0 / torch.pow(
        theta, torch.arange(0, dim, 2, dtype=torch.float32).div(dim))
    freqs = torch.outer(torch.arange(max_len, dtype=torch.float32), inv)
    return torch.polar(torch.ones_like(freqs), freqs)


def rope_apply(x: torch.Tensor, grid_sizes, freqs: torch.Tensor):
    """x [B, L, n, d]; interleaved-pair rotation via complex view. Public
    Wan2.1: wan/modules/model.py ``rope_apply`` — per-head channels split
    [c-2(c//3), c//3, c//3] across (t, h, w) axis tables, view_as_complex
    pairs (x[2j], x[2j+1])."""
    b, L, n, d = x.shape
    c = d // 2
    split = [c - 2 * (c // 3), c // 3, c // 3]
    f_t, f_h, f_w = freqs.split(split, dim=1)
    f, h, w = grid_sizes
    fr = torch.cat([
        f_t[:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        f_h[:h].view(1, h, 1, -1).expand(f, h, w, -1),
        f_w[:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(f * h * w, 1, -1)
    xc = torch.view_as_complex(x.float().reshape(b, L, n, c, 2))
    out = torch.view_as_real(xc * fr.unsqueeze(0)).flatten(3)
    return out.type_as(x)


class WanRMSNorm(nn.Module):
    """Public Wan2.1: wan/modules/model.py ``WanRMSNorm`` — f32 rsqrt of the
    FULL-dim mean square (all heads at once), then the learned weight."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        n = x.float() * torch.rsqrt(
            x.float().pow(2).mean(-1, keepdim=True) + self.eps)
        return n.type_as(x) * self.weight


class WanSelfAttention(nn.Module):
    """Public Wan2.1: wan/modules/model.py ``WanSelfAttention`` — separate
    q/k/v/o Linears, norm_q/norm_k BEFORE the head reshape, RoPE on q and k
    only, SDPA over heads."""

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.o = nn.Linear(dim, dim)
        self.norm_q = WanRMSNorm(dim, eps)
        self.norm_k = WanRMSNorm(dim, eps)

    def forward(self, x, grid_sizes, freqs):
        b, s, _ = x.shape
        n, d = self.num_heads, self.dim // self.num_heads
        q = rope_apply(self.norm_q(self.q(x)).view(b, s, n, d),
                       grid_sizes, freqs)
        k = rope_apply(self.norm_k(self.k(x)).view(b, s, n, d),
                       grid_sizes, freqs)
        v = self.v(x).view(b, s, n, d)
        out = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return self.o(out.transpose(1, 2).reshape(b, s, -1))


class WanCrossAttention(nn.Module):
    """Public Wan2.1: wan/modules/model.py ``WanT2VCrossAttention`` — same
    projection set against the text context, no RoPE."""

    def __init__(self, dim: int, num_heads: int, eps: float = 1e-6):
        super().__init__()
        self.dim, self.num_heads = dim, num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.o = nn.Linear(dim, dim)
        self.norm_q = WanRMSNorm(dim, eps)
        self.norm_k = WanRMSNorm(dim, eps)

    def forward(self, x, context):
        b, s, _ = x.shape
        n, d = self.num_heads, self.dim // self.num_heads
        q = self.norm_q(self.q(x)).view(b, s, n, d)
        k = self.norm_k(self.k(context)).view(b, -1, n, d)
        v = self.v(context).view(b, -1, n, d)
        out = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return self.o(out.transpose(1, 2).reshape(b, s, -1))


class WanAttentionBlock(nn.Module):
    """Public Wan2.1: wan/modules/model.py ``WanAttentionBlock`` — shared
    adaLN e (6-chunk) plus the per-block ``modulation`` bias; norm1/norm2
    affine-free, norm3 affine; GELU(tanh) FFN; gates applied in f32."""

    def __init__(self, dim, ffn_dim, num_heads, eps=1e-6):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps, elementwise_affine=False)
        self.self_attn = WanSelfAttention(dim, num_heads, eps)
        self.norm3 = nn.LayerNorm(dim, eps, elementwise_affine=True)
        self.cross_attn = WanCrossAttention(dim, num_heads, eps)
        self.norm2 = nn.LayerNorm(dim, eps, elementwise_affine=False)
        self.ffn = nn.Sequential(
            nn.Linear(dim, ffn_dim), nn.GELU(approximate="tanh"),
            nn.Linear(ffn_dim, dim))
        self.modulation = nn.Parameter(torch.randn(1, 6, dim) / dim**0.5)

    def forward(self, x, e, context, grid_sizes, freqs):
        e = (self.modulation + e).chunk(6, dim=1)
        y = self.self_attn(
            (self.norm1(x).float() * (1 + e[1]) + e[0]).type_as(x),
            grid_sizes, freqs)
        x = x + y * e[2]
        x = x + self.cross_attn(self.norm3(x), context)
        y = self.ffn(
            (self.norm2(x).float() * (1 + e[4]) + e[3]).type_as(x))
        return x + y * e[5]


class Head(nn.Module):
    """Public Wan2.1: wan/modules/model.py ``Head`` — (modulation +
    t_emb).chunk(2) with the RAW time embedding e (pre-time_projection),
    affine-free LN, then the output Linear."""

    def __init__(self, dim, out_dim, patch_size, eps=1e-6):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps, elementwise_affine=False)
        self.head = nn.Linear(dim, out_dim * math.prod(patch_size))
        self.modulation = nn.Parameter(torch.randn(1, 2, dim) / dim**0.5)

    def forward(self, x, e):
        e = (self.modulation + e.unsqueeze(1)).chunk(2, dim=1)
        return self.head(self.norm(x) * (1 + e[1]) + e[0])


class WanModelMirror(nn.Module):
    """state_dict keys match DiffSynth WanModel (+ buffer_embedding from the
    InfiniCube fork's initialize_buffer_embedder)."""

    def __init__(self, dim=64, ffn_dim=128, num_layers=2, num_heads=2,
                 in_dim=4, out_dim=4, text_dim=32, freq_dim=32,
                 patch_size=(1, 2, 2), buffer_dim=None, eps=1e-6):
        super().__init__()
        self.dim, self.freq_dim, self.patch_size = dim, freq_dim, patch_size
        self.out_dim = out_dim
        self.patch_embedding = nn.Conv3d(
            in_dim, dim, patch_size, stride=patch_size)
        if buffer_dim:
            self.buffer_embedding = nn.Conv3d(
                buffer_dim, dim, patch_size, stride=patch_size)
        self.text_embedding = nn.Sequential(
            nn.Linear(text_dim, dim), nn.GELU(approximate="tanh"),
            nn.Linear(dim, dim))
        self.time_embedding = nn.Sequential(
            nn.Linear(freq_dim, dim), nn.SiLU(), nn.Linear(dim, dim))
        self.time_projection = nn.Sequential(
            nn.SiLU(), nn.Linear(dim, 6 * dim))
        self.blocks = nn.ModuleList([
            WanAttentionBlock(dim, ffn_dim, num_heads, eps)
            for _ in range(num_layers)])
        self.head = Head(dim, out_dim, patch_size, eps)
        d = dim // num_heads
        self.register_buffer("freqs", torch.cat([
            rope_params(1024, d - 4 * (d // 6)),
            rope_params(1024, 2 * (d // 6)),
            rope_params(1024, 2 * (d // 6)),
        ], dim=1), persistent=False)

    def forward(self, x, t, context, buffer=None):
        """x [B, C, T, H, W]; t [B]; context [B, L, text_dim]."""
        x = self.patch_embedding(x)
        if buffer is not None:
            x = x + self.buffer_embedding(buffer)
        grid_sizes = tuple(x.shape[2:])
        x = x.flatten(2).transpose(1, 2)
        e = self.time_embedding(sinusoidal_embedding_1d(self.freq_dim, t))
        e0 = self.time_projection(e).unflatten(1, (6, self.dim))
        context = self.text_embedding(context)
        for blk in self.blocks:
            x = blk(x, e0, context, grid_sizes, self.freqs)
        x = self.head(x, e)
        return self.unpatchify(x, grid_sizes)

    def unpatchify(self, x, grid_sizes):
        b = x.shape[0]
        f, h, w = grid_sizes
        pt, ph, pw = self.patch_size
        x = x.view(b, f, h, w, pt, ph, pw, self.out_dim)
        x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)  # b c f pt h ph w pw
        return x.reshape(b, self.out_dim, f * pt, h * ph, w * pw)
