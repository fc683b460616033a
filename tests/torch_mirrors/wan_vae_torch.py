"""Test-only torch mirror of the Wan2.1 causal video VAE.

State-dict key names match the released ``Wan2.1_VAE.pth`` layout (Encoder3d
conv1 / downsamples.N / middle.N / head.N, quant convs conv1/conv2, Decoder3d
upsamples.N) so weights/wan_convert.convert_wan_vae can be validated without
the actual weights. Full-sequence (non-streaming) semantics match
infinicube_tpu/models/wan/vae3d.py: causal convs left-pad 2*pt with zeros;
temporal resamples pass the first frame through.

TEST FIXTURE only — the production path is the JAX VideoVAE.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F
from einops import rearrange


class CausalConv3d(nn.Conv3d):
    """Conv3d with temporal pad 2*pt entirely on the left."""

    def __init__(self, in_dim, out_dim, kernel_size, stride=1):
        super().__init__(in_dim, out_dim, kernel_size, stride=stride)
        kt, kh, kw = self.kernel_size
        self._pad = (kw // 2, kw // 2, kh // 2, kh // 2, 2 * (kt // 2), 0)

    def forward(self, x):
        return super().forward(F.pad(x, self._pad))


class RMS_norm(nn.Module):
    def __init__(self, dim, images=True):
        super().__init__()
        broadcastable = (1, 1) if images else (1, 1, 1)
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(dim, *broadcastable))

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class ResidualBlock(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.residual = nn.Sequential(
            RMS_norm(in_dim, images=False), nn.SiLU(),
            CausalConv3d(in_dim, out_dim, 3),
            RMS_norm(out_dim, images=False), nn.SiLU(), nn.Dropout(0.0),
            CausalConv3d(out_dim, out_dim, 3))
        self.shortcut = CausalConv3d(in_dim, out_dim, 1) \
            if in_dim != out_dim else nn.Identity()

    def forward(self, x):
        return self.shortcut(x) + self.residual(x)


class AttentionBlock(nn.Module):
    """Per-frame single-head attention over H*W."""

    def __init__(self, dim):
        super().__init__()
        self.dim = dim
        self.norm = RMS_norm(dim)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        identity = x
        b, c, t, h, w = x.size()
        x = rearrange(x, "b c t h w -> (b t) c h w")
        x = self.norm(x)
        q, k, v = (self.to_qkv(x).reshape(b * t, 1, c * 3, -1)
                   .permute(0, 1, 3, 2).contiguous().chunk(3, dim=-1))
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        return rearrange(x, "(b t) c h w -> b c t h w", t=t) + identity


class Resample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.mode = mode
        if mode == "downsample2d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=2))
        elif mode == "downsample3d":
            self.resample = nn.Sequential(
                nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=2))
            self.time_conv = nn.Conv3d(dim, dim, (3, 1, 1),
                                       stride=(2, 1, 1))
        elif mode == "upsample2d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
        elif mode == "upsample3d":
            self.resample = nn.Sequential(
                nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
                nn.Conv2d(dim, dim // 2, 3, padding=1))
            self.time_conv = CausalConv3d(dim, dim * 2, (3, 1, 1))

    def _spatial(self, x):
        t = x.shape[2]
        x = rearrange(x, "b c t h w -> (b t) c h w")
        x = self.resample(x)
        return rearrange(x, "(b t) c h w -> b c t h w", t=t)

    def forward(self, x):
        if self.mode == "upsample3d":
            b, c, t, h, w = x.size()
            y = self.time_conv(x)                       # [b, 2c, t, h, w]
            y = y.reshape(b, 2, c, t, h, w)[:, :, :, 1:]
            y = torch.stack((y[:, 0], y[:, 1]), 3).reshape(
                b, c, 2 * (t - 1), h, w)
            x = torch.cat([x[:, :, :1], y], dim=2)
        x = self._spatial(x)
        if self.mode == "downsample3d":
            rest = self.time_conv(x)                    # VALID stride 2
            x = torch.cat([x[:, :, :1], rest], dim=2)
        return x


class Encoder3d(nn.Module):
    def __init__(self, dim=96, z_dim=32, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, temperal_downsample=(False, True, True)):
        super().__init__()
        dims = [dim * u for u in (1,) + tuple(dim_mult)]
        self.conv1 = CausalConv3d(3, dims[0], 3)
        downsamples = []
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(num_res_blocks):
                downsamples.append(ResidualBlock(in_dim, out_dim))
                in_dim = out_dim
            if i != len(dim_mult) - 1:
                mode = "downsample3d" if temperal_downsample[i] \
                    else "downsample2d"
                downsamples.append(Resample(out_dim, mode))
        self.downsamples = nn.Sequential(*downsamples)
        self.middle = nn.Sequential(
            ResidualBlock(out_dim, out_dim), AttentionBlock(out_dim),
            ResidualBlock(out_dim, out_dim))
        self.head = nn.Sequential(
            RMS_norm(out_dim, images=False), nn.SiLU(),
            CausalConv3d(out_dim, z_dim, 3))

    def forward(self, x):
        return self.head(self.middle(self.downsamples(self.conv1(x))))


class Decoder3d(nn.Module):
    def __init__(self, dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, temperal_upsample=(True, True, False)):
        super().__init__()
        mult = list(dim_mult)
        dims = [dim * u for u in [mult[-1]] + mult[::-1]]
        self.conv1 = CausalConv3d(z_dim, dims[0], 3)
        self.middle = nn.Sequential(
            ResidualBlock(dims[0], dims[0]), AttentionBlock(dims[0]),
            ResidualBlock(dims[0], dims[0]))
        upsamples = []
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i > 0:
                in_dim = in_dim // 2
            for _ in range(num_res_blocks + 1):
                upsamples.append(ResidualBlock(in_dim, out_dim))
                in_dim = out_dim
            if i != len(mult) - 1:
                mode = "upsample3d" if temperal_upsample[i] else "upsample2d"
                upsamples.append(Resample(out_dim, mode))
        self.upsamples = nn.Sequential(*upsamples)
        self.head = nn.Sequential(
            RMS_norm(out_dim, images=False), nn.SiLU(),
            CausalConv3d(out_dim, 3, 3))

    def forward(self, x):
        return self.head(self.upsamples(self.middle(self.conv1(x))))


class WanVAEMirror(nn.Module):
    """Top-level module; state_dict keys match Wan2.1_VAE.pth."""

    def __init__(self, dim=96, z_dim=16, dim_mult=(1, 2, 4, 4),
                 num_res_blocks=2, temperal_downsample=(False, True, True)):
        super().__init__()
        self.z_dim = z_dim
        self.encoder = Encoder3d(dim, z_dim * 2, dim_mult, num_res_blocks,
                                 temperal_downsample)
        self.conv1 = CausalConv3d(z_dim * 2, z_dim * 2, 1)
        self.conv2 = CausalConv3d(z_dim, z_dim, 1)
        self.decoder = Decoder3d(dim, z_dim, dim_mult, num_res_blocks,
                                 tuple(temperal_downsample)[::-1])

    def encode(self, x):
        mu, log_var = self.conv1(self.encoder(x)).chunk(2, dim=1)
        return mu

    def decode(self, z):
        return self.decoder(self.conv2(z)).clamp_(-1, 1)
