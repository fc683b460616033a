"""Torch checkpoint -> JAX parameter conversion.

The reference ships torch checkpoints (voxel_diffusion.ckpt / vae.ckpt, the
DiffSynth Wan2.1 safetensors, umt5-xxl) — these converters map their state
dicts onto this framework's parameter trees so trained reference weights can
be served on TPU. Conversion is pure name/layout mapping:

- torch Conv3d [O, I, kD, kH, kW] -> flax [kD, kH, kW, I, O]
- torch Linear [O, I] -> flax Dense kernel [I, O]
- fvdb SparseConv3d [O, I, k, k, k] -> gather-GEMM kernel [K=27, I, O]
  with taps enumerated row-major over (di, dj, dk) — matching
  grid.ops.neighbor_offsets order.

Without checkpoint files present these functions are inert; they are
exercised in tests with synthetic state dicts."""

from __future__ import annotations

from typing import Mapping

import numpy as np


def t2j(t) -> np.ndarray:
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().cpu().float().numpy()
    except Exception:
        pass
    return np.asarray(t, np.float32)


def convert_linear(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": t2j(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2j(sd[f"{prefix}.bias"])
    return out


def convert_conv3d(sd: Mapping, prefix: str) -> dict:
    w = t2j(sd[f"{prefix}.weight"])          # [O, I, kD, kH, kW]
    out = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2j(sd[f"{prefix}.bias"])
    return out


def convert_conv2d(sd: Mapping, prefix: str) -> dict:
    w = t2j(sd[f"{prefix}.weight"])          # [O, I, kH, kW]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2j(sd[f"{prefix}.bias"])
    return out


def convert_sparse_conv3d(sd: Mapping, prefix: str) -> dict:
    """fvdb kernel [O, I, 3, 3, 3] -> gather-GEMM [27, I, O], taps row-major
    over the (di, dj, dk) window (grid.ops.neighbor_offsets order)."""
    w = t2j(sd[f"{prefix}.weight"])
    if w.ndim == 5:                          # [O, I, kd, kh, kw]
        O, I = w.shape[:2]
        k = w.shape[2] * w.shape[3] * w.shape[4]
        kern = w.reshape(O, I, k).transpose(2, 1, 0)
    else:                                    # already [K, I, O]-like
        kern = w
    out = {"kernel": kern}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2j(sd[f"{prefix}.bias"])
    return out


def convert_norm(sd: Mapping, prefix: str) -> dict:
    return {"scale": t2j(sd[f"{prefix}.weight"]),
            "bias": t2j(sd[f"{prefix}.bias"])}


def convert_embedding(sd: Mapping, prefix: str) -> dict:
    return {"embedding": t2j(sd[f"{prefix}.weight"])}


# ---------------------------------------------------------------------------
# Wan DiT block mapping (DiffSynth naming -> models.wan.dit naming)
# ---------------------------------------------------------------------------

def _rope_interleave_to_halfsplit(vec_or_kernel: np.ndarray,
                                  num_heads: int) -> np.ndarray:
    """Permute q/k output channels from Wan's interleaved RoPE-pair layout
    to this framework's half-split layout (dit.apply_rope).

    Upstream rotates complex pairs (c[2j], c[2j+1]) per head; we rotate
    (c[j], c[j+d/2]).  Reordering each head's channels [evens..., odds...]
    maps one onto the other, and is transparent to attention because q and k
    are permuted identically (dot products unchanged) while v/o stay put.
    Works on Dense kernels [I, h*d] (last axis = output channels), biases
    [h*d], and RMSNorm scales [h*d]."""
    x = np.asarray(vec_or_kernel)
    hd = x.shape[-1] // num_heads
    perm = np.concatenate([np.arange(0, hd, 2), np.arange(1, hd, 2)])
    shaped = x.reshape(x.shape[:-1] + (num_heads, hd))
    return shaped[..., perm].reshape(x.shape)


def convert_wan_block(sd: Mapping, i: int, num_heads: int) -> dict:
    """One DiffSynth WanModel block -> WanBlock params."""
    p = f"blocks.{i}"

    def rope_linear(prefix):
        out = convert_linear(sd, prefix)
        out = {k: _rope_interleave_to_halfsplit(v, num_heads)
               for k, v in out.items()}
        return out

    def fuse(parts: list[dict]) -> dict:
        """Concat separate linears into one fused projection (output axis)."""
        out = {"kernel": np.concatenate([q["kernel"] for q in parts], -1)}
        if "bias" in parts[0]:
            out["bias"] = np.concatenate([q["bias"] for q in parts], -1)
        return out

    blk = {
        "self_attn": {
            # dit.WanAttention uses one fused [C, 3C] qkv projection
            "qkv": fuse([rope_linear(f"{p}.self_attn.q"),
                         rope_linear(f"{p}.self_attn.k"),
                         convert_linear(sd, f"{p}.self_attn.v")]),
            "o": convert_linear(sd, f"{p}.self_attn.o"),
            "q_norm": {"scale": _rope_interleave_to_halfsplit(
                t2j(sd[f"{p}.self_attn.norm_q.weight"]), num_heads)},
            "k_norm": {"scale": _rope_interleave_to_halfsplit(
                t2j(sd[f"{p}.self_attn.norm_k.weight"]), num_heads)},
        },
        "cross_attn": {
            "q": convert_linear(sd, f"{p}.cross_attn.q"),
            "kv": fuse([convert_linear(sd, f"{p}.cross_attn.k"),
                        convert_linear(sd, f"{p}.cross_attn.v")]),
            "o": convert_linear(sd, f"{p}.cross_attn.o"),
            "q_norm": {"scale": t2j(sd[f"{p}.cross_attn.norm_q.weight"])},
            "k_norm": {"scale": t2j(sd[f"{p}.cross_attn.norm_k.weight"])},
        },
        "cross_norm": convert_norm(sd, f"{p}.norm3"),
        "ffn_in": convert_linear(sd, f"{p}.ffn.0"),
        "ffn_out": convert_linear(sd, f"{p}.ffn.2"),
        "mod_bias": t2j(sd[f"{p}.modulation"]).reshape(6, -1),
    }
    return blk


def stack_blocks(blocks: list[dict]) -> dict:
    """Stack per-block param trees along a leading layer axis (the
    scan_layers=True layout)."""
    def rec(trees):
        if isinstance(trees[0], dict):
            return {k: rec([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees)
    return rec(blocks)


def convert_wan_dit(sd: Mapping, num_layers: int, num_heads: int,
                    scan_layers: bool = True) -> dict:
    params = {
        "patch_embed": _patchify_conv(sd, "patch_embedding"),
        "t_proj1": convert_linear(sd, "time_embedding.0"),
        "t_proj2": convert_linear(sd, "time_embedding.2"),
        "t_mod": convert_linear(sd, "time_projection.1"),
        "text_proj_in": convert_linear(sd, "text_embedding.0"),
        "text_proj": convert_linear(sd, "text_embedding.2"),
        "head": convert_linear(sd, "head.head"),
        # Wan's Head computes (modulation + t_emb).chunk(2); head_mod is that
        # [2, dim] parameter verbatim (dit.py adds the raw time embedding).
        "head_mod": t2j(sd["head.modulation"]).reshape(2, -1),
    }
    if "buffer_embedding.weight" in sd:
        params["buffer_embed"] = _patchify_conv(sd, "buffer_embedding")
    blocks = [convert_wan_block(sd, i, num_heads) for i in range(num_layers)]
    if scan_layers:
        params["blocks"] = {"WanBlock_0": stack_blocks(blocks)}
    else:
        for i, b in enumerate(blocks):
            params[f"block{i}"] = b
    return {"params": params}


def _patchify_conv(sd: Mapping, prefix: str) -> dict:
    """Wan's Conv3d patch embedding [O, I, pt, ph, pw] -> Dense over the
    flattened patch [pt*ph*pw*I, O] matching dit.patchify's reshape order
    (patch dims before channels)."""
    w = t2j(sd[f"{prefix}.weight"])          # [O, I, pt, ph, pw]
    O, I = w.shape[:2]
    w = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, O)
    out = {"kernel": w}
    if f"{prefix}.bias" in sd:
        out["bias"] = t2j(sd[f"{prefix}.bias"])
    return out


def initialize_buffer_embedder(dit_params: dict, cfg) -> dict:
    """Zero-init the buffer-embedder patchifier into converted DiT params —
    the InfiniCube fork's ``initialize_buffer_embedder(buffer_channels=16,
    zero_init=True)`` (/root/reference/infinicube/videogen/inference.py:84-88)
    applied to a vanilla Wan2.1 T2V checkpoint: the pretrained model is
    untouched at init because the added embedding starts at zero."""
    p = dict(dit_params["params"])
    if "buffer_embed" not in p:
        pt, ph, pw = cfg.patch_size
        in_dim = pt * ph * pw * cfg.buffer_channels
        p["buffer_embed"] = {
            "kernel": np.zeros((in_dim, cfg.dim), np.float32),
            "bias": np.zeros((cfg.dim,), np.float32),
        }
    return {**dit_params, "params": p}


def load_torch_state_dict(path: str) -> dict:
    """Load a .ckpt/.pt/.safetensors state dict."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd
