"""Wan2.1 stack checkpoint conversion: video VAE + umt5-xxl (+ DiT re-export).

The reference's stage 2 runs entirely on pretrained weights
(/root/reference/infinicube/videogen/inference.py:63-88: Wan2.1 DiT
safetensors, ``Wan2.1_VAE.pth``, ``models_t5_umt5-xxl-enc-bf16.pth``). These
converters map those state dicts onto the JAX module trees:

- convert_wan_vae: Wan2.1_VAE.pth layout -> models.wan.vae3d.VideoVAE
- convert_umt5_hf: HuggingFace UMT5EncoderModel -> models.wan.t5.T5Encoder
- convert_umt5_wan: Wan's own t5 .pth layout (token_embedding / blocks.N /
  pos_embedding) -> the same tree
- convert_wan_dit: re-exported from weights.convert

Validated against torch mirrors (tests/torch_mirrors/) and transformers'
UMT5EncoderModel — see tests/test_wan_torch_parity.py."""

from __future__ import annotations

from typing import Mapping

import numpy as np

from infinicube_tpu.weights.convert import (  # noqa: F401 (re-export)
    convert_linear, convert_wan_dit, initialize_buffer_embedder,
    load_torch_state_dict, t2j)


# ---------------------------------------------------------------------------
# video VAE
# ---------------------------------------------------------------------------

def _vae_entry(leaf: str, v: np.ndarray) -> dict:
    """One torch parameter -> flax param(s) under its module."""
    if leaf == "gamma":                       # RMS_norm [C,1,1(,1)] -> [C]
        return {"gamma": v.reshape(v.shape[0])}
    if leaf == "bias":
        return {"bias": v}
    assert leaf == "weight", leaf
    if v.ndim == 5:                           # Conv3d -> [kt,kh,kw,I,O]
        return {"kernel": v.transpose(2, 3, 4, 1, 0)}
    if v.ndim == 4:                           # Conv2d
        if v.shape[2] == 1 and v.shape[3] == 1:   # 1x1 -> Dense [I,O]
            return {"kernel": v[:, :, 0, 0].T}
        return {"kernel": v.transpose(2, 3, 1, 0)[None]}  # k3 -> (1,3,3,I,O)
    return {"kernel": v.T}                    # Linear


def convert_wan_vae(sd: Mapping) -> dict:
    """Wan2.1_VAE.pth state dict -> {"params": ...} for VideoVAE.

    Name mapping is mechanical: dotted integer indices become underscored
    module names (downsamples.3.residual.0 -> downsamples_3/residual_0);
    kernels transpose per layer kind (_vae_entry)."""
    params: dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        path = []
        i = 0
        while i < len(parts) - 1:
            if i + 1 < len(parts) - 1 and parts[i + 1].isdigit():
                path.append(f"{parts[i]}_{parts[i + 1]}")
                i += 2
            else:
                path.append(parts[i])
                i += 1
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node.update(_vae_entry(leaf, t2j(val)))
    return {"params": params}


# ---------------------------------------------------------------------------
# umt5 text encoder
# ---------------------------------------------------------------------------

def convert_umt5_hf(sd: Mapping, num_layers: int) -> dict:
    """HuggingFace UMT5EncoderModel state dict -> T5Encoder params.

    HF layout: shared.weight; encoder.block.N.layer.0.SelfAttention.{q,k,v,o,
    relative_attention_bias}; layer.0.layer_norm; layer.1.DenseReluDense.
    {wi_0,wi_1,wo}; layer.1.layer_norm; encoder.final_layer_norm."""
    def lin(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).T}

    params = {
        "embed": {"embedding": t2j(sd["shared.weight"])},
        "final_ln": {"scale": t2j(sd["encoder.final_layer_norm.weight"])},
    }
    for i in range(num_layers):
        b = f"encoder.block.{i}"
        att = f"{b}.layer.0.SelfAttention"
        params[f"layer{i}"] = {
            "ln1": {"scale": t2j(sd[f"{b}.layer.0.layer_norm.weight"])},
            "attn": {
                "q": lin(f"{att}.q"), "k": lin(f"{att}.k"),
                "v": lin(f"{att}.v"), "o": lin(f"{att}.o"),
                "rel_bias": t2j(
                    sd[f"{att}.relative_attention_bias.weight"]),
            },
            "ln2": {"scale": t2j(sd[f"{b}.layer.1.layer_norm.weight"])},
            "wi0": lin(f"{b}.layer.1.DenseReluDense.wi_0"),
            "wi1": lin(f"{b}.layer.1.DenseReluDense.wi_1"),
            "wo": lin(f"{b}.layer.1.DenseReluDense.wo"),
        }
    return {"params": params}


def convert_umt5_wan(sd: Mapping, num_layers: int) -> dict:
    """Wan's models_t5_umt5-xxl-enc .pth layout -> T5Encoder params.

    Wan layout (wan/modules/t5.py): token_embedding.weight; blocks.N.norm1 /
    attn.{q,k,v,o} / pos_embedding.embedding.weight / norm2 /
    ffn.{gate.0,fc1,fc2}; norm.weight. The FFN computes
    fc2(fc1(x) * GELU(gate(x))) so gate.0 is the activated branch (wi0)."""
    def lin(prefix):
        return {"kernel": t2j(sd[f"{prefix}.weight"]).T}

    params = {
        "embed": {"embedding": t2j(sd["token_embedding.weight"])},
        "final_ln": {"scale": t2j(sd["norm.weight"])},
    }
    for i in range(num_layers):
        b = f"blocks.{i}"
        params[f"layer{i}"] = {
            "ln1": {"scale": t2j(sd[f"{b}.norm1.weight"])},
            "attn": {
                "q": lin(f"{b}.attn.q"), "k": lin(f"{b}.attn.k"),
                "v": lin(f"{b}.attn.v"), "o": lin(f"{b}.attn.o"),
                "rel_bias": t2j(
                    sd[f"{b}.pos_embedding.embedding.weight"]),
            },
            "ln2": {"scale": t2j(sd[f"{b}.norm2.weight"])},
            "wi0": lin(f"{b}.ffn.gate.0"),
            "wi1": lin(f"{b}.ffn.fc1"),
            "wo": lin(f"{b}.ffn.fc2"),
        }
    return {"params": params}


def convert_wan_pipeline(dit_sd: Mapping | None, vae_sd: Mapping | None,
                         t5_sd: Mapping | None, dit_cfg=None,
                         t5_layout: str = "wan") -> dict:
    """Assemble a WanVideoGenerator params dict from the three checkpoints
    (any may be None to keep that tower random-init)."""
    params = {}
    if dit_sd is not None:
        p = convert_wan_dit(dit_sd, num_layers=dit_cfg.num_layers,
                            num_heads=dit_cfg.num_heads,
                            scan_layers=dit_cfg.scan_layers)
        params["dit"] = initialize_buffer_embedder(p, dit_cfg)
    if vae_sd is not None:
        params["vae"] = convert_wan_vae(vae_sd)
    if t5_sd is not None:
        if t5_layout == "wan":
            idxs = [int(k.split(".")[1]) for k in t5_sd
                    if k.startswith("blocks.")]
            params["t5"] = convert_umt5_wan(t5_sd, 1 + max(idxs))
        else:
            idxs = [int(k.split(".")[2]) for k in t5_sd
                    if k.startswith("encoder.block.")]
            params["t5"] = convert_umt5_hf(t5_sd, 1 + max(idxs))
    return params
