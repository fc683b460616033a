"""Real-weights converter CLI: released Wan2.1 checkpoint files -> one
framework checkpoint the inference CLIs load directly.

    python -m infinicube_tpu.convert \
        --wan-dit  <Wan2.1-T2V-1.3B dir or .safetensors> \
        --wan-vae  Wan2.1_VAE.pth \
        --umt5     models_t5_umt5-xxl-enc-bf16.pth \
        --variant  1.3b \
        --out      ckpts/wan13b_infinicube

Consumes the exact layouts the Wan2.1 release ships (and the reference
loads in /root/reference/infinicube/videogen/inference.py:63-88):

- DiT: ``diffusion_pytorch_model.safetensors`` (1.3B, single file) or the
  sharded ``diffusion_pytorch_model-0000X-of-0000N.safetensors`` +
  ``diffusion_pytorch_model.safetensors.index.json`` (14B); a directory is
  scanned for either. Plain ``.pth``/``.pt`` state dicts also accepted
  (the reference's finetuned buffer-DiT checkpoints are torch .ckpt).
- VAE: ``Wan2.1_VAE.pth`` torch pickle.
- umt5: ``models_t5_umt5-xxl-enc-bf16.pth`` (Wan "blocks.N..." layout) or a
  HuggingFace ``encoder.block.N...`` state dict (--umt5-layout hf).

Output: an Orbax checkpoint directory holding the assembled
``{"dit", "vae", "t5"}`` params tree (the WanVideoGenerator layout) plus a
``pipeline.json`` sidecar recording the variant/flags, loaded by
``load_pipeline_checkpoint`` / ``WanVideoGenerator.from_checkpoint`` and the
``--ckpt`` flag of the inference CLIs.

Round-tripped in tests/test_convert_cli.py: torch mirrors are SAVED in the
released file formats, converted through this CLI, and the loaded pipeline
must reproduce the mirror numerics.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# released-layout state-dict loaders
# ---------------------------------------------------------------------------

def load_safetensors_any(path: str | Path) -> dict:
    """Load a single .safetensors file, a sharded set via its index json, or
    a directory containing either (the released DiT layouts)."""
    from safetensors.numpy import load_file
    path = Path(path)
    if path.is_dir():
        idx = sorted(path.glob("*.safetensors.index.json"))
        if idx:
            return load_safetensors_any(idx[0])
        files = sorted(path.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no .safetensors under {path}")
        sd = {}
        for f in files:
            sd.update(load_file(f))
        return sd
    if path.name.endswith(".index.json"):
        index = json.loads(path.read_text())
        shards = sorted(set(index["weight_map"].values()))
        sd = {}
        for shard in shards:
            sd.update(load_file(path.parent / shard))
        return sd
    return load_file(path)


def load_released_state_dict(path: str | Path) -> dict:
    """Dispatch on the released file type: safetensors (single/sharded/dir)
    or torch pickle (.pth/.pt/.ckpt)."""
    p = Path(path)
    if p.is_dir() or p.suffix == ".safetensors" or \
            p.name.endswith(".index.json"):
        return load_safetensors_any(p)
    from infinicube_tpu.weights.convert import load_torch_state_dict
    return load_torch_state_dict(str(p))


def overlay_finetune(dit_sd: dict | None, ft_sd: dict) -> tuple[dict, int, int]:
    """Overlay a finetuned buffer-DiT TRAINING checkpoint onto the base DiT
    state dict — the reference's ``_load_checkpoint`` semantics
    (/root/reference/infinicube/videogen/inference.py:101-128): keys
    ``buffer_embedder.<tail>`` carry the trained buffer patchifier (loaded
    into the module that ``initialize_buffer_embedder`` added — here they
    become the DiT's ``buffer_embedding.*`` Conv3d weights), and keys
    ``dit.<tail>`` override base DiT weights (reference loads them
    ``strict=False``: extra keys are ignored, missing keys keep the base
    values). Returns (merged_sd, n_buffer_keys, n_dit_keys)."""
    merged = dict(dit_sd) if dit_sd else {}
    n_be = n_dit = 0
    for k, v in ft_sd.items():
        if k.startswith("buffer_embedder."):
            # accept both a bare Conv3d ('weight'/'bias') and a nested
            # module ('proj.weight'): the leaf name is what matters
            leaf = k.rsplit(".", 1)[-1]
            merged[f"buffer_embedding.{leaf}"] = v
            n_be += 1
        elif k.startswith("dit."):
            merged[k[len("dit."):]] = v
            n_dit += 1
    return merged, n_be, n_dit


# ---------------------------------------------------------------------------
# checkpoint save / load
# ---------------------------------------------------------------------------

def save_pipeline_checkpoint(out: str | Path, params: dict,
                             meta: dict | None = None):
    """Write the assembled params tree as an Orbax checkpoint + json sidecar."""
    import orbax.checkpoint as ocp
    out = Path(out).absolute()
    out.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out / "params", params, force=True)
    ckpt.wait_until_finished()
    (out / "pipeline.json").write_text(json.dumps(meta or {}, indent=2))


def load_pipeline_checkpoint(path: str | Path) -> tuple[dict, dict]:
    """-> (params, meta). Restores exactly what the converter saved."""
    import orbax.checkpoint as ocp
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(path / "params")
    meta = {}
    if (path / "pipeline.json").exists():
        meta = json.loads((path / "pipeline.json").read_text())
    return params, meta


def pipeline_config_from_meta(meta: dict):
    """Rebuild a WanPipelineConfig from the sidecar (variant + overrides)."""
    from infinicube_tpu.models.wan.dit import WanDiTConfig
    from infinicube_tpu.models.wan.pipeline import WanPipelineConfig
    variant = meta.get("variant", "1.3b")
    dit_kw = dict(meta.get("dit_overrides", {}))
    dit = WanDiTConfig.wan_14b(**dit_kw) if variant == "14b" else \
        WanDiTConfig.wan_1_3b(**dit_kw)
    pipe_kw = {k: v for k, v in meta.get("pipeline_overrides", {}).items()}
    return WanPipelineConfig(dit=dit, **pipe_kw)


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert released Wan2.1 weights to a framework "
                    "checkpoint")
    ap.add_argument("--wan-dit", default=None,
                    help="DiT dir / .safetensors / index.json / .pth")
    ap.add_argument("--wan-vae", default=None, help="Wan2.1_VAE.pth")
    ap.add_argument("--umt5", default=None,
                    help="models_t5_umt5-xxl-enc-bf16.pth or HF state dict")
    ap.add_argument("--umt5-layout", default="wan", choices=["wan", "hf"])
    ap.add_argument("--finetune-ckpt", default=None,
                    help="finetuned buffer-DiT training checkpoint (.ckpt) "
                         "overlaying the base DiT: 'buffer_embedder.*' + "
                         "'dit.*' prefixed keys (the reference's "
                         "checkpoint_path, videogen/inference.py:101-128)")
    ap.add_argument("--variant", default="1.3b", choices=["1.3b", "14b"])
    ap.add_argument("--no-buffer-embedder", action="store_true",
                    help="skip zero-init buffer embedder injection "
                         "(pure T2V serving)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    from infinicube_tpu.models.wan.dit import WanDiTConfig
    from infinicube_tpu.weights.wan_convert import convert_wan_pipeline

    dit_cfg = WanDiTConfig.wan_14b() if args.variant == "14b" else \
        WanDiTConfig.wan_1_3b()
    if args.no_buffer_embedder:
        dit_cfg = dataclasses.replace(dit_cfg, use_buffer_embedder=False)

    dit_sd = load_released_state_dict(args.wan_dit) if args.wan_dit else None
    if args.finetune_ckpt:
        if dit_sd is None:
            ap.error("--finetune-ckpt overlays a base DiT; pass --wan-dit "
                     "(the reference also loads base + checkpoint together)")
        ft_sd = load_released_state_dict(args.finetune_ckpt)
        dit_sd, n_be, n_dit = overlay_finetune(dit_sd, ft_sd)
        print(f"[convert] finetune overlay: {n_be} buffer-embedder + "
              f"{n_dit} dit tensors from {args.finetune_ckpt}")
    vae_sd = load_released_state_dict(args.wan_vae) if args.wan_vae else None
    t5_sd = load_released_state_dict(args.umt5) if args.umt5 else None
    for name, sd in (("dit", dit_sd), ("vae", vae_sd), ("t5", t5_sd)):
        if sd is not None:
            n = sum(int(np.prod(v.shape)) for v in sd.values()
                    if hasattr(v, "shape"))
            print(f"[convert] {name}: {len(sd)} tensors, {n/1e6:.0f}M params")

    params = convert_wan_pipeline(dit_sd, vae_sd, t5_sd, dit_cfg=dit_cfg,
                                  t5_layout=args.umt5_layout)
    meta = {
        "variant": args.variant,
        "towers": sorted(params.keys()),
        "dit_overrides": {"use_buffer_embedder": dit_cfg.use_buffer_embedder},
        "source_files": {k: str(v) for k, v in
                         (("wan_dit", args.wan_dit), ("wan_vae", args.wan_vae),
                          ("umt5", args.umt5),
                          ("finetune_ckpt", args.finetune_ckpt)) if v},
    }
    save_pipeline_checkpoint(args.out, params, meta)
    print(f"[convert] checkpoint written to {args.out} "
          f"(towers: {', '.join(meta['towers'])})")


if __name__ == "__main__":
    main()
