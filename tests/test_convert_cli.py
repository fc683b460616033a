"""Real-weights converter CLI round trip (infinicube_tpu/convert.py).

Torch mirrors are SAVED in the released Wan2.1 file layouts (sharded
safetensors + index json for the DiT, .pth torch pickles for VAE/umt5),
converted through the CLI, and the loaded checkpoint must (a) match the
in-memory converter output leaf-for-leaf and (b) drive a WanVideoGenerator
forward. Reference load path: /root/reference/infinicube/videogen/
inference.py:63-88."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from infinicube_tpu import convert as convert_cli
from infinicube_tpu.models.wan.dit import WanDiTConfig
from infinicube_tpu.models.wan.pipeline import (WanPipelineConfig,
                                                WanVideoGenerator)
from infinicube_tpu.models.wan.t5 import T5Config
from infinicube_tpu.models.wan.vae3d import VideoVAEConfig
from infinicube_tpu.weights.wan_convert import convert_wan_pipeline

from torch_mirrors.wan_dit_torch import WanModelMirror
from torch_mirrors.wan_vae_torch import WanVAEMirror


def _tiny_dit_cfg():
    return WanDiTConfig(
        dim=64, ffn_dim=128, num_layers=2, num_heads=2, in_channels=4,
        out_channels=4, text_dim=32, freq_dim=32, patch_size=(1, 2, 2),
        buffer_channels=6, dtype=jnp.float32)


def _save_sharded_safetensors(sd, out_dir, shards=3):
    """Write the released 14B layout: N shards + weight-map index json."""
    from safetensors.numpy import save_file
    keys = sorted(sd.keys())
    weight_map = {}
    for s in range(shards):
        part = {k: sd[k].detach().numpy() for k in keys[s::shards]}
        name = f"diffusion_pytorch_model-{s+1:05d}-of-{shards:05d}.safetensors"
        save_file(part, out_dir / name)
        weight_map.update({k: name for k in part})
    (out_dir / "diffusion_pytorch_model.safetensors.index.json").write_text(
        json.dumps({"metadata": {}, "weight_map": weight_map}))


@pytest.fixture(scope="module")
def released_files(tmp_path_factory):
    root = tmp_path_factory.mktemp("released")
    torch.manual_seed(0)
    dit = WanModelMirror(dim=64, ffn_dim=128, num_layers=2, num_heads=2,
                         in_dim=4, out_dim=4, text_dim=32, freq_dim=32,
                         buffer_dim=6).eval()
    dit_dir = root / "Wan2.1-T2V-tiny"
    dit_dir.mkdir()
    _save_sharded_safetensors(dit.state_dict(), dit_dir)

    vae = WanVAEMirror(dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
                       temperal_downsample=(False, True)).eval()
    torch.save(vae.state_dict(), root / "Wan2.1_VAE.pth")

    # umt5 in the Wan .pth key layout (synthesized like
    # test_wan_torch_parity.test_umt5_wan_layout_converts)
    from transformers import UMT5Config as HFCfg, UMT5EncoderModel
    torch.manual_seed(1)
    hf = UMT5EncoderModel(HFCfg(
        vocab_size=512, d_model=64, d_ff=128, num_layers=2, num_heads=4,
        d_kv=16, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False)).eval()
    hsd = hf.state_dict()
    wan_sd = {"token_embedding.weight": hsd["shared.weight"],
              "norm.weight": hsd["encoder.final_layer_norm.weight"]}
    for i in range(2):
        b, hb = f"blocks.{i}", f"encoder.block.{i}"
        att = f"{hb}.layer.0.SelfAttention"
        wan_sd.update({
            f"{b}.norm1.weight": hsd[f"{hb}.layer.0.layer_norm.weight"],
            f"{b}.attn.q.weight": hsd[f"{att}.q.weight"],
            f"{b}.attn.k.weight": hsd[f"{att}.k.weight"],
            f"{b}.attn.v.weight": hsd[f"{att}.v.weight"],
            f"{b}.attn.o.weight": hsd[f"{att}.o.weight"],
            f"{b}.pos_embedding.embedding.weight":
                hsd[f"{att}.relative_attention_bias.weight"],
            f"{b}.norm2.weight": hsd[f"{hb}.layer.1.layer_norm.weight"],
            f"{b}.ffn.gate.0.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wi_0.weight"],
            f"{b}.ffn.fc1.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wi_1.weight"],
            f"{b}.ffn.fc2.weight":
                hsd[f"{hb}.layer.1.DenseReluDense.wo.weight"],
        })
    torch.save(wan_sd, root / "models_t5_umt5-xxl-enc-bf16.pth")
    return root, dit


def test_sharded_safetensors_loader(released_files):
    root, dit = released_files
    sd = convert_cli.load_released_state_dict(root / "Wan2.1-T2V-tiny")
    ref = dit.state_dict()
    assert set(sd) == set(ref)
    for k in sd:
        np.testing.assert_array_equal(sd[k], ref[k].detach().numpy())


def test_cli_round_trip_matches_in_memory(released_files, tmp_path,
                                          monkeypatch):
    root, dit = released_files
    out = tmp_path / "ckpt"
    # the CLI hardcodes release variants; patch the 1.3b config to the tiny
    # mirror shape so it converts this fixture's checkpoint
    monkeypatch.setattr(WanDiTConfig, "wan_1_3b",
                        staticmethod(lambda **kw: _tiny_dit_cfg()))
    convert_cli.main([
        "--wan-dit", str(root / "Wan2.1-T2V-tiny"),
        "--wan-vae", str(root / "Wan2.1_VAE.pth"),
        "--umt5", str(root / "models_t5_umt5-xxl-enc-bf16.pth"),
        "--variant", "1.3b", "--out", str(out)])

    params, meta = convert_cli.load_pipeline_checkpoint(out)
    assert meta["variant"] == "1.3b"
    assert sorted(meta["towers"]) == ["dit", "t5", "vae"]

    ref = convert_wan_pipeline(
        {k: v.detach().numpy() for k, v in dit.state_dict().items()},
        torch.load(root / "Wan2.1_VAE.pth", weights_only=False),
        torch.load(root / "models_t5_umt5-xxl-enc-bf16.pth",
                   weights_only=False),
        dit_cfg=_tiny_dit_cfg(), t5_layout="wan")
    flat_got = jax.tree_util.tree_leaves_with_path(params)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref))
    assert len(flat_got) == len(flat_ref)
    for path, leaf in flat_got:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_ref[path]), atol=1e-6)


def test_checkpoint_drives_pipeline(released_files, tmp_path, monkeypatch):
    """from_checkpoint -> generate() runs end-to-end on the converted real
    (mirror) weights — the day-one real-weights serving path."""
    root, _ = released_files
    out = tmp_path / "ckpt"
    monkeypatch.setattr(WanDiTConfig, "wan_1_3b",
                        staticmethod(lambda **kw: _tiny_dit_cfg()))
    convert_cli.main([
        "--wan-dit", str(root / "Wan2.1-T2V-tiny"),
        "--wan-vae", str(root / "Wan2.1_VAE.pth"),
        "--umt5", str(root / "models_t5_umt5-xxl-enc-bf16.pth"),
        "--variant", "1.3b", "--out", str(out)])

    cfg = WanPipelineConfig(
        dit=_tiny_dit_cfg(),
        vae=VideoVAEConfig(latent_channels=4, base_channels=8,
                           channel_mult=(1, 2, 2), num_res_blocks=1,
                           temporal_down=(False, True), dtype=jnp.float32),
        t5=T5Config.tiny(dtype=jnp.float32),
        num_frames=5, height=16, width=16, num_steps=2)
    gen = WanVideoGenerator.from_checkpoint(out, cfg=cfg)
    assert set(gen.params) == {"dit", "t5", "vae"}
    # t5 tower runs standalone (its tiny d_model=64 differs from the tiny
    # mirror DiT's text_dim=32, so the denoise drive gets a 32-dim context)
    emb = gen.encode_text(gen.params, "a test scene")
    assert np.isfinite(np.asarray(emb)).all()
    T, H, W = gen.cfg.latent_thw
    buf = jnp.zeros((1, T, H, W, 6))
    text = jnp.zeros((1, 8, 32))
    # _denoise takes ONLY the DiT tower (the host-resident umt5-xxl must
    # never be shipped into the jit)
    z = gen._denoise(gen.params["dit"], jax.random.PRNGKey(0), text,
                     text * 0, buf, 2, 5.0)
    assert np.isfinite(np.asarray(z)).all()


def test_finetune_ckpt_overlay(released_files, tmp_path, monkeypatch):
    """The reference's finetuned buffer-DiT checkpoint layout
    (/root/reference/infinicube/videogen/inference.py:101-128): a torch
    .ckpt whose 'buffer_embedder.*' keys carry the trained buffer patchifier
    and whose 'dit.*' keys override base DiT weights (strict=False). The CLI
    must overlay both onto the base safetensors and ignore unrelated keys."""
    root, dit = released_files
    out = tmp_path / "ckpt_ft"
    torch.manual_seed(7)
    ft = {
        # trained (non-zero) buffer embedder: Conv3d [O, I, pt, ph, pw]
        "buffer_embedder.weight": torch.randn(64, 6, 1, 2, 2),
        "buffer_embedder.bias": torch.randn(64),
        # a finetuned DiT head + one block tensor
        "dit.head.head.weight": torch.randn(16, 64),
        "dit.head.head.bias": torch.randn(16),
        # optimizer / trainer junk the reference's strict=False path ignores
        "optimizer.step": torch.tensor(1000),
    }
    torch.save(ft, tmp_path / "buffer_dit_finetune.ckpt")
    monkeypatch.setattr(WanDiTConfig, "wan_1_3b",
                        staticmethod(lambda **kw: _tiny_dit_cfg()))
    convert_cli.main([
        "--wan-dit", str(root / "Wan2.1-T2V-tiny"),
        "--finetune-ckpt", str(tmp_path / "buffer_dit_finetune.ckpt"),
        "--variant", "1.3b", "--out", str(out)])

    params, meta = convert_cli.load_pipeline_checkpoint(out)
    assert "finetune_ckpt" in meta["source_files"]
    p = params["dit"]["params"]
    # buffer embedder is the TRAINED one (patchified layout), not zero-init
    w = ft["buffer_embedder.weight"].numpy()
    want = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, 64)
    np.testing.assert_allclose(np.asarray(p["buffer_embed"]["kernel"]),
                               want, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["buffer_embed"]["bias"]),
                               ft["buffer_embedder.bias"].numpy(), atol=1e-6)
    # dit.* keys overrode the base head; untouched keys kept base values
    np.testing.assert_allclose(
        np.asarray(p["head"]["kernel"]),
        ft["dit.head.head.weight"].numpy().T, atol=1e-6)
    base = dit.state_dict()
    np.testing.assert_allclose(
        np.asarray(p["patch_embed"]["bias"]),
        base["patch_embedding.bias"].detach().numpy(), atol=1e-6)


def test_partial_checkpoint_fills_missing_towers(released_files, tmp_path,
                                                 monkeypatch):
    root, _ = released_files
    out = tmp_path / "ckpt_vae_only"
    convert_cli.main(["--wan-vae", str(root / "Wan2.1_VAE.pth"),
                      "--out", str(out)])
    cfg = WanPipelineConfig(
        dit=_tiny_dit_cfg(),
        vae=VideoVAEConfig(latent_channels=4, base_channels=8,
                           channel_mult=(1, 2, 2), num_res_blocks=1,
                           temporal_down=(False, True), dtype=jnp.float32),
        t5=T5Config.tiny(dtype=jnp.float32),
        num_frames=5, height=16, width=16, num_steps=2)
    gen = WanVideoGenerator.from_checkpoint(out, cfg=cfg)
    assert set(gen.params) == {"dit", "t5", "vae"}
