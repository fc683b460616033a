"""Stage-3 CLI: lift video + voxels + buffers into a 3D Gaussian scene.

Mirror of the reference's scene_gaussian_generation
(/root/reference/infinicube/inference/scene_gaussian_generation.py:258-975):
load the buffer folder (voxel world, pose/intrinsic/depth/instance tars,
video mp4), build the 4-channel GSM masks — sky from segmentation when
available with the **depth-buffer fallback** (sky = depth == 0, reference
:407-432), dynamic pixels from instance ids >= 10000 (:308) — run the static
feed-forward reconstruction with ``provided_depth``, then dynamic-object
reconstruction: per-pixel gaussians via decode_all, cropped to each object's
cuboid and accumulated per gid (:580-695). Saves decoded_gs_static.pkl /
decoded_gs_object.pkl / composite renders."""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from infinicube_tpu.camera.conventions import opencv_to_flu
from infinicube_tpu.data.codec import decode_member
from infinicube_tpu.data.tario import TarReader
from infinicube_tpu.grid.build import grid_from_ijk
from infinicube_tpu.models.gsm.model import (
    GSM, GSMConfig, gsm_apply_jit, gsm_init_jit)
from infinicube_tpu.utils.bbox import points_in_obb
from infinicube_tpu.utils.gaussian_io import (
    gaussians_to_dict, save_pkl, save_splat)

DYNAMIC_ID_BASE = 10000  # instance >= 10000 => dynamic (reference :308)


def load_buffer_folder(folder: str | Path, num_frames: int | None = None,
                       stride: int = 1) -> dict:
    """Read the stage-2 output folder into numpy arrays."""
    folder = Path(folder)
    out: dict = {}

    def read_tar(name, ext, post):
        p = folder / f"{name}.tar"
        if not p.exists():
            return None
        with TarReader(p) as r:
            frames = sorted(n for n in r.names() if n.endswith(ext))
            frames = frames[::stride][:num_frames]
            return np.stack([post(decode_member(ext.split(".")[-1],
                                                r.read(n))) for n in frames])

    out["depth"] = read_tar("depth", "png",
                            lambda a: np.asarray(a, np.float32) / 100.0)
    out["instance"] = read_tar("instance", "png",
                               lambda a: np.asarray(a, np.int32))
    out["semantic"] = read_tar("semantic", "png",
                               lambda a: np.asarray(a, np.int32))
    out["poses_cv"] = read_tar("pose", "npy", lambda a: np.asarray(a))
    out["Ks"] = read_tar("intrinsic", "npy", lambda a: np.asarray(a))
    video = folder / "video.mp4"
    if video.exists():
        from infinicube_tpu.utils.fileio import read_video
        v = read_video(video)[::stride][:num_frames]
        out["video"] = np.asarray(v, np.float32) / 255.0
    world = folder / "world.npz"
    if world.exists():
        d = np.load(world)
        out["world"] = d
    return out


def merge_buffer_folders(folders: list, num_frames: int | None = None,
                         stride: int = 1) -> dict:
    """Concatenate multiple recorded passes over the same scene into one
    data dict (the reference's multi-pass merge, :830-898); the world grid is
    taken from the first pass."""
    parts = [load_buffer_folder(f, num_frames, stride) for f in folders]
    out = {}
    for k in ("depth", "instance", "semantic", "poses_cv", "Ks", "video"):
        arrs = [p[k] for p in parts if p.get(k) is not None]
        if arrs:
            out[k] = np.concatenate(arrs, axis=0)
    for p in parts:
        if "world" in p:
            out["world"] = p["world"]
            break
    return out


def build_gsm_masks(depth: np.ndarray, instance: np.ndarray,
                    sky_seg: np.ndarray | None = None,
                    pixel_branch_last_n: int | None = 1) -> np.ndarray:
    """4-channel masks [V, H, W, 4] (reference :435-483):
    ch0 fg-from-seg (sky=0; depth==0 fallback when no seg), ch1 non-dynamic,
    ch2 hood/pad (all-ones here), ch3 fg-from-grid (depth>0).

    The pixel branch models the MIDGROUND = ch0 & ~ch3 (foreground the voxel
    grid doesn't cover).  ``pixel_branch_last_n`` (reference
    --enable_pixel_branch_last_n_frame, default 1) empties the midground of
    every frame before the last N by setting ch0 = ch3 there; None/0
    disables the pixel branch for all frames the same way."""
    V, H, W = depth.shape
    fg_grid = (depth > 0).astype(np.float32)
    fg_seg = (~(sky_seg > 0)).astype(np.float32) if sky_seg is not None \
        else fg_grid
    m = np.ones((V, H, W, 4), np.float32)
    m[..., 0] = fg_seg
    m[..., 1] = (instance < DYNAMIC_ID_BASE).astype(np.float32)
    m[..., 3] = fg_grid
    n = pixel_branch_last_n or 0
    if n <= 0:
        m[..., 0] = m[..., 3]
    elif n < V:
        m[:-n, ..., 0] = m[:-n, ..., 3]
    return m


def reconstruct_scene(data: dict, params=None, model: GSM | None = None,
                      cfg: GSMConfig | None = None, max_views: int = 8,
                      seed: int = 0, pixel_branch_last_n: int = 1):
    """Static + dynamic reconstruction. Returns (static_gs, object_gs dict,
    model, params)."""
    depth = data["depth"]
    V = min(max_views, depth.shape[0])
    sel = np.linspace(0, depth.shape[0] - 1, V).astype(int)
    depth = depth[sel]
    instance = data["instance"][sel]
    poses_cv = data["poses_cv"][sel]
    Ks = data["Ks"][sel]
    rgb = data.get("video")
    rgb = rgb[sel] if rgb is not None else \
        np.zeros(depth.shape + (3,), np.float32)
    sky_seg = data.get("sky_seg")
    masks = build_gsm_masks(depth, instance,
                            sky_seg[sel] if sky_seg is not None else None,
                            pixel_branch_last_n=pixel_branch_last_n)

    # voxel grid from the world crop
    if "world" in data:
        w = data["world"]
        ijk = w["ijk"]
        cap = 1 << int(np.ceil(np.log2(max(len(ijk), 2))))
        grid = grid_from_ijk(jnp.asarray(ijk, jnp.int32)[None],
                             jnp.ones((1, len(ijk)), bool),
                             jnp.asarray(w["voxel_size"], jnp.float32),
                             jnp.asarray(w["origin"], jnp.float32),
                             capacity=min(cap, 1 << 18))
        use_voxel = True
    else:
        grid = grid_from_ijk(jnp.zeros((1, 2, 3), jnp.int32),
                             jnp.zeros((1, 2), bool), 0.2, 0.1, capacity=2)
        use_voxel = False

    cfg = cfg or GSMConfig(use_voxel_branch=use_voxel)
    model = model or GSM(cfg)
    batch = {
        "grid": grid,
        "images": jnp.asarray(rgb, jnp.float32),
        "masks": jnp.asarray(masks),
        "Ks": jnp.asarray(Ks, jnp.float32),
        "cam_to_worlds": jnp.asarray(poses_cv, jnp.float32),
        "depth_prior": jnp.asarray(depth, jnp.float32)[..., None],
    }
    if params is None:
        params = gsm_init_jit(model, jax.random.PRNGKey(seed), batch)

    # static pass (provided_depth drives the pixel branch)
    out = gsm_apply_jit(model, params, batch)
    static_gs = gaussians_to_dict(**{k: np.asarray(out["gaussians"][k])
                                     for k in ("means", "scales", "quats",
                                               "opacities", "colors")},
                                  valid=np.asarray(out["gaussians"]["valid"]))

    # dynamic pass: per-pixel gaussians for dynamic pixels, cropped per object
    object_gs: dict[int, dict] = {}
    dyn_ids = np.unique(instance[instance >= DYNAMIC_ID_BASE])
    if len(dyn_ids):
        out_dyn = gsm_apply_jit(model, params, batch, True)
        g = {k: np.asarray(out_dyn["gaussians"][k])
             for k in ("means", "scales", "quats", "opacities", "colors",
                       "valid")}
        # map pixel gaussians back to their pixel's instance id
        K = cfg.pixel.gs_per_pixel
        if cfg.use_voxel_branch:
            n_vox = out_dyn["gaussians"]["valid"].shape[0] - \
                instance.size * K
            for k in g:
                g[k] = g[k][n_vox:]
        pix_inst = np.repeat(instance.reshape(-1), K)
        for gid in dyn_ids:
            m = pix_inst == gid
            object_gs[int(gid)] = gaussians_to_dict(
                g["means"][m], g["scales"][m], g["quats"][m],
                g["opacities"][m], g["colors"][m])
    return static_gs, object_gs, out, model, params


def segment_sky(video: "np.ndarray", ckpt: str,
                variant: str = "b0") -> "np.ndarray":
    """Run the converted SegFormer over the video frames -> sky masks
    [V, H, W] uint8 (the reference runs the cityscapes mmseg SegFormer at
    this exact spot, scene_gaussian_generation.py:90-95). ``ckpt``: a torch
    state dict (.pth, HF layout) or a saved flax params .msgpack."""
    from infinicube_tpu.data_process.generate_additional_attributes import (
        make_segformer_sky_segmenter)
    from infinicube_tpu.models.gsm.segformer import (SegformerConfig,
                                                     convert_segformer_hf)
    cfg = getattr(SegformerConfig, variant)()
    if str(ckpt).endswith(".msgpack"):
        import flax.serialization
        from infinicube_tpu.models.gsm.segformer import Segformer
        import jax
        tmpl = jax.eval_shape(
            lambda: Segformer(cfg).init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3))))
        params = flax.serialization.from_bytes(
            tmpl, Path(ckpt).read_bytes())
    else:
        from infinicube_tpu.weights.convert import load_torch_state_dict
        params = convert_segformer_hf(load_torch_state_dict(ckpt), cfg)
    seg = make_segformer_sky_segmenter(params, cfg)
    return np.stack([seg(f) for f in video]).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--buffer_folder", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--max_views", type=int, default=8)
    ap.add_argument("--segformer-ckpt", default=None,
                    help="SegFormer weights (.pth HF layout or flax "
                         ".msgpack): sky masks from segmentation instead of "
                         "the depth==0 fallback")
    ap.add_argument("--segformer-variant", default="b0")
    args = ap.parse_args(argv)

    data = load_buffer_folder(args.buffer_folder, args.num_frames)
    if args.segformer_ckpt and data.get("video") is not None and \
            data.get("sky_seg") is None:
        data["sky_seg"] = segment_sky(data["video"], args.segformer_ckpt,
                                      args.segformer_variant)
    static_gs, object_gs, out, _, _ = reconstruct_scene(
        data, max_views=args.max_views)
    outdir = Path(args.output)
    save_pkl(outdir / "decoded_gs_static.pkl", static_gs)
    save_pkl(outdir / "decoded_gs_object.pkl", object_gs)
    save_splat(outdir / "decoded_gs_static.splat", static_gs)
    # first-frame composite render preview
    rgb0 = np.asarray(out["render"]["rgb"][0])
    from PIL import Image
    Image.fromarray((np.clip(rgb0, 0, 1) * 255).astype(np.uint8)).save(
        outdir / "composite_frame0.png")
    print(f"static gaussians: {len(static_gs['means'])}; "
          f"objects: {list(object_gs)} -> {outdir}")


if __name__ == "__main__":
    main()
