"""Sample member codec for tar shards.

Mirror of the reference's webdataset codec
(/root/reference/infinicube/utils/wds_utils.py:112-237): decode by extension
— png (incl. **uint16** depth/instance pngs), jpg, json, npy/npz, txt, pth —
and the matching encoders for shard writing."""

from __future__ import annotations

import io
import json
from typing import Any

import numpy as np


def decode_member(ext: str, data: bytes) -> Any:
    ext = ext.lower().lstrip(".")
    if ext in ("png", "jpg", "jpeg"):
        from PIL import Image
        img = Image.open(io.BytesIO(data))
        arr = np.asarray(img)
        return arr  # uint16 PNGs decode as uint16 (mode I;16)
    if ext == "json":
        return json.loads(data.decode())
    if ext in ("txt", "text"):
        return data.decode()
    if ext == "npy":
        return np.load(io.BytesIO(data), allow_pickle=False)
    if ext == "npz":
        return dict(np.load(io.BytesIO(data), allow_pickle=False))
    if ext in ("pth", "pt", "pkl", "pickle"):
        import pickle
        try:
            return pickle.loads(data)
        except Exception:
            import torch
            return torch.load(io.BytesIO(data), map_location="cpu",
                              weights_only=False)
    if ext == "mp4":
        return data  # raw bytes; decode via fileio.read_video
    return data


def encode_member(ext: str, value: Any) -> bytes:
    ext = ext.lower().lstrip(".")
    if ext in ("png", "jpg", "jpeg"):
        from PIL import Image
        arr = np.asarray(value)
        if arr.dtype == np.uint16:
            img = Image.fromarray(arr.astype(np.int32), mode="I")
            buf = io.BytesIO()
            # Pillow writes mode I as 32-bit; convert through I;16
            img = img.convert("I;16")
            img.save(buf, format="PNG")
            return buf.getvalue()
        img = Image.fromarray(arr)
        buf = io.BytesIO()
        img.save(buf, format="PNG" if ext == "png" else "JPEG")
        return buf.getvalue()
    if ext == "json":
        return json.dumps(value).encode()
    if ext in ("txt", "text"):
        return str(value).encode()
    if ext == "npy":
        buf = io.BytesIO()
        np.save(buf, np.asarray(value))
        return buf.getvalue()
    if ext == "npz":
        buf = io.BytesIO()
        np.savez_compressed(buf, **value)
        return buf.getvalue()
    if ext in ("pkl", "pickle", "pth", "pt"):
        import pickle
        return pickle.dumps(value)
    if isinstance(value, bytes):
        return value
    raise ValueError(f"cannot encode extension {ext}")


def decode_sample(members: dict[str, bytes]) -> dict[str, Any]:
    return {ext: decode_member(ext.split(".")[-1], raw)
            for ext, raw in members.items()}


def group_samples(names: list[str]) -> dict[str, list[str]]:
    """Group member names by sample key (prefix before first dot)."""
    out: dict[str, list[str]] = {}
    for n in names:
        key = n.partition(".")[0]
        out.setdefault(key, []).append(n)
    return out
