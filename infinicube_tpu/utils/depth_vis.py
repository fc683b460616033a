"""Depth visualization + alignment utilities.

Mirror of the reference's depth utilities
(/root/reference/infinicube/utils/depth_utils.py): ``vis_depth`` colormap
(:20) and least-squares scale/shift alignment of monocular depth against
sparse metric depth (:72-328, used for DAv2/metric3d alignment in the data
pipeline)."""

from __future__ import annotations

import numpy as np


def vis_depth(depth: np.ndarray, max_depth: float | None = None) -> np.ndarray:
    """f32 [H, W] depth (0 = invalid) -> uint8 [H, W, 3] turbo-ish colormap."""
    d = np.asarray(depth, np.float32)
    valid = d > 0
    if max_depth is None:
        max_depth = np.percentile(d[valid], 97) if valid.any() else 1.0
    x = np.clip(d / max(max_depth, 1e-6), 0, 1)
    try:
        from matplotlib import colormaps
        rgb = colormaps["turbo"](1.0 - x)[..., :3]
    except Exception:
        rgb = np.stack([1 - x, np.abs(0.5 - x) * 2, x], axis=-1)
    rgb = np.where(valid[..., None], rgb, 1.0)
    return (rgb * 255).astype(np.uint8)


def align_depth_lstsq(mono: np.ndarray, metric: np.ndarray,
                      valid: np.ndarray | None = None,
                      inverse: bool = True) -> tuple[float, float]:
    """Fit (scale, shift) minimizing || s * mono + t - metric ||^2 over valid
    pixels; with inverse=True the fit runs in inverse-depth space (the
    standard monocular-depth alignment; reference depth_utils.py:72-328).
    Returns (scale, shift)."""
    m = np.asarray(mono, np.float64).ravel()
    g = np.asarray(metric, np.float64).ravel()
    v = (g > 0) & np.isfinite(m)
    if valid is not None:
        v &= np.asarray(valid).ravel()
    if inverse:
        g = np.where(v, 1.0 / np.maximum(g, 1e-6), 0.0)
    A = np.stack([m[v], np.ones(v.sum())], axis=1)
    sol, *_ = np.linalg.lstsq(A, g[v], rcond=None)
    return float(sol[0]), float(sol[1])


def apply_depth_alignment(mono: np.ndarray, scale: float, shift: float,
                          inverse: bool = True) -> np.ndarray:
    out = scale * np.asarray(mono, np.float64) + shift
    if inverse:
        out = 1.0 / np.maximum(out, 1e-6)
    return out.astype(np.float32)
