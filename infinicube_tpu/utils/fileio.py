"""Video / file I/O helpers.

Mirror of the reference's fileio utilities
(/root/reference/infinicube/utils/fileio_utils.py:25-160): video read
(imageio/PIL instead of decord), video write (imageio-ffmpeg), and the
grid+semantic reader for stage hand-off files."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def write_video(path, frames: np.ndarray, fps: int = 10):
    """frames uint8 [T, H, W, 3]."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames = np.ascontiguousarray(frames)
    try:
        import imageio.v3 as iio
        iio.imwrite(path, frames, fps=fps)
    except Exception:
        try:
            import imageio
            w = imageio.get_writer(path, fps=fps)
            for f in frames:
                w.append_data(f)
            w.close()
        except Exception:
            # last resort: png frame dump next to the target
            d = path.with_suffix("")
            d.mkdir(parents=True, exist_ok=True)
            from PIL import Image
            for i, f in enumerate(frames):
                Image.fromarray(f).save(d / f"{i:06d}.png")


def read_video(path) -> np.ndarray:
    """-> uint8 [T, H, W, 3]."""
    try:
        import imageio.v3 as iio
        return np.asarray(iio.imread(path, plugin="pyav"))
    except Exception:
        import imageio
        r = imageio.get_reader(path)
        return np.stack([np.asarray(f) for f in r])


def save_grid_semantic(path, ijk: np.ndarray, semantics: np.ndarray,
                       voxel_size, origin):
    """Stage-1 hand-off file ({step}.pt analogue, npz-based)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, ijk=ijk.astype(np.int64),
                        semantics=semantics.astype(np.int32),
                        voxel_size=np.asarray(voxel_size, np.float64),
                        origin=np.asarray(origin, np.float64))


def load_grid_semantic(path):
    d = np.load(path)
    return (d["ijk"], d["semantics"], d["voxel_size"], d["origin"])
