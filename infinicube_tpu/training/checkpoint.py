"""Orbax checkpointing with retention policy + resume.

Replaces the reference's PL ModelCheckpoint + wandb artifact resume
(/root/reference/infinicube/voxelgen/train.py:307-315,333-421,
utils/wandb_util.py:234-290): save_last + top-k retention, every-N-steps
saves, auto-resume from the latest step, and tolerant partial restore
(missing/mismatched keys skipped like the reference's size-mismatch loader)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    """``monitor``/``mode`` switch retention from keep-last-k to
    top-k-on-metric (the reference's ModelCheckpoint(monitor='val_step',
    save_top_k), train.py:307-315): pass the validation metrics dict to
    ``save`` and the k best checkpoints by that key are retained."""

    def __init__(self, directory: str | Path, max_to_keep: int = 2,
                 save_interval_steps: int = 50,
                 monitor: str | None = None, mode: str = "min"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        if _HAS_ORBAX:
            kw = {}
            if monitor is not None:
                kw = dict(best_fn=lambda m: float(m.get(monitor, np.inf)),
                          best_mode=mode, keep_checkpoints_without_metrics=False)
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep,
                    save_interval_steps=save_interval_steps,
                    create=True, **kw))
        else:
            self._mgr = None
        self._interval = save_interval_steps

    def save(self, step: int, state: Any, force: bool = False,
             metrics: dict | None = None):
        if self._mgr is not None:
            if force and step in self._mgr.all_steps():
                return  # already saved at this step (final save after loop)
            kw = {}
            if self.monitor is not None:
                if metrics is None and not force:
                    return  # top-k-on-metric: unranked saves are skipped
                kw["metrics"] = {k: float(v) for k, v in
                                 (metrics or {}).items() if np.ndim(v) == 0}
            self._mgr.save(step, args=ocp.args.StandardSave(state),
                           force=force, **kw)
        else:  # numpy fallback
            if not force and step % self._interval:
                return
            flat, treedef = jax.tree.flatten(state)
            np.savez(self.directory / f"ckpt_{step}.npz",
                     *[np.asarray(x) for x in flat])

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = sorted(int(p.stem.split("_")[1])
                       for p in self.directory.glob("ckpt_*.npz"))
        return steps[-1] if steps else None

    def restore(self, abstract_state: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if self._mgr is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state))
        flat, treedef = jax.tree.flatten(abstract_state)
        data = np.load(self.directory / f"ckpt_{step}.npz")
        return jax.tree.unflatten(
            treedef, [data[f"arr_{i}"] for i in range(len(flat))])


def partial_restore(params: Any, loaded: Any) -> Any:
    """Merge loaded params into params, skipping missing keys and shape
    mismatches (the reference's tolerant cross-model loading,
    wandb_util.py:234-290, diffusion.py:336-390)."""
    def merge(p, l):
        if isinstance(p, dict):
            return {k: merge(v, l.get(k, v)) if isinstance(l, dict) else v
                    for k, v in p.items()}
        try:
            if hasattr(l, "shape") and tuple(l.shape) == tuple(p.shape):
                return l
        except Exception:
            pass
        return p
    return merge(params, loaded)
