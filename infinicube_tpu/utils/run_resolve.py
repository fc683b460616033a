"""Run / checkpoint reference resolution.

Mirror of /root/reference/infinicube/voxelgen/utils/wandb_util.py:75-233:
``wdb:entity/project/run:version`` references resolve to downloaded wandb
artifacts (gated on the wandb package + login); plain paths resolve to local
checkpoint directories; ``tb:folder`` resolves to the latest checkpoint in a
log folder."""

from __future__ import annotations

from pathlib import Path


def resolve_checkpoint(ref: str) -> Path:
    """Resolve a checkpoint reference to a local directory/file path."""
    if ref.startswith("wdb:"):
        return _resolve_wandb(ref[4:])
    if ref.startswith("tb:"):
        root = Path(ref[3:])
        cands = sorted(root.rglob("ckpt_*.npz")) + \
            sorted(d for d in root.rglob("*") if d.is_dir() and
                   d.name.isdigit())
        if not cands:
            raise FileNotFoundError(f"no checkpoints under {root}")
        return cands[-1]
    return Path(ref)


def _resolve_wandb(spec: str) -> Path:  # pragma: no cover - needs wandb login
    run_path, _, version = spec.partition(":")
    try:
        import wandb
    except ImportError as e:
        raise RuntimeError("wandb not available; pass a local path") from e
    api = wandb.Api()
    run = api.run(run_path)
    arts = [a for a in run.logged_artifacts() if a.type == "model"]
    if version:
        arts = [a for a in arts if a.version == version]
    if not arts:
        raise FileNotFoundError(f"no model artifacts on {run_path}")
    return Path(arts[-1].download())
