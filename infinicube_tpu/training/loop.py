"""Generic training loop: metrics, logging, validation, checkpoint cadence.

Replaces the reference's PyTorch-Lightning plumbing (train.py + BaseModel,
SURVEY.md §2.2 training infra): the loop consumes an iterable of collated
host batches, shards them over the mesh's ``data`` axis, runs the jitted
train step (gradient psum by XLA), tracks weighted loss meters with NaN
assertion (exp.TorchLossMeter equivalent), logs scalars, and saves orbax
checkpoints on an every-N-steps + top-k retention policy."""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable

import jax
import numpy as np

from infinicube_tpu.parallel.mesh import make_mesh, shard_batch
from infinicube_tpu.training.checkpoint import CheckpointManager
from infinicube_tpu.training.state import TrainConfig, TrainState, make_train_step


class LossMeter:
    """Weighted running means with NaN assertion (exp.py:233-278)."""

    def __init__(self):
        self.sums: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    def update(self, metrics: dict):
        for k, v in metrics.items():
            v = float(v)
            assert v == v, f"metric {k} is NaN"
            self.sums[k] = self.sums.get(k, 0.0) + v
            self.counts[k] = self.counts.get(k, 0) + 1

    def means(self) -> dict:
        return {k: self.sums[k] / self.counts[k] for k in self.sums}

    def reset(self):
        self.sums.clear()
        self.counts.clear()


@dataclasses.dataclass
class LoopConfig:
    max_steps: int = 1000
    log_every: int = 50
    val_every: int = 500
    ckpt_every: int = 50
    ckpt_dir: str = "checkpoints"
    ckpt_keep: int = 2
    resume: bool = True


def train(loop_cfg: LoopConfig, train_cfg: TrainConfig, params,
          loss_fn: Callable, batches: Iterable, rng: jax.Array,
          logger: Callable[[int, dict], None] | None = None,
          val_fn: Callable | None = None,
          mesh=None) -> TrainState:
    """loss_fn(params, rng, batch) -> (loss, metrics)."""
    mesh = mesh or make_mesh()
    state = TrainState.create(train_cfg, params)
    mgr = CheckpointManager(loop_cfg.ckpt_dir, loop_cfg.ckpt_keep,
                            loop_cfg.ckpt_every)
    if loop_cfg.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"[train] resumed from step {int(state.step)}")
    step_fn = jax.jit(make_train_step(train_cfg, loss_fn))
    meter = LossMeter()
    t0 = time.perf_counter()
    it = iter(batches)
    step = int(state.step)
    while step < loop_cfg.max_steps:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(batches)
            continue
        batch = shard_batch(mesh, batch)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, sub, batch)
        step = int(state.step)
        meter.update({k: v for k, v in metrics.items()
                      if np.ndim(v) == 0})
        if step % loop_cfg.log_every == 0:
            means = meter.means()
            means["steps_per_sec"] = loop_cfg.log_every / \
                max(time.perf_counter() - t0, 1e-9)
            t0 = time.perf_counter()
            if logger:
                logger(step, means)
            else:
                print(f"[train] step {step}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in means.items()))
            meter.reset()
        if val_fn is not None and step % loop_cfg.val_every == 0:
            val_metrics = val_fn(state, step)
            if logger and val_metrics:
                logger(step, {f"val/{k}": v for k, v in val_metrics.items()})
        mgr.save(step, state)
    mgr.save(step, state, force=True)
    mgr.wait()
    return state
