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
    val_batches: int = 4        # batches per default validation pass
    ckpt_every: int = 50
    ckpt_dir: str = "checkpoints"
    ckpt_keep: int = 2
    ckpt_monitor: str | None = None   # e.g. "val_loss": top-k-on-metric
    ckpt_monitor_mode: str = "min"
    resume: bool = True


def make_default_val_fn(loss_fn: Callable, val_data: Iterable,
                        num_batches: int, mesh) -> Callable:
    """Default validation: run ``loss_fn`` on held-out batches using the
    EMA parameters when present (the reference validates with LitEma weights,
    diffusion.py:1105-1122). Returns mean metrics incl. ``val_loss``.

    ``val_data`` may be a re-iterable (list, Dataset) or a zero-arg factory
    returning a fresh iterator (plain generators exhaust after one pass)."""
    eval_fn = jax.jit(lambda p, rng, b: loss_fn(p, rng, b))

    def val_fn(state, step):
        params = state.ema.params if getattr(state, "ema", None) is not None \
            else state.params
        meter = LossMeter()
        it = iter(val_data() if callable(val_data) else val_data)
        for i in range(num_batches):
            try:
                batch = next(it)
            except StopIteration:
                break
            batch = shard_batch(mesh, batch)
            loss, metrics = eval_fn(params, jax.random.PRNGKey(i), batch)
            meter.update({"val_loss": loss, **{
                k: v for k, v in metrics.items() if np.ndim(v) == 0}})
        return meter.means()

    return val_fn


def train(loop_cfg: LoopConfig, train_cfg: TrainConfig, params,
          loss_fn: Callable, batches: Iterable, rng: jax.Array,
          logger: Callable[[int, dict], None] | None = None,
          val_fn: Callable | None = None, val_data: Iterable | None = None,
          mesh=None) -> TrainState:
    """loss_fn(params, rng, batch) -> (loss, metrics).

    If ``val_data`` is given without an explicit ``val_fn``, a default
    validation (EMA params, mean loss/metrics over held-out batches) runs
    every ``val_every`` steps; its metrics feed the checkpoint manager's
    top-k-on-metric retention when ``ckpt_monitor`` is set."""
    mesh = mesh or make_mesh()
    state = TrainState.create(train_cfg, params)
    if val_fn is None and val_data is not None:
        val_fn = make_default_val_fn(loss_fn, val_data,
                                     loop_cfg.val_batches, mesh)
    monitor = loop_cfg.ckpt_monitor
    if monitor and val_fn is None:
        # With a monitor but no validation metrics, save() would skip every
        # unranked periodic checkpoint and a crash would lose the whole run —
        # fall back to keep-last-k retention instead.
        print(f"[train] WARNING: ckpt_monitor={monitor!r} but no val_fn/"
              "val_data produces metrics; falling back to keep-last-k "
              "checkpoint retention")
        monitor = None
    mgr = CheckpointManager(loop_cfg.ckpt_dir, loop_cfg.ckpt_keep,
                            loop_cfg.ckpt_every,
                            monitor=monitor,
                            mode=loop_cfg.ckpt_monitor_mode)
    if loop_cfg.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"[train] resumed from step {int(state.step)}")
    step_fn = jax.jit(make_train_step(train_cfg, loss_fn))
    meter = LossMeter()
    t0 = time.perf_counter()
    it = iter(batches)
    step = int(state.step)
    last_val = None
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
            val_metrics = val_fn(state, step) or {}
            last_val = val_metrics
            if logger and val_metrics:
                logger(step, {f"val/{k}": v for k, v in val_metrics.items()})
            elif val_metrics:
                print(f"[val] step {step}: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in val_metrics.items()))
        mgr.save(step, state, metrics=last_val)
    mgr.save(step, state, force=True)
    mgr.wait()
    return state
