"""Train state, optimizer construction, and the generic SPMD train step.

Replaces the reference's Lightning BaseModel plumbing
(/root/reference/infinicube/voxelgen/models/base_model.py): AdamW +
exponential-decay LambdaLR (192-228), gradient clip-by-value with NaN-step
skipping (233-281), EMA tracking (diffusion.py:445-447), and DDP gradient
averaging (implicit in PL) — here a single ``train_step`` jitted over the
mesh: gradients are averaged by XLA's psum through sharding, NaN steps are
skipped with ``jnp.where`` (no host sync), EMA updates fuse into the step."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from infinicube_tpu.models.diffusion.ema import EmaState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-5
    lr_decay_mult: float = 1.0          # per decay_step multiplicative decay
    lr_decay_step: int = 2_000_000_000  # effectively constant (release cfg)
    lr_clip: float = 1e-6
    weight_decay: float = 0.0
    grad_clip_value: float = 0.5        # clip-by-value (base_model.py:246)
    ema_decay: float = 0.9999
    use_ema: bool = True
    # finetune only the params whose tree path contains one of these
    # substrings (the reference's turn_on_decoder decoder-only finetune,
    # sunet.py:675-705); None = train everything
    trainable_substrings: tuple | None = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema: EmaState | None
    num_nan_skips: jnp.ndarray

    @staticmethod
    def create(cfg: TrainConfig, params) -> "TrainState":
        tx = make_optimizer(cfg)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema=EmaState.create(params) if cfg.use_ema else None,
            num_nan_skips=jnp.zeros((), jnp.int32))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def lr_schedule(step):
        lr = cfg.learning_rate * jnp.power(
            cfg.lr_decay_mult, step // cfg.lr_decay_step)
        return jnp.maximum(lr, cfg.lr_clip)

    tx = optax.chain(
        optax.clip(cfg.grad_clip_value),
        optax.adamw(lr_schedule, weight_decay=cfg.weight_decay,
                    b1=0.9, b2=0.999))
    if cfg.trainable_substrings:
        subs = tuple(cfg.trainable_substrings)

        def label(params):
            def rec(path, x):
                p = "/".join(str(getattr(k, "key", k)) for k in path)
                return "train" if any(s in p for s in subs) else "freeze"
            return jax.tree_util.tree_map_with_path(rec, params)

        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label)
    return tx


def make_train_step(cfg: TrainConfig,
                    loss_fn: Callable[[Any, jax.Array, Any], tuple]):
    """loss_fn(params, rng, batch) -> (loss, metrics). Returns a jittable
    step(state, rng, batch) -> (state, metrics). Shard the batch over the
    mesh 'data' axis before calling; XLA inserts the gradient psum."""
    tx = make_optimizer(cfg)

    def step(state: TrainState, rng: jax.Array, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, rng, batch)
        # NaN/inf guard: skip the update entirely on bad steps
        flat = jax.tree.leaves(grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in flat]))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                              new_params, state.params)
        opt_state = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o) if hasattr(n, "dtype") else n,
            new_opt, state.opt_state)
        ema = state.ema
        if ema is not None:
            new_ema = ema.update(params, cfg.ema_decay)
            ema = EmaState(
                params=jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                    new_ema.params, ema.params),
                step=new_ema.step)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_finite"] = finite.astype(jnp.float32)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema=ema,
                          num_nan_skips=state.num_nan_skips +
                          (1 - finite.astype(jnp.int32))), metrics

    return step
