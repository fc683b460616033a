"""Exponential moving average of a parameter pytree.

Equivalent of the reference's LitEma
(/root/reference/infinicube/voxelgen/modules/diffusionmodules/ema.py): decay
0.9999 with warmup decay min(decay, (1+step)/(10+step)); sampling runs under
the EMA weights (the reference's ``ema_scope``, diffusion.py:449-462 — here
just pass ``ema.params`` to the sampler)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmaState:
    params: object            # shadow pytree
    step: jnp.ndarray         # int32 scalar

    @staticmethod
    def create(params) -> "EmaState":
        return EmaState(params=jax.tree.map(jnp.asarray, params),
                        step=jnp.zeros((), jnp.int32))

    def update(self, params, decay: float = 0.9999) -> "EmaState":
        step = self.step + 1
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
        new = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                           self.params, params)
        return EmaState(params=new, step=step)
