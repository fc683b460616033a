"""Flow-matching (rectified flow) schedule + Euler sampler for the video DiT.

The Wan2.1 family denoises with shifted flow matching: x_t = (1-sigma) x0 +
sigma eps, model predicts the velocity v = eps - x0, sigmas warped by a shift
factor (larger shift -> more steps near the data end). Mirrors the sampling
behavior of the reference's external DiffSynth WanVideoPipeline
(/root/reference/infinicube/videogen/inference.py:164-236; 50 denoise steps,
CFG) as a pure-JAX lax.scan."""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    num_train_timesteps: int = 1000
    shift: float = 5.0

    def sigmas(self, num_steps: int) -> jnp.ndarray:
        """Descending sigmas in (0, 1], shifted; length num_steps + 1 with a
        terminal 0."""
        s = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
        s = self.shift * s / (1.0 + (self.shift - 1.0) * s)
        return jnp.concatenate([s, jnp.zeros((1,))])

    def timesteps(self, num_steps: int) -> jnp.ndarray:
        return self.sigmas(num_steps)[:-1] * self.num_train_timesteps

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  sigma: jnp.ndarray) -> jnp.ndarray:
        sigma = sigma.reshape((-1,) + (1,) * (x0.ndim - 1))
        return (1.0 - sigma) * x0 + sigma * noise

    def velocity_target(self, x0: jnp.ndarray, noise: jnp.ndarray):
        return noise - x0


def euler_sample(schedule: FlowMatchSchedule,
                 model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                 x_T: jnp.ndarray, num_steps: int = 50) -> jnp.ndarray:
    """model_fn(x, t[B]) -> velocity. Euler integration x <- x + (s' - s) v."""
    sig = schedule.sigmas(num_steps)
    ts = sig[:-1] * schedule.num_train_timesteps
    B = x_T.shape[0]

    def step(x, inp):
        t, s, s_next = inp
        v = model_fn(x, jnp.full((B,), t, jnp.float32))
        return x + (s_next - s) * v, None

    x, _ = jax.lax.scan(step, x_T, (ts, sig[:-1], sig[1:]))
    return x
