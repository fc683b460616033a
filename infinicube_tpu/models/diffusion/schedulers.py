"""Diffusion noise schedules and samplers (DDPM / DDIM / DPM-Solver++ 2M).

Functional equivalents of the reference's vendored diffusers schedulers
(/root/reference/infinicube/voxelgen/modules/diffusionmodules/schedulers/:
DDPM 539 LoC, DDIM 475, DPM++ 867) with the release configuration semantics:
linear betas 1e-4 -> 0.02, 1000 train steps, v-prediction
(configs/train/diffusion/diffusion_16x16x16_dense.yaml:21-25,58-65).

Everything is a pure function over a precomputed ``NoiseSchedule``; sampling
loops are ``lax.scan`` over static timestep index arrays so the whole sampler
jits into one XLA program (model fn is scanned, no Python-loop re-trace).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    betas: jnp.ndarray            # f32[T]
    alphas_cumprod: jnp.ndarray   # f32[T]

    @staticmethod
    def linear(num_train_timesteps: int = 1000, beta_start: float = 1e-4,
               beta_end: float = 0.02) -> "NoiseSchedule":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps,
                             dtype=jnp.float32)
        return NoiseSchedule(betas=betas,
                             alphas_cumprod=jnp.cumprod(1.0 - betas))

    @staticmethod
    def scaled_linear(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
                      beta_end: float = 0.012) -> "NoiseSchedule":
        """Stable-diffusion style sqrt-space schedule."""
        betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                             num_train_timesteps, dtype=jnp.float32) ** 2
        return NoiseSchedule(betas=betas,
                             alphas_cumprod=jnp.cumprod(1.0 - betas))

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]

    # ---- forward process --------------------------------------------------
    def _ab(self, t, ndim):
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (ndim - 1)
        return jnp.sqrt(a).reshape(shape), jnp.sqrt(1.0 - a).reshape(shape)

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
        """q(x_t | x_0). t int32[B] per-sample."""
        sa, sb = self._ab(t, x0.ndim)
        return sa * x0 + sb * noise

    def v_target(self, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray):
        """v-prediction target: v = sqrt(a) * eps - sqrt(1-a) * x0."""
        sa, sb = self._ab(t, x0.ndim)
        return sa * noise - sb * x0

    def to_eps_x0(self, model_out: jnp.ndarray, x_t: jnp.ndarray,
                  t: jnp.ndarray, prediction_type: str = "v_prediction"):
        """Convert a model output into (eps, x0) estimates."""
        sa, sb = self._ab(t, x_t.ndim)
        if prediction_type == "v_prediction":
            x0 = sa * x_t - sb * model_out
            eps = sa * model_out + sb * x_t
        elif prediction_type == "epsilon":
            eps = model_out
            x0 = (x_t - sb * eps) / sa
        elif prediction_type == "sample":
            x0 = model_out
            eps = (x_t - sa * x0) / sb
        else:
            raise ValueError(prediction_type)
        return eps, x0


def sampling_timesteps(num_train_timesteps: int, num_steps: int) -> np.ndarray:
    """Evenly spaced descending timesteps (diffusers leading-spacing style)."""
    step = num_train_timesteps // num_steps
    return (np.arange(num_steps) * step).round().astype(np.int64)[::-1].copy()


# ---------------------------------------------------------------------------
# samplers — model_fn(x_t, t_int32_scalar_per_batch) -> model prediction
# ---------------------------------------------------------------------------

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_sample(schedule: NoiseSchedule, model_fn: ModelFn, x_T: jnp.ndarray,
                num_steps: int = 100, eta: float = 0.0,
                prediction_type: str = "v_prediction",
                rng: jax.Array | None = None,
                step_callback=None) -> jnp.ndarray:
    """Deterministic (eta=0) DDIM sampling loop under lax.scan.

    ``step_callback(x, t, i) -> x`` runs before each model call — the SDEdit
    injection point (reference diffusion.py:1717-1726)."""
    ts = jnp.asarray(sampling_timesteps(schedule.num_train_timesteps, num_steps))
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])
    B = x_T.shape[0]

    def step(carry, inp):
        x, rng_i = carry
        i, t, tp = inp
        if step_callback is not None:
            x = step_callback(x, t, i)
        tb = jnp.full((B,), t, jnp.int32)
        out = model_fn(x, tb)
        eps, x0 = schedule.to_eps_x0(out, x, tb, prediction_type)
        a_prev = jnp.where(tp >= 0, schedule.alphas_cumprod[jnp.maximum(tp, 0)],
                           1.0)
        a_t = schedule.alphas_cumprod[t]
        sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)) * \
            jnp.sqrt(1 - a_t / a_prev)
        dir_xt = jnp.sqrt(jnp.clip(1 - a_prev - sigma ** 2, 0.0)) * eps
        x_prev = jnp.sqrt(a_prev) * x0 + dir_xt
        if eta > 0:
            rng_i, sub = jax.random.split(rng_i)
            x_prev = x_prev + sigma * jax.random.normal(sub, x.shape)
        return (x_prev, rng_i), None

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    (x, _), _ = jax.lax.scan(step, (x_T, rng),
                             (jnp.arange(num_steps), ts, ts_prev))
    return x


def ddpm_sample(schedule: NoiseSchedule, model_fn: ModelFn, x_T: jnp.ndarray,
                rng: jax.Array, num_steps: int | None = None,
                prediction_type: str = "v_prediction",
                step_callback=None) -> jnp.ndarray:
    """Ancestral DDPM sampling (full or strided schedule)."""
    T = schedule.num_train_timesteps
    num_steps = num_steps or T
    ts = jnp.asarray(sampling_timesteps(T, num_steps))
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])
    B = x_T.shape[0]

    def step(carry, inp):
        x, rng_i = carry
        i, t, tp = inp
        if step_callback is not None:
            x = step_callback(x, t, i)
        tb = jnp.full((B,), t, jnp.int32)
        out = model_fn(x, tb)
        eps, x0 = schedule.to_eps_x0(out, x, tb, prediction_type)
        a_t = schedule.alphas_cumprod[t]
        a_prev = jnp.where(tp >= 0, schedule.alphas_cumprod[jnp.maximum(tp, 0)],
                           1.0)
        beta_eff = 1.0 - a_t / a_prev
        # posterior mean in terms of x0/eps
        mean = jnp.sqrt(a_prev) * beta_eff / (1 - a_t) * x0 + \
            jnp.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t) * x
        var = beta_eff * (1 - a_prev) / (1 - a_t)
        rng_i, sub = jax.random.split(rng_i)
        noise = jax.random.normal(sub, x.shape)
        x_prev = jnp.where(tp >= 0, mean + jnp.sqrt(jnp.clip(var, 0.0)) * noise,
                           x0)
        return (x_prev, rng_i), None

    (x, _), _ = jax.lax.scan(step, (x_T, rng),
                             (jnp.arange(num_steps), ts, ts_prev))
    return x


def karras_timesteps(schedule: NoiseSchedule, num_steps: int,
                     rho: float = 7.0) -> np.ndarray:
    """Karras et al. sigma spacing mapped back to the discrete schedule's
    timesteps (the reference DPM++'s use_karras_sigmas option)."""
    a = np.asarray(schedule.alphas_cumprod)
    sigmas = np.sqrt((1 - a) / a)
    s_min, s_max = sigmas[0], sigmas[-1]
    ramp = np.linspace(0, 1, num_steps)
    ks = (s_max ** (1 / rho) + ramp * (s_min ** (1 / rho) -
                                       s_max ** (1 / rho))) ** rho
    # nearest discrete timestep per karras sigma, descending
    ts = np.array([int(np.abs(sigmas - s).argmin()) for s in ks[::-1]])
    return np.unique(ts)[::-1].copy()


def dpmpp_sample(schedule: NoiseSchedule, model_fn: ModelFn, x_T: jnp.ndarray,
                 num_steps: int = 25, prediction_type: str = "v_prediction",
                 step_callback=None, use_karras_sigmas: bool = False
                 ) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep in log-SNR (lambda) space,
    data-prediction formulation. Matches the reference's multistep DPM++
    sampler capability (schedulers/scheduling_dpmsolver_multistep.py),
    incl. the Karras sigma spacing option."""
    if use_karras_sigmas:
        ts = jnp.asarray(karras_timesteps(schedule, num_steps))
        num_steps = int(ts.shape[0])
    else:
        ts = jnp.asarray(sampling_timesteps(schedule.num_train_timesteps,
                                            num_steps))
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])
    a = schedule.alphas_cumprod
    B = x_T.shape[0]
    sigma_floor = 1e-3  # t=-1 sentinel: fully denoised (alpha~1, tiny sigma;
    # must stay representable as 1 - sigma^2 in f32)

    def _a(t):
        return jnp.where(t >= 0, a[jnp.maximum(t, 0)], 1.0 - sigma_floor ** 2)

    def lam(t):  # log-SNR/2
        at = _a(t)
        return 0.5 * jnp.log(at / (1 - at))

    def alpha_sigma(t):
        at = _a(t)
        return jnp.sqrt(at), jnp.sqrt(1 - at)

    def step(carry, inp):
        x, x0_prev, have_prev, lam_prev_gap = carry
        i, t, tp = inp
        if step_callback is not None:
            x = step_callback(x, t, i)
        tb = jnp.full((B,), t, jnp.int32)
        out = model_fn(x, tb)
        _, x0 = schedule.to_eps_x0(out, x, tb, prediction_type)
        l_t, l_p = lam(t), lam(tp)
        h = l_p - l_t
        al_p, sg_p = alpha_sigma(tp)
        _, sg_t = alpha_sigma(t)
        # first-order (DPM++ 1S) update
        upd1 = (sg_p / sg_t) * x - al_p * jnp.expm1(-h) * x0
        # second-order multistep correction; first-order on the first and
        # final steps (diffusers' lower_order_final behavior)
        r = lam_prev_gap / jnp.maximum(h, 1e-12)
        d = (x0 - x0_prev) / jnp.maximum(r, 1e-12) * 0.5
        upd2 = upd1 - al_p * jnp.expm1(-h) * d
        x_new = jnp.where(have_prev & (tp >= 0), upd2, upd1)
        return (x_new, x0, jnp.array(True), h), None

    init = (x_T, jnp.zeros_like(x_T), jnp.array(False), jnp.array(1.0))
    (x, _, _, _), _ = jax.lax.scan(step, init,
                                   (jnp.arange(num_steps), ts, ts_prev))
    return x
