"""Shared DDPM machinery for the FastDiff family.

Capability parity with the reference's diffusion utilities
(reference ``litfass/third_party/fastdiff/module/util.py:150-342``):
cumulative alpha/sigma schedules, sinusoidal step embeddings, the
noise-scale -> timestep mapping, and the reverse-process sampler (with
optional DDIM update). TPU-native split: everything data-dependent
(schedule derivation, step mapping) is computed host-side in numpy ONCE
(SURVEY.md hard part #5), and the reverse loop is a ``lax.scan`` over the
precomputed per-step constants — a single compiled program per N.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# hardcoded inference noise schedules (FastDiff.py:158-174)
INFERENCE_SCHEDULES = {
    1000: np.linspace(0.000001, 0.01, 1000),
    200: np.linspace(0.0001, 0.02, 200),
    8: np.array([6.689325005027058e-07, 1.0033881153503899e-05,
                 0.00015496854030061513, 0.002387222135439515,
                 0.035597629845142365, 0.3681158423423767,
                 0.4735414385795593, 0.5]),
    6: np.array([1.7838445955931093e-06, 2.7984189728158526e-05,
                 0.00043231004383414984, 0.006634317338466644,
                 0.09357017278671265, 0.6000000238418579]),
    4: np.array([3.2176e-04, 2.5743e-03, 2.5376e-02, 7.0414e-01]),
    3: np.array([9.0000e-05, 9.0000e-03, 6.0000e-01]),
}


class DiffusionHyperparams(NamedTuple):
    T: int
    beta: np.ndarray
    alpha: np.ndarray  # cumulative sqrt(prod(1-beta))
    sigma: np.ndarray


def linear_beta_schedule(beta_0: float = 1e-6, beta_T: float = 0.01,
                         T: int = 1000) -> np.ndarray:
    return np.linspace(beta_0, beta_T, T)


def compute_hyperparams(beta: np.ndarray) -> DiffusionHyperparams:
    """util.py:276-301: alpha_t = sqrt(prod_{s<=t}(1-beta_s)),
    sigma_t^2 = beta_t * (1-alpha_{t-1}^2)/(1-alpha_t^2)."""
    beta = np.asarray(beta, np.float64)
    T = len(beta)
    alpha = 1.0 - beta
    sigma = beta.copy()
    for t in range(1, T):
        alpha[t] *= alpha[t - 1]
        sigma[t] *= (1 - alpha[t - 1]) / (1 - alpha[t])
    return DiffusionHyperparams(T, beta, np.sqrt(alpha), np.sqrt(sigma))


def map_noise_scale_to_time_step(alpha_infer: float, alpha: np.ndarray) -> float:
    """util.py:305-315: fractional timestep whose cumulative alpha matches."""
    if alpha_infer < alpha[-1]:
        return len(alpha) - 1
    if alpha_infer > alpha[0]:
        return 0
    for t in range(len(alpha) - 1):
        if alpha[t + 1] <= alpha_infer <= alpha[t]:
            return t + (alpha[t] - alpha_infer) / (alpha[t] - alpha[t + 1])
    return -1


class InferenceSchedule(NamedTuple):
    """Per-step constants for the reverse loop (all static arrays)."""

    steps: np.ndarray        # fractional timesteps fed to the net
    alpha: np.ndarray        # alpha_infer
    beta: np.ndarray
    sigma: np.ndarray


def make_inference_schedule(
    hp: DiffusionHyperparams, N_or_schedule
) -> InferenceSchedule:
    """Derive the inference schedule host-side (util.py:158-199)."""
    if isinstance(N_or_schedule, int):
        beta_infer = np.asarray(INFERENCE_SCHEDULES[N_or_schedule], np.float64)
    else:
        beta_infer = np.asarray(N_or_schedule, np.float64)
    N = len(beta_infer)
    alpha_infer = 1 - beta_infer
    sigma_infer = beta_infer.copy()
    for n in range(1, N):
        alpha_infer[n] *= alpha_infer[n - 1]
        sigma_infer[n] *= (1 - alpha_infer[n - 1]) / (1 - alpha_infer[n])
    alpha_infer = np.sqrt(alpha_infer)
    sigma_infer = np.sqrt(sigma_infer)

    steps, keep = [], []
    for n in range(N):
        step = map_noise_scale_to_time_step(alpha_infer[n], hp.alpha)
        if step >= 0:
            steps.append(step)
            keep.append(n)
    keep = np.asarray(keep, int)
    return InferenceSchedule(
        steps=np.asarray(steps, np.float32),
        alpha=alpha_infer[keep].astype(np.float32),
        beta=beta_infer[keep].astype(np.float32),
        sigma=sigma_infer[keep].astype(np.float32),
    )


def step_embedding(ts: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal diffusion-step embedding, (B, 1)->(B, dim)
    (util.py:318-342: exponent log(10000)/(dim/2 - 1))."""
    half = dim // 2
    freq = jnp.exp(jnp.arange(half) * (-np.log(10000.0) / (half - 1)))
    arg = ts.reshape(-1, 1).astype(jnp.float32) * freq[None, :]
    return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=1)


def diffuse(x0: jnp.ndarray, ts: jnp.ndarray, z: jnp.ndarray,
            alpha: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0): alpha[ts] * x0 + sqrt(1 - alpha[ts]^2) * z; ts (B,),
    broadcast over trailing dims."""
    a = alpha[ts].reshape((-1,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
    delta = jnp.sqrt(1.0 - a**2)
    return a * x0 + delta * z


def reverse_sample(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    shape: Tuple[int, ...],
    schedule: InferenceSchedule,
    rng: jax.Array,
    ddim: bool = False,
) -> jnp.ndarray:
    """Reverse diffusion x_T -> x_0 (util.py:200-237) as a lax.scan.

    ``eps_fn(x, ts)`` predicts epsilon; ts is (B,) of the fractional step.
    """
    N = len(schedule.steps)
    steps = jnp.asarray(schedule.steps)
    alpha = jnp.asarray(schedule.alpha)
    beta = jnp.asarray(schedule.beta)
    sigma = jnp.asarray(schedule.sigma)

    x = jax.random.normal(rng, shape)
    noise_rngs = jax.random.split(jax.random.fold_in(rng, 1), N)

    def body(x, idx):
        n = N - 1 - idx  # reverse order
        ts = jnp.full((shape[0],), steps[n])
        eps = eps_fn(x, ts)
        if ddim:
            alpha_next = alpha[n] / jnp.sqrt(1 - beta[n])
            c1 = alpha_next / alpha[n]
            c2 = -jnp.sqrt(1 - alpha[n] ** 2) * c1
            c3 = jnp.sqrt(1 - alpha_next**2)
            x = c1 * x + (c2 + c3) * eps
        else:
            x = x - beta[n] / jnp.sqrt(1 - alpha[n] ** 2) * eps
            x = x / jnp.sqrt(1 - beta[n])
            x = jnp.where(
                n > 0, x + sigma[n] * jax.random.normal(noise_rngs[idx], shape), x
            )
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(N))
    return x
