"""Piecewise rational-quadratic spline transforms (Durkan et al. 2019,
Neural Spline Flows), pure JAX.

Capability parity with the reference's transform module
(reference ``litfass/third_party/stochastic_duration_predictor/
transforms.py:12-212``): linear tails at |x| > tail_bound, min bin
width/height/derivative 1e-3, softmax-normalized bins, softplus
derivatives, exact forward/inverse with log|det J|. Fully vectorized and
branch-free (jnp.where over the inside-interval mask) so it jits.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _searchsorted_per_element(cum: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bin index for each element given its own partition ``cum``
    (..., K+1); returns (...,) int32 in [0, K-1]."""
    idx = jnp.sum((x[..., None] >= cum[..., 1:-1]).astype(jnp.int32), axis=-1)
    return jnp.clip(idx, 0, cum.shape[-1] - 2)


def rational_quadratic_spline(
    inputs: jnp.ndarray,
    unnormalized_widths: jnp.ndarray,
    unnormalized_heights: jnp.ndarray,
    unnormalized_derivatives: jnp.ndarray,
    inverse: bool = False,
    tail_bound: float = 5.0,
    min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
    min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
    min_derivative: float = DEFAULT_MIN_DERIVATIVE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'linear'-tails variant: identity outside [-tail_bound, tail_bound].

    inputs (...,); unnormalized_{widths,heights} (..., K);
    unnormalized_derivatives (..., K-1) — padded to K+1 with the constant
    that makes boundary derivatives exactly 1 (transforms.py:44-51).
    """
    K = unnormalized_widths.shape[-1]
    inside = jnp.abs(inputs) <= tail_bound

    constant = np.log(np.expm1(1.0 - min_derivative))
    pad = [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)]
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives, pad, constant_values=constant
    )

    widths = jnp.exp(
        unnormalized_widths - jnp.max(unnormalized_widths, axis=-1, keepdims=True)
    )
    widths = widths / jnp.sum(widths, axis=-1, keepdims=True)
    widths = min_bin_width + (1 - min_bin_width * K) * widths
    cumwidths = jnp.cumsum(widths, axis=-1)
    cumwidths = jnp.pad(cumwidths, pad[:-1] + [(1, 0)])
    cumwidths = (2 * tail_bound) * cumwidths - tail_bound
    cumwidths = cumwidths.at[..., 0].set(-tail_bound)
    cumwidths = cumwidths.at[..., -1].set(tail_bound)
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]

    derivatives = min_derivative + jnp.logaddexp(unnormalized_derivatives, 0.0)

    heights = jnp.exp(
        unnormalized_heights - jnp.max(unnormalized_heights, axis=-1, keepdims=True)
    )
    heights = heights / jnp.sum(heights, axis=-1, keepdims=True)
    heights = min_bin_height + (1 - min_bin_height * K) * heights
    cumheights = jnp.cumsum(heights, axis=-1)
    cumheights = jnp.pad(cumheights, pad[:-1] + [(1, 0)])
    cumheights = (2 * tail_bound) * cumheights - tail_bound
    cumheights = cumheights.at[..., 0].set(-tail_bound)
    cumheights = cumheights.at[..., -1].set(tail_bound)
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    x_safe = jnp.where(inside, inputs, 0.0)
    bin_idx = _searchsorted_per_element(
        cumheights if inverse else cumwidths, x_safe
    )

    take = lambda a: jnp.take_along_axis(a, bin_idx[..., None], axis=-1)[..., 0]
    input_cumwidths = take(cumwidths[..., :-1])
    input_bin_widths = take(widths)
    input_cumheights = take(cumheights[..., :-1])
    input_heights = take(heights)
    delta = input_heights / input_bin_widths
    input_derivatives = take(derivatives[..., :-1])
    input_derivatives_p1 = take(derivatives[..., 1:])

    if inverse:
        y_rel = x_safe - input_cumheights
        term = y_rel * (input_derivatives + input_derivatives_p1 - 2 * delta)
        a = input_heights * (delta - input_derivatives) + term
        b = input_heights * input_derivatives - term
        c = -delta * y_rel
        discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
        root = (2 * c) / (-b - jnp.sqrt(discriminant))
        outputs_in = root * input_bin_widths + input_cumwidths

        theta_one_minus_theta = root * (1 - root)
        denominator = delta + (
            (input_derivatives + input_derivatives_p1 - 2 * delta)
            * theta_one_minus_theta
        )
        derivative_numerator = delta**2 * (
            input_derivatives_p1 * root**2
            + 2 * delta * theta_one_minus_theta
            + input_derivatives * (1 - root) ** 2
        )
        logabsdet_in = -(
            jnp.log(jnp.maximum(derivative_numerator, 1e-24))
            - 2 * jnp.log(jnp.maximum(denominator, 1e-24))
        )
    else:
        theta = (x_safe - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            delta * theta**2 + input_derivatives * theta_one_minus_theta
        )
        denominator = delta + (
            (input_derivatives + input_derivatives_p1 - 2 * delta)
            * theta_one_minus_theta
        )
        outputs_in = input_cumheights + numerator / denominator
        derivative_numerator = delta**2 * (
            input_derivatives_p1 * theta**2
            + 2 * delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        logabsdet_in = jnp.log(
            jnp.maximum(derivative_numerator, 1e-24)
        ) - 2 * jnp.log(jnp.maximum(denominator, 1e-24))

    outputs = jnp.where(inside, outputs_in, inputs)
    logabsdet = jnp.where(inside, logabsdet_in, 0.0)
    return outputs, logabsdet


# alias with the reference's entry-point name
def piecewise_rational_quadratic_transform(
    inputs, unnormalized_widths, unnormalized_heights, unnormalized_derivatives,
    inverse=False, tails="linear", tail_bound=5.0,
):
    assert tails == "linear", "only linear tails are supported"
    return rational_quadratic_spline(
        inputs, unnormalized_widths, unnormalized_heights,
        unnormalized_derivatives, inverse=inverse, tail_bound=tail_bound,
    )
