"""Stochastic Weight Averaging (reference ``train.py:282-283`` uses
Lightning's StochasticWeightAveraging callback).

Plain running average of params collected after ``start_step``, every
``every`` steps — the SWA estimate is served/evaluated with the averaged
weights while training continues on the live ones.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


class SWA:
    def __init__(self, start_step: int = 0, every: int = 1):
        self.start_step = start_step
        self.every = every
        self.n = 0
        self.avg: Optional[Any] = None

    def update(self, step: int, params: Any) -> None:
        if step < self.start_step or (step - self.start_step) % self.every:
            return
        if self.avg is None:
            # copy, don't alias: the live params are donated to the next
            # train step, which would invalidate shared buffers
            self.avg = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
            self.n = 1
            return
        self.n += 1
        w = 1.0 / self.n
        self.avg = jax.tree_util.tree_map(
            lambda a, p: a + (p - a) * w, self.avg, params
        )

    @property
    def params(self) -> Optional[Any]:
        return self.avg
