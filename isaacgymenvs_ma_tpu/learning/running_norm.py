"""Running mean/std normalization (rl_games ``RunningMeanStd`` equivalent).

The reference normalizes observations and values with torch RunningMeanStd
modules inside the rl_games model (``normalize_input`` / ``normalize_value``
train-config flags, e.g. cfg/train/AntPPO.yaml).  Here it's a pure pytree with
Chan's parallel-merge update so it can live inside the jitted train step and
be psum-merged across hosts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jax.Array
    var: jax.Array
    count: jax.Array  # scalar

    @staticmethod
    def create(shape=()) -> "RunningMeanStd":
        return RunningMeanStd(
            mean=jnp.zeros(shape, jnp.float32),
            var=jnp.ones(shape, jnp.float32),
            count=jnp.asarray(1e-4, jnp.float32),
        )

    def update(self, batch: jax.Array) -> "RunningMeanStd":
        """Merge batch moments over all leading axes (Chan et al.)."""
        reduce_axes = tuple(range(batch.ndim - self.mean.ndim))
        b_mean = jnp.mean(batch, axis=reduce_axes)
        b_var = jnp.var(batch, axis=reduce_axes)
        b_count = jnp.asarray(
            jnp.prod(jnp.asarray(batch.shape[: batch.ndim - self.mean.ndim])),
            jnp.float32)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * b_count / tot
        return RunningMeanStd(new_mean, m2 / tot, tot)

    def normalize(self, x: jax.Array, clip: float = 5.0) -> jax.Array:
        y = (x - self.mean) / jnp.sqrt(self.var + 1e-5)
        return jnp.clip(y, -clip, clip)

    def denormalize(self, y: jax.Array) -> jax.Array:
        return y * jnp.sqrt(self.var + 1e-5) + self.mean
