"""Welford parallel running mean/var (reference:
/root/reference/utils/running_mean_std.py:12-58), as a pure pytree.

The parallel-update form is also the cross-device merge used when env
statistics are reduced over a mesh (`psum` of count/mean/M2) — SURVEY.md §5.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..sim.model import _pytree_dataclass


@_pytree_dataclass
@dataclass(frozen=True)
class RunningMeanStd:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # scalar

    @staticmethod
    def create(shape=(), epsilon=1e-4):
        return RunningMeanStd(
            mean=jnp.zeros(shape, dtype=jnp.float32),
            var=jnp.ones(shape, dtype=jnp.float32),
            count=jnp.asarray(epsilon, dtype=jnp.float32),
        )

    def update(self, batch) -> "RunningMeanStd":
        batch = batch.reshape(-1, *self.mean.shape)
        batch_mean = jnp.mean(batch, axis=0)
        batch_var = jnp.var(batch, axis=0)
        batch_count = batch.shape[0]
        return self.update_from_moments(batch_mean, batch_var, batch_count)

    def update_from_moments(self, batch_mean, batch_var, batch_count):
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        M2 = m_a + m_b + delta ** 2 * self.count * batch_count / tot
        return RunningMeanStd(mean=new_mean, var=M2 / tot, count=tot)

    def normalize(self, x, un_norm=False):
        if un_norm:
            return x * jnp.sqrt(self.var + 1e-5) + self.mean
        return (x - self.mean) / jnp.sqrt(self.var + 1e-5)
