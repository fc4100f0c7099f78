"""Train state: params + BN batch stats + optimizer state + step counter."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, batch_stats, tx: optax.GradientTransformation):
        return cls(params=params, batch_stats=batch_stats,
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        new_batch_stats=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params, opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            step=self.step + 1)
