"""Noam learning-rate schedule + Adam optimizer.

Rewrite of the reference ``TransformerOptimizer``
(SBL_Multilingual_Lip_reading/transformer/optimizer.py:1-27):

    lr(step) = k * d_model**-0.5 * min(step**-0.5, step * warmup**-1.5)

with step counting from 1 (the reference increments before use), k=0.2,
warmup=4000, wrapping Adam(b1=0.9, b2=0.98, eps=1e-9).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(k: float = 0.2, warmup_steps: int = 4000,
                  d_model: int = 512):
    init_lr = d_model ** (-0.5)

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        return k * init_lr * jnp.minimum(s ** -0.5,
                                         s * (warmup_steps ** -1.5))

    return schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Build the optimizer from an OptimConfig."""
    sched = noam_schedule(cfg.k, cfg.warmup_steps, cfg.lr_base_dim)
    tx = optax.adam(learning_rate=sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                    eps=cfg.adam_eps)
    if cfg.grad_clip is not None:
        # the reference ships clip_gradient (utils.py:10-19: elementwise
        # clamp) but never calls it; we expose the standard global-norm clip
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
