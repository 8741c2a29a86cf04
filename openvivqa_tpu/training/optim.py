"""Optimizer + LR schedules.

Parity: Adam(betas=(0.9, 0.98)) (base_task.py:46) with either the Noam
warmup lambda (base_task.py:73-76) or the constant lambda
(classification_task.py:141-142 / training_saaa_task.py:24-25).

NOTE on the constant schedule: torch's LambdaLR multiplies the base LR by
the lambda, and the reference's constant lambda returns LEARNING_RATE —
so the *effective* LR is LEARNING_RATE**2 (e.g. saaa.yaml's 0.01 trains at
1e-4).  We reproduce that faithfully.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def noam_schedule(base_lr: float, d_model: int, warmup: int) -> optax.Schedule:
    """lr(step) = base_lr * d_model^-0.5 * min(s^-0.5, s * warmup^-1.5),
    s = step+1 (base_task.py:73-76)."""

    def schedule(step):
        s = step + 1.0
        return base_lr * (d_model**-0.5) * jnp.minimum(s**-0.5, s * warmup**-1.5)

    return schedule


def constant_lambda_schedule(base_lr: float) -> optax.Schedule:
    effective = base_lr * base_lr  # LambdaLR semantics, see module docstring
    return lambda step: jnp.asarray(effective, jnp.float32)


def make_optimizer(schedule: optax.Schedule) -> optax.GradientTransformation:
    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.98)
