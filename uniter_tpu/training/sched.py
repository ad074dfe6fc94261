"""LR schedules (reference /root/reference/optim/sched.py).

The reference pokes ``get_lr_sched(global_step)`` into param groups each
step with global_step starting at 1; our optax schedules receive the update
count starting at 0, so every schedule here is evaluated at ``count + 1``
for step-parity, with the reference's 1e-8 floor (sched.py:40-46).
"""

from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(step, warmup_step=4000):
    """Original Transformer schedule (sched.py:10-14)."""
    step = jnp.maximum(step, 1)
    return jnp.where(
        step <= warmup_step,
        step / warmup_step,
        (warmup_step**0.5) * (step**-0.5),
    )


def warmup_linear(step, warmup_step, tot_step):
    """BERT schedule: linear warmup -> linear decay (sched.py:17-21)."""
    return jnp.where(
        step < warmup_step,
        step / jnp.maximum(warmup_step, 1),
        jnp.maximum(0.0, (tot_step - step) / jnp.maximum(tot_step - warmup_step, 1)),
    )


def vqa_schedule(step, warmup_interval, decay_interval, decay_start,
                 decay_rate):
    """MCAN step schedule (sched.py:24-37; defined but unused by reference
    drivers — kept for surface parity)."""
    num_decay = jnp.ceil((step - decay_start) / decay_interval)
    return jnp.where(
        step < warmup_interval, 0.25,
        jnp.where(
            step < 2 * warmup_interval, 0.5,
            jnp.where(
                step < 3 * warmup_interval, 0.75,
                jnp.where(
                    step >= decay_start,
                    decay_rate**num_decay,
                    1.0,
                ),
            ),
        ),
    )


def get_lr_schedule(learning_rate: float, warmup_steps: int,
                    num_train_steps: int):
    """optax schedule fn reproducing get_lr_sched (sched.py:40-46)."""

    def schedule(count):
        step = count + 1  # reference global_step starts at 1
        lr = learning_rate * warmup_linear(step, warmup_steps, num_train_steps)
        return jnp.maximum(lr, 1e-8)

    return schedule
