"""LR schedule: linear warmup -> cosine decay to min_lr.

Exact semantics of the reference `_linear_warmup_cosine_decay`
(/root/reference/gato/training/schedulers.py:21-32): during warmup
(step <= warmup_steps) lr ramps linearly init_lr -> base_lr; afterwards cosine
decays base_lr -> min_lr over the remaining steps; `cosine_decay=False` holds
base_lr after warmup.  Implemented as an optax schedule (step -> lr) instead
of a torch LambdaLR proportion.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_cosine_decay(
    *,
    base_lr: float,
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    total_steps: int,
    cosine_decay: bool = True,
):
    warmup_steps = max(int(warmup_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (base_lr - init_lr) * step / warmup_steps
        if cosine_decay:
            progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
            progress = jnp.clip(progress, 0.0, 1.0)
            after = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * progress))
        else:
            after = jnp.asarray(base_lr, jnp.float32)
        return jnp.where(step <= warmup_steps, warm, after)

    return schedule


def linear_warmup_cosine_decay_host(
    *,
    base_lr: float,
    init_lr: float,
    min_lr: float,
    warmup_steps: int,
    total_steps: int,
    cosine_decay: bool = True,
):
    """Pure-host twin of `linear_warmup_cosine_decay` for logging: the jnp
    schedule executes on the accelerator, and fetching its value blocks on
    the whole dispatched device queue — a per-step sync that serialized the
    train loop (~70 ms/step through the remote-device tunnel)."""
    import math

    warmup_steps = max(int(warmup_steps), 1)

    def lr(step) -> float:
        step = float(step)
        if step <= warmup_steps:
            return init_lr + (base_lr - init_lr) * step / warmup_steps
        if not cosine_decay:
            return base_lr
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        progress = min(max(progress, 0.0), 1.0)
        return min_lr + 0.5 * (base_lr - min_lr) * (1 + math.cos(math.pi * progress))

    return lr
