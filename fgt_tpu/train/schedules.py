"""Learning-rate schedules: linear warmup + step decay.

Mirrors the reference recipe: StepLR with gamma ``lr_decay`` every
``UPDATE_INTERVAL`` iterations (FGT/networks/network.py:36-40, quantized to
epochs there; expressed directly in steps here), plus the warmup rule of
``_trainEpoch`` (network.py:94-98) including its quirk: the warmup WINDOW is
``WARMUP // world_size`` steps but the SLOPE divides by the full ``WARMUP``,
so with world_size > 1 warmup ends below the target lr and jumps.
"""

from __future__ import annotations

import optax


def step_decay(base_lr: float, decay_interval: int, gamma: float = 0.1):
    def schedule(step):
        return base_lr * (gamma ** (step // decay_interval))
    return schedule


def warmup_step_decay(base_lr: float, decay_interval: int,
                      gamma: float = 0.1, warmup: int | None = None,
                      world_size: int = 1):
    decay = step_decay(base_lr, decay_interval, gamma)
    if not warmup:
        return decay

    def schedule(step):
        window = warmup // world_size
        warm_lr = base_lr * (step + 1) / warmup  # reference slope quirk
        import jax.numpy as jnp

        return jnp.where(step < window, warm_lr, decay(step))
    return schedule


def make_adam(lr_schedule, beta1: float = 0.9, beta2: float = 0.999,
              grad_clip: float | None = None) -> optax.GradientTransformation:
    """Adam with the reference betas; optional global-norm clip (LAFC's
    ``gc`` flag, max_norm=10 — LAFC/networks/network.py:131-134)."""
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=beta1, b2=beta2))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)
