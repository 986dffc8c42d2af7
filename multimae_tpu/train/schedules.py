"""LR / weight-decay schedules.

Reference: utils/native_scaler.py:65-82 (`cosine_scheduler`) — linear
warmup then half-cosine, precomputed per *step*. We expose both the
precomputed array (for exact parity and logging) and an optax-compatible
callable evaluated on the device step counter.
"""

from __future__ import annotations

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    """Per-step schedule array, exact reference semantics."""
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    if warmup_iters > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule.astype(np.float32)


def as_optax_schedule(values: np.ndarray):
    """Wrap a precomputed per-step array as an optax schedule fn.

    Clamps past the end (the reference indexes `it % len` but never
    exceeds it; clamping is the safe jit behaviour).
    """
    import jax.numpy as jnp

    table = jnp.asarray(values)

    def schedule(step):
        idx = jnp.clip(step, 0, table.shape[0] - 1).astype(jnp.int32)
        return table[idx]

    return schedule


def constant_schedule(value: float):
    def schedule(step):
        return value

    return schedule
