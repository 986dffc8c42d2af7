"""Classification losses (reference: utils/cross_entropy.py:17-43)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Integer targets with label smoothing."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot reduce: take_along_axis's backward is a serialized scatter
    # on TPU (see models/criterion.py).
    onehot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logp.dtype)
    nll = -(onehot * logp).sum(axis=-1)
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_cross_entropy(
    logits: jnp.ndarray, soft_targets: jnp.ndarray
) -> jnp.ndarray:
    """Soft (mixup) targets."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(-soft_targets * logp, axis=-1).mean()


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return label_smoothing_cross_entropy(logits, targets, smoothing=0.0)
