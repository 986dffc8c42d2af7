"""MXU-friendly token gathers.

On TPU, `take_along_axis`'s backward pass is a scatter-add, which lowers
to a slow serialized loop. Expressing the same permutation as a one-hot
matmul puts both directions on the MXU — measured ~2.2x faster fwd+bwd
for the (B, 589, 256) decoder unshuffles of this model (see the perf
notes in SpatialOutputAdapter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_tokens(values: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """out[b, i] = values[b, ids[b, i]] via one-hot matmul.

    values: (B, N, D); ids: (B, M) int. Returns (B, M, D) in values.dtype.
    The result is bit-exact with take_along_axis: one-hot rows select a
    single value, and accumulation is fp32.
    """
    n = values.shape[1]
    onehot = jax.nn.one_hot(ids, n, dtype=values.dtype)
    out = jnp.einsum(
        "bmn,bnd->bmd", onehot, values, preferred_element_type=jnp.float32
    )
    return out.astype(values.dtype)


def select_or_zero(values: jnp.ndarray, ids: jnp.ndarray, valid_upto: int) -> jnp.ndarray:
    """out[b, i] = values[b, ids[b, i]] if ids[b, i] < valid_upto else 0.

    Implemented with one_hot(ids, valid_upto): out-of-range rows are all
    zeros, so no clamping/where is needed. values: (B, K, D) with
    K == valid_upto. Bit-exact single-value selection, fp32 accumulation.
    """
    onehot = jax.nn.one_hot(ids, valid_upto, dtype=values.dtype)
    out = jnp.einsum(
        "bmk,bkd->bmd", onehot, values, preferred_element_type=jnp.float32
    )
    return out.astype(values.dtype)
