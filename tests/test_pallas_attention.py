"""Correctness tests for the custom Pallas fused attention kernel.

Runs in interpreter mode on CPU (slow but exact), so CI without a TPU
still exercises the kernel math.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.ops.attention import einsum_attention


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Force pallas interpret mode on CPU."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    if jax.default_backend() != "tpu":
        monkeypatch.setattr(
            pl, "pallas_call", functools.partial(orig, interpret=True)
        )
    yield


@pytest.mark.parametrize("nq,nk,d", [(32, 32, 64), (24, 136, 32)])
def test_pallas_attention_forward_matches_dense(nq, nk, d):
    from multimae_tpu.ops.fused_attention_pallas import pallas_short_attention

    b, h = 2, 2
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, nq, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, nk, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, nk, d), jnp.float32)
    scale = d**-0.5
    ref = einsum_attention(q, k, v, scale)
    out = pallas_short_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_attention_grads_match_dense():
    from multimae_tpu.ops.fused_attention_pallas import pallas_short_attention

    b, h, n, d = 1, 2, 24, 32
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32) for kk in keys)
    scale = d**-0.5

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v, scale)))

    ref_grads = jax.grad(functools.partial(loss, einsum_attention),
                         argnums=(0, 1, 2))(q, k, v)
    our_grads = jax.grad(functools.partial(loss, pallas_short_attention),
                         argnums=(0, 1, 2))(q, k, v)
    for r, o, name in zip(ref_grads, our_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), atol=5e-5,
            err_msg=f"d{name} mismatch",
        )
