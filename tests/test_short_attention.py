"""Fused short-attention kernel equivalence (Pallas interpreter on CPU).

The kernel (ops/short_attention_pallas.py) must match the einsum
reference path in forward AND gradients — it replaces it on TPU for
every attention site in the model (reference semantics:
multimae/multimae_utils.py:170-182). BNHD layout: (B, N, H, D).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.ops.attention import (
    einsum_attention_bnhd,
    fused_attention,
)
from multimae_tpu.ops.short_attention_pallas import short_attention, supported


SHAPES = [
    # (B, Nq, Nk, H, D) — encoder pretrain, decoder self/cross, finetune
    (2, 99, 99, 12, 64),
    (2, 196, 99, 8, 32),
    (2, 196, 196, 8, 32),
    (1, 197, 197, 12, 64),
    (1, 1025, 1025, 12, 64),  # 512px fine-tune (per-head grid path)
]


def _qkv(shape, dtype, seed=0):
    b, nq, nk, h, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (b, nq, h, d), dtype)
    k = jax.random.normal(kk, (b, nk, h, d), dtype)
    v = jax.random.normal(kv, (b, nk, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("shape", SHAPES[:4])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_einsum(shape, dtype):
    q, k, v = _qkv(shape, dtype)
    scale = shape[-1] ** -0.5
    ref = einsum_attention_bnhd(q, k, v, scale)
    out = short_attention(q, k, v, scale)
    assert out.dtype == ref.dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol,
    )


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_grads_match_einsum(shape):
    q, k, v = _qkv(shape, jnp.float32, seed=1)
    scale = shape[-1] ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(einsum_attention_bnhd(q, k, v, scale)))

    def loss_ker(q, k, v):
        return jnp.sum(jnp.sin(short_attention(q, k, v, scale)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ker = jax.grad(loss_ker, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, rtol=2e-4
        )


def test_per_head_grid_path():
    """1025 tokens forces the per-head grid (VMEM budget exceeded for the
    heads-batched layout) — still must match einsum."""
    shape = SHAPES[4]
    q, k, v = _qkv(shape, jnp.float32, seed=2)
    scale = shape[-1] ** -0.5
    assert supported(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    ref = einsum_attention_bnhd(q, k, v, scale)
    out = short_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_supported_predicate():
    q = jnp.zeros((1, 99, 12, 64), jnp.bfloat16)
    assert supported(q, q)
    # 512px rgb+depth fine-tune: 2049 tokens -> 3 fp32 tiles ~54 MB,
    # inside the 100 MB per-head budget (measured 1.83x over dense).
    q = jnp.zeros((16, 2049, 12, 64), jnp.bfloat16)
    assert supported(q, q)
    # 4096 tokens: 3 fp32 (Nq, Nk) tiles = 201 MB — beyond VMEM.
    q = jnp.zeros((1, 4096, 12, 64), jnp.bfloat16)
    assert not supported(q, q)


def test_bhnd_wrapper_roundtrip():
    """fused_attention keeps the legacy (B, H, N, D) API."""
    b, h, n, d = 2, 4, 33, 16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, n, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, n, d), jnp.float32)
    out = fused_attention(q, k, v, d ** -0.5)
    ref = einsum_attention_bnhd(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        d ** -0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.swapaxes(ref, 1, 2)), atol=1e-6, rtol=1e-6
    )


def test_lightres_fp32_grads_bitexact():
    """For fp32 inputs the light-residual VJP is exactly autodiff
    (the dtype cast of the probabilities is a no-op)."""
    from multimae_tpu.ops.attention import (
        einsum_attention_bnhd,
        einsum_attention_bnhd_lightres,
    )

    q, k, v = _qkv((2, 33, 33, 4, 16), jnp.float32, seed=5)
    scale = 16 ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(jnp.sin(fn(q, k, v, scale)))

    g_ref = jax.grad(lambda *a: loss(einsum_attention_bnhd, *a), argnums=(0, 1, 2))(q, k, v)
    g_new = jax.grad(lambda *a: loss(einsum_attention_bnhd_lightres, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_lightres_bf16_close():
    from multimae_tpu.ops.attention import (
        einsum_attention_bnhd,
        einsum_attention_bnhd_lightres,
    )

    q, k, v = _qkv((2, 64, 64, 4, 32), jnp.bfloat16, seed=6)
    scale = 32 ** -0.5
    out_ref = einsum_attention_bnhd(q, k, v, scale)
    out_new = einsum_attention_bnhd_lightres(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out_new, np.float32), np.asarray(out_ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )

    def loss(fn, q):
        return jnp.sum(jnp.sin(fn(q, k, v, scale).astype(jnp.float32)))

    g_ref = jax.grad(lambda q: loss(einsum_attention_bnhd, q))(q)
    g_new = jax.grad(lambda q: loss(einsum_attention_bnhd_lightres, q))(q)
    np.testing.assert_allclose(
        np.asarray(g_new, np.float32), np.asarray(g_ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )


def test_tp_head_sharded_kernel_matches_unsharded():
    """TP seam (parallel/mesh.bnhd_shard_map): the kernel run on local
    (batch, head) slices under a (data=4, model=2) mesh must reproduce
    the unsharded kernel — attention is independent per (sample, head),
    so head sharding needs no collective."""
    from multimae_tpu.parallel.mesh import (
        bnhd_shard_map,
        create_mesh,
        use_constraint_mesh,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    q, k, v = _qkv((8, 99, 99, 12, 64), jnp.float32, seed=3)
    scale = 64 ** -0.5
    base = short_attention(q, k, v, scale)
    mesh = create_mesh(data=4, model=2)
    use_constraint_mesh(mesh)
    try:
        core = bnhd_shard_map(
            lambda qq, kk, vv: short_attention(qq, kk, vv, scale),
            tp_scoped=True,
        )
        out = jax.jit(core)(q, k, v)
    finally:
        use_constraint_mesh(None)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=1e-6, rtol=1e-6
    )


def test_use_short_kernel_gate_mesh_rules(monkeypatch):
    """Dispatch gate under meshes: TP sites shard heads over 'model'
    (divisibility required), non-TP sites only need the batch to split
    over 'data'."""
    from multimae_tpu.ops import attention as attn
    from multimae_tpu.parallel.mesh import create_mesh, use_constraint_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    monkeypatch.setattr(attn.jax, "default_backend", lambda: "tpu")
    mesh = create_mesh(data=4, model=2)
    use_constraint_mesh(mesh)
    try:
        q = jnp.zeros((8, 1025, 12, 64), jnp.bfloat16)
        assert attn._use_short_kernel(q, q, tp_scoped=True)
        assert attn._use_short_kernel(q, q, tp_scoped=False)
        # heads not divisible by model size -> TP site falls back
        q_odd_h = jnp.zeros((8, 1025, 11, 64), jnp.bfloat16)
        assert not attn._use_short_kernel(q_odd_h, q_odd_h, tp_scoped=True)
        assert attn._use_short_kernel(q_odd_h, q_odd_h, tp_scoped=False)
        # batch not divisible by data size -> off everywhere
        q_odd_b = jnp.zeros((6, 1025, 12, 64), jnp.bfloat16)
        assert not attn._use_short_kernel(q_odd_b, q_odd_b, tp_scoped=False)
    finally:
        use_constraint_mesh(None)
