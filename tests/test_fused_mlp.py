"""Fused Dense->GELU->Dense kernel (ops/fused_mlp_pallas) equivalence.

The ConvNeXt-head MLP must produce the same values and gradients as the
unfused module path (reference multimae/output_adapter_utils.py:42-45
pwconv1/act/pwconv2) up to fp32 accumulation-order noise from the
row-tiled dW reduction.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.ops import fused_mlp_pallas as fmp


@contextlib.contextmanager
def force_interpret(row_tile=None):
    fmp.set_force_mode("interpret")
    old_tile = fmp._ROW_TILE
    if row_tile is not None:
        fmp._ROW_TILE = row_tile
    try:
        yield
    finally:
        fmp.set_force_mode(None)
        fmp._ROW_TILE = old_tile


def ref_mlp(x, w1, b1, w2, b2):
    # Same tanh-basis gelu as the kernel: this file tests the KERNEL
    # mechanics (tiling, padding, fp32 dW accumulation, custom vjp);
    # the gelu approximation itself is pinned by tests/test_fast_gelu.py.
    from multimae_tpu.ops.fast_gelu import gelu_bf16_exact

    dt = x.dtype
    h = gelu_bf16_exact(x @ w1.astype(dt) + b1.astype(dt))
    return h @ w2.astype(dt) + b2.astype(dt)


def make(m, k, hid, dtype=jnp.float32):
    ks = iter(jax.random.split(jax.random.PRNGKey(3), 8))
    r = lambda *s: jax.random.normal(next(ks), s, jnp.float32) * 0.3
    return (r(m, k).astype(dtype), r(k, hid), r(hid), r(hid, k), r(k))


@pytest.mark.parametrize("m", [256, 300])  # aligned + padded-remainder rows
def test_forward_and_grads_match(m):
    k, hid = 128, 256
    x, w1, b1, w2, b2 = make(m, k, hid)

    def loss_fused(*a):
        return jnp.sum(fmp.fused_mlp(*a).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(ref_mlp(*a).astype(jnp.float32) ** 2)

    with force_interpret(row_tile=128):
        out = fmp.fused_mlp(x, w1, b1, w2, b2)
        grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w1, b1, w2, b2)
    base = ref_mlp(x, w1, b1, w2, b2)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    for g, gr, name in zip(grads, grads_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(gr), rtol=2e-4, atol=5e-4,
            err_msg=f"grad {name}",
        )
        assert g.dtype == gr.dtype, name


def test_bf16_matches_module_gelu():
    """bf16 end to end: the kernel's gelu is the same tanh-basis poly
    the module path uses, so outputs agree to bf16 rounding."""
    x, w1, b1, w2, b2 = make(256, 128, 256, dtype=jnp.bfloat16)
    with force_interpret(row_tile=128):
        out = fmp.fused_mlp(x, w1, b1, w2, b2)
    base = ref_mlp(x, w1, b1, w2, b2)
    # bf16 rounding points differ (the kernel rounds once per GEMM with
    # fp32 accumulation; jnp rounds the dot and the bias add separately),
    # so agreement is a few bf16 ulps: |out| here is O(5), one ulp ~0.04.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base, np.float32),
        rtol=3e-2, atol=6e-2,
    )


def ref_ln_mlp_res(x, res, g, b, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    n1 = (((xf - mu) * jax.lax.rsqrt(var + 1e-6)) * g.reshape(1, -1)
          + b.reshape(1, -1)).astype(x.dtype)
    return res + ref_mlp(n1, w1, b1, w2, b2)


@pytest.mark.parametrize("m", [256, 300])
def test_ln_mlp_res_forward_and_grads_match(m):
    k, hid = 128, 256
    x, w1, b1, w2, b2 = make(m, k, hid)
    ks = iter(jax.random.split(jax.random.PRNGKey(11), 4))
    res = jax.random.normal(next(ks), (m, k), jnp.float32)
    g = jax.random.normal(next(ks), (k,), jnp.float32) * 0.1 + 1.0
    bb = jax.random.normal(next(ks), (k,), jnp.float32) * 0.1
    args = (x, res, g, bb, w1, b1, w2, b2)
    nargs = tuple(range(len(args)))

    def loss_fused(*a):
        return jnp.sum(fmp.fused_ln_mlp_res(*a).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(ref_ln_mlp_res(*a).astype(jnp.float32) ** 2)

    with force_interpret(row_tile=128):
        out = fmp.fused_ln_mlp_res(*args)
        grads = jax.grad(loss_fused, argnums=nargs)(*args)
    base = ref_ln_mlp_res(*args)
    grads_ref = jax.grad(loss_ref, argnums=nargs)(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    for gg, gr, name in zip(grads, grads_ref,
                            "x res ln_g ln_b w1 b1 w2 b2".split()):
        # grads here are O(1e3) (sum-of-squares loss over LN'd rows);
        # atol scales with that — violations are pure f32 noise.
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), rtol=2e-4, atol=5e-3,
            err_msg=f"grad {name}",
        )
        assert gg.dtype == gr.dtype, name


def test_convnext_block_fused_matches_module(monkeypatch):
    """ConvNeXtBlock with the fused-MLP gate forced on matches the plain
    module path, forward and gradients."""
    from multimae_tpu.models.conv_utils import ConvNeXtBlock

    blk = ConvNeXtBlock(dim=128, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    params = blk.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    def loss(p):
        return jnp.sum(blk.apply({"params": p}, x).astype(jnp.float32) ** 2)

    base = blk.apply({"params": params}, x)
    gbase = jax.grad(loss)(params)
    monkeypatch.setattr(fmp, "supported", lambda *a: True)
    with force_interpret(row_tile=64):
        fused = blk.apply({"params": params}, x)
        gfused = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gfused), key=lambda e: str(e[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gbase), key=lambda e: str(e[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-4,
            err_msg=str(ka),
        )


def test_convnext_block_fused_under_data_mesh(monkeypatch):
    """Sharded (8-way data mesh, shard_map-wrapped kernel) vs unsharded
    ConvNeXtBlock: values and grads must match (SCALING.md rule 3 — an
    unwrapped opaque kernel would be replicated by GSPMD)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.models.conv_utils import ConvNeXtBlock
    from multimae_tpu.parallel.mesh import create_mesh, use_constraint_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    blk = ConvNeXtBlock(dim=128, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 4, 4, 128))
    params = blk.init({"params": jax.random.PRNGKey(6)}, x)["params"]

    def loss(p, xx):
        return jnp.sum(blk.apply({"params": p}, xx).astype(jnp.float32) ** 2)

    monkeypatch.setattr(fmp, "supported", lambda *a: True)
    with force_interpret(row_tile=8):
        base_l, base_g = jax.jit(jax.value_and_grad(loss))(params, x)
        mesh = create_mesh(devices=jax.devices()[:8])
        use_constraint_mesh(mesh)
        try:
            repl = NamedSharding(mesh, P())
            data_sh = NamedSharding(mesh, P("data"))
            sh_l, sh_g = jax.jit(
                jax.value_and_grad(loss),
                in_shardings=(repl, data_sh), out_shardings=(repl, repl),
            )(params, x)
        finally:
            use_constraint_mesh(None)
    np.testing.assert_allclose(float(sh_l), float(base_l), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(sh_g), key=lambda e: str(e[0])),
        sorted(jax.tree_util.tree_leaves_with_path(base_g), key=lambda e: str(e[0])),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=5e-4,
            err_msg=str(ka),
        )


def test_supported_gate():
    # the 512px ConvNeXt regime (B=16): 262144 rows, 384 -> 1536
    assert fmp.supported(262144, 384, 1536, jnp.bfloat16)
    # small-M MLPs stay on XLA
    assert not fmp.supported(4096, 384, 1536, jnp.bfloat16)
    # fp32 paths (golden parity) stay on XLA
    assert not fmp.supported(262144, 384, 1536, jnp.float32)
    assert not fmp.supported(262144, 192, 768, jnp.bfloat16)
