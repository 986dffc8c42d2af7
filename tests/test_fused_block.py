"""Inference fused encoder block (ops/fused_block_pallas) equivalence.

The eval-only Pallas block must match the module path exactly on the
full MultiViT forward (reference multimae_utils.py:217-232 semantics).
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.models import LinearOutputAdapter, PatchedInputAdapter
from multimae_tpu.models.registry import create_model
from multimae_tpu.ops import fused_block_pallas as fbp


@pytest.fixture(autouse=True)
def _clear_constraint_mesh():
    # Earlier tests (jit_data_parallel/jit_fsdp) register a global
    # constraint mesh and never unregister it (CLI-lifetime semantics);
    # the fused-block gate then requires batch % 8 == 0. Isolate.
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    use_constraint_mesh(None)
    yield
    use_constraint_mesh(None)


@contextlib.contextmanager
def force_interpret():
    fbp.set_force_mode("interpret")
    try:
        yield
    finally:
        fbp.set_force_mode(None)


def build(dtype=jnp.float32):
    # dim 128 / head_dim 32: smallest config the fused gate accepts
    # (d and hidden must be lane-tile multiples; head slice width 32 is
    # the decoder kernel's proven layout).
    from multimae_tpu.models.multimae import MultiViT

    return MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=64,
            )
        },
        output_adapters={
            "cls": functools.partial(
                LinearOutputAdapter, num_classes=7, use_mean_pooling=True,
            )
        },
        dim_tokens=128, depth=2, num_heads=4, dtype=dtype,
    )


@pytest.fixture(scope="module")
def setup():
    model = build()
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))}
    params = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)[
        "params"]
    return model, params, x


def test_eval_forward_matches_module_path(setup, monkeypatch):
    model, params, x = setup
    base = model.apply({"params": params}, x, train=False)["cls"]
    calls = []
    orig = fbp.fused_block_infer

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fbp, "fused_block_infer", spy)
    with force_interpret():
        fused = model.apply({"params": params}, x, train=False)["cls"]
    assert len(calls) == 2, "fused block did not engage on both encoder blocks"
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(base), rtol=2e-5, atol=2e-5
    )


def test_train_path_unaffected_and_differentiable(setup):
    model, params, x = setup

    def loss(p, det):
        out = model.apply(
            {"params": p}, x, train=not det,
            rngs={} if det else {"dropout": jax.random.PRNGKey(2)},
        )["cls"]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with force_interpret():
        # deterministic=False keeps the gate off -> grads must flow
        g = jax.grad(lambda p: loss(p, det=False))(params)
    assert all(np.isfinite(np.asarray(l, np.float32)).all()
               for l in jax.tree.leaves(g))


def test_supported_gate_bounds():
    assert fbp.supported(99, 768, 3072, jnp.bfloat16)
    assert fbp.supported(197, 768, 3072, jnp.bfloat16)
    # ViT-B at the 2049-token 512px rgb+depth serving shape fits
    # (measured +31% over the unfused eval path on v5e)
    assert fbp.supported(2049, 768, 3072, jnp.bfloat16)
    # ViT-L at 2049 exceeds the VMEM budget -> module path
    assert not fbp.supported(2049, 1024, 4096, jnp.bfloat16)
    # non-128-multiple dims fall back
    assert not fbp.supported(99, 192, 768, jnp.bfloat16)


def test_eval_under_data_mesh_matches_unsharded():
    """shard_map partitioning of the eval kernel under an 8-way data mesh
    (SCALING.md rule 3): sharded vs unsharded outputs must match."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.parallel.mesh import create_mesh, use_constraint_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = build()
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(3), (16, 64, 64, 3))}
    params = model.init({"params": jax.random.PRNGKey(4)}, x, train=False)[
        "params"]

    def fwd(p, xx):
        return model.apply({"params": p}, xx, train=False)["cls"]

    with force_interpret():
        base = jax.jit(fwd)(params, x)
        mesh = create_mesh(devices=jax.devices()[:8])
        use_constraint_mesh(mesh)
        try:
            repl = NamedSharding(mesh, P())
            data_sh = NamedSharding(mesh, P("data"))
            sharded = jax.jit(
                fwd,
                in_shardings=(repl, {"rgb": data_sh}),
                out_shardings=repl,
            )(params, x)
        finally:
            use_constraint_mesh(None)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(base), rtol=1e-5, atol=1e-5
    )
