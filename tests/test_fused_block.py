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


def test_eval_forward_matches_module_path(monkeypatch):
    # bf16: the only dtype the fused gate admits (the kernel's GELU is
    # the tanh-basis polynomial, which IS the bf16 module path's GELU —
    # fp32 keeps exact erf and must stay on the module path, below).
    model = build(jnp.bfloat16)
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))}
    params = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)[
        "params"]
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
    # bf16 activations: kernel and module agree up to bf16 rounding of
    # intermediates (both do LN/softmax in fp32).
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(base, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_fp32_eval_stays_on_module_path(setup, monkeypatch):
    """fp32 eval keeps jax.nn.gelu's exact erf (golden-parity contract):
    the fused kernel (polynomial GELU) must NOT engage."""
    model, params, x = setup
    calls = []
    orig = fbp.fused_block_infer

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fbp, "fused_block_infer", spy)
    with force_interpret():
        model.apply({"params": params}, x, train=False)["cls"]
    assert len(calls) == 0, "fused block must not engage on fp32 models"


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
    # ViT-B at the 2049-token 512px rgb+depth serving shape fits the
    # one-shot kernel (measured +31% over the unfused eval path on v5e)
    assert fbp._one_shot_fits(2049, 768, 3072, 2)
    # ViT-L at 2049 exceeds the one-shot VMEM budget but the q-tiled
    # kernel covers it
    assert not fbp._one_shot_fits(2049, 1024, 4096, 2)
    assert fbp._tiled_fits(2049, 1024, 4096, 2)
    assert fbp.supported(2049, 1024, 4096, jnp.bfloat16)
    # non-128-multiple dims fall back
    assert not fbp.supported(99, 192, 768, jnp.bfloat16)


def test_tiled_kernel_matches_one_shot(monkeypatch):
    """The q-tiled kernel (ViT-L@2049 class shapes) must reproduce the
    one-shot kernel at shapes both can run, up to f32 accumulation-order
    noise from the different GEMM M-dims (~1e-5 abs on O(10) outputs).
    Shrink the query tile so n=300 exercises uneven tiles (128, 128, 44)."""
    d, heads, hidden, n, b = 128, 4, 512, 300, 2
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 20))

    def rnd(*shape):
        return jax.random.normal(next(keys), shape, jnp.float32) * 0.2

    w = fbp.BlockWeights(
        n1_g=rnd(1, d) + 1, n1_b=rnd(1, d),
        wqkv=rnd(d, 3 * d), bqkv=rnd(1, 3 * d),
        wp=rnd(d, d), bp=rnd(1, d),
        n2_g=rnd(1, d) + 1, n2_b=rnd(1, d),
        w1=rnd(d, hidden), b1=rnd(1, hidden),
        w2=rnd(hidden, d), b2=rnd(1, d),
    )
    x = rnd(b, n, d)
    with force_interpret():
        base = fbp.fused_block_infer(x, w, heads, jnp.float32)
        monkeypatch.setattr(fbp, "_Q_TILE", 128)
        monkeypatch.setattr(fbp, "_one_shot_fits", lambda *a: False)
        tiled = fbp.fused_block_infer(x, w, heads, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(base), rtol=1e-4, atol=1e-4
    )


def test_tiled_kernel_matches_module_forward(monkeypatch):
    """Full MultiViT eval forward with every block forced onto the
    q-tiled kernel matches the plain module path (bf16: the only dtype
    the gate admits)."""
    model = build(jnp.bfloat16)
    xin = {"rgb": jax.random.normal(jax.random.PRNGKey(9), (2, 64, 64, 3))}
    params = model.init({"params": jax.random.PRNGKey(8)}, xin, train=False)[
        "params"]
    base = model.apply({"params": params}, xin, train=False)["cls"]
    calls = []
    orig = fbp.fused_block_infer

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fbp, "fused_block_infer", spy)
    monkeypatch.setattr(fbp, "_Q_TILE", 8)  # (17 tokens -> tiles 8, 8, 1)
    monkeypatch.setattr(fbp, "_one_shot_fits", lambda *a: False)
    with force_interpret():
        fused = model.apply({"params": params}, xin, train=False)["cls"]
    assert len(calls) == 2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(base, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_eval_under_data_mesh_matches_unsharded():
    """shard_map partitioning of the eval kernel under an 8-way data mesh
    (SCALING.md rule 3): sharded vs unsharded outputs must match."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.parallel.mesh import create_mesh, use_constraint_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    model = build(jnp.bfloat16)
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
