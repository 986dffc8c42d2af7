"""Fused decoder core (ops/fused_decoder_pallas) equivalence tests.

The fused region replaces SpatialOutputAdapter's xattn + MLP +
decoder_transformer stack (reference multimae/output_adapters.py:236-268).
These tests run the FULL tiny pretrain model three ways on CPU —
module path (fused gate off), pure-JAX reference core ("ref" force
mode), and the Pallas kernels under the interpreter ("interpret") —
and require matching predictions and parameter gradients.
"""

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.models import (
    MultiMAE,
    PatchedInputAdapter,
    SemSegInputAdapter,
    SpatialOutputAdapter,
)
from multimae_tpu.ops import fused_decoder_pallas as fdp

IMG = 64
DIM = 64


def build_model(depth=2, dtype=jnp.float32):
    in_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=16, image_size=IMG,
        ),
        "depth": functools.partial(
            PatchedInputAdapter, num_channels=1, stride_level=1,
            patch_size_full=16, image_size=IMG,
        ),
        "semseg": functools.partial(
            SemSegInputAdapter, num_classes=10, stride_level=4,
            patch_size_full=16, dim_class_emb=8, image_size=IMG,
        ),
    }
    out_adapters = {
        t: functools.partial(
            SpatialOutputAdapter, num_channels=c, stride_level=s,
            patch_size_full=16, dim_tokens=32, depth=depth, num_heads=4,
            task=t, context_tasks=("rgb", "depth", "semseg"), image_size=IMG,
        )
        for t, c, s in [("rgb", 3, 1), ("depth", 1, 1), ("semseg", 10, 4)]
    }
    return MultiMAE(
        input_adapters=in_adapters, output_adapters=out_adapters,
        dim_tokens=DIM, depth=2, num_heads=4, dtype=dtype,
    )


def make_batch(b=2):
    rng = np.random.default_rng(0)
    return {
        "rgb": jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), jnp.float32),
        "depth": jnp.asarray(rng.standard_normal((b, IMG, IMG, 1)), jnp.float32),
        "semseg": jnp.asarray(rng.integers(0, 10, (b, IMG // 4, IMG // 4)), jnp.int32),
    }


@contextlib.contextmanager
def force_mode(mode):
    fdp.set_force_mode(mode)
    try:
        yield
    finally:
        fdp.set_force_mode(None)


def run_fwd(model, params, batch, mode):
    with force_mode(mode):
        preds, masks = model.apply(
            {"params": params}, batch, train=True, num_encoded_tokens=24,
            rngs={"masking": jax.random.PRNGKey(7)},
        )
    return preds


def run_grads(model, params, batch, mode):
    def loss_fn(p):
        with force_mode(mode):
            preds, _ = model.apply(
                {"params": p}, batch, train=True, num_encoded_tokens=24,
                rngs={"masking": jax.random.PRNGKey(7)},
            )
        return sum(jnp.sum(v.astype(jnp.float32) ** 2) for v in preds.values())

    return jax.grad(loss_fn)(params)


def assert_trees_close(a, b, rtol, atol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree.leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=rtol, atol=atol,
            err_msg=f"mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.fixture(scope="module")
def setup():
    model = build_model()
    batch = make_batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=24,
    )["params"]
    return model, params, batch


@pytest.mark.parametrize("mode", ["ref", "interpret"])
def test_forward_matches_module_path(setup, mode):
    model, params, batch = setup
    base = run_fwd(model, params, batch, None)
    fused = run_fwd(model, params, batch, mode)
    assert set(base) == set(fused)
    for t in base:
        np.testing.assert_allclose(
            np.asarray(fused[t]), np.asarray(base[t]), rtol=2e-4, atol=2e-4,
            err_msg=f"task {t} ({mode})",
        )


@pytest.mark.parametrize("mode", ["ref", "interpret"])
def test_grads_match_module_path(setup, mode):
    model, params, batch = setup
    base = run_grads(model, params, batch, None)
    fused = run_grads(model, params, batch, mode)
    # Gradients flow through the fused region into every upstream param
    # (encoder, input adapters) — compare the whole tree. atol: the
    # kernel's tanh-basis gelu differs from the f32 module path's exact
    # erf by ~2e-5 in gelu'; dW = x^T g sums that coherently over the
    # token axis, giving up to ~1.5e-3 absolute on a handful of
    # small-magnitude weight-grad elements.
    assert_trees_close(fused, base, rtol=5e-3, atol=2e-3)


def test_bf16_forward_close(setup):
    _, params, batch = setup
    model16 = build_model(dtype=jnp.bfloat16)
    base = run_fwd(model16, params, batch, None)
    fused = run_fwd(model16, params, batch, "interpret")
    for t in base:
        np.testing.assert_allclose(
            np.asarray(fused[t], np.float32), np.asarray(base[t], np.float32),
            rtol=0.1, atol=0.1, err_msg=f"task {t}",
        )


def test_depth1_and_odd_batch():
    model = build_model(depth=1)
    batch = make_batch(b=3)  # odd batch -> bt=1 tiles
    params = model.init(
        {"params": jax.random.PRNGKey(2), "masking": jax.random.PRNGKey(3)},
        batch, num_encoded_tokens=24,
    )["params"]
    base = run_fwd(model, params, batch, None)
    fused = run_fwd(model, params, batch, "interpret")
    for t in base:
        np.testing.assert_allclose(
            np.asarray(fused[t]), np.asarray(base[t]), rtol=2e-4, atol=2e-4,
        )


@pytest.mark.parametrize("ns", [2, 4])
def test_ns_blockdiag_matches_ns1(setup, monkeypatch, ns):
    """Block-diagonal masked attention at ns>1 (one masked softmax over
    the whole slab per head; off-block probs exactly zero) must match
    the per-sample kernel."""
    model, params, _ = setup
    batch = make_batch(b=4)
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_NS", "1")
    base_f = run_fwd(model, params, batch, "interpret")
    base_g = run_grads(model, params, batch, "interpret")
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_NS", str(ns))
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_ATTN", "blockdiag")
    wide_f = run_fwd(model, params, batch, "interpret")
    wide_g = run_grads(model, params, batch, "interpret")
    for t in base_f:
        np.testing.assert_allclose(
            np.asarray(wide_f[t]), np.asarray(base_f[t]),
            rtol=1e-4, atol=1e-4, err_msg=f"task {t} ns={ns} blockdiag",
        )
    assert_trees_close(wide_g, base_g, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ns", [2, 4])
def test_ns_widening_matches_ns1(setup, monkeypatch, ns):
    """GEMM M-widening (ns samples per program, pick_ns) must reproduce
    the per-sample kernel up to fp32 accumulation-order noise from the
    different GEMM M-dims."""
    model, params, _ = setup
    batch = make_batch(b=4)
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_NS", "1")
    base_f = run_fwd(model, params, batch, "interpret")
    base_g = run_grads(model, params, batch, "interpret")
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_NS", str(ns))
    wide_f = run_fwd(model, params, batch, "interpret")
    wide_g = run_grads(model, params, batch, "interpret")
    for t in base_f:
        np.testing.assert_allclose(
            np.asarray(wide_f[t]), np.asarray(base_f[t]),
            rtol=1e-4, atol=1e-4, err_msg=f"task {t} ns={ns}",
        )
    assert_trees_close(wide_g, base_g, rtol=1e-3, atol=1e-3)


def test_pick_ns_policy(monkeypatch):
    # Default is per-sample (ns=1): M-widening measured SLOWER at the
    # 224px pretrain shape (see pick_ns docstring).
    monkeypatch.delenv("MULTIMAE_TPU_DECODER_NS", raising=False)
    assert fdp.pick_ns(128, 196, 99, 256, 8, 2, jnp.bfloat16) == 1
    # the VMEM estimator still understands ns (used for forced A/Bs)
    assert fdp.supported(196, 99, 256, 8, 2, jnp.bfloat16, ns=4)
    assert not fdp.supported(196, 99, 256, 8, 2, jnp.bfloat16, ns=16)
    monkeypatch.setenv("MULTIMAE_TPU_DECODER_NS", "2")
    assert fdp.pick_ns(128, 196, 99, 256, 8, 2, jnp.bfloat16) == 2
