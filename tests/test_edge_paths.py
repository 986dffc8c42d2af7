"""Edge-path coverage: EMA, grad accumulation, pooling modes,
semseg-only inputs, interpolated class embeddings, make_mask."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimae_tpu.models import (
    LinearOutputAdapter,
    MultiViT,
    PatchedInputAdapter,
    SemSegInputAdapter,
)
from multimae_tpu.ops.masking import make_mask
from multimae_tpu.train.optim_factory import create_optimizer
from multimae_tpu.train.train_state import TrainState


def _tiny_cls(use_mean_pooling=True):
    return MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=32,
            )
        },
        output_adapters={
            "cls": functools.partial(
                LinearOutputAdapter, num_classes=5,
                use_mean_pooling=use_mean_pooling,
            )
        },
        dim_tokens=32, depth=1, num_heads=4,
    )


def test_mean_pool_vs_last_token_differ():
    x = {"rgb": jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)), jnp.float32)}
    m1 = _tiny_cls(True)
    m2 = _tiny_cls(False)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x)
    o1 = m1.apply(v, x)["cls"]
    o2 = m2.apply(v, x)["cls"]
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_semseg_only_input_infers_image_size():
    model = MultiViT(
        input_adapters={
            "semseg": functools.partial(
                SemSegInputAdapter, num_classes=10, stride_level=4,
                patch_size_full=16, dim_class_emb=8, image_size=64,
            )
        },
        output_adapters={
            "cls": functools.partial(LinearOutputAdapter, num_classes=3)
        },
        dim_tokens=32, depth=1, num_heads=4,
    )
    x = {"semseg": jnp.zeros((2, 16, 16), jnp.int32)}  # 64/4 input res
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(v, x)["cls"]
    assert out.shape == (2, 3)


def test_interpolate_class_emb_path():
    adapter = SemSegInputAdapter(
        num_classes=10, stride_level=4, patch_size_full=16, dim_class_emb=8,
        image_size=64, interpolate_class_emb=True, dim_tokens=32,
    )
    x = jnp.zeros((2, 16, 16), jnp.int32)
    v = adapter.init(jax.random.PRNGKey(0), x)
    out = adapter.apply(v, x)
    assert out.shape == (2, 16, 32)  # (64/16)^2 tokens


def test_ema_tracks_params():
    model = _tiny_cls()
    x = {"rgb": jnp.ones((2, 32, 32, 3))}
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tx = create_optimizer(params, opt="adamw", lr_schedule=lambda s: 1e-2,
                          weight_decay=0.0)
    state = TrainState.create(params=params, tx=tx, ema_decay=0.5)
    grads = jax.tree.map(jnp.ones_like, params)
    state2 = state.apply_gradients(grads, ema_decay=0.5)
    p0 = jax.tree.leaves(params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    e1 = jax.tree.leaves(state2.ema_params)[0]
    # ema = 0.5*old + 0.5*new -> strictly between
    np.testing.assert_allclose(np.asarray(e1), 0.5 * np.asarray(p0) + 0.5 * np.asarray(p1),
                               atol=1e-6)


def test_grad_accumulation_multisteps():
    model = _tiny_cls()
    x = {"rgb": jnp.ones((2, 32, 32, 3))}
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    base_tx = create_optimizer(params, opt="adamw", lr_schedule=lambda s: 1e-2,
                               weight_decay=0.0)
    tx = optax.MultiSteps(base_tx, every_k_schedule=2)
    state = TrainState.create(params=params, tx=tx)
    grads = jax.tree.map(jnp.ones_like, params)
    s1 = state.apply_gradients(grads)  # accumulate only
    p0 = jax.tree.leaves(params)[0]
    p1 = jax.tree.leaves(s1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    s2 = s1.apply_gradients(grads)  # applies now
    p2 = jax.tree.leaves(s2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_make_mask_demo_path():
    masks = make_mask(4, 4, {"rgb": [(0, 0), (1, 2)], "depth": []},
                      full_tasks=["depth"])
    rgb = np.asarray(masks["rgb"]).reshape(4, 4)
    assert rgb[0, 0] == 0 and rgb[2, 1] == 0  # (x=1, y=2) -> row 2, col 1
    assert rgb.sum() == 14
    assert np.asarray(masks["depth"]).sum() == 0  # full task = all visible
