"""ViT-L registry entries (reference multimae.py:399-416, 523-539):
pretrain_multimae_large / multivit_large must build and run forward at
the large config (dim 1024 / depth 24 / heads 16)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimae_tpu.models import (
    LinearOutputAdapter,
    PatchedInputAdapter,
    SpatialOutputAdapter,
)
from multimae_tpu.models.registry import create_model


def _count(params):
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def test_pretrain_multimae_large_forward():
    model = create_model(
        "pretrain_multimae_large",
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=32,
            )
        },
        output_adapters={
            "rgb": functools.partial(
                SpatialOutputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, dim_tokens=64, depth=1, num_heads=4,
                image_size=32,
            )
        },
    )
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))}
    params = model.init(
        {"params": jax.random.PRNGKey(1), "masking": jax.random.PRNGKey(2)},
        x, num_encoded_tokens=2,
    )["params"]
    # encoder alone: 24 * (4*1024^2 + 2*4*1024^2) + LNs ~= 302M
    assert _count(params) > 250e6
    preds, masks = model.apply(
        {"params": params}, x, num_encoded_tokens=2,
        rngs={"masking": jax.random.PRNGKey(3)},
    )
    assert preds["rgb"].shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(preds["rgb"], np.float32)).all()


def test_multivit_large_forward():
    model = create_model(
        "multivit_large",
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=32,
            )
        },
        output_adapters={
            "cls": functools.partial(
                LinearOutputAdapter, num_classes=5, use_mean_pooling=True,
            )
        },
    )
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))}
    params = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)[
        "params"]
    out = model.apply({"params": params}, x, train=False)["cls"]
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out, np.float32)).all()
