"""Patch-space losses must equal the image-space reference path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.models.criterion import (
    MaskedCrossEntropyLoss,
    MaskedL1Loss,
    MaskedMSELoss,
    patchify_cpp,
    unpatchify_cpp,
)

B, H, W, P = 3, 32, 32, 16
N = (H // P) * (W // P)  # 4 tokens


def _mask(rng, all_masked_row=False):
    m = (rng.random((B, N)) > 0.5).astype(np.int32)
    m[0, 0] = 1  # ensure at least one masked token in sample 0
    if all_masked_row:
        m[1] = 0  # sample with empty mask (nanmean path)
    return jnp.asarray(m)


@pytest.mark.parametrize("norm_pix", [False, True])
@pytest.mark.parametrize("cls", [MaskedMSELoss, MaskedL1Loss])
def test_patch_equals_image_regression(cls, norm_pix):
    rng = np.random.default_rng(0)
    c = 3
    patches = jnp.asarray(rng.standard_normal((B, N, c * P * P)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((B, H, W, c)), jnp.float32)
    mask = _mask(rng)

    loss_fn = cls(patch_size=P, stride=1, norm_pix=norm_pix)
    img_pred = unpatchify_cpp(patches, (H, W), c, P)
    ref = float(loss_fn(img_pred, target, mask=mask))
    fast = float(loss_fn(patches, target, mask=mask))
    assert fast == pytest.approx(ref, rel=1e-5)

    # no-mask path
    ref = float(loss_fn(img_pred, target))
    fast = float(loss_fn(patches, target))
    assert fast == pytest.approx(ref, rel=1e-5)


def test_patch_equals_image_with_empty_mask_sample():
    rng = np.random.default_rng(1)
    c = 1
    patches = jnp.asarray(rng.standard_normal((B, N, c * P * P)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((B, H, W, c)), jnp.float32)
    mask = _mask(rng, all_masked_row=True)
    loss_fn = MaskedMSELoss(patch_size=P, stride=1)
    img_pred = unpatchify_cpp(patches, (H, W), c, P)
    assert float(loss_fn(patches, target, mask=mask)) == pytest.approx(
        float(loss_fn(img_pred, target, mask=mask)), rel=1e-5
    )


def test_patch_equals_image_cross_entropy():
    rng = np.random.default_rng(2)
    classes, p = 7, 4
    h = w = 16  # stride-4 resolution; 4x4 grid of 4px patches -> 16 tokens
    n = (h // p) * (w // p)
    patches = jnp.asarray(rng.standard_normal((B, n, classes * p * p)), jnp.float32)
    target = jnp.asarray(rng.integers(0, classes, (B, h, w)), jnp.int32)
    m = (rng.random((B, n)) > 0.5).astype(np.int32)
    m[0, 0] = 1
    mask = jnp.asarray(m)

    loss_fn = MaskedCrossEntropyLoss(patch_size=16, stride=4)
    img_pred = unpatchify_cpp(patches, (h, w), classes, p)
    ref = float(loss_fn(img_pred, target, mask=mask))
    fast = float(loss_fn(patches, target, mask=mask))
    assert fast == pytest.approx(ref, rel=1e-5)
    # no-mask path
    assert float(loss_fn(patches, target)) == pytest.approx(
        float(loss_fn(img_pred, target)), rel=1e-5
    )


def test_adapter_return_patches_matches_unpatchify():
    import functools

    from multimae_tpu.models import (
        MultiMAE,
        PatchedInputAdapter,
        SpatialOutputAdapter,
    )

    def build(return_patches):
        return MultiMAE(
            input_adapters={
                "rgb": functools.partial(
                    PatchedInputAdapter, num_channels=3, stride_level=1,
                    patch_size_full=16, image_size=64,
                )
            },
            output_adapters={
                "rgb": functools.partial(
                    SpatialOutputAdapter, num_channels=3, stride_level=1,
                    patch_size_full=16, dim_tokens=32, depth=0, num_heads=4,
                    task="rgb", context_tasks=("rgb",), image_size=64,
                    return_patches=return_patches,
                )
            },
            dim_tokens=32, depth=1, num_heads=4,
        )

    x = {"rgb": jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 64, 64, 3)), jnp.float32)}
    m_img = build(False)
    m_patch = build(True)
    variables = m_img.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        x, num_encoded_tokens=8,
    )
    preds_img, _ = m_img.apply(variables, x, num_encoded_tokens=8,
                               rngs={"masking": jax.random.PRNGKey(2)})
    preds_patch, _ = m_patch.apply(variables, x, num_encoded_tokens=8,
                                   rngs={"masking": jax.random.PRNGKey(2)})
    reassembled = unpatchify_cpp(preds_patch["rgb"], (64, 64), 3, 16)
    np.testing.assert_allclose(
        np.asarray(reassembled), np.asarray(preds_img["rgb"]), atol=1e-6
    )
