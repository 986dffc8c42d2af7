"""Tests for semseg/depth fine-tune transforms, losses, and metrics."""

import numpy as np
import pytest

from tests.conftest import requires_torch

from multimae_tpu.data.regression_transforms import (
    DataAugmentationForRegression,
    NYUTransform,
)
from multimae_tpu.data.semseg_transforms import (
    DataAugmentationForSemSeg,
    SimpleTransform,
    standardize_depth_map,
)
from multimae_tpu.utils.data_constants import NYU_MEAN, NYU_STD, PAD_MASK_VALUE


def _arrays(h=100, w=140):
    rng = np.random.default_rng(0)
    return {
        "rgb": rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
        "depth": rng.integers(0, 60000, (h, w), dtype=np.uint16),
        "semseg": rng.integers(0, 20, (h, w), dtype=np.uint8),
    }


def test_simple_transform_train_shapes():
    import random

    tf = SimpleTransform(train=True, input_size=64)
    out = tf(_arrays(), rng=random.Random(0))
    assert out["rgb"].shape == (64, 64, 3)
    assert out["depth"].shape == (64, 64)
    assert out["semseg"].shape == (64, 64)


def test_simple_transform_eval_pads_topleft():
    tf = SimpleTransform(train=False, input_size=64)
    out = tf(_arrays(40, 64))
    # 40x64 -> scale to 64 longest side -> 40x64 -> pad bottom to 64
    assert out["semseg"].shape == (64, 64)
    assert (out["semseg"][50:, :] == PAD_MASK_VALUE).all()


def test_seg_adapt_labels_void_and_reduce():
    tf = DataAugmentationForSemSeg(
        SimpleTransform(train=False, input_size=8),
        seg_num_classes=10, seg_reduce_zero_label=True, seg_use_void_label=False,
    )
    img = np.asarray([[0, 1, PAD_MASK_VALUE], [5, 0, 2]], np.int64)
    out = tf.seg_adapt_labels(img.copy())
    assert out[0, 0] == 255  # zero -> ignore
    assert out[0, 1] == 0    # 1 -> 0
    assert out[0, 2] == 255  # pad -> ignore (wrapped through -1 correction)
    assert out[1, 0] == 4


def test_standardize_depth_map_handles_pad():
    img = np.full((10, 10), 100.0, np.float32)
    img[0, :5] = PAD_MASK_VALUE
    out = standardize_depth_map(img)
    assert np.isfinite(out).all()


def test_regression_pipeline():
    import random

    tf = DataAugmentationForRegression(NYUTransform(train=True, input_size=64))
    arrays = _arrays()
    arrays["mask_valid"] = (np.random.default_rng(1).random((100, 140)) > 0.3) \
        .astype(np.uint8) * 255
    del arrays["semseg"]
    out = tf(arrays, rng=random.Random(0))
    assert out["depth"].shape == (64, 64, 1)
    assert out["rgb"].shape == (64, 64, 3)
    assert out["mask_valid"].shape == (64, 64, 1)
    # invalid depth zeroed
    assert (out["depth"][~out["mask_valid"]] == 0).all()


@requires_torch
def test_berhu_loss_matches_reference():
    import jax.numpy as jnp
    import torch

    from multimae_tpu.train.regression_losses import (
        masked_berhu_loss,
        masked_l1_loss,
        masked_mse_loss,
    )

    rng = np.random.default_rng(2)
    preds = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    target = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    maskv = rng.random((2, 16, 16, 1)) > 0.3

    # Reference torch implementation (run_finetuning_depth.py:69-84), NCHW
    pt = torch.from_numpy(preds.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(target.transpose(0, 3, 1, 2))
    mt = torch.from_numpy(maskv.transpose(0, 3, 1, 2))

    diff = pt - tt
    diff[~mt] = 0
    c = max(torch.abs(diff).max() * 0.2, torch.tensor(1e-5))
    l1 = torch.abs(diff)
    l2 = (torch.square(diff) + c**2) / 2.0 / c
    ref_berhu = (l1[torch.abs(diff) < c].sum() + l2[torch.abs(diff) >= c].sum()) / mt.sum()
    # NOTE: the reference's l2 branch contributes c/2 for masked-out pixels
    # with |diff|=0 >= c is False, so masked pixels fall in the l1 branch
    # with 0 contribution — matching our jnp.where(mask, ...) formulation.

    ours = float(masked_berhu_loss(jnp.asarray(preds), jnp.asarray(target),
                                   jnp.asarray(maskv)))
    assert ours == pytest.approx(float(ref_berhu), rel=1e-5)

    ours_l1 = float(masked_l1_loss(jnp.asarray(preds), jnp.asarray(target),
                                   jnp.asarray(maskv)))
    ref_l1 = float(torch.abs(diff).sum() / mt.sum())
    assert ours_l1 == pytest.approx(ref_l1, rel=1e-5)

    ours_mse = float(masked_mse_loss(jnp.asarray(preds), jnp.asarray(target),
                                     jnp.asarray(maskv)))
    ref_mse = float(torch.square(diff).sum() / mt.sum())
    assert ours_mse == pytest.approx(ref_mse, rel=1e-5)


@requires_torch
def test_nyu_metrics_match_reference():
    import jax.numpy as jnp
    import torch

    from multimae_tpu.train.regression_losses import masked_nyu_metrics

    rng = np.random.default_rng(3)
    preds = rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    target = rng.uniform(-1, 1, (2, 8, 8, 1)).astype(np.float32)
    maskv = rng.random((2, 8, 8, 1)) > 0.3

    ours = masked_nyu_metrics(jnp.asarray(preds), jnp.asarray(target),
                              jnp.asarray(maskv))

    pt = torch.from_numpy(preds.transpose(0, 3, 1, 2)) * NYU_STD + NYU_MEAN
    tt = torch.from_numpy(target.transpose(0, 3, 1, 2)) * NYU_STD + NYU_MEAN
    mt = torch.from_numpy(maskv.transpose(0, 3, 1, 2))
    n = mt.sum()
    diff = torch.abs(pt - tt)
    diff[~mt] = 0
    max_rel = torch.maximum(pt / torch.clamp_min(tt, 1e-6),
                            tt / torch.clamp_min(pt, 1e-6))[mt]
    assert float(ours["rmse"]) == pytest.approx(
        float((diff.square().sum() / n).sqrt()), rel=1e-4)
    assert float(ours["rel"]) == pytest.approx(
        float((diff / torch.clamp_min(tt, 1e-6))[mt].mean()), rel=1e-4)
    assert float(ours["delta_1"]) == pytest.approx(
        float((max_rel < 1.25).float().mean()), rel=1e-4)
