"""Tests for classification fine-tune components: augs, mixup, losses, metrics."""

import numpy as np
import pytest
from PIL import Image

from tests.conftest import requires_torch

from multimae_tpu.data.auto_augment import rand_augment_transform
from multimae_tpu.data.cls_transforms import (
    ClsEvalTransform,
    ClsTrainTransform,
    RandomErasing,
)
from multimae_tpu.data.mixup import Mixup, mixup_target, one_hot


def _img(h=96, w=128):
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB")


def test_rand_augment_runs_all_ops():
    import random

    random.seed(0)
    ra = rand_augment_transform("rand-m9-mstd0.5-inc1", {"img_mean": (124, 116, 104)})
    assert len(ra.ops) == 15
    img = _img()
    for _ in range(50):
        out = ra(img)
        assert out.size == img.size
        assert out.mode == "RGB"


def test_rand_augment_each_op():
    img = _img()
    ra = rand_augment_transform("rand-m9-mstd0.5-inc1")
    for op in ra.ops:
        op.prob = 1.0
        out = op(img)
        assert out.size == img.size, op.name


def test_cls_train_transform_shapes():
    tf = ClsTrainTransform(input_size=64, re_prob=0.5)
    out = tf(_img())
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32


def test_cls_eval_transform_crop_pct():
    tf = ClsEvalTransform(input_size=224)
    assert tf.resize_size == 256  # 224 / (224/256)
    out = tf(_img(300, 400))
    assert out.shape == (224, 224, 3)


def test_random_erasing_erases():
    import random

    re_op = RandomErasing(probability=1.0)
    arr = np.zeros((64, 64, 3), np.float32)
    out = re_op(arr, random.Random(0))
    assert np.abs(out).sum() > 0  # pixel-mode noise got written
    assert np.abs(arr).sum() == 0  # input untouched


def test_one_hot_and_smoothing():
    t = np.array([1, 3])
    y = mixup_target(t, 4, lam=1.0, smoothing=0.1)
    np.testing.assert_allclose(y.sum(axis=1), 1.0, atol=1e-6)
    assert y[0, 1] == pytest.approx(0.925)
    assert y[0, 0] == pytest.approx(0.025)


def test_mixup_batch_mode():
    mix = Mixup(mixup_alpha=0.8, cutmix_alpha=1.0, label_smoothing=0.1,
                num_classes=10, seed=0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    t = rng.integers(0, 10, (8,))
    x2, y2 = mix(x.copy(), t)
    assert x2.shape == x.shape
    assert y2.shape == (8, 10)
    np.testing.assert_allclose(y2.sum(axis=1), 1.0, atol=1e-5)


@requires_torch
def test_label_smoothing_ce_matches_torch():
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from multimae_tpu.train.cross_entropy import (
        label_smoothing_cross_entropy,
        soft_target_cross_entropy,
    )

    rng = np.random.default_rng(2)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    targets = rng.integers(0, 10, (16,))
    ours = float(
        label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(targets), 0.1)
    )
    ref = float(
        F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(targets),
                        label_smoothing=0.1)
    )
    assert ours == pytest.approx(ref, abs=1e-5)

    soft = rng.dirichlet(np.ones(10), 16).astype(np.float32)
    ours_soft = float(
        soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(soft))
    )
    ref_soft = float(
        torch.sum(-torch.from_numpy(soft) *
                  torch.log_softmax(torch.from_numpy(logits), dim=-1), dim=-1).mean()
    )
    assert ours_soft == pytest.approx(ref_soft, abs=1e-5)


@requires_torch
def test_accuracy_matches_reference_semantics():
    import jax.numpy as jnp

    from multimae_tpu.utils.metrics import accuracy

    logits = np.asarray([
        [0.1, 0.9, 0.0, 0.0],
        [0.9, 0.1, 0.0, 0.0],
        [0.0, 0.0, 0.2, 0.8],
    ], np.float32)
    targets = np.asarray([1, 1, 2])
    t1, t2 = accuracy(jnp.asarray(logits), jnp.asarray(targets), topk=(1, 2))
    assert float(t1) == pytest.approx(100 * 1 / 3)
    assert float(t2) == pytest.approx(100.0)  # every target is within top-2


def test_depth_metrics_perfect_prediction():
    import jax.numpy as jnp

    from multimae_tpu.utils.metrics import depth_metrics

    target = jnp.asarray(np.random.default_rng(0).uniform(1, 5, (2, 8, 8, 1)))
    m = depth_metrics(target, target)
    assert float(m["rmse"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["delta_1"]) == pytest.approx(1.0)


def test_confusion_matrix_miou():
    import jax.numpy as jnp

    from multimae_tpu.utils.metrics import confusion_matrix, miou_from_confusion

    pred = jnp.asarray([[0, 1], [2, 255]])
    label = jnp.asarray([[0, 1], [1, 255]])
    cm = np.asarray(confusion_matrix(pred, jnp.where(label == 255, 255, label), 3))
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[1, 2] == 1
    stats = miou_from_confusion(cm)
    # class0 IoU=1, class1 IoU=1/2, class2 IoU=0/1=0 -> mIoU=0.5
    assert stats["mIoU"] == pytest.approx(0.5)
