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


def test_dense_finetune_8dev_data_parallel_matches_single():
    """The semseg fine-tune train step (make_dense_train_step + the CLI's
    jit shardings) must produce identical loss/params under an 8-way data
    mesh as on one device — the dense analogue of the pretrain dp test."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.cli.run_finetuning_semseg import seg_cross_entropy
    from multimae_tpu.models import ConvNeXtAdapter, PatchedInputAdapter
    from multimae_tpu.models.multimae import MultiViT
    from multimae_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from multimae_tpu.train.finetune_step import make_dense_train_step
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState

    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    s, b, ncls = 32, 8, 5
    model = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=s,
            )
        },
        output_adapters={
            "semseg": functools.partial(
                ConvNeXtAdapter, num_classes=ncls, preds_per_patch=16,
                depth=1, embed_dim=96, patch_size=16, main_tasks=("rgb",),
            )
        },
        dim_tokens=64, depth=2, num_heads=4,
    )
    batch = {
        "rgb": jax.random.normal(jax.random.PRNGKey(0), (b, s, s, 3)),
        "target": jax.random.randint(
            jax.random.PRNGKey(1), (b, s, s), 0, ncls, jnp.int32
        ),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        {"rgb": batch["rgb"]}, train=False,
    )["params"]
    lr = as_optax_schedule(
        cosine_scheduler(1e-3, 0.0, epochs=2, niter_per_ep=2, warmup_epochs=1)
    )
    tx = create_optimizer(
        params, opt="adamw", lr_schedule=lr, weight_decay=0.05,
        opt_betas=(0.9, 0.999), filter_bias_and_bn=True,
    )
    step = make_dense_train_step(
        model, "semseg", seg_cross_entropy, in_domains=("rgb",)
    )

    state = TrainState.create(params=jax.tree.map(jnp.copy, params), tx=tx)
    state_ref, metrics_ref = jax.jit(step)(state, batch, jax.random.PRNGKey(4))

    mesh = create_mesh()
    state_dp = TrainState.create(params=jax.tree.map(jnp.copy, params), tx=tx)
    state_dp = state_dp.replace(
        params=replicate(state_dp.params, mesh),
        opt_state=replicate(state_dp.opt_state, mesh),
    )
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    dp_step = jax.jit(step, in_shardings=(repl, data_sh, repl),
                      out_shardings=(repl, repl))
    state_dp2, metrics_dp = dp_step(
        state_dp, shard_batch(batch, mesh), jax.random.PRNGKey(4)
    )

    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_ref["loss"]), rtol=1e-4
    )
    for (pa, a), bb in zip(
        jax.tree_util.tree_leaves_with_path(state_ref.params),
        jax.tree.leaves(state_dp2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
