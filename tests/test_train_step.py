"""End-to-end pretrain train-step tests on a simulated 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.models import (
    MaskedCrossEntropyLoss,
    MaskedL1Loss,
    MaskedMSELoss,
    MultiMAE,
    PatchedInputAdapter,
    SemSegInputAdapter,
    SpatialOutputAdapter,
)
from multimae_tpu.parallel.mesh import create_mesh, shard_batch, replicate
from multimae_tpu.train.optim_factory import create_optimizer
from multimae_tpu.train.pretrain_step import (
    jit_data_parallel,
    make_pretrain_train_step,
    standardize_depth,
)
from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
from multimae_tpu.train.task_balancing import build_balancer
from multimae_tpu.train.train_state import TrainState

DIM = 64
IMG = 64  # 4x4 grid of 16px patches -> 16 tokens per task


def build_tiny(depth=2, **kw):
    in_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1, patch_size_full=16,
            image_size=IMG,
        ),
        "depth": functools.partial(
            PatchedInputAdapter, num_channels=1, stride_level=1, patch_size_full=16,
            image_size=IMG,
        ),
        "semseg": functools.partial(
            SemSegInputAdapter, num_classes=10, stride_level=4, patch_size_full=16,
            dim_class_emb=8, image_size=IMG,
        ),
    }
    out_adapters = {
        t: functools.partial(
            SpatialOutputAdapter, num_channels=c, stride_level=s, patch_size_full=16,
            dim_tokens=32, depth=1, num_heads=4, task=t,
            context_tasks=("rgb", "depth", "semseg"), image_size=IMG,
        )
        for t, c, s in [("rgb", 3, 1), ("depth", 1, 1), ("semseg", 10, 4)]
    }
    out_adapters["norm_rgb"] = functools.partial(
        SpatialOutputAdapter, num_channels=3, stride_level=1, patch_size_full=16,
        dim_tokens=32, depth=1, num_heads=4, task="rgb",
        context_tasks=("rgb", "depth", "semseg"), image_size=IMG,
    )
    return MultiMAE(
        input_adapters=in_adapters, output_adapters=out_adapters,
        dim_tokens=DIM, depth=depth, num_heads=4, **kw,
    )


def make_batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "rgb": jnp.asarray(rng.standard_normal((b, IMG, IMG, 3)), jnp.float32),
        "depth": jnp.asarray(rng.standard_normal((b, IMG, IMG, 1)) + 3.0, jnp.float32),
        "semseg": jnp.asarray(rng.integers(0, 10, (b, IMG // 4, IMG // 4)), jnp.int32),
    }


def test_standardize_depth():
    d = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 1)) * 5 + 7)
    out = standardize_depth(d)
    # middle-80% standardisation: overall stats close to standard
    assert abs(float(out.mean())) < 0.5
    assert 0.5 < float(out.std()) < 2.0


@pytest.fixture(scope="module")
def setup():
    model = build_tiny()
    balancer = build_balancer("uncertainty", ("rgb", "depth", "semseg", "norm_rgb"))
    batch = make_batch()
    model_params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=24,
    )["params"]
    bal_params = balancer.init(
        jax.random.PRNGKey(0),
        {t: jnp.zeros(()) for t in ("rgb", "depth", "semseg", "norm_rgb")},
    )["params"]
    params = {"model": model_params, "balancer": bal_params}

    lr_sched = as_optax_schedule(
        cosine_scheduler(1e-3, 0.0, epochs=2, niter_per_ep=5, warmup_epochs=0)
    )
    tx = create_optimizer(
        params, opt="adamw", lr_schedule=lr_sched, weight_decay=0.05,
        opt_betas=(0.9, 0.95), filter_bias_and_bn=False, balancer_lr_scale=1.0,
    )
    tasks_loss_fn = {
        "rgb": MaskedMSELoss(patch_size=16, stride=1),
        "norm_rgb": MaskedMSELoss(patch_size=16, stride=1, norm_pix=True),
        "depth": MaskedL1Loss(patch_size=16, stride=1),
        "semseg": MaskedCrossEntropyLoss(patch_size=16, stride=4),
    }
    step_fn = make_pretrain_train_step(
        model, balancer, tasks_loss_fn,
        num_encoded_tokens=24, in_domains=("rgb", "depth", "semseg"),
        extra_norm_pix_loss=True, clip_grad=None, skip_grad=None,
    )

    def fresh_params():
        # copy so donation in one test can't invalidate another's buffers
        return jax.tree.map(jnp.array, params)

    return model, balancer, fresh_params, tx, step_fn, batch


def test_single_device_step(setup):
    _, _, fresh_params, tx, step_fn, batch = setup
    params = fresh_params()
    state = TrainState.create(params=params, tx=tx)
    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(42))
    assert np.isfinite(float(metrics["loss"]))
    for t in ("rgb", "depth", "semseg", "norm_rgb"):
        assert np.isfinite(float(metrics[f"{t}_loss"]))
    # params actually moved
    d0 = jax.tree.leaves(params["model"])[0]
    d1 = jax.tree.leaves(state2.params["model"])[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert int(state2.step) == 1


def test_data_parallel_8dev_matches_single(setup):
    _, _, fresh_params, tx, step_fn, batch = setup
    params = fresh_params()
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    mesh = create_mesh()
    state = TrainState.create(params=fresh_params(), tx=tx)

    # single-device reference
    state_ref, metrics_ref = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(7))

    # 8-way data parallel
    state_dp = TrainState.create(params=fresh_params(), tx=tx)
    state_dp = state_dp.replace(
        params=replicate(state_dp.params, mesh),
        opt_state=replicate(state_dp.opt_state, mesh),
    )
    dp_step = jit_data_parallel(step_fn, mesh)
    batch_sharded = shard_batch(batch, mesh)
    state_dp2, metrics_dp = dp_step(state_dp, batch_sharded, jax.random.PRNGKey(7))

    # identical masking rng + full batch -> identical loss and params
    np.testing.assert_allclose(
        float(metrics_dp["loss"]), float(metrics_ref["loss"]), rtol=1e-4
    )
    a = jax.tree.leaves(state_ref.params["model"])[0]
    b = jax.tree.leaves(state_dp2.params["model"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_skip_grad_blocks_update(setup):
    _, _, fresh_params, tx, step_fn_base, batch = setup
    params = fresh_params()
    model, balancer = setup[0], setup[1]
    from multimae_tpu.models import (
        MaskedCrossEntropyLoss as CE, MaskedL1Loss as L1, MaskedMSELoss as MSE,
    )
    tasks_loss_fn = {
        "rgb": MSE(16, 1), "norm_rgb": MSE(16, 1, norm_pix=True),
        "depth": L1(16, 1), "semseg": CE(16, 4),
    }
    step_fn = make_pretrain_train_step(
        model, balancer, tasks_loss_fn,
        num_encoded_tokens=24, in_domains=("rgb", "depth", "semseg"),
        extra_norm_pix_loss=True, skip_grad=1e-9,  # everything skips
    )
    state = TrainState.create(params=params, tx=tx)
    state2, metrics = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(3))
    assert float(metrics["skipped"]) == 1.0
    a = jax.tree.leaves(state.params["model"])[0]
    b = jax.tree.leaves(state2.params["model"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_balancer_gets_gradients(setup):
    _, _, fresh_params, tx, step_fn, batch = setup
    params = fresh_params()
    state = TrainState.create(params=params, tx=tx)
    state2, _ = jax.jit(step_fn)(state, batch, jax.random.PRNGKey(11))
    lv0 = np.asarray(params["balancer"]["log_vars"])
    lv1 = np.asarray(state2.params["balancer"]["log_vars"])
    assert not np.allclose(lv0, lv1)
