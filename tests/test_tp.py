"""Tensor-parallel (model-axis) pretrain step on the simulated 8-device mesh.

The reference has no tensor parallelism (SURVEY.md §2.4); parallel/tp.py
is the TPU-native scaling extension. These tests check the whole recipe —
head/hidden activation constraints (vit.py constrain_tp), column/row
weight shardings, GSPMD-inserted psums — against the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimae_tpu.models import (
    MaskedCrossEntropyLoss,
    MaskedL1Loss,
    MaskedMSELoss,
)
from multimae_tpu.parallel.mesh import (
    MODEL_AXIS,
    create_mesh,
    shard_batch,
    use_constraint_mesh,
)
from multimae_tpu.parallel.tp import _tp_leaf_spec, jit_tp, shard_state_tp
from multimae_tpu.train.optim_factory import create_optimizer
from multimae_tpu.train.pretrain_step import make_pretrain_train_step
from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
from multimae_tpu.train.task_balancing import build_balancer
from multimae_tpu.train.train_state import TrainState
from test_train_step import build_tiny, make_batch


def test_tp_leaf_spec_rules():
    assert _tp_leaf_spec(("model", "encoder_3", "mlp", "fc1", "kernel"),
                         (64, 256), 2) == P(None, MODEL_AXIS)
    assert _tp_leaf_spec(("model", "encoder_3", "mlp", "fc1", "bias"),
                         (256,), 2) == P(MODEL_AXIS)
    assert _tp_leaf_spec(("model", "encoder_0", "mlp", "fc2", "kernel"),
                         (256, 64), 2) == P(MODEL_AXIS, None)
    assert _tp_leaf_spec(("model", "encoder_0", "attn", "proj", "kernel"),
                         (64, 64), 2) == P(MODEL_AXIS, None)
    # packed qkv has no contiguous model split -> replicated
    assert _tp_leaf_spec(("model", "encoder_0", "attn", "qkv", "kernel"),
                         (64, 192), 2) == P()
    # decoder blocks are outside TP scope
    assert _tp_leaf_spec(
        ("model", "output_adapters_rgb", "decoder_0", "mlp", "fc1", "kernel"),
        (32, 128), 2) == P()
    # non-divisible dims stay replicated rather than erroring
    assert _tp_leaf_spec(("model", "encoder_1", "mlp", "fc1", "kernel"),
                         (64, 255), 2) == P()


def test_constrain_tp_scope_rules():
    """constrain_tp: engaged only inside encoder scopes (the only
    scopes whose weights tp_state_shardings shards) and when the dim
    divides the model axis; otherwise returns its input untouched."""
    from multimae_tpu.parallel.mesh import constrain_tp

    mesh = create_mesh(model=2)  # (4, 2)
    try:
        use_constraint_mesh(mesh)
        x = jnp.ones((8, 10, 4, 16))  # (B, N, H, Dh)
        y = jax.jit(lambda t: constrain_tp(t * 1.0, 2, ("encoder_0", "attn")))(x)
        assert y.sharding.spec == P("data", None, MODEL_AXIS), y.sharding
        # replicated-weight scope (decoder): off — constraining it would
        # reshard every decoder op with no partitioned GEMM to pay for it
        assert constrain_tp(x, 2, ("output_adapters_rgb", "decoder_0")) is x
        # non-divisible dim: off
        xo = jnp.ones((8, 10, 3, 16))
        assert constrain_tp(xo, 2, ("encoder_0", "attn")) is xo
        # no path given (non-module callers): scoping waived
        y2 = jax.jit(lambda t: constrain_tp(t * 1.0, 2))(x)
        assert y2.sharding.spec == P("data", None, MODEL_AXIS), y2.sharding
    finally:
        use_constraint_mesh(None)


def _build_setup(num_encoded_tokens: int = 24, depth: int = 2):
    model = build_tiny(depth=depth)
    out_tasks = ("rgb", "depth", "semseg", "norm_rgb")
    balancer = build_balancer("uncertainty", out_tasks)
    batch = make_batch()
    model_params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=num_encoded_tokens,
    )["params"]
    bal_params = balancer.init(
        jax.random.PRNGKey(0), {t: jnp.zeros(()) for t in out_tasks}
    )["params"]
    params = {"model": model_params, "balancer": bal_params}
    lr_sched = as_optax_schedule(
        cosine_scheduler(1e-3, 0.0, epochs=2, niter_per_ep=5, warmup_epochs=0)
    )
    tx = create_optimizer(
        params, opt="adamw", lr_schedule=lr_sched, weight_decay=0.05,
        opt_betas=(0.9, 0.95), filter_bias_and_bn=False,
    )
    tasks_loss_fn = {
        "rgb": MaskedMSELoss(patch_size=16, stride=1),
        "norm_rgb": MaskedMSELoss(patch_size=16, stride=1, norm_pix=True),
        "depth": MaskedL1Loss(patch_size=16, stride=1),
        "semseg": MaskedCrossEntropyLoss(patch_size=16, stride=4),
    }
    step_fn = make_pretrain_train_step(
        model, balancer, tasks_loss_fn,
        num_encoded_tokens=num_encoded_tokens,
        in_domains=("rgb", "depth", "semseg"),
        extra_norm_pix_loss=True, clip_grad=1.0,
    )
    return params, tx, step_fn, batch


@pytest.mark.parametrize("model_par", [2, 4])
def test_tp_step_matches_single(model_par):
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    params, tx, step_fn, batch = _build_setup()

    try:
        # single-device reference (no mesh registered)
        use_constraint_mesh(None)
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = create_mesh(model=model_par)  # (8/model_par) x model_par
        state_tp = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_tp = shard_state_tp(state_tp, mesh)
        # a TP-sharded leaf really is distributed
        fc1 = state_tp.params["model"]["encoder_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(None, MODEL_AXIS)

        tp_step = jit_tp(step_fn, state_tp, mesh)
        state_tp, metrics_tp = tp_step(
            state_tp, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        np.testing.assert_allclose(
            float(metrics_tp["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
        np.testing.assert_allclose(
            float(metrics_tp["grad_norm"]), float(metrics_ref["grad_norm"]),
            rtol=1e-3)
        # updated params match: one replicated leaf + one model-sharded leaf
        for path in (
            ("encoder_0", "attn", "qkv", "kernel"),
            ("encoder_1", "mlp", "fc1", "kernel"),
            ("encoder_1", "mlp", "fc2", "kernel"),
            ("encoder_0", "attn", "proj", "kernel"),
        ):
            a = state_ref.params["model"]
            b = state_tp.params["model"]
            for k in path:
                a, b = a[k], b[k]
            # tolerance covers collective reduction-order noise (psum vs
            # reduce-scatter orderings, grows with model_par) amplified
            # by Adam's second-moment sqrt
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)),
                rtol=5e-4, atol=2e-5, err_msg="/".join(path))
    finally:
        use_constraint_mesh(None)


def test_tp_fsdp_combined_matches_single():
    """ZeRO-3 x Megatron composition (--fsdp --model_parallel 2): large
    leaves additionally sharded over 'data' on a free axis; step result
    must still match the single-device step."""
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    from multimae_tpu.parallel.mesh import DATA_AXIS

    params, tx, step_fn, batch = _build_setup()
    try:
        use_constraint_mesh(None)
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = create_mesh(model=2)  # (data=4, model=2)
        state_2d = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        # min_size=1: the tiny model's leaves are all below the
        # production 32k-element ZeRO threshold
        state_2d = shard_state_tp(state_2d, mesh, fsdp=True, min_size=1)
        # a TP leaf picked up the extra 'data' axis (2-D sharded)...
        fc1 = state_2d.params["model"]["encoder_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(DATA_AXIS, MODEL_AXIS), fc1.sharding
        # ...and a large non-TP leaf is ZeRO-sharded over 'data'
        qkv = state_2d.params["model"]["encoder_0"]["attn"]["qkv"]["kernel"]
        assert DATA_AXIS in (qkv.sharding.spec or ()), qkv.sharding

        step_2d = jit_tp(step_fn, state_2d, mesh, fsdp=True, min_size=1)
        state_2d, metrics_2d = step_2d(
            state_2d, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        np.testing.assert_allclose(
            float(metrics_2d["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
        np.testing.assert_allclose(
            float(metrics_2d["grad_norm"]), float(metrics_ref["grad_norm"]),
            rtol=1e-3)
        for path in (
            ("encoder_0", "attn", "qkv", "kernel"),
            ("encoder_1", "mlp", "fc1", "kernel"),
            ("encoder_0", "attn", "proj", "kernel"),
        ):
            a = state_ref.params["model"]
            b = state_2d.params["model"]
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)),
                rtol=5e-4, atol=2e-5, err_msg="/".join(path))
    finally:
        use_constraint_mesh(None)


def test_add_fsdp_axis_rules():
    from multimae_tpu.parallel.mesh import DATA_AXIS
    from multimae_tpu.parallel.tp import _add_fsdp_axis

    # TP'd fc1 (D, hidden): 'data' lands on the free (largest-free) axis
    assert _add_fsdp_axis(P(None, MODEL_AXIS), (256, 1024), 4, 1) \
        == P(DATA_AXIS, MODEL_AXIS)
    # row-parallel fc2 (hidden, D): axis 0 taken -> 'data' on axis 1
    assert _add_fsdp_axis(P(MODEL_AXIS, None), (1024, 256), 4, 1) \
        == P(MODEL_AXIS, DATA_AXIS)
    # replicated leaf: plain ZeRO shard on the largest divisible axis
    assert _add_fsdp_axis(P(), (256, 1024), 4, 1) == P(None, DATA_AXIS)
    # small leaves stay put
    assert _add_fsdp_axis(P(), (8, 8), 4, 2**15) == P()
    # nothing divisible -> unchanged
    assert _add_fsdp_axis(P(MODEL_AXIS, None), (1024, 255), 4, 1) \
        == P(MODEL_AXIS, None)
