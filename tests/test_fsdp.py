"""FSDP sharding tests on the simulated 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimae_tpu.parallel.fsdp import fsdp_shardings, jit_fsdp, shard_state_fsdp
from multimae_tpu.parallel.mesh import DATA_AXIS, create_mesh, replicate, shard_batch
from tests.test_train_step import build_tiny, make_batch

from multimae_tpu.models import (
    MaskedCrossEntropyLoss,
    MaskedL1Loss,
    MaskedMSELoss,
)
from multimae_tpu.train.optim_factory import create_optimizer
from multimae_tpu.train.pretrain_step import jit_data_parallel, make_pretrain_train_step
from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
from multimae_tpu.train.task_balancing import build_balancer
from multimae_tpu.train.train_state import TrainState


def _setup():
    model = build_tiny()
    tasks = ("rgb", "depth", "semseg", "norm_rgb")
    balancer = build_balancer("uncertainty", tasks)
    batch = make_batch()
    params = {
        "model": model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            batch, num_encoded_tokens=24,
        )["params"],
        "balancer": balancer.init(
            jax.random.PRNGKey(0), {t: jnp.zeros(()) for t in tasks}
        )["params"],
    }
    tx = create_optimizer(
        params, opt="adamw",
        lr_schedule=as_optax_schedule(
            cosine_scheduler(1e-3, 0, epochs=1, niter_per_ep=5, warmup_epochs=0)
        ),
        weight_decay=0.05, opt_betas=(0.9, 0.95), filter_bias_and_bn=False,
    )
    losses = {
        "rgb": MaskedMSELoss(16, 1), "norm_rgb": MaskedMSELoss(16, 1, norm_pix=True),
        "depth": MaskedL1Loss(16, 1), "semseg": MaskedCrossEntropyLoss(16, 4),
    }
    step = make_pretrain_train_step(
        model, balancer, losses, num_encoded_tokens=24,
        in_domains=("rgb", "depth", "semseg"), extra_norm_pix_loss=True,
    )
    return params, tx, step, batch


def test_fsdp_shardings_shard_large_leaves():
    mesh = create_mesh()
    params, _, _, _ = _setup()
    sh = fsdp_shardings(params, mesh, min_size=1024)
    import flax

    flat_p = flax.traverse_util.flatten_dict(params["model"])
    flat_s = flax.traverse_util.flatten_dict(sh["model"])
    sharded = sum(
        1 for k in flat_p
        if flat_s[k].spec != jax.sharding.PartitionSpec()
    )
    assert sharded > 0
    # every sharded dim divides evenly
    for k, leaf in flat_p.items():
        spec = flat_s[k].spec
        for dim, axis in enumerate(spec):
            if axis == DATA_AXIS:
                assert np.shape(leaf)[dim] % mesh.shape[DATA_AXIS] == 0


def test_fsdp_step_matches_dp():
    mesh = create_mesh()
    params, tx, step, batch = _setup()

    def fresh():
        return jax.tree.map(jnp.array, params)

    # DP reference
    state_dp = TrainState.create(params=fresh(), tx=tx)
    state_dp = state_dp.replace(
        params=replicate(state_dp.params, mesh),
        opt_state=replicate(state_dp.opt_state, mesh),
    )
    dp = jit_data_parallel(step, mesh)
    state_dp, m_dp = dp(state_dp, shard_batch(batch, mesh), jax.random.PRNGKey(9))

    # FSDP
    state_f = TrainState.create(params=fresh(), tx=tx)
    state_f = shard_state_fsdp(state_f, mesh, min_size=1024)
    fs = jit_fsdp(step, state_f, mesh, min_size=1024)
    state_f, m_f = fs(state_f, shard_batch(batch, mesh), jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m_f["loss"]), float(m_dp["loss"]), rtol=1e-5)
    a = jax.tree.leaves(state_dp.params["model"])[0]
    b = jax.tree.leaves(state_f.params["model"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # param memory is actually distributed: addressable shard smaller than global
    import flax

    flat_p = flax.traverse_util.flatten_dict(state_f.params["model"])
    big = max(flat_p.values(), key=lambda v: v.size)
    shard = big.addressable_shards[0].data
    assert shard.size < big.size


def test_dp_step_compiles_without_resharding_collectives():
    """Regression for the GSPMD 'involuntary full rematerialization' on
    the semseg tokenize transposes (round-1 MULTICHIP dryrun warnings):
    a pure data-parallel step needs only gradient/metric all-reduces —
    any all-gather / all-to-all / collective-permute in the compiled
    module means the partitioner had to reshard an intermediate."""
    mesh = create_mesh()
    params, tx, step, batch = _setup()
    state = TrainState.create(params=params, tx=tx)
    state = state.replace(
        params=replicate(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    dp_step = jit_data_parallel(step, mesh)
    sharded = shard_batch(batch, mesh)
    compiled = dp_step.lower(state, sharded, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo  # gradient psums must be there
    for op in ("all-gather", "all-to-all", "collective-permute"):
        assert op not in hlo, f"unexpected resharding collective: {op}"
