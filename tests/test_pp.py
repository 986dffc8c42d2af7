"""Pipeline-parallel (stage-axis) pretrain step on the simulated 8-device mesh.

The reference has no pipeline parallelism (SURVEY.md §2.4); parallel/pp.py
is the TPU-native scaling extension: encoder blocks GPipe'd over the
'stage' mesh axis (shard_map + ppermute + lax.scan), with jax deriving
the reverse pipeline by transposition. These tests check the full
schedule — stage-stacked weights, microbatch ticks, bubble masking, the
last-stage collect/broadcast — against the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.parallel import pp
from multimae_tpu.parallel.mesh import shard_batch, use_constraint_mesh
from multimae_tpu.train.train_state import TrainState
from test_tp import _build_setup


def _cleanup():
    pp.use_pipeline(None)
    use_constraint_mesh(None)


@pytest.mark.parametrize("n_micro", [1, 2])
def test_pp_step_matches_single(n_micro):
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    params, tx, step_fn, batch = _build_setup()
    try:
        _cleanup()
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = pp.create_pp_mesh(stage=2)  # (data 4, stage 2); depth=2
        state_pp = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        pp_step = pp.jit_pp(step_fn, mesh, n_micro=n_micro)
        state_pp, metrics_pp = pp_step(
            state_pp, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        assert abs(float(metrics_ref["loss"]) - float(metrics_pp["loss"])) < 1e-5
        diffs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            state_ref.params, state_pp.params)
        assert max(jax.tree.leaves(diffs)) < 2e-4
    finally:
        _cleanup()


def test_pp_stage4_matches_single():
    """4-stage pipeline (data 2 x stage 4) on a depth-4 encoder."""
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    params, tx, step_fn, batch = _build_setup(depth=4)
    try:
        _cleanup()
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = pp.create_pp_mesh(stage=4)  # (data 2, stage 4)
        state_pp = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        pp_step = pp.jit_pp(step_fn, mesh, n_micro=2)
        state_pp, metrics_pp = pp_step(
            state_pp, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        assert abs(float(metrics_ref["loss"]) - float(metrics_pp["loss"])) < 1e-5
        diffs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            state_ref.params, state_pp.params)
        assert max(jax.tree.leaves(diffs)) < 2e-4
    finally:
        _cleanup()


def test_pp_fsdp_composed_matches_single():
    """PP x FSDP: ZeRO-3 'data' sharding at rest + GPipe over 'stage';
    the stage slices are all-gathered in front of the shard_map and the
    result must still match the single-device step."""
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    from jax.sharding import PartitionSpec as P

    from multimae_tpu.parallel.fsdp import shard_state_fsdp
    from multimae_tpu.parallel.mesh import DATA_AXIS

    params, tx, step_fn, batch = _build_setup()
    try:
        _cleanup()
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = pp.create_pp_mesh(stage=2)  # (data 4, stage 2)
        state_pp = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_pp = shard_state_fsdp(state_pp, mesh, min_size=1024)
        # an FSDP-sharded leaf really is distributed over 'data'
        proj = state_pp.params["model"]["input_adapters_rgb"]["proj"]["kernel"]
        assert DATA_AXIS in jax.tree.leaves(
            [proj.sharding.spec])[0], proj.sharding.spec

        pp_step = pp.jit_pp(
            step_fn, mesh, n_micro=2, state=state_pp, fsdp=True,
            min_size=1024)
        state_pp, metrics_pp = pp_step(
            state_pp, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        assert abs(float(metrics_ref["loss"]) - float(metrics_pp["loss"])) < 1e-5
        diffs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            state_ref.params, state_pp.params)
        assert max(jax.tree.leaves(diffs)) < 2e-4
        # outputs keep the FSDP at-rest sharding (donation-compatible)
        proj = state_pp.params["model"]["input_adapters_rgb"]["proj"]["kernel"]
        assert proj.sharding.spec != P()
    finally:
        _cleanup()


def test_pp_second_step_runs():
    """Two chained steps (donated state) through the pipeline."""
    params, tx, step_fn, batch = _build_setup()
    try:
        mesh = pp.create_pp_mesh(stage=2)
        state = TrainState.create(params=jax.tree.map(jnp.array, params), tx=tx)
        pp_step = pp.jit_pp(step_fn, mesh, n_micro=2)
        sharded = shard_batch(batch, mesh)
        state, m1 = pp_step(state, sharded, jax.random.PRNGKey(1))
        state, m2 = pp_step(state, sharded, jax.random.PRNGKey(2))
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
        assert float(m2["loss"]) != float(m1["loss"])
    finally:
        _cleanup()


def test_pp_depth_divisibility_error():
    params, tx, step_fn, batch = _build_setup()
    try:
        mesh = pp.create_pp_mesh(stage=8)  # tiny depth=2 % 8 != 0
        pp_step = pp.jit_pp(step_fn, mesh, n_micro=1)
        with pytest.raises(ValueError, match="not divisible"):
            state = TrainState.create(
                params=jax.tree.map(jnp.array, params), tx=tx)
            pp_step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    finally:
        _cleanup()


def test_pp_microbatch_divisibility_error():
    params, tx, step_fn, batch = _build_setup()
    try:
        mesh = pp.create_pp_mesh(stage=2)  # data 4; B=8 -> local 2
        pp_step = pp.jit_pp(step_fn, mesh, n_micro=3)  # 8 % (4*3) != 0
        with pytest.raises(ValueError, match="not divisible"):
            state = TrainState.create(
                params=jax.tree.map(jnp.array, params), tx=tx)
            pp_step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))
    finally:
        _cleanup()


def test_pp_eval_allows_per_block_drop_path():
    """MultiMAE assigns drop_path_rate per-block via linspace whenever
    the model rate is nonzero (models/multimae.py), so the homogeneity
    check must not compare drop_path_rate: in eval drop_path is a no-op
    and the pipelined trace must (a) pass and (b) match the sequential
    forward; in train the nonzero-rate guard still rejects it
    (round-4 advisor finding on pp.py)."""
    from test_train_step import build_tiny, make_batch

    model = build_tiny(depth=2, drop_path_rate=0.1)
    batch = make_batch()
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    params = model.init(rngs, batch, num_encoded_tokens=24)["params"]

    def fwd(p, b, train):
        preds, masks = model.apply(
            {"params": p}, b, num_encoded_tokens=24, train=train,
            rngs={"masking": jax.random.PRNGKey(2)},
        )
        return preds

    try:
        _cleanup()
        ref = jax.jit(lambda p, b: fwd(p, b, False))(params, batch)

        mesh = pp.create_pp_mesh(stage=2)  # (data 4, stage 2)
        pp.use_pipeline(mesh, 1)
        use_constraint_mesh(mesh)
        out = jax.jit(lambda p, b: fwd(p, b, False))(
            params, shard_batch(batch, mesh))
        for (ka, a), (kb, b) in zip(
            sorted(ref.items()), sorted(out.items())
        ):
            assert ka == kb
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, err_msg=ka)

        # train=True still fails loudly: stochastic depth would need
        # (stage, tick) rng folding through the schedule.
        with pytest.raises(ValueError, match="drop/attn_drop/drop_path"):
            jax.jit(lambda p, b: fwd(p, b, True))(
                params, shard_batch(batch, mesh))
    finally:
        _cleanup()
