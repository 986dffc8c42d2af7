"""Cross-topology checkpoint restore (round-4 verdict item 2).

The reference's single .pth is trivially elastic — any world size can
load it (utils/checkpoint.py:103-152). A pod framework whose sharded
checkpoints only restore onto the identical topology would be weaker
than the thing it replaces, so these tests pin the elasticity matrix:
state saved under fsdp / tp x fsdp sharding on the 8-device mesh
restores onto a 4-device dp mesh (and vice versa), through BOTH
backends, and training continues on the new topology. The 2-process
orbax save -> 1-process restore leg ("evacuate a pod to one host")
lives in tests/test_multiprocess.py. Supported matrix: SCALING.md.

Mechanically this works because both save paths write topology-free
payloads — msgpack gathers to host numpy before serializing, and the
orbax restore path gathers to numpy before the template-preserving
merge (train/checkpoint.py load_checkpoint) — and the CLIs re-shard
AFTER load (resume happens before shard_state_*). These tests keep
that property honest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimae_tpu.parallel.fsdp import jit_fsdp, shard_state_fsdp
from multimae_tpu.parallel.mesh import (
    create_mesh,
    replicate,
    shard_batch,
    use_constraint_mesh,
)
from multimae_tpu.parallel.tp import jit_tp, shard_state_tp
from multimae_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from multimae_tpu.train.pretrain_step import jit_data_parallel
from multimae_tpu.train.train_state import TrainState
from test_tp import _build_setup


@pytest.fixture(autouse=True)
def _clear_mesh():
    use_constraint_mesh(None)
    yield
    use_constraint_mesh(None)


def _fresh_state(params, tx):
    return TrainState.create(params=jax.tree.map(jnp.array, params), tx=tx)


def _assert_states_equal(a, b, atol=0.0):
    for name in ("params", "opt_state"):
        for x, y in zip(jax.tree.leaves(getattr(a, name)),
                        jax.tree.leaves(getattr(b, name))):
            np.testing.assert_allclose(
                np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y)),
                atol=atol, err_msg=name)
    assert int(a.step) == int(b.step)


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_fsdp8_save_restores_onto_dp4(tmp_path, backend):
    """ZeRO-3 state sharded over 8 devices -> checkpoint -> restore onto
    a 4-device plain-dp mesh; one more step runs there."""
    params, tx, step_fn, batch = _build_setup()
    mesh8 = create_mesh()  # (8, 1)
    state = shard_state_fsdp(_fresh_state(params, tx), mesh8, min_size=1)
    f_step = jit_fsdp(step_fn, state, mesh8, min_size=1)
    state, _ = f_step(state, shard_batch(batch, mesh8), jax.random.PRNGKey(3))
    use_constraint_mesh(None)
    save_checkpoint(str(tmp_path), 0, state, backend=backend)

    mesh4 = create_mesh(devices=jax.devices()[:4])  # (4, 1)
    template = _fresh_state(params, tx)
    restored, epoch = load_checkpoint(
        str(tmp_path / f"checkpoint-0.{backend}"), template)
    assert epoch == 0
    _assert_states_equal(restored, state)

    restored = restored.replace(
        params=replicate(restored.params, mesh4),
        opt_state=replicate(restored.opt_state, mesh4),
    )
    d_step = jit_data_parallel(step_fn, mesh4)
    restored, metrics = d_step(
        restored, shard_batch(batch, mesh4), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(restored.step) == 2


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_tp_fsdp_save_restores_onto_dp4(tmp_path, backend):
    """Megatron TP(2) x ZeRO-3 2-D-sharded state -> checkpoint ->
    4-device dp restore + step."""
    params, tx, step_fn, batch = _build_setup()
    mesh = create_mesh(model=2)  # (4, 2)
    state = shard_state_tp(_fresh_state(params, tx), mesh, fsdp=True,
                           min_size=1)
    t_step = jit_tp(step_fn, state, mesh, fsdp=True, min_size=1)
    state, _ = t_step(state, shard_batch(batch, mesh), jax.random.PRNGKey(3))
    use_constraint_mesh(None)
    save_checkpoint(str(tmp_path), 0, state, backend=backend)

    mesh4 = create_mesh(devices=jax.devices()[:4])
    restored, _ = load_checkpoint(
        str(tmp_path / f"checkpoint-0.{backend}"), _fresh_state(params, tx))
    _assert_states_equal(restored, state)

    restored = restored.replace(
        params=replicate(restored.params, mesh4),
        opt_state=replicate(restored.opt_state, mesh4),
    )
    restored, metrics = jit_data_parallel(step_fn, mesh4)(
        restored, shard_batch(batch, mesh4), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_dp4_save_restores_onto_fsdp8(tmp_path, backend):
    """The scale-UP direction: a 4-device dp checkpoint restores onto
    the 8-device ZeRO-3 layout (load first, shard after — the CLI
    ordering) and training continues sharded."""
    params, tx, step_fn, batch = _build_setup()
    mesh4 = create_mesh(devices=jax.devices()[:4])
    state = _fresh_state(params, tx)
    state = state.replace(params=replicate(state.params, mesh4),
                          opt_state=replicate(state.opt_state, mesh4))
    d_step = jit_data_parallel(step_fn, mesh4)
    state, _ = d_step(state, shard_batch(batch, mesh4), jax.random.PRNGKey(3))
    use_constraint_mesh(None)
    save_checkpoint(str(tmp_path), 0, state, backend=backend)

    mesh8 = create_mesh()
    restored, _ = load_checkpoint(
        str(tmp_path / f"checkpoint-0.{backend}"), _fresh_state(params, tx))
    _assert_states_equal(restored, state)
    restored = shard_state_fsdp(restored, mesh8, min_size=1)
    f_step = jit_fsdp(step_fn, restored, mesh8, min_size=1)
    restored, metrics = f_step(
        restored, shard_batch(batch, mesh8), jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    assert int(restored.step) == 2
