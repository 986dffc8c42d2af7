"""Hybrid ICI x DCN mesh ('dcn', 'data', 'model') on the simulated
8-device CPU mesh.

The reference's multi-node story is DDP over NCCL (utils/dist.py:62-93);
the TPU-native analogue for multi-slice pods is a hybrid mesh where only
plain batch data parallelism crosses the DCN links between slices, and
FSDP/TP collectives stay on ICI inside one slice
(parallel/mesh.create_hybrid_mesh). These tests simulate 2 slices x 4
devices on one host and check every composition against the
single-device step; tests/test_multiprocess.py adds the 2-real-process
leg where slice discovery uses device.process_index.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimae_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    MODEL_AXIS,
    batch_axes,
    create_hybrid_mesh,
    create_mesh,
    data_sharding,
    shard_batch,
    use_constraint_mesh,
)
from multimae_tpu.train.pretrain_step import jit_data_parallel
from multimae_tpu.train.train_state import TrainState
from test_tp import _build_setup


def test_create_hybrid_mesh_shapes():
    assert jax.device_count() >= 8, "conftest must simulate 8 cpu devices"
    mesh = create_hybrid_mesh(dcn=2)
    assert dict(mesh.shape) == {DCN_AXIS: 2, DATA_AXIS: 4, MODEL_AXIS: 1}
    mesh3 = create_hybrid_mesh(dcn=2, model=2)
    assert dict(mesh3.shape) == {DCN_AXIS: 2, DATA_AXIS: 2, MODEL_AXIS: 2}
    # batch axes resolve to the combined ('dcn', 'data') tuple...
    assert batch_axes(mesh) == (DCN_AXIS, DATA_AXIS)
    assert data_sharding(mesh).spec == P((DCN_AXIS, DATA_AXIS))
    # ...and stay plain 'data' on flat meshes
    flat = create_mesh()
    assert batch_axes(flat) == DATA_AXIS


def test_create_hybrid_mesh_slice_discovery_single_host():
    """Without an explicit dcn count, slices group by
    slice_index/process_index — one host = one slice."""
    mesh = create_hybrid_mesh()
    assert mesh.shape[DCN_AXIS] == 1
    assert mesh.shape[DATA_AXIS] == jax.device_count()


def test_explicit_dcn_groups_by_slice_topology(monkeypatch):
    """--dcn_data_parallel N on hardware that exposes slice topology must
    STILL group devices by slice_index — jax.devices() ordering is not
    guaranteed slice-major, and a contiguous split could put one slice's
    chips in different 'dcn' rows, routing FSDP/TP collectives over DCN
    (round-4 advisor finding on mesh.py)."""
    import multimae_tpu.parallel.mesh as mesh_lib

    class FakeTpu:
        platform = "tpu"

        def __init__(self, slice_index, i):
            self.slice_index = slice_index
            self.id = i

        def __repr__(self):
            return f"tpu(s{self.slice_index},{self.id})"

    # Worst case: slices interleaved in backend order.
    devs = [FakeTpu(i % 2, i) for i in range(8)]
    captured = {}

    def fake_mesh(arr, names):
        captured["arr"], captured["names"] = arr, names
        return "mesh"

    monkeypatch.setattr(mesh_lib, "Mesh", fake_mesh)
    assert mesh_lib.create_hybrid_mesh(dcn=2, devices=devs) == "mesh"
    arr = captured["arr"]
    assert arr.shape == (2, 4, 1) and captured["names"] == (
        DCN_AXIS, DATA_AXIS, MODEL_AXIS)
    for row in range(2):
        assert {d.slice_index for d in arr[row].ravel()} == {row}, arr

    # A count that disagrees with the discovered topology fails loudly
    # instead of silently splitting a slice across 'dcn' rows.
    with pytest.raises(AssertionError, match="slice topology wins"):
        mesh_lib.create_hybrid_mesh(dcn=4, devices=devs)


def test_hybrid_dp_matches_single():
    """2 slices x 4-way ICI data parallelism == the single-device step."""
    params, tx, step_fn, batch = _build_setup()
    try:
        use_constraint_mesh(None)
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = create_hybrid_mesh(dcn=2)
        state_h = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        from multimae_tpu.parallel.mesh import replicate

        state_h = state_h.replace(
            params=replicate(state_h.params, mesh),
            opt_state=replicate(state_h.opt_state, mesh),
        )
        h_step = jit_data_parallel(step_fn, mesh)
        state_h, metrics_h = h_step(
            state_h, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        np.testing.assert_allclose(
            float(metrics_h["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
        a = jax.tree.leaves(state_ref.params["model"])[0]
        b = jax.tree.leaves(state_h.params["model"])[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    finally:
        use_constraint_mesh(None)


def test_hybrid_fsdp_shards_inside_slice_and_matches_single():
    """--fsdp on a hybrid mesh: ZeRO-3 shards params over the INNER
    'data' axis only (param all-gathers on ICI; DCN carries only the
    gradient reduction), and the step matches single-device."""
    from multimae_tpu.parallel.fsdp import fsdp_shardings, jit_fsdp, shard_state_fsdp

    params, tx, step_fn, batch = _build_setup()
    try:
        use_constraint_mesh(None)
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = create_hybrid_mesh(dcn=2)  # (2, 4, 1)
        state_f = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_f = shard_state_fsdp(state_f, mesh, min_size=1)
        # every sharded leaf uses 'data' only — never 'dcn'
        for sh in jax.tree.leaves(fsdp_shardings(state_f, mesh, min_size=1)):
            for entry in sh.spec:
                assert entry in (None, DATA_AXIS), sh.spec
        qkv = state_f.params["model"]["encoder_0"]["attn"]["qkv"]["kernel"]
        assert DATA_AXIS in (qkv.sharding.spec or ()), qkv.sharding

        f_step = jit_fsdp(step_fn, state_f, mesh, min_size=1)
        state_f, metrics_f = f_step(
            state_f, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        np.testing.assert_allclose(
            float(metrics_f["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
        a = jax.tree.leaves(state_ref.params["model"])[0]
        b = jax.tree.leaves(state_f.params["model"])[0]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-5)
    finally:
        use_constraint_mesh(None)


def test_hybrid_tp_fsdp_matches_single():
    """Full composition on 2 simulated slices: dcn=2 x data=2 x model=2
    (Megatron TP inside the slice, ZeRO-3 over the slice's data group,
    plain DP over DCN)."""
    from multimae_tpu.parallel.tp import jit_tp, shard_state_tp

    params, tx, step_fn, batch = _build_setup()
    try:
        use_constraint_mesh(None)
        state_ref = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_ref, metrics_ref = jax.jit(step_fn)(
            state_ref, batch, jax.random.PRNGKey(7))

        mesh = create_hybrid_mesh(dcn=2, model=2)  # (2, 2, 2)
        state_h = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        state_h = shard_state_tp(state_h, mesh, fsdp=True, min_size=1)
        fc1 = state_h.params["model"]["encoder_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(DATA_AXIS, MODEL_AXIS), fc1.sharding

        h_step = jit_tp(step_fn, state_h, mesh, fsdp=True, min_size=1)
        state_h, metrics_h = h_step(
            state_h, shard_batch(batch, mesh), jax.random.PRNGKey(7))

        np.testing.assert_allclose(
            float(metrics_h["loss"]), float(metrics_ref["loss"]), rtol=1e-4)
        for path in (
            ("encoder_0", "attn", "qkv", "kernel"),
            ("encoder_1", "mlp", "fc1", "kernel"),
            ("encoder_0", "attn", "proj", "kernel"),
        ):
            a = state_ref.params["model"]
            b = state_h.params["model"]
            for k in path:
                a, b = a[k], b[k]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(jax.device_get(b)),
                rtol=5e-4, atol=2e-5, err_msg="/".join(path))
    finally:
        use_constraint_mesh(None)
