"""Worker for tests/test_multiprocess.py: one of two real jax.distributed
processes on localhost (4 virtual CPU devices each).

Exercises the code paths that are no-ops at process_count()==1 —
`initialize_distributed` (all launcher branches), SmoothedValue's
cross-process sync (reference utils/logger.py:42-53), the semseg
confusion-matrix allgather merge (reference utils/dist.py:96-159), and
`local_batch_slice` disjointness (reference DistributedSampler
semantics, run_pretraining_multimae.py:341).

Invoked with env preset by the parent test; prints "MP_OK <rank>" on
success so the parent can assert both ranks completed.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from multimae_tpu.parallel import mesh as mesh_lib  # noqa: E402

# MUST run before anything touches the backend.
mesh_lib.initialize_distributed()


def main():
    quick = os.environ.get("MP_QUICK") == "1"
    assert jax.process_count() == 2, jax.process_count()
    rank = jax.process_index()
    assert jax.device_count() == 8 and len(jax.local_devices()) == 4

    if quick:
        # Launcher-discovery variants only check the bootstrap wiring.
        print(f"MP_OK {rank}", flush=True)
        return

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    # 1. SmoothedValue cross-process sync (rank0: 1 value of 1.0,
    # rank1: 2 values of 2.0 -> global count 3, total 5).
    from multimae_tpu.utils.logger import SmoothedValue

    sv = SmoothedValue()
    sv.update(float(rank + 1), n=rank + 1)
    sv.synchronize_between_processes()
    assert sv.count == 3, sv.count
    assert abs(sv.total - 5.0) < 1e-9, sv.total
    assert abs(sv.global_avg - 5.0 / 3.0) < 1e-9

    # 2. Semseg eval confusion-matrix merge: allgather + sum, exactly the
    # cli/run_finetuning_semseg.py eval pattern.
    cm_local = np.full((3, 3), rank + 1, np.float32)
    cm = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(cm_local))
    ).sum(axis=0)
    assert cm.shape == (3, 3) and (cm == 3.0).all(), cm

    # 3. local_batch_slice: both ranks' slices tile [0, B) disjointly.
    sl = mesh_lib.local_batch_slice(8)
    assert sl.stop - sl.start == 4
    bounds = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray([sl.start, sl.stop], jnp.int32)
        )
    )
    segs = sorted((int(a), int(b)) for a, b in bounds)
    assert segs[0] == (0, 4) and segs[1] == (4, 8), segs

    # 4. Checkpoint round-trip with CROSS-PROCESS sharded state (the
    # multi-host FSDP/TP layout): params are not fully addressable, so
    # save_checkpoint's collective gather must run on every rank before
    # rank 0 serializes; per-process extras (grain iterator position)
    # go to per-rank sidecars and each rank restores its OWN copy.
    ckpt_dir = os.environ.get("MP_CKPT_DIR")
    if ckpt_dir:
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from multimae_tpu.parallel.mesh import create_mesh
        from multimae_tpu.train.checkpoint import (
            load_checkpoint,
            save_checkpoint,
        )
        from multimae_tpu.train.train_state import TrainState

        mesh = create_mesh()
        w_global = np.arange(16.0, dtype=np.float32).reshape(16, 1)
        w = jax.make_array_from_callback(
            (16, 1), NamedSharding(mesh, P("data", None)),
            lambda idx: w_global[idx],
        )
        assert not w.is_fully_addressable  # the case under test
        tx = optax.sgd(0.1)
        state = TrainState.create(params={"w": w}, tx=tx)
        my_iter_state = f"grain-pos-rank{rank}".encode()
        save_checkpoint(ckpt_dir, 0, state,
                        extras={"data_iter_state": my_iter_state})
        multihost_utils.sync_global_devices("ckpt written")

        template = TrainState.create(
            params={"w": np.zeros((16, 1), np.float32)}, tx=tx)
        st2, epoch, ex = load_checkpoint(
            os.path.join(ckpt_dir, "checkpoint-0.msgpack"),
            template, with_extras=True)
        assert epoch == 0
        np.testing.assert_array_equal(np.asarray(st2.params["w"]), w_global)
        assert bytes(ex["data_iter_state"]) == my_iter_state, ex

        # Same round-trip through the orbax backend: each host writes
        # its own shards (no gather), both ranks restore the global
        # values plus their own per-rank extras sidecar.
        save_checkpoint(ckpt_dir, 1, state,
                        extras={"data_iter_state": my_iter_state},
                        backend="orbax")
        multihost_utils.sync_global_devices("orbax ckpt written")
        st3, epoch3, ex3 = load_checkpoint(
            os.path.join(ckpt_dir, "checkpoint-1.orbax"),
            template, with_extras=True)
        assert epoch3 == 1
        np.testing.assert_array_equal(np.asarray(st3.params["w"]), w_global)
        assert bytes(ex3["data_iter_state"]) == my_iter_state, ex3

        # 4b. COORDINATED crash-safe auto-resume: rank 0 plants a
        # truncated newest save; both ranks must agree (process-0
        # validation + broadcast) to fall back to checkpoint-1.orbax.
        # Divergent per-rank fallbacks would feed mismatched states into
        # the next gradient all-reduce — the round-5 review finding.
        from multimae_tpu.train.checkpoint import auto_load_checkpoint

        if rank == 0:
            with open(os.path.join(ckpt_dir, "checkpoint-2.msgpack"),
                      "wb") as f:
                f.write(b"\x00" * 37)  # parses as 0 + trailing garbage
        multihost_utils.sync_global_devices("damaged ckpt planted")
        st4, start_epoch, ex4 = auto_load_checkpoint(
            ckpt_dir, template, with_extras=True)
        assert start_epoch == 2, start_epoch  # fell back to epoch 1
        np.testing.assert_array_equal(np.asarray(st4.params["w"]), w_global)
        assert bytes(ex4["data_iter_state"]) == my_iter_state, ex4

    # 5. Hybrid ICI x DCN mesh (parallel/mesh.create_hybrid_mesh):
    # slice auto-discovery groups devices by process -> 2 simulated
    # slices x 4 devices; a global-batch train step over the hybrid
    # mesh must equal the numpy reference, and FSDP shardings must stay
    # inside the slice ('data' axis only — never 'dcn').
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.parallel.fsdp import fsdp_shardings

    hmesh = mesh_lib.create_hybrid_mesh()
    assert dict(hmesh.shape) == {"dcn": 2, "data": 4, "model": 1}, hmesh
    for i in range(2):
        assert all(d.process_index == i for d in hmesh.devices[i].flat), (
            "slice rows must be single-process")

    w_np = np.linspace(-1.0, 1.0, 8, dtype=np.float32).reshape(8, 1)
    x_np = (np.arange(16 * 8, dtype=np.float32).reshape(16, 8) / 100.0)

    def hstep(w, x):
        def loss_fn(w):
            return ((x @ w) ** 2).mean()

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    data_sh = mesh_lib.data_sharding(hmesh)
    repl_h = NamedSharding(hmesh, P())
    x_h = jax.make_array_from_callback((16, 8), data_sh,
                                       lambda idx: x_np[idx])
    w_h = jax.make_array_from_callback((8, 1), repl_h,
                                       lambda idx: w_np[idx])
    w2, loss = jax.jit(
        hstep, in_shardings=(repl_h, data_sh),
        out_shardings=(repl_h, repl_h),
    )(w_h, x_h)
    y = x_np @ w_np
    loss_ref = float((y ** 2).mean())
    g_ref = (2.0 / y.size) * (x_np.T @ y)
    assert abs(float(loss) - loss_ref) < 1e-6 * max(1.0, abs(loss_ref))
    np.testing.assert_allclose(
        np.asarray(jax.device_get(w2)), w_np - 0.1 * g_ref,
        rtol=1e-5, atol=1e-7,
    )
    for sh in jax.tree.leaves(
        fsdp_shardings({"w": np.zeros((16, 8), np.float32)}, hmesh,
                       min_size=1)
    ):
        for entry in sh.spec:
            assert entry in (None, "data"), sh.spec

    print(f"MP_OK {rank}", flush=True)


if __name__ == "__main__":
    main()
