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

    print(f"MP_OK {rank}", flush=True)


if __name__ == "__main__":
    main()
