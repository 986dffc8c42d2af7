"""Device mesh construction and data-parallel sharding helpers.

Replaces the reference's torch.distributed/NCCL runtime (utils/dist.py):
there is no user-level collective code — we build a `jax.sharding.Mesh`,
annotate shardings, and XLA emits the gradient psums over ICI/DCN inside
the jitted train step.

Axes:
  * 'dcn'   — optional LEADING axis for multi-slice pods: pure data
              parallelism across slices/hosts connected by DCN (the
              TPU-native analogue of the reference's multi-node DDP,
              utils/dist.py:62-93). Only plain batch sharding crosses
              it — gradient all-reduces hierarchically reduce inside a
              slice over ICI first, then once over DCN.
  * 'data'  — batch sharding (the reference's only parallelism, DDP;
              utils/dist.py:87-92). FSDP (ZeRO-3) shards params over
              THIS axis only, so parameter all-gathers ride ICI.
  * 'model' — optional tensor-parallel axis (not required for parity;
              reserved so fsdp/tp variants can slot in without API churn)

Flat meshes are ('data', 'model'); `create_hybrid_mesh` prepends 'dcn'.
Batch tensors shard dim 0 over the combined ('dcn', 'data') axes —
every helper below resolves that through `batch_axes(mesh)`, so model
and step code never hard-code the axis list.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh by default; optionally 2-D (data, model)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def create_hybrid_mesh(
    dcn: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('dcn', 'data', 'model') mesh for multi-slice pods.

    Devices are grouped by slice (device.slice_index when the runtime
    exposes it, else process_index) so that the 'data' and 'model' axes
    stay INSIDE one slice — their collectives (FSDP param all-gathers,
    Megatron psums) ride ICI — while only the plain gradient reduction
    of data parallelism crosses the slower DCN links, once, as the
    outer stage of a hierarchical all-reduce. This is the TPU-native
    analogue of the reference's multi-node DDP (utils/dist.py:62-93).

    `dcn` fixes the slice count. On hardware that exposes slice
    topology the device list is STILL grouped by slice (and the
    discovered count must equal `dcn`) — jax.devices() ordering is not
    guaranteed slice-major, and a contiguous split could put one
    slice's chips in different 'dcn' rows, silently routing FSDP/TP
    collectives over DCN. Only when no topology is visible (CPU
    simulation with one process) does the list fall back to `dcn`
    equal contiguous groups.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)

    # Group by the runtime's slice topology. On TPU, slice_index
    # varies across DCN-connected slices but NOT across the hosts
    # of one (multi-host) slice — those are one ICI domain and must
    # stay in one group. On CPU (tests / simulation) slice_index is
    # constant, so fall back to process_index: separate processes
    # are the simulated DCN boundary.
    def key_fn(d):
        if d.platform != "cpu":
            return getattr(d, "slice_index", 0) or 0
        return d.process_index

    groups: dict = {}
    for d in devices:
        groups.setdefault(key_fn(d), []).append(d)
    ordered = [groups[k] for k in sorted(groups)]
    if dcn is None:
        dcn = len(ordered)
    if len(ordered) > 1:
        # Real topology discovered: honor it even with an explicit dcn
        # (which must then agree), so 'data'/'model' stay on ICI.
        assert len(ordered) == dcn, (
            f"--dcn_data_parallel {dcn} != {len(ordered)} discovered "
            f"slices/processes; the slice topology wins — pass the real "
            f"count (or omit it)")
        sizes = {len(g) for g in ordered}
        assert len(sizes) == 1, f"unequal slice sizes {sizes}"
        devices = [d for g in ordered for d in g]
    # else: single visible group (e.g. 1-process CPU simulation of a
    # multi-slice pod) — keep backend order, split contiguously below.
    assert n % dcn == 0, f"{n} devices not divisible into {dcn} slices"
    per_slice = n // dcn
    if data is None:
        data = per_slice // model
    assert dcn * data * model == n, (
        f"mesh {dcn}x{data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(dcn, data, model)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Optional[Mesh]):
    """The mesh axes a batch dim shards over: ('dcn', 'data') on hybrid
    meshes, plain 'data' otherwise. Usable directly as one entry of a
    PartitionSpec."""
    if mesh is not None and DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading dim sharded over 'data' (x 'dcn')."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


# --- batch-sharding constraints inside traced model code ---------------
#
# GSPMD occasionally mis-propagates shardings through reshape/transpose
# chains (measured: the semseg tokenize patchify transposes drew
# "[SPMD] Involuntary full rematerialization" warnings under an 8-way
# data mesh — the compiler replicated the tensor to reshard). Model code
# calls `constrain_batch_sharded` on such intermediates; it is a no-op
# unless a mesh has been registered for the current trace via
# `use_constraint_mesh` (the jit helpers do this).

_CONSTRAINT_MESH: Optional[Mesh] = None


def use_constraint_mesh(mesh: Optional[Mesh]):
    """Register the mesh that in-model batch constraints should target.
    Call before tracing/jitting; pass None to clear."""
    global _CONSTRAINT_MESH
    _CONSTRAINT_MESH = mesh


def constrain_batch_sharded(x):
    """Pin an intermediate to batch-dim sharding (dim 0 over 'data').

    A layout HINT, not a requirement: skipped when the (global) batch
    dim is not divisible by the data axis — e.g. eager/odd-batch runs
    traced after a mesh was registered by an earlier jit helper."""
    if _CONSTRAINT_MESH is None:
        return x
    n_data = constraint_data_size()
    if n_data <= 1 or x.shape[0] % n_data:
        return x
    spec = P(batch_axes(_CONSTRAINT_MESH), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_CONSTRAINT_MESH, spec)
    )


def constraint_data_size() -> int:
    """Total batch-sharding ways of the registered constraint mesh —
    data x dcn on hybrid meshes (1 if no mesh is registered)."""
    if _CONSTRAINT_MESH is None:
        return 1
    return int(_CONSTRAINT_MESH.shape.get(DATA_AXIS, 1)
               * _CONSTRAINT_MESH.shape.get(DCN_AXIS, 1))


def constraint_model_size() -> int:
    """Size of the model (tensor-parallel) axis of the registered
    constraint mesh (1 if no mesh is registered)."""
    if _CONSTRAINT_MESH is None:
        return 1
    return int(_CONSTRAINT_MESH.shape.get(MODEL_AXIS, 1))


# Module scopes whose weights parallel/tp.py shards over 'model'. The
# activation constraints below only apply inside these scopes: pinning a
# replicated-weight scope (the decoders, the adapters) to 'model' would
# make GSPMD reshard every op in and out of the axis — a flood of
# collectives with no partitioned GEMM to pay for them (measured: the
# unscoped version took the 8-virtual-device CPU dryrun from minutes to
# a stuck all-reduce rendezvous past a 15-minute timeout).
TP_SCOPE_RE = re.compile(r"^(encoder|blocks)_\d+$")


def constrain_tp(x, dim: int, path: Optional[Sequence[str]] = None):
    """Pin activation dim `dim` over the 'model' axis (tensor parallelism).

    The Megatron recipe, GSPMD-style: instead of hand-splitting weights
    and inserting collectives, model code marks the head dim of q/k/v and
    the MLP hidden dim as 'model'-sharded; XLA partitions the adjacent
    GEMMs column-parallel (free: the producing weights are replicated or
    column-sharded, each device computes its slice locally) and makes
    the following contraction row-parallel (one psum per attention/MLP
    exit — exactly Megatron's two all-reduces per block). No-op unless a
    mesh with model>1 is registered and the dim divides; dim 0 (batch)
    is additionally pinned to 'data' when divisible.

    `path` (a flax `module.path`) scopes the constraint to the module
    scopes whose weights are actually 'model'-sharded (TP_SCOPE_RE —
    mirrored by tp.py's leaf-spec rules); elsewhere it is a no-op."""
    n = constraint_model_size()
    if n <= 1 or x.shape[dim] % n:
        return x
    if path is not None and not any(TP_SCOPE_RE.match(str(p)) for p in path):
        return x
    spec = [None] * x.ndim
    spec[dim] = MODEL_AXIS
    n_data = constraint_data_size()
    if dim != 0 and n_data > 1 and x.shape[0] % n_data == 0:
        spec[0] = batch_axes(_CONSTRAINT_MESH)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_CONSTRAINT_MESH, P(*spec))
    )


# Sequence parallelism: MEASURED DEAD END under GSPMD (2026-08-17).
# A Megatron-SP formulation (encoder residual stream token-sharded over
# 'model' via with_sharding_constraint at block entry / residual adds /
# the row-parallel proj+fc2 outputs, composing with constrain_tp) was
# built, numerically verified against the single-device step at
# (4,2)x32 tokens, and compile-inspected: the jax-0.9.0 SPMD partitioner
# emitted ZERO reduce-scatters for the pattern — block exits stayed
# all-reduce and every SP re-shard lowered to all-gather/dynamic-slice
# pairs. fwd+bwd collective mix for a 2-block encoder at divisible
# ntok=96, TP vs TP+SP: all-reduce 61 -> 134, all-gather 10 -> 32,
# dynamic-slice 72 -> 512. Strictly worse at the HLO level, so the
# implementation was removed rather than shipped as a footgun knob.
# (Also: with_sharding_constraint requires the token dim to divide the
# axis, and MultiMAE's natural lengths — 99/197/2049, patch tokens + 1
# global — are odd.) Revisit only if GSPMD grows a reduce-scatter
# creation pass for constraint-derived partial sums.


def data_shard_map(fn, n_data_args: int = 2):
    """Run a per-sample-independent fn per-device over the data axis.

    GSPMD replicates opaque custom calls (Pallas kernels) instead of
    partitioning them, which would gather the whole global batch onto
    every chip. shard_map pins batch-dim partitioning: the first
    `n_data_args` operands split on dim 0 over 'data', the final
    (weights) argument replicated (FSDP-sharded params all-gather, and
    their cotangents psum, exactly as GSPMD would). Identity when no
    multi-device data mesh is registered (single chip, eager, CPU
    tests)."""
    from multimae_tpu.parallel import pp

    if constraint_data_size() <= 1 or pp.inside_stage():
        # Inside a pipeline-stage shard_map body the data is already
        # per-device local — nesting another shard_map would error.
        return fn
    from jax import shard_map

    bspec = P(batch_axes(_CONSTRAINT_MESH))
    return shard_map(
        fn, mesh=_CONSTRAINT_MESH,
        in_specs=tuple(bspec for _ in range(n_data_args)) + (P(),),
        out_specs=bspec,
        check_vma=False,
    )


def bnhd_shard_map(fn, tp_scoped: bool = False):
    """shard_map for per-(sample, head)-independent BNHD attention
    kernels (ops/short_attention_pallas): batch over 'data' and — for
    TP-scoped call sites where q/k/v heads are 'model'-sharded
    (Megatron, constrain_tp) — heads over 'model'. Attention is
    embarrassingly parallel over (sample, head), so the kernel needs no
    collective either way; without this wrapper GSPMD would replicate
    the opaque custom call and gather the global batch onto every chip
    (SCALING.md rule 3). Identity when no multi-device mesh is
    registered. Non-TP-scoped sites under a 2-D mesh replicate over
    'model' (same as the XLA path: no weight there is model-sharded)."""
    from multimae_tpu.parallel import pp

    if _CONSTRAINT_MESH is None or pp.inside_stage():
        return fn
    nd = constraint_data_size()
    nm = constraint_model_size() if tp_scoped else 1
    if nd <= 1 and nm <= 1:
        return fn
    from jax import shard_map

    spec = P(batch_axes(_CONSTRAINT_MESH) if nd > 1 else None, None,
             MODEL_AXIS if nm > 1 else None, None)
    return shard_map(
        fn, mesh=_CONSTRAINT_MESH,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False,
    )


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch onto the mesh, sharded along the batch dim."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """rank-0 gating (reference utils/dist.py:46-59)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """Each host feeds its slice of the global batch (replaces
    DistributedSampler sharding, reference run_pretraining_multimae.py:341)."""
    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


_DIST_INITIALIZED = False


def initialize_distributed():
    """Multi-host init (no-op single-host). Mirrors the reference's rank
    bootstrap (utils/dist.py:62-93: env://, OpenMPI-on-ITP, SLURM) —
    every launcher the reference discovers resolves here to ONE
    `jax.distributed.initialize()` call; all collectives thereafter are
    GSPMD-inserted over ICI/DCN (no user-level comm code).

    Launchers recognized:
      * env:// equivalent — `JAX_COORDINATOR_ADDRESS` (+
        `JAX_NUM_PROCESSES`/`JAX_PROCESS_ID`), the TPU-pod standard.
      * reference `--dist_on_itp` — OpenMPI ranks + explicit
        MASTER_ADDR/MASTER_PORT (utils/dist.py:62-70).
      * SLURM (`SLURM_PROCID` et al., utils/dist.py:75-77) and
        mpirun/mpiexec (`OMPI_MCA_orte_hnp_uri`) — via jax's built-in
        cluster auto-detection.
    Anything else: single-process ("Not using distributed mode").

    Must run before any other jax API touches the backend.
    """
    global _DIST_INITIALIZED
    import os

    if _DIST_INITIALIZED:
        return
    env = os.environ
    slurm_vars = ("SLURM_JOB_ID", "SLURM_STEP_NODELIST", "SLURM_NTASKS",
                  "SLURM_PROCID", "SLURM_LOCALID")
    if env.get("JAX_COORDINATOR_ADDRESS"):
        # jax reads the address itself but (as of 0.9) NOT the process
        # count/id env vars — pass them through when present, else leave
        # them to cluster auto-detection (e.g. TPU pod metadata).
        nproc = env.get("JAX_NUM_PROCESSES")
        pid = env.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    elif (env.get("OMPI_COMM_WORLD_RANK")
          and env.get("MASTER_ADDR") and env.get("MASTER_PORT")):
        jax.distributed.initialize(
            coordinator_address=f"{env['MASTER_ADDR']}:{env['MASTER_PORT']}",
            num_processes=int(env["OMPI_COMM_WORLD_SIZE"]),
            process_id=int(env["OMPI_COMM_WORLD_RANK"]),
        )
    elif all(v in env for v in slurm_vars) and int(env["SLURM_NTASKS"]) > 1:
        jax.distributed.initialize()  # jax SlurmCluster discovery
    elif env.get("OMPI_MCA_orte_hnp_uri"):
        jax.distributed.initialize()  # jax OmpiCluster (mpirun/mpiexec)
    else:
        return
    _DIST_INITIALIZED = True
