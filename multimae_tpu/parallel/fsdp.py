"""FSDP-style parameter/optimizer sharding over the data axis.

The reference only has DDP (SURVEY.md §2.4); this is the TPU-native
scaling extension: every large tensor (params AND Adam moments) is
sharded along its largest divisible axis over the 'data' mesh dimension,
and GSPMD inserts the all-gathers (use) / reduce-scatters (grads)
automatically inside the jitted step — the JAX analogue of ZeRO-3.

Usage: pass `fsdp=True` to the step jitters, or build shardings with
`fsdp_shardings(tree, mesh)` and feed them to jax.jit in/out_shardings.
Small tensors (< min_size elements) stay replicated — gathering them
costs more than the memory saved.

On a hybrid ('dcn', 'data', 'model') mesh (mesh.create_hybrid_mesh),
params shard over the INNER 'data' axis only — the per-step parameter
all-gathers stay on ICI inside one slice; only the plain gradient
reduction crosses DCN. The batch still shards over ('dcn', 'data').
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimae_tpu.parallel.mesh import DATA_AXIS, data_sharding


def _leaf_spec(shape, mesh_size: int, min_size: int) -> P:
    if np.prod(shape, dtype=np.int64) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in order:
        if shape[d] % mesh_size == 0 and shape[d] >= mesh_size:
            return P(*[DATA_AXIS if i == d else None for i in range(len(shape))])
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh, min_size: int = 2**15) -> Any:
    """Per-leaf NamedShardings: large leaves sharded over 'data'."""
    n = mesh.shape[DATA_AXIS]

    def to_sharding(leaf):
        shape = np.shape(leaf)
        if not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(shape, n, min_size))

    return jax.tree.map(to_sharding, tree)


def shard_state_fsdp(state, mesh: Mesh, min_size: int = 2**15):
    """Place an existing TrainState according to FSDP shardings."""
    shardings = fsdp_shardings(state, mesh, min_size)
    return jax.tree.map(jax.device_put, state, shardings)


def jit_fsdp(train_step, state, mesh: Mesh, min_size: int = 2**15):
    """jit the step with FSDP state shardings + batch sharded on 'data'."""
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    use_constraint_mesh(mesh)
    state_sh = fsdp_shardings(state, mesh, min_size)
    data_sh = data_sharding(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
