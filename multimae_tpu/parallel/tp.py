"""Tensor parallelism (Megatron-style) over the 'model' mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.4 — DDP only);
this is the TPU-native scaling extension for encoders too big or too
slow for one chip (ViT-L/H at 512px, serving). Design is the GSPMD
recipe, not hand-written collectives:

  * model code pins the HEAD dim of q/k/v and the MLP HIDDEN dim to the
    'model' axis (`mesh.constrain_tp`, called inside vit.py Attention /
    CrossAttention / Mlp — a no-op on 1-D meshes);
  * this module shards the clean column/row weight dims over 'model'
    (fc1 column-parallel, fc2 / attn-proj row-parallel);
  * XLA partitions the GEMMs and inserts exactly Megatron's two psums
    per block (after attn proj, after fc2) over ICI.

The fused qkv kernel stays replicated: its packed (3, H, Dh) output
layout has no contiguous 'model' split, and with a replicated weight the
head-sliced q/k/v are local slices — no collective. Pallas kernels under
model>1: short_attention runs on local (batch, head) slices via
mesh.bnhd_shard_map at TP-scoped sites (attention needs no collective);
the fused decoder/MLP kernels live outside the TP scopes and replicate
over 'model' like the XLA path; only the eval fused_block falls back to
XLA (its fusion spans both Megatron psum points — see its `enabled()`).

Compose with data parallelism by building `create_mesh(model=k)`:
devices factor as (data, model) with 'model' innermost, i.e. adjacent
devices (same ICI hop) form the tensor-parallel groups. Pass
`fsdp=True` (CLI: --fsdp --model_parallel k) to additionally shard
every large param/moment leaf over 'data' (ZeRO-3 x Megatron).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimae_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    TP_SCOPE_RE,
    data_sharding,
)

# Weight shardings below and activation constraints (mesh.constrain_tp,
# called with the flax module path from vit.py) must cover the SAME
# scopes — a sharded weight with unconstrained activations reshards its
# GEMM; a constrained activation with replicated weights buys collectives
# for nothing.
_ENCODER_RE = TP_SCOPE_RE


def _tp_leaf_spec(path, shape, n_model: int) -> P:
    """'model'-axis spec for one param/moment leaf (P() if not sharded).

    Only encoder-block weights with clean contiguous splits are sharded:
      mlp/fc1 kernel (D, hidden)   -> P(None, 'model')   column-parallel
      mlp/fc1 bias   (hidden,)     -> P('model')
      mlp/fc2 kernel (hidden, D)   -> P('model', None)   row-parallel
      attn/proj kernel (D, D)      -> P('model', None)   row-parallel
    (attn/proj rows are the H*Dh contraction dim: head-major, so the
    head sharding of the attention output maps onto contiguous rows.)
    """
    names = [str(p) for p in path]
    if not any(_ENCODER_RE.match(n) for n in names):
        return P()
    leaf = names[-1]
    if "mlp" in names and "fc1" in names:
        if leaf == "kernel" and len(shape) == 2 and shape[1] % n_model == 0:
            return P(None, MODEL_AXIS)
        if leaf == "bias" and len(shape) == 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS)
        return P()
    if "mlp" in names and "fc2" in names and leaf == "kernel":
        if len(shape) == 2 and shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
        return P()
    if "attn" in names and "proj" in names and leaf == "kernel":
        if len(shape) == 2 and shape[0] % n_model == 0:
            return P(MODEL_AXIS, None)
        return P()
    return P()


def _add_fsdp_axis(spec: P, shape, n_data: int, min_size: int) -> P:
    """Compose a ZeRO-3 'data'-axis shard onto an existing (possibly
    'model'-sharded) spec: the largest axis not already taken by
    'model' and divisible by the data-group size gets DATA_AXIS. Small
    leaves stay as-is (gathering them costs more than the memory
    saved — same policy as parallel/fsdp.py)."""
    if np.prod(shape, dtype=np.int64) < min_size:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    order = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in order:
        if dims[d] is None and shape[d] % n_data == 0 and shape[d] >= n_data:
            dims[d] = DATA_AXIS
            return P(*dims)
    return spec


def tp_state_shardings(state, mesh: Mesh, fsdp: bool = False,
                       min_size: int = 2**15) -> Any:
    """Per-leaf NamedShardings for a TrainState under a (data, model)
    mesh: encoder block weights (and their congruent Adam moments, EMA
    copies) sharded over 'model'; everything else replicated. With
    `fsdp=True`, every large leaf is ADDITIONALLY sharded over 'data'
    on its largest free axis (ZeRO-3 x Megatron 2-D sharding: GSPMD
    all-gathers params over 'data' at use and reduce-scatters their
    grads, while the block GEMMs stay partitioned over 'model')."""
    from jax.tree_util import tree_map_with_path

    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]

    def to_sharding(path_keys, leaf):
        path = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path_keys
        )
        shape = np.shape(leaf)
        if not shape:
            return NamedSharding(mesh, P())
        spec = _tp_leaf_spec(path, shape, n_model)
        if fsdp and n_data > 1:
            spec = _add_fsdp_axis(spec, shape, n_data, min_size)
        return NamedSharding(mesh, spec)

    return tree_map_with_path(to_sharding, state)


def shard_state_tp(state, mesh: Mesh, fsdp: bool = False,
                   min_size: int = 2**15):
    """Place an existing TrainState according to TP(+FSDP) shardings."""
    shardings = tp_state_shardings(state, mesh, fsdp=fsdp,
                                   min_size=min_size)
    return jax.tree.map(jax.device_put, state, shardings)


def jit_tp(train_step, state, mesh: Mesh, fsdp: bool = False,
           min_size: int = 2**15):
    """jit the step tensor-parallel: batch sharded on 'data', encoder
    weights sharded on 'model', activations partitioned by the in-model
    constraints (mesh.constrain_tp). `fsdp=True` composes ZeRO-3
    parameter/moment sharding over 'data' on top (--fsdp
    --model_parallel k on the pretrain CLI).

    No sequence-parallel variant: a Megatron-SP formulation was built
    and removed — the SPMD partitioner emitted no reduce-scatters for
    it and the collective mix got strictly worse (see the dead-end note
    in parallel/mesh.py)."""
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    assert mesh.shape[MODEL_AXIS] > 1, "use jit_data_parallel for model=1"
    use_constraint_mesh(mesh)
    state_sh = tp_state_shardings(state, mesh, fsdp=fsdp,
                                  min_size=min_size)
    data_sh = data_sharding(mesh)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
