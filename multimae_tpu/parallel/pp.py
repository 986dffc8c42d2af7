"""Pipeline parallelism (GPipe-style) over the 'stage' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.4 — DDP only);
this is the TPU-native scaling extension for encoders deeper than one
chip's HBM or for pod topologies where tensor parallelism has exhausted
the all-reduce-friendly ICI neighborhood. Design is the TPU pipelining
recipe (jax-ml scaling-book), not a port of torch pipe APIs:

  * the encoder's L blocks are split into S contiguous stages
    (L % S == 0); each stage's block weights are stacked along a
    leading layer axis and `shard_map` places one stage per device
    along the 'stage' mesh axis;
  * the (local) batch is split into M microbatches; a `lax.scan` over
    M + S - 1 ticks runs the classic GPipe schedule — stage s works on
    microbatch t - s at tick t, activations hop one stage per tick via
    `lax.ppermute` over ICI;
  * the backward pipeline is NOT hand-written: jax transposes the scan
    (reverse-tick scan) and each `ppermute` (inverted permutation), so
    `jax.grad` of the pipelined forward IS the reverse pipeline, bubble
    for bubble;
  * everything outside the encoder trunk (input adapters, decoders,
    losses, optimizer) runs replicated over 'stage' and sharded over
    'data' exactly as in plain data parallelism.

Storage note: the TrainState keeps its canonical per-block layout
(`encoder_{i}` subtrees, replicated at rest) so checkpoints, EMA, and
the torch-interop key mapping are identical across dp/fsdp/tp/pp; the
stack + stage-slice happens inside the jitted step (a few-hundred-MB
HBM copy at ViT-B scale, ~0.4 ms — invisible next to the block GEMMs).
The production memory-scaling variant (stacked at-rest storage sharded
over 'stage') only changes `_stack_blocks` and the checkpoint codec,
not the schedule.

Bubble fraction is the GPipe (S-1)/(M+S-1); pick M ≥ 2S (CLI:
--pipeline_microbatches) to keep it under a third.  Equivalence with
the sequential encoder is exact (same block ops, same order per
microbatch) — tested against the single-device step in
tests/test_pp.py on the simulated 8-device CPU mesh.

Reference parity anchor: the encoder loop being pipelined is
/root/reference/multimae/multimae.py:375 (`self.encoder(input_tokens)`)
— an nn.Sequential of Blocks (multimae.py:120-130).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimae_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"

# (mesh, n_micro) while a pipelined jit is being traced; None otherwise.
_PIPELINE: Optional[tuple] = None
# True while tracing inside the per-stage shard_map body: per-device
# data is already local there, so the GSPMD shard_map wrappers
# (mesh.data_shard_map / mesh.bnhd_shard_map) must become identities —
# nesting a shard_map over the same mesh axes would be an error.
_INSIDE_STAGE = False


def create_pp_mesh(
    stage: int,
    data: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'stage') mesh; 'stage' innermost so the per-tick
    activation hop rides adjacent-device ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // stage
    assert data * stage == n, f"mesh {data}x{stage} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, stage)
    return Mesh(dev_array, (DATA_AXIS, STAGE_AXIS))


def use_pipeline(mesh: Optional[Mesh], n_micro: int = 0):
    """Register (or clear, with None) the pipeline config that
    models.multimae.run_encoder consults during tracing.

    Contract: this is a trace-time global — any trace that reaches
    run_encoder while it is set takes the shard_map pipeline path.
    `jit_pp` returns a wrapper that scopes the registration around each
    call/lower, so callers normally never touch this directly; clear it
    (use_pipeline(None)) if you register it by hand.
    """
    global _PIPELINE
    if mesh is not None and int(n_micro) < 1:
        raise ValueError(
            f"pipeline microbatch count must be >= 1, got {n_micro} "
            "(--pipeline_microbatches)"
        )
    _PIPELINE = None if mesh is None else (mesh, int(n_micro))


def active() -> bool:
    return _PIPELINE is not None


def inside_stage() -> bool:
    return _INSIDE_STAGE


def pipelined_encoder(model, tokens: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Run `model.encoder` (a list of bound vit.Block submodules) as an
    S-stage GPipe pipeline over the registered ('data','stage') mesh.

    Called from MultiMAE/MultiViT.run_encoder when `use_pipeline` has
    registered a config (never during module init — the plain loop
    creates the params so the tree layout is identical to dp).
    """
    mesh, n_micro = _PIPELINE
    n_stage = mesh.shape[STAGE_AXIS]
    n_data = mesh.shape.get(DATA_AXIS, 1)
    blocks = list(model.encoder)
    depth = len(blocks)
    if depth % n_stage:
        raise ValueError(
            f"encoder depth {depth} not divisible by {n_stage} pipeline stages"
        )
    batch = tokens.shape[0]
    if batch % (n_data * n_micro):
        raise ValueError(
            f"global batch {batch} not divisible by data axis {n_data} x "
            f"{n_micro} microbatches"
        )
    if train and any(
        b.drop or b.attn_drop or b.drop_path_rate for b in blocks
    ):
        # Stochastic-depth keys would need (stage, tick) folding through
        # the schedule; no pretrain recipe enables these (drop_path
        # default 0.0) so v1 keeps the schedule deterministic.
        raise ValueError(
            "pipeline parallelism requires drop/attn_drop/drop_path == 0 "
            "during training (got a nonzero rate)"
        )

    # Every stage applies blocks[0] as the template module, so all
    # blocks must share the same static config — fail loudly on any
    # heterogeneity instead of silently running layer i with block 0's
    # hyperparameters. drop_path_rate is deliberately NOT checked:
    # MultiMAE assigns it per-block via linspace whenever the rate is
    # nonzero (models/multimae.py), train-time heterogeneity is already
    # rejected by the nonzero-rate guard above, and in eval drop_path
    # is a no-op — so a deterministic trace of such a model must pass.
    _CFG_FIELDS = ("num_heads", "mlp_ratio", "qkv_bias", "drop",
                   "attn_drop", "dtype")
    for i, b in enumerate(blocks[1:], start=1):
        for f in _CFG_FIELDS:
            a, v = getattr(blocks[0], f, None), getattr(b, f, None)
            if a != v:
                raise ValueError(
                    f"pipeline parallelism requires homogeneous encoder "
                    f"blocks; block {i}.{f}={v!r} != block 0.{f}={a!r}"
                )

    # Stack the per-block param subtrees (identical structure by
    # construction) along a leading layer axis; shard_map slices
    # depth/S consecutive layers onto each stage device.
    params = model.variables["params"]
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[params[f"encoder_{i}"] for i in range(depth)]
    )
    template = blocks[0].clone(parent=None, name=None)
    deterministic = not train

    def block_apply(p, x):
        global _INSIDE_STAGE
        _INSIDE_STAGE = True
        try:
            return template.apply({"params": p}, x, deterministic=deterministic)
        finally:
            _INSIDE_STAGE = False

    def stage_body(stage_params, local_tokens):
        # stage_params: depth/S stacked layers; local_tokens: the
        # device's 'data' slice of the batch.
        stage = jax.lax.axis_index(STAGE_AXIS)
        bm = local_tokens.shape[0] // n_micro
        micro = local_tokens.reshape((n_micro,) + (bm,) + local_tokens.shape[1:])

        def run_stage(x):
            def layer(carry, p):
                return block_apply(p, carry), None

            y, _ = jax.lax.scan(layer, x, stage_params)
            return y

        def tick(carry, t):
            recv, out = carry
            # Stage 0 feeds microbatch t (clamped; the clamped reads in
            # the drain phase produce bubble outputs that are never
            # collected, so no gradient flows through them).
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, n_micro - 1), keepdims=False
            )
            x = jnp.where(stage == 0, feed, recv)
            y = run_stage(x)
            nxt = jax.lax.ppermute(
                y, STAGE_AXIS, [(i, (i + 1) % n_stage) for i in range(n_stage)]
            )
            # The last stage finishes microbatch t-(S-1) at tick t.
            slot = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
            done = jnp.logical_and(t >= n_stage - 1, stage == n_stage - 1)
            cur = jax.lax.dynamic_index_in_dim(out, slot, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(done, y, cur), slot, 0
            )
            return (nxt, out), None

        init = (jnp.zeros_like(micro[0]), jnp.zeros_like(micro))
        (_, out), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stage - 1)
        )
        # Collected outputs live on the last stage; broadcast so the
        # decoders/losses run replicated over 'stage' like plain dp.
        full = jax.lax.all_gather(out, STAGE_AXIS)[n_stage - 1]
        return full.reshape(local_tokens.shape)

    from jax import shard_map

    pipelined = shard_map(
        stage_body,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return pipelined(stacked, tokens)


class _PipelinedStep:
    """Wrapper around the pipelined jit that scopes the trace-time
    registries (use_pipeline / use_constraint_mesh) to each call/lower:
    jax may (re)trace inside either, and without scoping, a later trace
    in the same process (eval, EMA, visualization) would silently take
    the shard_map pipeline path. After any call returns, both
    registries are restored to their prior values."""

    def __init__(self, jitted, mesh: Mesh, n_micro: int):
        self._jitted = jitted
        self._mesh = mesh
        self._n_micro = n_micro

    def _scoped(self, fn, *args, **kwargs):
        from multimae_tpu.parallel import mesh as mesh_lib

        global _PIPELINE
        prev_pipe = _PIPELINE
        prev_mesh = mesh_lib._CONSTRAINT_MESH
        mesh_lib.use_constraint_mesh(self._mesh)
        use_pipeline(self._mesh, self._n_micro)
        try:
            return fn(*args, **kwargs)
        finally:
            _PIPELINE = prev_pipe
            mesh_lib.use_constraint_mesh(prev_mesh)

    def __call__(self, *args, **kwargs):
        return self._scoped(self._jitted, *args, **kwargs)

    def lower(self, *args, **kwargs):
        return self._scoped(self._jitted.lower, *args, **kwargs)


def jit_pp(
    train_step, mesh: Mesh, n_micro: int, state=None, fsdp: bool = False,
    min_size: int = 2**15,
) -> _PipelinedStep:
    """jit the step pipeline-parallel: batch sharded on 'data', the
    encoder trunk GPipe'd over 'stage' (the run_encoder hook fires during
    tracing because the returned wrapper registers `use_pipeline` around
    each call, and clears it after).

    State is replicated by default; with `fsdp=True` (requires `state`
    for leaf shapes) every large param/moment leaf is ZeRO-3-sharded
    over 'data' at rest (parallel/fsdp.py rules) and GSPMD inserts the
    gathers — including the all-gather of each stage's stacked block
    slice in front of the shard_map, so the pipeline composes with FSDP
    without touching the schedule."""
    assert mesh.shape[STAGE_AXIS] > 1, "use jit_data_parallel for stage=1"
    if int(n_micro) < 1:
        raise ValueError(
            f"pipeline microbatch count must be >= 1, got {n_micro} "
            "(--pipeline_microbatches)"
        )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    if fsdp:
        if state is None:
            raise ValueError("jit_pp(fsdp=True) needs the state for leaf shapes")
        from multimae_tpu.parallel.fsdp import fsdp_shardings

        state_sh = fsdp_shardings(state, mesh, min_size)
    else:
        state_sh = repl
    jitted = jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return _PipelinedStep(jitted, mesh, n_micro)
