"""Fused short-sequence attention (Pallas, TPU), BNHD layout.

Motivation (measured, tools/profile_step.py @ B=128 ViT-B pretrain):
the XLA dense-attention path materialises the fp32 (B, H, N, N) logits
and probability tensors in HBM — for the 4 pretraining decoders
(N=196, head_dim 32) that traffic plus the small K=32 matmuls cost
~21 ms/step of the 137 ms step. The sequences in this model are tiny
(99-2049 tokens), so whole attention rows fit in VMEM: this kernel
computes qk^T -> softmax -> @v in one fused program with NO N^2 HBM
traffic.

Layout: q/k/v come in as (B, N, H, D) — the NATURAL shape produced by
reshaping the fused qkv Dense output — and the output is written back
as (B, N, H, D), which reshapes to (B, N, C) for the out-projection for
free. The first kernel iteration used (B, H, N, D) and measured SLOWER
end-to-end (865 vs 919 samples/s): XLA had to materialise the moveaxis
transposes at the pallas_call boundary that it previously fused into
the attention einsums. The head transpose now happens inside the
kernel, in VMEM.

Backward: standard flash-attention-style residuals. The forward (when
differentiated) additionally emits the per-row logsumexp
``lse = m + log(sum(exp(s - m)))`` — an (B, H, Nq, 1) fp32 column,
~1.6 MB at the 512px fine-tune shape — and the VJP wrapper derives
``delta_i = sum_d do_id * o_id`` from the saved output (which the
surrounding out-projection's backward keeps alive anyway). The backward
kernel then recomputes the probabilities with a SINGLE exp pass
(``p = exp(s*scale - lse)`` — no max-reduce, no sum-reduce, no divide)
and uses ``ds = p * (dp - delta) * scale`` — the identity
``sum_k p_ik dp_ik = sum_d do_id o_id`` replaces the N^2-sized
``rowsum(dp*p)`` with an O(N*D) reduction done outside the kernel.
Measured on v5e at the 512px rgb+depth fine-tune shape (B=16, N=2049):
the previous full-softmax-recompute backward was 88 ms/step vs 40 ms
forward; the fp32 N^2 VPU passes this removes were the gap's main
component. No N^2 residuals are saved in either scheme.

Numerics match ops/attention.einsum_attention: fp32 logits and softmax,
probabilities cast to the input dtype for the @v matmul, fp32
accumulation. Reference semantics: multimae/multimae_utils.py:170-182.

Grid layouts (Pallas requires the last two block dims be (8,128)-
divisible or full, so heads cannot be split in BNHD blocks):
  * heads-batched BNHD (grid over B): one program handles all H heads
    of one sample — the hot path for every <=~512-token shape.
  * per-head BHND (grid over B*H): for longer sequences (512px
    fine-tune, 2049 tokens) where the (H, Nq, Nk) fp32 tile would not
    fit VMEM; the explicit head transpose is amortised by the O(N^2)
    attention work at those lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Raise the Mosaic scoped-VMEM cap from the 16 MB default — v5e cores
# have 128 MB of physical VMEM. The per-head backward at the 512px
# rgb+depth fine-tune shape (N=2049) holds 3 fp32 (Nq, Nk) tiles
# (~54 MB) plus IO blocks; measured 1.83x faster than XLA dense there.
_VMEM_LIMIT = 100 * 1024 * 1024
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _lane_pad(d):
    return 128 * ((d + 127) // 128)


def _footprint_bytes(nq, nk, h, d, itemsize, n_io):
    """Rough per-program VMEM estimate for the heads-batched layout:
    double-buffered IO blocks + in-kernel transposed copies + 3 fp32
    (H, Nq, Nk) tiles + the lane-padded (H, Nq, 1) lse/delta columns."""
    lanes = _lane_pad(d)
    io = n_io * h * max(nq, nk) * lanes * itemsize * 3  # blocks x2 + copy
    f32 = 3 * h * nq * _lane_pad(nk) * 4
    cols = 4 * h * nq * 128 * 4  # lse + delta, x2 buffers, lane-padded
    return io + f32 + cols


def _heads_batched(nq, nk, h, d, itemsize):
    # Judge by the heavier (backward, n_io=7) kernel so fwd/bwd agree.
    return _footprint_bytes(nq, nk, h, d, itemsize, 7) <= 40 * 1024 * 1024


def _interpret():
    # CPU tests exercise the kernel via the Pallas interpreter.
    return jax.default_backend() != "tpu"


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _softmax_rows_lse(s):
    """Row softmax plus the logsumexp column (..., Nq, 1) in fp32."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.sum(e, axis=-1, keepdims=True)
    return e / den, m + jnp.log(den)


# --------------------------- heads-batched (BNHD blocks, grid (B,)) ---


def _attend_h(q, k, v, scale):
    """q (H, Nq, D), k/v (H, Nk, D) -> fp32 (H, Nq, D), all in VMEM."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (H, Nq, Nk)
    p = _softmax_rows(s.astype(jnp.float32) * scale)
    return jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel_h(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = jnp.swapaxes(q_ref[0], 0, 1)  # (H, Nq, D), VMEM relayout
    k = jnp.swapaxes(k_ref[0], 0, 1)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    o = _attend_h(q, k, v, scale)
    o_ref[0] = jnp.swapaxes(o.astype(o_ref.dtype), 0, 1)


def _fwd_lse_kernel_h(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q = jnp.swapaxes(q_ref[0], 0, 1)
    k = jnp.swapaxes(k_ref[0], 0, 1)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    p, lse = _softmax_rows_lse(s.astype(jnp.float32) * scale)
    o = jax.lax.dot_general(
        p.astype(q.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = jnp.swapaxes(o.astype(o_ref.dtype), 0, 1)
    lse_ref[0] = lse  # (H, Nq, 1)


def _bwd_kernel_h(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                  dq_ref, dk_ref, dv_ref, *, scale):
    q = jnp.swapaxes(q_ref[0], 0, 1)
    k = jnp.swapaxes(k_ref[0], 0, 1)
    v = jnp.swapaxes(v_ref[0], 0, 1)
    do = jnp.swapaxes(do_ref[0], 0, 1)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # Single-exp probability recompute from the saved logsumexp.
    p = jnp.exp(s.astype(jnp.float32) * scale - lse_ref[0])  # (H, Nq, Nk)
    p_c = p.astype(q.dtype)
    dv = jax.lax.dot_general(  # p^T @ do : contract Nq
        p_c, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(  # do @ v^T : contract D
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = ((p * (dp - dlt_ref[0])) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dq_ref[0] = jnp.swapaxes(dq.astype(dq_ref.dtype), 0, 1)
    dk_ref[0] = jnp.swapaxes(dk.astype(dk_ref.dtype), 0, 1)
    dv_ref[0] = jnp.swapaxes(dv.astype(dv_ref.dtype), 0, 1)


def _specs_h(nq, nk, h, d):
    qspec = pl.BlockSpec((1, nq, h, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, nk, h, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, h, nq, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, cspec


# ------------------------------ per-head (BHND blocks, grid (B, H)) ---


def _fwd_kernel_ph(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]  # (N, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nq, Nk)
    p = _softmax_rows(s.astype(jnp.float32) * scale)
    o = jnp.dot(p.astype(q.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fwd_lse_kernel_ph(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale):
    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p, lse = _softmax_rows_lse(s.astype(jnp.float32) * scale)
    o = jnp.dot(p.astype(q.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = lse  # (Nq, 1)


def _bwd_kernel_ph(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                   dq_ref, dk_ref, dv_ref, *, scale):
    q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s.astype(jnp.float32) * scale - lse_ref[0, 0])  # (Nq, Nk)
    p_c = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        p_c, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nk, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Nq, Nk)
    ds = ((p * (dp - dlt_ref[0, 0])) * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _specs_ph(nq, nk, d):
    qspec = pl.BlockSpec((1, 1, nq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, nk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, nq, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, cspec


# ------------------------------------------------------------ driver --


def _fwd(q, k, v, scale, with_lse: bool = False):
    """Returns o, or (o, lse) with lse (B, H, Nq, 1) fp32."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    lse_shape = jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32)
    if _heads_batched(nq, nk, h, d, q.dtype.itemsize):
        qspec, kspec, cspec = _specs_h(nq, nk, h, d)
        if with_lse:
            return pl.pallas_call(
                functools.partial(_fwd_lse_kernel_h, scale=scale),
                out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype), lse_shape),
                grid=(b,),
                in_specs=[qspec, kspec, kspec],
                out_specs=(qspec, cspec),
                compiler_params=_PARAMS,
                interpret=_interpret(),
            )(q, k, v)
        return pl.pallas_call(
            functools.partial(_fwd_kernel_h, scale=scale),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            grid=(b,),
            in_specs=[qspec, kspec, kspec],
            out_specs=qspec,
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(q, k, v)
    # long-sequence path: BHND with per-head programs
    qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    qspec, kspec, cspec = _specs_ph(nq, nk, d)
    if with_lse:
        out, lse = pl.pallas_call(
            functools.partial(_fwd_lse_kernel_ph, scale=scale),
            out_shape=(jax.ShapeDtypeStruct(qt.shape, q.dtype), lse_shape),
            grid=(b, h),
            in_specs=[qspec, kspec, kspec],
            out_specs=(qspec, cspec),
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(qt, kt, vt)
        return jnp.swapaxes(out, 1, 2), lse
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_ph, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=(b, h),
        in_specs=[qspec, kspec, kspec],
        out_specs=qspec,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(qt, kt, vt)
    return jnp.swapaxes(out, 1, 2)


def _bwd(q, k, v, do, lse, delta, scale):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if _heads_batched(nq, nk, h, d, q.dtype.itemsize):
        qspec, kspec, cspec = _specs_h(nq, nk, h, d)
        return pl.pallas_call(
            functools.partial(_bwd_kernel_h, scale=scale),
            out_shape=(
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ),
            grid=(b,),
            in_specs=[qspec, kspec, kspec, qspec, cspec, cspec],
            out_specs=(qspec, kspec, kspec),
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(q, k, v, do, lse, delta)
    qt, kt, vt, dot_ = (jnp.swapaxes(x, 1, 2) for x in (q, k, v, do))
    qspec, kspec, cspec = _specs_ph(nq, nk, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_ph, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qt.shape, q.dtype),
            jax.ShapeDtypeStruct(kt.shape, k.dtype),
            jax.ShapeDtypeStruct(vt.shape, v.dtype),
        ),
        grid=(b, h),
        in_specs=[qspec, kspec, kspec, qspec, cspec, cspec],
        out_specs=(qspec, kspec, kspec),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(qt, kt, vt, dot_, lse, delta)
    return tuple(jnp.swapaxes(x, 1, 2) for x in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_attention(q, k, v, scale: float):
    """q (B,Nq,H,D), k/v (B,Nk,H,D) -> (B,Nq,H,D). Fused on-chip softmax
    attention; backward recomputes the probabilities from the saved
    logsumexp with one exp (no N^2 residuals)."""
    return _fwd(q, k, v, scale)


def _short_attention_fwd(q, k, v, scale):
    o, lse = _fwd(q, k, v, scale, with_lse=True)
    # o is a free residual: the out-projection matmul's backward keeps
    # the attention output alive anyway, so XLA shares the buffer.
    return o, (q, k, v, o, lse)


def _short_attention_bwd(scale, res, g):
    q, k, v, o, lse = res
    # delta_i = sum_d do_id * o_id == rowsum(dp * p): O(N*D) in XLA
    # (fused) instead of an N^2 multiply+lane-reduce inside the kernel.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.transpose(delta, (0, 2, 1))[..., None]  # (B, H, Nq, 1)
    dq, dk, dv = _bwd(q, k, v, g, lse, delta, scale)
    return dq, dk, dv


short_attention.defvjp(_short_attention_fwd, _short_attention_bwd)


def supported(q, k) -> bool:
    """Shapes this kernel handles: sequences where the per-head
    backward's three fp32 (Nq, Nk) tiles PLUS its nine double-buffered
    IO blocks (q, k, v, do, dq, dk, dv at the actual Nq/Nk/lane-padded
    d, plus the lane-padded lse/delta columns) fit the 100 MB VMEM
    budget with an explicit 12 MB slack for in-kernel copies/scheduling.
    BNHD layout. Covers every shape this model family uses up to ~2500
    tokens (512px rgb+depth = 2049, which totals ~70 MB); oversized
    falls back to XLA dense instead of a Mosaic VMEM-exhaustion compile
    error."""
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if d > 256:
        return False
    lanes = _lane_pad(d)
    itemsize = jnp.dtype(q.dtype).itemsize
    io = (4 * nq + 3 * nk) * lanes * itemsize * 2  # 7 blocks, x2 buffers
    cols = 4 * nq * 128 * 4  # lse + delta columns, x2 buffers
    f32 = 3 * nq * _lane_pad(nk) * 4
    return f32 + io + cols <= _VMEM_LIMIT - 12 * 1024 * 1024
