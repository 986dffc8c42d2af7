"""Custom Pallas fused attention for short sequences (<= ~1k tokens).

The model's attention lives at 99 (pretrain), 197-261 (cls/depth ft) and
589-1025 (semseg ft) tokens. XLA's dense path materialises the
(B, H, Nq, Nk) fp32 softmax tensor in HBM three times (fwd + two bwd
passes); jax's shipped flash kernel is tuned for long sequences and loses
here on launch/grid overhead (see ops/attention.py). This kernel keeps
the whole (Nq, Nk) tile for a group of (batch, head) pairs resident in
VMEM: one fused QK^T -> softmax -> PV pass forward, and one recompute
pass backward producing dq/dk/dv — no HBM softmax round-trips.

STATUS (v5e, measured): XLA's fused dense attention still wins at this
model's sequence lengths (99 tok: 1.6 vs 2.6 ms fwd+bwd at B=128;
196 tok: 2.7 vs 3.1 ms) — its fusions already keep the small softmax
tiles on-chip. This kernel is therefore NOT wired into the model; it is
kept as tuned-kernel infrastructure (correctness-tested, custom VJP) for
longer-sequence variants where the dense path's O(N^2) HBM tensor does
bind.

Layout: inputs are (BH, N, D) with BH = batch*heads blocked by `group`
along the grid. Sequences are padded to the fp32 sublane tile (8) by the
caller; padded kv columns are masked with -inf before the softmax and
padded q rows are sliced away by the caller.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    g = q_ref.shape[0]
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if kv_len < s.shape[1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[i] = (o / denom).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float, kv_len: int):
    g = q_ref.shape[0]
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        do = do_ref[i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if kv_len < s.shape[1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / denom  # (Nq, Nk) fp32
        # dv = p^T do
        dv_ref[i] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        # dp = do v^T ; ds = p * (dp - rowsum(dp * p))
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row) * scale
        dq_ref[i] = jnp.dot(
            ds.astype(q.dtype), k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[i] = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pick_group(bh: int, nq: int, nk: int, d: int, itemsize: int = 2) -> int:
    """Largest divisor of bh whose double-buffered blocks fit the ~16MB
    VMEM budget (q/k/v/o blocks + the fp32 logits tile)."""
    budget = 12 * 1024 * 1024
    for g in (8, 4, 2, 1):
        if bh % g != 0:
            continue
        blocks = 2 * g * (2 * nq * d + 2 * nk * d) * itemsize  # dbl-buffered io
        logits = nq * nk * 4 * 2
        if blocks + logits <= budget:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attend(q3, k3, v3, meta):
    out, _ = _attend_fwd(q3, k3, v3, meta)
    return out


def _attend_fwd(q3, k3, v3, meta):
    scale, kv_len, nq_len = meta
    bh, nq, d = q3.shape
    nk = k3.shape[1]
    g = _pick_group(bh, nq, nk, d)
    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len)
    out = pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q3.dtype),
    )(q3, k3, v3)
    return out, (q3, k3, v3)


def _attend_bwd(meta, res, g_out):
    scale, kv_len, nq_len = meta
    q3, k3, v3 = res
    bh, nq, d = q3.shape
    nk = k3.shape[1]
    g = _pick_group(bh, nq, nk, d)
    kernel = functools.partial(_bwd_kernel, scale=scale, kv_len=kv_len)
    # zero padded q rows of the cotangent so they contribute nothing
    if nq_len < nq:
        row = jnp.arange(nq)[None, :, None]
        g_out = jnp.where(row < nq_len, g_out, 0)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, nk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v3.dtype),
        ],
    )(q3, k3, v3, g_out)
    return dq, dk, dv


_attend.defvjp(_attend_fwd, _attend_bwd)


def pallas_short_attention(q, k, v, sm_scale: float) -> jnp.ndarray:
    """q: (B, H, Nq, D), k/v: (B, H, Nk, D) -> (B, H, Nq, D).

    Whole-sequence fused attention; requires the (Nq_pad x Nk_pad) fp32
    tile per (b, h)-group to fit VMEM (true for Nk <= ~2k at D <= 128).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_p = _round_up(nq, 8)
    nk_p = _round_up(nk, 128)

    def pad_seq(x, n_to):
        if x.shape[2] == n_to:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - x.shape[2]), (0, 0)))

    q3 = pad_seq(q, nq_p).reshape(b * h, nq_p, d)
    k3 = pad_seq(k, nk_p).reshape(b * h, nk_p, d)
    v3 = pad_seq(v, nk_p).reshape(b * h, nk_p, d)
    out = _attend(q3, k3, v3, (float(sm_scale), nk, nq))
    return out.reshape(b, h, nq_p, d)[:, :, :nq]
