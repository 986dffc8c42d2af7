"""Fused SpatialOutputAdapter decoder core (Pallas, TPU).

Motivation (measured, tools/profile_step.py @ B=128 ViT-B pretrain): the
4 pretraining decoders cost ~55 ms of the 137 ms step at ~16% MFU. At
dim 256 every GEMM is HBM-bound (arithmetic intensity ~K*N/(K+N) ~ 205
flops/byte vs the v5e ridge of ~240), and the interleaved LayerNorms /
GELU / residual adds round-trip the (B, 196, 256) activations through
HBM ~12 times per block. XLA cannot fuse across the GEMMs, so the only
way to recover the bandwidth is a kernel that keeps the token tile
resident in VMEM across the WHOLE decoder:

    queries, context --> [ query_norm/context_norm -> cross-attention
        -> out_norm -> MLP(+res) -> depth x (LN -> self-attn(+res)
        -> LN -> MLP(+res)) ] --> tokens

HBM traffic per sample drops from ~19 MB to ~0.25 MB (read queries +
context, write tokens) plus one weight read per batch tile.

The backward pass is a second kernel that RECOMPUTES the forward
activations in VMEM from (queries, context) — flash-attention style —
then backpropagates, so no intermediate activations are ever saved to
HBM either. Weight gradients are accumulated in fp32 across the
(sequential on TPU) batch-tile grid via output-block revisiting.

Numerics mirror the flax module path exactly (models/vit.py,
models/output_adapters.py:254-284):
  * LayerNorm statistics fp32, fast-variance (mean(x^2) - mean(x)^2),
    eps 1e-6; scale/bias fp32.
  * GEMMs in the compute dtype (bf16 in training) with fp32
    accumulation; bias adds in compute dtype.
  * Attention logits and softmax fp32; probabilities cast to the
    compute dtype for the @v matmul (reference
    multimae/multimae_utils.py:170-182).
  * GELU exact (erf), evaluated in fp32.

Behavioural spec: reference multimae/output_adapters.py:236-268 (the
decoder/transformer portion of SpatialOutputAdapter.forward).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e cores have far more physical VMEM than the 16 MB Mosaic default;
# the decoder backward needs the fwd recompute + fp32 grad accumulators.
_VMEM_LIMIT = 100 * 1024 * 1024
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

_LN_EPS = 1e-6

# Test hook: force the dispatch mode regardless of backend.
#   None       — normal dispatch (Pallas on TPU, module path elsewhere)
#   "ref"      — pure-JAX reference core (decoder_core_ref)
#   "interpret"— Pallas kernels through the interpreter (CPU tests)
_FORCE_MODE = None


def set_force_mode(mode):
    global _FORCE_MODE
    assert mode in (None, "ref", "interpret")
    _FORCE_MODE = mode


def enabled() -> bool:
    if _FORCE_MODE is not None:
        return True
    # model>1 TP meshes: the pretrain decoders live OUTSIDE the TP
    # scopes (TP_SCOPE_RE = encoder blocks), so their operands are
    # replicated over 'model' and data_shard_map replicates the kernel
    # there too — identical redundancy to the XLA path it replaces.
    return (
        os.environ.get("MULTIMAE_TPU_NO_FUSED_DECODER") != "1"
        and jax.default_backend() == "tpu"
    )


def supported(nq: int, nc: int, dim: int, heads: int, depth: int, dtype,
              mlp_ratio: float = 4.0, ns: int = 1,
              blockdiag: bool = False) -> bool:
    """VMEM-fit estimate for the backward (recompute) kernel — the
    heavier of the two programs — at `ns` samples per program. It
    recomputes the whole forward and holds: the per-head fp32 probs
    (1 xattn + `depth` self-attn sets), ~20 activation slabs, the
    weights in compute dtype PLUS fp32 grad accumulators, and the
    double-buffered IO blocks. Everything except the weights scales
    with ns (the block-diagonal attention mode's probs scale ns^2 —
    one (ns*nq, ns*nk) tile per head instead of ns (nq, nk) tiles).
    Oversized shapes (e.g. 512px pretraining, Nq~1024/decoder) must
    fall back to the XLA module path instead of dying with a Mosaic
    VMEM-exhaustion compile error."""
    bpe = jnp.dtype(dtype).itemsize
    f32 = 4
    hidden = int(dim * mlp_ratio)
    # fp32 softmax probabilities, all heads, all attention sites
    probs = heads * nq * (nc + depth * nq) * f32
    if blockdiag:
        probs *= ns  # per-sample cost below multiplies by ns again
    # activation slabs recorded by _core_fwd(save=...): dtype slabs +
    # fp32 xhat/LN-stat slabs (counted from the rec() calls)
    xattn_act = ((8 * nq + 3 * nc) * dim + 2 * nq * hidden) * bpe \
        + (2 * nq + nc) * dim * f32
    blk_act = (10 * nq * dim + 2 * nq * hidden) * bpe \
        + 2 * nq * dim * f32
    acts = xattn_act + depth * blk_act
    # weights (compute dtype) + fp32 dW accumulator blocks; per region
    # the big tensors sum to ~(4 + 2*mlp_ratio) * dim^2
    w_elems = int((4 + 2 * mlp_ratio) * dim * dim) * (1 + depth)
    weights = w_elems * (bpe + f32)
    # double-buffered IO: q/g/dq tiles + c/dc tiles
    io = (3 * nq + 2 * nc) * dim * bpe * 2
    est = ns * (probs + acts + io) + weights
    # 1.4x headroom for in-flight temporaries (per-head fp32 dp/ds
    # tiles, qkv/concat buffers, scheduler slack). The shipped 224px
    # pretrain shape (nq=196, nc=99, dim=256, h=8, depth=2, bf16)
    # estimates ~25 MB at ns=1 — comfortably inside the 100 MB budget
    # it is measured to compile in.
    return est * 1.4 <= _VMEM_LIMIT


def pick_ns(b: int, nq: int, nc: int, dim: int, heads: int, depth: int,
            dtype, mlp_ratio: float = 4.0) -> int:
    """Samples per program. Every dense GEMM in the kernel runs at
    M = ns*nq; attention stays per-sample (static row slices).

    MEASURED DEAD END at the shipped 224px pretrain shape (nq=196,
    nc=99, d=256, B=128, v5e, 2026-08-18): ns=1 benches 1150.5
    samples/s/chip vs 1116 at ns=2 and 1123 at ns=4 — the wider GEMMs
    don't pay for the unaligned (196-row, non-sublane-tile) per-sample
    attention slices and the lost cross-program pipelining (B/ns
    programs overlap compute with IO; fewer, fatter programs overlap
    less). The block-diagonal masked-attention variant (attn_blockdiag)
    removes the unaligned slices entirely and STILL loses: 1118.3 at
    ns=2 vs the same-day ns=1 capture of 1147.8 — so the deficit is the
    pipelining (and at ns>1 the ns x junk attention FLOPs), not the
    slicing. Default is therefore 1; MULTIMAE_TPU_DECODER_NS forces a
    value (must divide the per-device batch and fit `supported(ns=)`)
    for A/B runs at other shapes."""
    forced = os.environ.get("MULTIMAE_TPU_DECODER_NS")
    if forced and b % int(forced) == 0:
        return int(forced)
    return 1


def attn_blockdiag() -> bool:
    """At ns>1, run each attention site as ONE masked softmax over the
    whole (ns*nq, ns*nk) slab per head — a block-diagonal mask zeroes
    the cross-sample probabilities exactly (exp(-1e30) == 0 in fp32),
    so numerics match the per-sample form bit-for-bit apart from the
    padded row max. This removes the non-tile-aligned per-sample row
    slices that made plain ns>1 slower (pick_ns docstring) at the cost
    of ns x the attention FLOPs (attention is ~11% of decoder FLOPs at
    the 224px shape). MEASURED at that shape (v5e, 2026-08-18): 1118.3
    samples/s/chip at ns=2 vs 1147.8 at ns=1 same-day — alignment was
    NOT the deficit; see pick_ns. Gated for A/B runs:
    MULTIMAE_TPU_DECODER_ATTN=blockdiag; 'split' (default) keeps
    per-sample slices."""
    return os.environ.get("MULTIMAE_TPU_DECODER_ATTN") == "blockdiag"


def _blockdiag_mask(bt, nq, nc):
    """(bt*nq, bt*nc) bool: True where query-row sample == key-col
    sample. Built from 2-D iotas (Mosaic lowers broadcasted_iota)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt * nq, bt * nc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt * nq, bt * nc), 1)
    return (rows // nq) == (cols // nc)


class DecoderCoreWeights(NamedTuple):
    """Weights of the fused region, in kernel-canonical layout.

    LayerNorm scale/bias are fp32 (1, D); dense kernels keep their flax
    (in, out) layout; biases are (1, out). Per-block tensors are stacked
    on a leading `depth` axis.
    """

    qn_g: jnp.ndarray   # query_norm scale  (1, D) fp32
    qn_b: jnp.ndarray
    cn_g: jnp.ndarray   # context_norm
    cn_b: jnp.ndarray
    on_g: jnp.ndarray   # out_norm
    on_b: jnp.ndarray
    wq: jnp.ndarray     # xattn q     (D, D)
    bq: jnp.ndarray     # (1, D)
    wkv: jnp.ndarray    # xattn kv    (D, 2D)
    bkv: jnp.ndarray
    wxp: jnp.ndarray    # xattn proj  (D, D)
    bxp: jnp.ndarray
    w1: jnp.ndarray     # xattn mlp fc1 (D, H)
    b1: jnp.ndarray
    w2: jnp.ndarray     # xattn mlp fc2 (H, D)
    b2: jnp.ndarray
    n1_g: jnp.ndarray   # (depth, 1, D) fp32
    n1_b: jnp.ndarray
    wqkv: jnp.ndarray   # (depth, D, 3D)
    bqkv: jnp.ndarray   # (depth, 1, 3D)
    wp: jnp.ndarray     # (depth, D, D)
    bp: jnp.ndarray
    n2_g: jnp.ndarray
    n2_b: jnp.ndarray
    wf1: jnp.ndarray    # (depth, D, H)
    bf1: jnp.ndarray
    wf2: jnp.ndarray    # (depth, H, D)
    bf2: jnp.ndarray


def collect_core_weights(p, depth: int) -> DecoderCoreWeights:
    """Build DecoderCoreWeights from a SpatialOutputAdapter param subtree
    (flax param-path layout; see models/output_adapters.py setup)."""

    def ln(name):
        s = p[name]["ln"]
        return s["scale"].reshape(1, -1), s["bias"].reshape(1, -1)

    def dense(tree):
        return tree["kernel"], tree["bias"].reshape(1, -1)

    qn_g, qn_b = ln("query_norm")
    cn_g, cn_b = ln("context_norm")
    on_g, on_b = ln("out_norm")
    wq, bq = dense(p["decoder"]["q"])
    wkv, bkv = dense(p["decoder"]["kv"])
    wxp, bxp = dense(p["decoder"]["proj"])
    w1, b1 = dense(p["mlp"]["fc1"])
    w2, b2 = dense(p["mlp"]["fc2"])

    def stack(fn):
        return jnp.stack([fn(p[f"decoder_transformer_{i}"]) for i in range(depth)])

    n1_g = stack(lambda b: b["norm1"]["ln"]["scale"].reshape(1, -1))
    n1_b = stack(lambda b: b["norm1"]["ln"]["bias"].reshape(1, -1))
    wqkv = stack(lambda b: b["attn"]["qkv"]["kernel"])
    bqkv = stack(lambda b: b["attn"]["qkv"]["bias"].reshape(1, -1))
    wp = stack(lambda b: b["attn"]["proj"]["kernel"])
    bp = stack(lambda b: b["attn"]["proj"]["bias"].reshape(1, -1))
    n2_g = stack(lambda b: b["norm2"]["ln"]["scale"].reshape(1, -1))
    n2_b = stack(lambda b: b["norm2"]["ln"]["bias"].reshape(1, -1))
    wf1 = stack(lambda b: b["mlp"]["fc1"]["kernel"])
    bf1 = stack(lambda b: b["mlp"]["fc1"]["bias"].reshape(1, -1))
    wf2 = stack(lambda b: b["mlp"]["fc2"]["kernel"])
    bf2 = stack(lambda b: b["mlp"]["fc2"]["bias"].reshape(1, -1))
    return DecoderCoreWeights(
        qn_g, qn_b, cn_g, cn_b, on_g, on_b, wq, bq, wkv, bkv, wxp, bxp,
        w1, b1, w2, b2, n1_g, n1_b, wqkv, bqkv, wp, bp, n2_g, n2_b,
        wf1, bf1, wf2, bf2,
    )


# Indices of the LayerNorm tensors (kept fp32 in-kernel; everything else
# is cast to the compute dtype).
_LN_FIELDS = frozenset(
    i for i, f in enumerate(DecoderCoreWeights._fields)
    if f[0] in ("q", "c", "o", "n") and ("_g" in f or "_b" in f)
)


def _cast_weights(w: DecoderCoreWeights, dtype) -> DecoderCoreWeights:
    return DecoderCoreWeights(*[
        t if i in _LN_FIELDS else t.astype(dtype) for i, t in enumerate(w)
    ])


# --------------------------------------------------------------- math --


def _ln_fwd(x, g, b, dtype):
    """fp32 fast-variance LayerNorm (flax semantics), returns (y, xhat,
    inv_sigma) with y in `dtype`."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (xf - mu) * inv
    y = xhat * g + b
    return y.astype(dtype), xhat, inv


def _ln_bwd(dy, xhat, inv, g):
    """Returns (dx fp32, dg fp32 (1,D), db fp32 (1,D))."""
    dyf = dy.astype(jnp.float32)
    dg = jnp.sum(dyf * xhat, axis=0, keepdims=True)
    db = jnp.sum(dyf, axis=0, keepdims=True)
    dxhat = dyf * g
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def _dense(x, w, b):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return y + b if b is not None else y


def _dense_bwd(x, w, g):
    """dx = g @ w^T, dw = x^T @ g (fp32), db = colsum(g) (fp32)."""
    dx = jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    return dx, dw, db


# Exact-erf GELU via the tanh-basis minimax fit (ops/fast_gelu.py):
# erf(x/sqrt(2)) ~= tanh(x * p(x^2)), max err 2.9e-6, matching the
# module path's bf16 gelu. Mosaic has no erf primitive but lowers tanh
# to the VPU's fast path; this replaced the Eigen rational erf (division
# + double Horner) here. _P_DERIV holds p'(t) for the hand-written VJP.
from multimae_tpu.ops.fast_gelu import _P_COEFFS

_P_DERIV = tuple((k + 1) * c for k, c in enumerate(_P_COEFFS[1:]))


def _gelu_poly(t):
    p = jnp.float32(_P_COEFFS[-1])
    for c in _P_COEFFS[-2::-1]:
        p = p * t + jnp.float32(c)
    return p


def _gelu_fwd(x, dtype):
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(xf * _gelu_poly(xf * xf)))
    return y.astype(dtype)


def _gelu_bwd(x, g):
    xf = x.astype(jnp.float32)
    t = xf * xf
    u = jnp.tanh(xf * _gelu_poly(t))
    du = jnp.float32(_P_DERIV[-1])
    for c in _P_DERIV[-2::-1]:
        du = du * t + jnp.float32(c)
    # d/dx [0.5 x (1+tanh(x p))] = 0.5(1+u) + 0.5 x (1-u^2)(p + 2t p')
    grad = 0.5 * (1.0 + u) + 0.5 * xf * (1.0 - u * u) * (
        _gelu_poly(t) + 2.0 * t * du
    )
    return (g.astype(jnp.float32) * grad).astype(x.dtype)


def _softmax_rows(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attend_fwd(q, k, v, scale, dtype):
    """q (G, Nq, dh), k/v (G, Nk, dh) -> (out (G, Nq, dh) in dtype,
    probs fp32)."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    p = _softmax_rows(s.astype(jnp.float32) * scale)
    o = jax.lax.dot_general(
        p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return o.astype(dtype), p


def _mha_fwd(q2d, k2d, v2d, bt, nq, nc, heads, dh, scale, dtype,
             inkernel=False):
    """Multi-head attention on 2-D activation slabs.

    Heads live in the lane dimension of the fused qkv GEMM output, and
    Mosaic cannot shape-cast a lane split (256 -> 8x32), so each head is
    a 32-lane slice. In-kernel everything stays rank-2 — Mosaic also
    rejects sublane splits at non-tile-aligned token counts like
    (bt*99, dh) -> (bt, 99, dh) — so with bt > 1 samples per program
    (the GEMM M-widening mode) each sample is a static ROW slice and
    attention runs per (head, sample). The CPU/XLA reference path
    (inkernel=False, bt > 1) batches samples with rank-3 reshapes
    instead. Returns the merged (bt*nq, heads*dh) output and the fp32
    probs list (one entry per head, or per (head, sample) in-kernel).
    """
    outs, probs = [], []
    blockdiag = inkernel and bt > 1 and attn_blockdiag()
    mask = _blockdiag_mask(bt, nq, nc) if blockdiag else None
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        if bt == 1 or blockdiag:
            o, p = _attend_fwd_2d(q2d[:, sl], k2d[:, sl], v2d[:, sl],
                                  scale, dtype, mask=mask)
            outs.append(o)
            probs.append(p)
        elif inkernel:
            os_ = []
            for s in range(bt):
                o, p = _attend_fwd_2d(
                    q2d[s * nq:(s + 1) * nq, sl],
                    k2d[s * nc:(s + 1) * nc, sl],
                    v2d[s * nc:(s + 1) * nc, sl], scale, dtype)
                os_.append(o)
                probs.append(p)
            outs.append(jnp.concatenate(os_, axis=0))
        else:
            o, p = _attend_fwd(
                q2d[:, sl].reshape(bt, nq, dh),
                k2d[:, sl].reshape(bt, nc, dh),
                v2d[:, sl].reshape(bt, nc, dh), scale, dtype)
            outs.append(o.reshape(bt * nq, dh))
            probs.append(p)
    return jnp.concatenate(outs, axis=1), probs


def _mha_bwd(q2d, k2d, v2d, probs, da2d, bt, nq, nc, heads, dh, scale,
             inkernel=False):
    """Gradients of _mha_fwd; returns (dq2d, dk2d, dv2d)."""
    dqs, dks, dvs = [], [], []
    blockdiag = inkernel and bt > 1 and attn_blockdiag()
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        if bt == 1 or blockdiag:
            # blockdiag: probs[h] is the full (bt*nq, bt*nc) tile with
            # exact zeros off-block — the plain backward is already
            # correct (see _attend_fwd_2d docstring).
            dq, dk, dv = _attend_bwd_2d(
                q2d[:, sl], k2d[:, sl], v2d[:, sl], probs[h], da2d[:, sl],
                scale)
            dqs.append(dq); dks.append(dk); dvs.append(dv)
        elif inkernel:
            dqs_, dks_, dvs_ = [], [], []
            for s in range(bt):
                dq, dk, dv = _attend_bwd_2d(
                    q2d[s * nq:(s + 1) * nq, sl],
                    k2d[s * nc:(s + 1) * nc, sl],
                    v2d[s * nc:(s + 1) * nc, sl],
                    probs[h * bt + s],
                    da2d[s * nq:(s + 1) * nq, sl], scale)
                dqs_.append(dq); dks_.append(dk); dvs_.append(dv)
            dqs.append(jnp.concatenate(dqs_, axis=0))
            dks.append(jnp.concatenate(dks_, axis=0))
            dvs.append(jnp.concatenate(dvs_, axis=0))
        else:
            dq, dk, dv = _attend_bwd(
                q2d[:, sl].reshape(bt, nq, dh),
                k2d[:, sl].reshape(bt, nc, dh),
                v2d[:, sl].reshape(bt, nc, dh),
                probs[h], da2d[:, sl].reshape(bt, nq, dh), scale)
            dqs.append(dq.reshape(bt * nq, dh))
            dks.append(dk.reshape(bt * nc, dh))
            dvs.append(dv.reshape(bt * nc, dh))
    return (jnp.concatenate(dqs, axis=1), jnp.concatenate(dks, axis=1),
            jnp.concatenate(dvs, axis=1))


def _attend_fwd_2d(q, k, v, scale, dtype, mask=None):
    """q (Nq, dh), k/v (Nc, dh) -> (out (Nq, dh), probs fp32 (Nq, Nc)).

    `mask` (bool, (Nq, Nc)): False entries get -1e30 before the softmax
    and therefore EXACTLY zero probability (block-diagonal ns mode);
    the backward needs no masking — zero probs kill every off-block
    term in _attend_bwd_2d algebraically."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s.astype(jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(-1e30))
    p = _softmax_rows(s)
    o = jnp.dot(p.astype(dtype), v, preferred_element_type=jnp.float32)
    return o.astype(dtype), p


def _attend_bwd_2d(q, k, v, p, do, scale):
    dtype = q.dtype
    p_c = p.astype(dtype)
    dv = jax.lax.dot_general(
        p_c, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dtype)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)
    return dq, dk, dv


def _attend_bwd(q, k, v, p, do, scale):
    """Gradients of _attend_fwd given saved fp32 probs."""
    dtype = q.dtype
    p_c = p.astype(dtype)
    dv = jax.lax.dot_general(  # p^T @ do, contract Nq
        p_c, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)
    dp = jax.lax.dot_general(  # do @ v^T, contract dh
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dtype)
    return dq, dk, dv


# ----------------------------------------------------- forward (core) --


def _core_fwd(q2d, c2d, w: DecoderCoreWeights, *, nq, nc, heads, depth,
              dtype, save=None, inkernel=False):
    """Shared forward math on 2-D slabs: q2d (bt*nq, d), c2d (bt*nc, d).

    Inside the kernels bt == 1 (rank-2 everywhere — see _mha_fwd); the
    CPU/XLA reference path batches samples. If `save` is a dict,
    intermediate activations needed by the backward pass are recorded
    into it. Returns x2d (bt*nq, d).
    """
    d = q2d.shape[1]
    bt = q2d.shape[0] // nq
    dh = d // heads
    scale = dh ** -0.5

    def rec(name, val):
        if save is not None:
            save[name] = val

    qn, qn_xhat, qn_inv = _ln_fwd(q2d, w.qn_g, w.qn_b, dtype)
    cn, cn_xhat, cn_inv = _ln_fwd(c2d, w.cn_g, w.cn_b, dtype)
    rec("qn", qn); rec("qn_xhat", qn_xhat); rec("qn_inv", qn_inv)
    rec("cn", cn); rec("cn_xhat", cn_xhat); rec("cn_inv", cn_inv)

    # Cross-attention (output REPLACES the queries; reference
    # output_adapters.py:272-278 has no residual on the xattn itself).
    q = _dense(qn, w.wq, w.bq)
    kv = _dense(cn, w.wkv, w.bkv)
    k, v = kv[:, :d], kv[:, d:]
    rec("xq", q); rec("xk", k); rec("xv", v)
    a, xp = _mha_fwd(q, k, v, bt, nq, nc, heads, dh, scale, dtype,
                     inkernel=inkernel)
    rec("xprobs", xp)
    rec("xa_in", a)
    x = _dense(a, w.wxp, w.bxp)
    rec("x_attn", x)

    on, on_xhat, on_inv = _ln_fwd(x, w.on_g, w.on_b, dtype)
    rec("on", on); rec("on_xhat", on_xhat); rec("on_inv", on_inv)
    h_pre = _dense(on, w.w1, w.b1)
    rec("xh_pre", h_pre)
    h = _gelu_fwd(h_pre, dtype)
    rec("xh", h)
    x = x + _dense(h, w.w2, w.b2)

    for i in range(depth):
        rec(f"b{i}_in", x)
        n1, n1_xhat, n1_inv = _ln_fwd(x, w.n1_g[i], w.n1_b[i], dtype)
        rec(f"b{i}_n1", n1); rec(f"b{i}_n1_xhat", n1_xhat)
        rec(f"b{i}_n1_inv", n1_inv)
        qkv = _dense(n1, w.wqkv[i], w.bqkv[i])
        sq, sk, sv = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        rec(f"b{i}_q", sq); rec(f"b{i}_k", sk); rec(f"b{i}_v", sv)
        a, sp = _mha_fwd(sq, sk, sv, bt, nq, nq, heads, dh, scale,
                         dtype, inkernel=inkernel)
        rec(f"b{i}_probs", sp)
        rec(f"b{i}_a", a)
        x = x + _dense(a, w.wp[i], w.bp[i])
        rec(f"b{i}_mid", x)
        n2, n2_xhat, n2_inv = _ln_fwd(x, w.n2_g[i], w.n2_b[i], dtype)
        rec(f"b{i}_n2", n2); rec(f"b{i}_n2_xhat", n2_xhat)
        rec(f"b{i}_n2_inv", n2_inv)
        h_pre = _dense(n2, w.wf1[i], w.bf1[i])
        rec(f"b{i}_h_pre", h_pre)
        h = _gelu_fwd(h_pre, dtype)
        rec(f"b{i}_h", h)
        x = x + _dense(h, w.wf2[i], w.bf2[i])
    return x


def _core_bwd(q2d, c2d, w: DecoderCoreWeights, g2d, *, nq, nc, heads,
              depth, dtype, inkernel=False):
    """Recompute-forward backward on 2-D slabs. Returns (dq2d, dc2d, dW)
    with dW entries fp32 in DecoderCoreWeights order."""
    d = q2d.shape[1]
    bt = q2d.shape[0] // nq
    dh = d // heads
    scale = dh ** -0.5

    s = {}
    _core_fwd(q2d, c2d, w, nq=nq, nc=nc, heads=heads, depth=depth,
              dtype=dtype, save=s, inkernel=inkernel)

    dW = {}
    # Per-block grads: each block contributes exactly once, so collect
    # per-index values and stack (Mosaic has no scatter-add).
    _STACKED = ("wf2", "bf2", "wf1", "bf1", "n2_g", "n2_b", "wp", "bp",
                "wqkv", "bqkv", "n1_g", "n1_b")
    blk = {f: [None] * depth for f in _STACKED}

    g = g2d
    for i in reversed(range(depth)):
        # x_out = x_mid + fc2(gelu(fc1(n2)))
        dh_, blk["wf2"][i], blk["bf2"][i] = _dense_bwd(
            s[f"b{i}_h"], w.wf2[i], g)
        dh_pre = _gelu_bwd(s[f"b{i}_h_pre"], dh_)
        dn2, blk["wf1"][i], blk["bf1"][i] = _dense_bwd(
            s[f"b{i}_n2"], w.wf1[i], dh_pre)
        dx_mid, blk["n2_g"][i], blk["n2_b"][i] = _ln_bwd(
            dn2, s[f"b{i}_n2_xhat"], s[f"b{i}_n2_inv"], w.n2_g[i])
        g = (g.astype(jnp.float32) + dx_mid).astype(dtype)

        # x_mid = x_in + proj(attn(qkv(n1)))
        da, blk["wp"][i], blk["bp"][i] = _dense_bwd(s[f"b{i}_a"], w.wp[i], g)
        dsq, dsk, dsv = _mha_bwd(
            s[f"b{i}_q"], s[f"b{i}_k"], s[f"b{i}_v"], s[f"b{i}_probs"],
            da, bt, nq, nq, heads, dh, scale, inkernel=inkernel)
        dqkv = jnp.concatenate([dsq, dsk, dsv], axis=1)
        dn1, blk["wqkv"][i], blk["bqkv"][i] = _dense_bwd(
            s[f"b{i}_n1"], w.wqkv[i], dqkv)
        dx_in, blk["n1_g"][i], blk["n1_b"][i] = _ln_bwd(
            dn1, s[f"b{i}_n1_xhat"], s[f"b{i}_n1_inv"], w.n1_g[i])
        g = (g.astype(jnp.float32) + dx_in).astype(dtype)

    for f in _STACKED:
        dW[f] = jnp.stack(blk[f])

    # xattn mlp: x = x_attn + fc2(gelu(fc1(out_norm(x_attn))))
    dh_, dW["w2"], dW["b2"] = _dense_bwd(s["xh"], w.w2, g)
    dh_pre = _gelu_bwd(s["xh_pre"], dh_)
    don, dW["w1"], dW["b1"] = _dense_bwd(s["on"], w.w1, dh_pre)
    dx_attn, dW["on_g"], dW["on_b"] = _ln_bwd(
        don, s["on_xhat"], s["on_inv"], w.on_g)
    g = (g.astype(jnp.float32) + dx_attn).astype(dtype)

    # x_attn = proj(xattn(q(qn), kv(cn)))
    da, dW["wxp"], dW["bxp"] = _dense_bwd(s["xa_in"], w.wxp, g)
    dq, dk_, dv_ = _mha_bwd(s["xq"], s["xk"], s["xv"], s["xprobs"], da,
                            bt, nq, nc, heads, dh, scale,
                            inkernel=inkernel)
    dkv = jnp.concatenate([dk_, dv_], axis=1)
    dqn, dW["wq"], dW["bq"] = _dense_bwd(s["qn"], w.wq, dq)
    dcn, dW["wkv"], dW["bkv"] = _dense_bwd(s["cn"], w.wkv, dkv)
    dq2d, dW["qn_g"], dW["qn_b"] = _ln_bwd(
        dqn, s["qn_xhat"], s["qn_inv"], w.qn_g)
    dc2d, dW["cn_g"], dW["cn_b"] = _ln_bwd(
        dcn, s["cn_xhat"], s["cn_inv"], w.cn_g)

    return (dq2d.astype(dtype), dc2d.astype(dtype), DecoderCoreWeights(
        **{f: dW[f] for f in DecoderCoreWeights._fields}
    ))


def decoder_core_ref(queries, context, w: DecoderCoreWeights, *, heads,
                     depth, dtype):
    """Pure-JAX mirror of the fused region (differentiable via the same
    hand-written VJP used by the kernels — exercised by the CPU tests)."""
    wc = _cast_weights(w, dtype)
    b, nq, d = queries.shape
    nc = context.shape[1]
    x2d = _core_fwd(
        queries.astype(dtype).reshape(b * nq, d),
        context.astype(dtype).reshape(b * nc, d),
        wc, nq=nq, nc=nc, heads=heads, depth=depth, dtype=dtype)
    return x2d.reshape(b, nq, d)


# ------------------------------------------------------------ kernels --


def _fwd_kernel(q_ref, c_ref, *rest, heads, depth, dtype, nq, nc):
    w = DecoderCoreWeights(*(r[...] for r in rest[:-1]))
    o_ref = rest[-1]
    o_ref[0] = _core_fwd(q_ref[0], c_ref[0], w, nq=nq, nc=nc, heads=heads,
                         depth=depth, dtype=dtype, inkernel=True)


def _bwd_kernel(q_ref, c_ref, g_ref, *rest, heads, depth, dtype, nq, nc):
    w = DecoderCoreWeights(*(r[...] for r in rest[:28]))
    dq_ref, dc_ref = rest[28], rest[29]
    dw_refs = rest[30:]
    dq, dc, dW = _core_bwd(q_ref[0], c_ref[0], w, g_ref[0], nq=nq, nc=nc,
                           heads=heads, depth=depth, dtype=dtype,
                           inkernel=True)
    dq_ref[0] = dq
    dc_ref[0] = dc
    # Weight-grad accumulation across the (sequential) batch grid: the
    # dW output blocks have constant index maps, so they stay resident
    # in VMEM across programs and are written back once at the end.
    first = pl.program_id(0) == 0
    for ref, val in zip(dw_refs, dW):
        @pl.when(first)
        def _(ref=ref, val=val):
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, val=val):
            ref[...] = ref[...] + val


def _interpret() -> bool:
    if _FORCE_MODE == "interpret":
        return True
    return jax.default_backend() != "tpu"


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _tile_spec(shape):
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                        memory_space=pltpu.VMEM)


def _fwd_call(queries, context, wc: DecoderCoreWeights, *, heads, depth,
              dtype):
    b, nq, d = queries.shape
    nc = context.shape[1]
    ns = pick_ns(b, nq, nc, d, heads, depth, dtype,
                 mlp_ratio=wc.w1.shape[1] / d)
    # GEMM M-widening: ns samples per program. The host-side reshape of
    # a contiguous (b, n, d) array to (b/ns, ns*n, d) is a free view;
    # inside the kernel every dense GEMM runs at M = ns*n while
    # attention walks per-sample row slices (_mha_fwd inkernel path).
    q = queries.reshape(b // ns, ns * nq, d)
    c = context.reshape(b // ns, ns * nc, d)
    w_specs = [_full_spec(t.shape) for t in wc]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, depth=depth,
                          dtype=dtype, nq=nq, nc=nc),
        grid=(b // ns,),
        in_specs=[_tile_spec((1, ns * nq, d)), _tile_spec((1, ns * nc, d))]
        + w_specs,
        out_specs=_tile_spec((1, ns * nq, d)),
        out_shape=jax.ShapeDtypeStruct((b // ns, ns * nq, d), dtype),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(q, c, *wc)
    return out.reshape(b, nq, d)


def _bwd_call(queries, context, g, wc: DecoderCoreWeights, *, heads,
              depth, dtype):
    b, nq, d = queries.shape
    nc = context.shape[1]
    ns = pick_ns(b, nq, nc, d, heads, depth, dtype,
                 mlp_ratio=wc.w1.shape[1] / d)
    q2 = queries.reshape(b // ns, ns * nq, d)
    c2 = context.reshape(b // ns, ns * nc, d)
    g2 = g.reshape(b // ns, ns * nq, d)
    w_specs = [_full_spec(t.shape) for t in wc]
    dw_specs = [_full_spec(t.shape) for t in wc]
    dw_shapes = [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in wc]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, depth=depth,
                          dtype=dtype, nq=nq, nc=nc),
        grid=(b // ns,),
        in_specs=[_tile_spec((1, ns * nq, d)), _tile_spec((1, ns * nc, d)),
                  _tile_spec((1, ns * nq, d))] + w_specs,
        out_specs=[_tile_spec((1, ns * nq, d)), _tile_spec((1, ns * nc, d))]
        + dw_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b // ns, ns * nq, d), dtype),
            jax.ShapeDtypeStruct((b // ns, ns * nc, d), dtype),
        ] + dw_shapes,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(q2, c2, g2, *wc)
    dq, dc = out[0].reshape(b, nq, d), out[1].reshape(b, nc, d)
    return dq, dc, DecoderCoreWeights(*out[2:])


# ---------------------------------------------------------- dispatch --


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_decoder_core(queries, context, weights: DecoderCoreWeights,
                       heads: int, depth: int, dtype):
    """queries (B, Nq, D), context (B, Nc, D) -> (B, Nq, D) in `dtype`.

    The cross-attention + MLP + `depth` transformer blocks of
    SpatialOutputAdapter, fused into one VMEM-resident Pallas program
    per batch tile. Weights are the fp32 flax params
    (collect_core_weights); gradients are returned fp32.
    """
    out, _ = _fused_fwd(queries, context, weights, heads, depth, dtype)
    return out


def _fused_fwd(queries, context, weights, heads, depth, dtype):
    q = queries.astype(dtype)
    c = context.astype(dtype)
    wc = _cast_weights(weights, dtype)
    if _FORCE_MODE == "ref":
        b, nq, d = q.shape
        nc = c.shape[1]
        out = _core_fwd(q.reshape(b * nq, d), c.reshape(b * nc, d), wc,
                        nq=nq, nc=nc, heads=heads, depth=depth,
                        dtype=dtype).reshape(q.shape)
    else:
        out = _fwd_call(q, c, wc, heads=heads, depth=depth, dtype=dtype)
    return out, (q, c, wc)


def _fused_bwd(heads, depth, dtype, res, g):
    q, c, wc = res
    g = g.astype(dtype)
    if _FORCE_MODE == "ref":
        b, nq, d = q.shape
        nc = c.shape[1]
        dq, dc, dW = _core_bwd(
            q.reshape(b * nq, d), c.reshape(b * nc, d), wc,
            g.reshape(b * nq, d), nq=nq, nc=nc, heads=heads, depth=depth,
            dtype=dtype)
        dq = dq.reshape(q.shape)
        dc = dc.reshape(c.shape)
    else:
        dq, dc, dW = _bwd_call(q, c, g, wc, heads=heads, depth=depth,
                               dtype=dtype)
    return dq, dc, dW


fused_decoder_core.defvjp(_fused_fwd, _fused_bwd)
