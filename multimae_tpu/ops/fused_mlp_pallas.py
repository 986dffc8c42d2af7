"""Fused Dense -> GELU -> Dense (Pallas, TPU) for huge-row MLPs.

Built for the ConvNeXt semseg head (reference
multimae/output_adapter_utils.py:19-57 pwconv1/act/pwconv2): at 512px
fine-tune shapes the block's MLP runs over B*128*128 = 262k rows with
K=384, H=1536 — arithmetic intensity ~K, so XLA's un-fusable
GEMM -> gelu -> GEMM materializes a (B,128,128,1536) bf16 intermediate
(~805 MB at B=16) and the pair measures ~25% MFU, HBM-bound. This
kernel walks static row tiles, keeps the hidden strip in VMEM, and
never touches HBM with it: fwd traffic drops from ~5x to ~2x the
in/out slabs.

The backward (custom_vjp) RECOMPUTES the first GEMM per tile instead of
saving pre-activations (the decoder-kernel playbook: one extra
K*H-GEMM per tile is cheaper than an 805 MB round trip), and
accumulates dW/db in fp32 VMEM across the sequential grid.

Weight grads are accumulated over row tiles in the kernel, so results
match the module path to fp32-accumulation-order noise; equivalence is
pinned by tests/test_fused_mlp.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimae_tpu.ops.fused_decoder_pallas import (
    _dense,
    _gelu_bwd,
    _gelu_fwd,
    _ln_bwd,
    _ln_fwd,
)

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

_ROW_TILE = 2048

_FORCE_MODE = None  # None | "interpret" (CPU tests)


def set_force_mode(mode):
    global _FORCE_MODE
    assert mode in (None, "interpret")
    _FORCE_MODE = mode


def _interpret() -> bool:
    if _FORCE_MODE == "interpret":
        return True
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    if _FORCE_MODE is not None:
        return True
    # model>1 TP meshes: this kernel lives OUTSIDE the TP scopes
    # (TP_SCOPE_RE = encoder blocks), so its operands are replicated
    # over 'model' and data_shard_map replicates the kernel there too —
    # identical redundancy to the XLA path, same per-chip win.
    return (
        os.environ.get("MULTIMAE_TPU_NO_FUSED_MLP") != "1"
        and jax.default_backend() == "tpu"
    )


def supported(m: int, k: int, h: int, dtype) -> bool:
    """Lane-tile dims, and enough rows that the fused pass matters (the
    kernel targets the >=100k-row ConvNeXt regime; small-M MLPs are
    GEMM-bound and XLA handles them at peak)."""
    if k % 128 or h % 128:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    item = jnp.dtype(dtype).itemsize
    tile = _ROW_TILE * (2 * k + h) * item * 2
    weights = item * 2 * k * h + 4 * (k * h * 2 + k + h)  # bf16 + fp32 grads
    return m >= 8 * _ROW_TILE and tile + weights <= 80 * 1024 * 1024


def _pad_rows(a, m_pad):
    if a.shape[0] == m_pad:
        return a
    return jnp.pad(a, ((0, m_pad - a.shape[0]), (0, 0)))


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    h = _gelu_fwd(_dense(x_ref[...], w1_ref[...], b1_ref[...]), x_ref.dtype)
    y_ref[...] = _dense(h, w2_ref[...], b2_ref[...])


def _bwd_kernel(x_ref, dy_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    pre = _dense(x, w1, b1_ref[...])
    h = _gelu_fwd(pre, x.dtype)

    dw2 = jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dy, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dpre = _gelu_bwd(pre, dh)
    dw1 = jax.lax.dot_general(
        x, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jax.lax.dot_general(
        dpre, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(i != 0)
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2


def _w_spec(t):
    return pl.BlockSpec(t.shape, lambda i: (0,) * t.ndim,
                        memory_space=pltpu.VMEM)


def _row_spec(k):
    return pl.BlockSpec((_ROW_TILE, k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """x (M, K) @ w1 (K, H) + b1 -> gelu -> @ w2 (H, K) + b2 -> (M, K).

    Weights fp32 (flax param_dtype); compute in x.dtype; dW in fp32."""
    return _fwd(x, w1, b1, w2, b2)[0]


def _cast_w(x, w1, b1, w2, b2):
    dt = x.dtype
    return w1.astype(dt), b1.reshape(1, -1).astype(dt), \
        w2.astype(dt), b2.reshape(1, -1).astype(dt)


def _fwd(x, w1, b1, w2, b2):
    m, k = x.shape
    h = w1.shape[1]
    w1c, b1c, w2c, b2c = _cast_w(x, w1, b1, w2, b2)
    m_pad = _ROW_TILE * ((m + _ROW_TILE - 1) // _ROW_TILE)
    xp = _pad_rows(x, m_pad)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(m_pad // _ROW_TILE,),
        in_specs=[_row_spec(k), _w_spec(w1c), _w_spec(b1c), _w_spec(w2c),
                  _w_spec(b2c)],
        out_specs=_row_spec(k),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), x.dtype),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(xp, w1c, b1c, w2c, b2c)
    return y[:m], (x, w1, b1, w2, b2)


def _bwd(res, dy):
    x, w1, b1, w2, b2 = res
    m, k = x.shape
    h = w1.shape[1]
    w1c, b1c, w2c, _ = _cast_w(x, w1, b1, w2, b2)
    m_pad = _ROW_TILE * ((m + _ROW_TILE - 1) // _ROW_TILE)
    xp = _pad_rows(x, m_pad)
    dyp = _pad_rows(dy.astype(x.dtype), m_pad)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(m_pad // _ROW_TILE,),
        in_specs=[_row_spec(k), _row_spec(k), _w_spec(w1c), _w_spec(b1c),
                  _w_spec(w2c)],
        out_specs=[
            _row_spec(k),
            pl.BlockSpec((k, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, k), x.dtype),
            jax.ShapeDtypeStruct((k, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(xp, dyp, w1c, b1c, w2c)
    return (dx[:m], dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype))


fused_mlp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Whole ConvNeXt-block tail: LayerNorm -> MLP -> + residual, one pass.
# Folds the block's LN prologue and residual epilogue into the same row
# tiles, removing two more full-tensor HBM round trips per block (the
# gamma layer-scale is disabled in the reference's isotropic adapter —
# output_adapter_utils.py:28 — so the epilogue is a plain add).
# ---------------------------------------------------------------------------


def _lmr_fwd_kernel(x_ref, r_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, y_ref):
    n1, _, _ = _ln_fwd(x_ref[...], g_ref[...], b_ref[...], x_ref.dtype)
    h = _gelu_fwd(_dense(n1, w1_ref[...], b1_ref[...]), x_ref.dtype)
    y_ref[...] = r_ref[...] + _dense(h, w2_ref[...], b2_ref[...])


def _lmr_bwd_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                    dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    g = g_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    n1, xhat, inv = _ln_fwd(x, g, b_ref[...], x.dtype)
    pre = _dense(n1, w1, b1_ref[...])
    h = _gelu_fwd(pre, x.dtype)

    dw2 = jax.lax.dot_general(
        h, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2 = jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dh = jax.lax.dot_general(
        dy, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dpre = _gelu_bwd(pre, dh)
    dw1 = jax.lax.dot_general(
        n1, dpre, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0, keepdims=True)
    dn1 = jax.lax.dot_general(
        dpre, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dx, dg, db = _ln_bwd(dn1, xhat, inv, g)
    dx_ref[...] = dx.astype(x.dtype)

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = dg
        db_ref[...] = db
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2

    @pl.when(i != 0)
    def _acc():
        dg_ref[...] += dg
        db_ref[...] += db
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2


@jax.custom_vjp
def fused_ln_mlp_res(x, res, ln_g, ln_b, w1, b1, w2, b2):
    """res + Dense(gelu(Dense(LN(x)))): the ConvNeXt block after its
    depthwise conv, as one row-tiled pass. LN params fp32 (1-d)."""
    return _lmr_fwd(x, res, ln_g, ln_b, w1, b1, w2, b2)[0]


def _lmr_fwd(x, res, ln_g, ln_b, w1, b1, w2, b2):
    m, k = x.shape
    w1c, b1c, w2c, b2c = _cast_w(x, w1, b1, w2, b2)
    g2 = ln_g.reshape(1, -1).astype(jnp.float32)
    bb2 = ln_b.reshape(1, -1).astype(jnp.float32)
    m_pad = _ROW_TILE * ((m + _ROW_TILE - 1) // _ROW_TILE)
    y = pl.pallas_call(
        _lmr_fwd_kernel,
        grid=(m_pad // _ROW_TILE,),
        in_specs=[_row_spec(k), _row_spec(k), _w_spec(g2), _w_spec(bb2),
                  _w_spec(w1c), _w_spec(b1c), _w_spec(w2c), _w_spec(b2c)],
        out_specs=_row_spec(k),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), x.dtype),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(_pad_rows(x, m_pad), _pad_rows(res, m_pad), g2, bb2, w1c, b1c, w2c, b2c)
    return y[:m], (x, ln_g, ln_b, w1, b1, w2, b2)


def _lmr_bwd(resids, dy):
    x, ln_g, ln_b, w1, b1, w2, b2 = resids
    m, k = x.shape
    h = w1.shape[1]
    w1c, b1c, w2c, _ = _cast_w(x, w1, b1, w2, b2)
    g2 = ln_g.reshape(1, -1).astype(jnp.float32)
    bb2 = ln_b.reshape(1, -1).astype(jnp.float32)
    m_pad = _ROW_TILE * ((m + _ROW_TILE - 1) // _ROW_TILE)
    dyc = dy.astype(x.dtype)
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        _lmr_bwd_kernel,
        grid=(m_pad // _ROW_TILE,),
        in_specs=[_row_spec(k), _row_spec(k), _w_spec(g2), _w_spec(bb2),
                  _w_spec(w1c), _w_spec(b1c), _w_spec(w2c)],
        out_specs=[
            _row_spec(k),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, k), x.dtype),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(_pad_rows(x, m_pad), _pad_rows(dyc, m_pad), g2, bb2, w1c, b1c, w2c)
    return (dx[:m], dy, dg.reshape(ln_g.shape).astype(ln_g.dtype),
            db.reshape(ln_b.shape).astype(ln_b.dtype),
            dw1.astype(w1.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(b2.shape).astype(b2.dtype))


fused_ln_mlp_res.defvjp(_lmr_fwd, _lmr_bwd)
