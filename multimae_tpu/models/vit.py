"""ViT primitives: Mlp, Attention, CrossAttention, Block, DecoderBlock.

Behavioural parity targets (reference: multimae/multimae_utils.py):
  * Mlp            — :138-155 (fc1 -> GELU(exact) -> fc2 -> dropout)
  * Attention      — :158-182 (fused qkv, scale = head_dim**-0.5)
  * CrossAttention — :185-214 (q from queries, fused kv from context)
  * Block          — :217-232 (pre-LN, residual, optional DropPath)
  * DecoderBlock   — :235-253 (self-attn + cross-attn + MLP)
  * DropPath       — :105-135 (per-sample stochastic depth)

TPU-first design choices:
  * Computation dtype is configurable (bfloat16 by default in training);
    parameters stay float32. LayerNorm statistics and attention softmax
    run in float32 for stability (this mirrors what AMP autocast does in
    the reference).
  * qkv / kv projections stay fused (one MXU matmul each).
  * Attention is einsum-based; XLA fuses scale+softmax. A Pallas flash
    kernel can be swapped in via `multimae_tpu.ops.attention` for long
    sequences (512px fine-tuning).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimae_tpu.parallel.mesh import TP_SCOPE_RE, constrain_tp


def _in_tp_scope(path) -> bool:
    """True when a flax module path sits in a Megatron-TP scope
    (encoder blocks, TP_SCOPE_RE) — i.e. its q/k/v head dim is
    'model'-sharded by constrain_tp and attention kernels must run on
    local head slices."""
    return path is not None and any(TP_SCOPE_RE.match(str(p)) for p in path)

Dtype = jnp.dtype

LAYERNORM_EPS = 1e-6


def qkv_fused_init(num_fused: int) -> Callable:
    """Per-Q/K/V fan-in uniform init for fused projections.

    Matches the reference's special-casing of 'qkv'/'kv' linear weights
    (multimae/multimae.py:101-110): torch weight (num_fused*dim, dim) gets
    U(-val, val) with val = sqrt(6 / (dim + dim)). Our kernel layout is
    (in_dim, num_fused*out_dim).
    """

    def init(key, shape, dtype=jnp.float32):
        in_dim = shape[0]
        out_per = shape[1] // num_fused
        val = math.sqrt(6.0 / float(out_per + in_dim))
        return jax.random.uniform(key, shape, dtype, -val, val)

    return init


xavier_uniform = nn.initializers.xavier_uniform()
trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)

# GELU variant switch (read at trace time). The reference uses the exact
# erf GELU (torch nn.GELU default). bf16 tensors take the fast polynomial
# path (ops/fast_gelu.py: exact to <=1 bf16 ulp, exhaustively verified —
# XLA's erf rational lowering was ~25% of the 512px fine-tune step);
# fp32 keeps jax.nn.gelu's erf so golden parity runs untouched. The tanh
# approximation (--approx_gelu / set_approx_gelu) remains as an explicit
# opt-in but no longer buys anything over the bf16 fast path.
_APPROX_GELU = False


def set_approx_gelu(enabled: bool):
    global _APPROX_GELU
    _APPROX_GELU = bool(enabled)


def gelu(x):
    if _APPROX_GELU:
        return nn.gelu(x, approximate=True)
    if x.dtype == jnp.bfloat16:
        from multimae_tpu.ops.fast_gelu import gelu_bf16_exact

        return gelu_bf16_exact(x)
    return nn.gelu(x, approximate=False)


def drop_path(
    x: jnp.ndarray,
    rate: float,
    deterministic: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference multimae_utils.py:105-120)."""
    if rate == 0.0 or deterministic:
        return x
    keep_prob = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, dtype=jnp.float32))
    return (x / keep_prob * mask.astype(x.dtype)).astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.LayerNorm(
            epsilon=LAYERNORM_EPS,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="ln",
        )(x.astype(jnp.float32))
        return out.astype(self.dtype)


class Mlp(nn.Module):
    hidden_features: int
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc1",
        )(x)
        x = gelu(x)  # exact erf by default (torch nn.GELU); see set_approx_gelu
        # TP: hidden dim over 'model' (encoder scopes only; no-op elsewhere)
        x = constrain_tp(x, x.ndim - 1, self.path)
        x = nn.Dense(
            out_features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(x)
        if self.drop > 0.0:
            x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def _attention_core(q, k, v, scale: float, dtype,
                    tp_scoped: bool = False) -> jnp.ndarray:
    """Softmax attention with fp32 logits/softmax.

    q,k,v: (B, N, H, Dh) — the natural reshape of the fused qkv Dense
    output (no transposes materialised anywhere on this path). Returns
    (B, N, H, Dh) in `dtype`. Dispatches to the fused short-attention
    Pallas kernel on TPU/bf16 (ops/attention.py); `tp_scoped` marks
    Megatron-TP call sites (model-sharded heads, head-sliced kernel).
    """
    from multimae_tpu.ops.attention import fused_attention_bnhd

    return fused_attention_bnhd(q, k, v, scale, tp_scoped).astype(dtype)


def _attention_core_dropped(q, k, v, scale: float, dtype, rate: float,
                            deterministic: bool) -> jnp.ndarray:
    """Dense attention with dropout on the softmax probabilities.

    Reference semantics (multimae/multimae_utils.py:164-176): softmax ->
    nn.Dropout(attn_drop) -> @ v. Only taken when rate > 0 and training —
    no recipe in cfgs/ enables attn_drop, so the fused path stays the
    default; this path keeps the constructor contract complete.
    q,k,v: (B, N, H, Dh).
    """
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    probs = nn.Dropout(rate, deterministic=deterministic)(probs)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(
            3 * c,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=qkv_fused_init(3),
            bias_init=nn.initializers.zeros,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        # TP: heads over 'model' (encoder scopes on 2-D meshes only). The
        # replicated qkv output slices locally; proj becomes row-parallel
        # (psum).
        q, k, v = (constrain_tp(qkv[:, :, i], 2, self.path) for i in range(3))
        if self.attn_drop > 0.0:
            out = _attention_core_dropped(
                q, k, v, scale, self.dtype, self.attn_drop, deterministic
            )
        else:
            out = _attention_core(q, k, v, scale, self.dtype,
                                  tp_scoped=_in_tp_scope(self.path))
        out = out.reshape(b, n, c)
        out = nn.Dense(
            c,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class CrossAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True):
        b, n, c = x.shape
        m = context.shape[1]
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        q = nn.Dense(
            c,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            name="q",
        )(x)
        kv = nn.Dense(
            2 * c,
            use_bias=self.qkv_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=qkv_fused_init(2),
            bias_init=nn.initializers.zeros,
            name="kv",
        )(context)
        q = constrain_tp(q.reshape(b, n, self.num_heads, head_dim), 2, self.path)
        kv = kv.reshape(b, m, 2, self.num_heads, head_dim)
        k, v = (constrain_tp(kv[:, :, i], 2, self.path) for i in range(2))
        if self.attn_drop > 0.0:
            out = _attention_core_dropped(
                q, k, v, scale, self.dtype, self.attn_drop, deterministic
            )
        else:
            out = _attention_core(q, k, v, scale, self.dtype,
                                  tp_scoped=_in_tp_scope(self.path))
        out = out.reshape(b, n, c)
        out = nn.Dense(
            c,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(out)
        if self.proj_drop > 0.0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-LN ViT block (reference multimae_utils.py:217-232)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]

        if deterministic and not self.is_initializing() and self.qkv_bias:
            # Inference hot path: the whole block (LN1 -> attn -> +res ->
            # LN2 -> MLP -> +res) as one VMEM-resident Pallas program per
            # sample (ops/fused_block_pallas; ~17% over XLA fwd at the
            # 99-197-token serving shapes). Eval only: no VJP on purpose —
            # training's XLA backward runs near-peak MXU from residuals.
            from multimae_tpu.ops import fused_block_pallas as fbp

            hidden = int(dim * self.mlp_ratio)
            from multimae_tpu.parallel.mesh import (
                constraint_data_size,
                data_shard_map,
            )

            if (
                fbp.enabled()
                and dim % self.num_heads == 0
                # bf16 only: the kernel's GELU is the tanh-basis
                # polynomial (Mosaic has no erf), which matches the bf16
                # module path but would break the contract that fp32
                # paths keep jax.nn.gelu's exact erf (golden parity) —
                # e.g. the depth fine-tune recipe runs fp32 eval.
                and jnp.dtype(self.dtype) == jnp.dtype(jnp.bfloat16)
                and fbp.supported(x.shape[1], dim, hidden, self.dtype)
                and x.shape[0] % constraint_data_size() == 0
            ):
                w = fbp.collect_block_weights(self.variables["params"])
                heads, dtype = self.num_heads, self.dtype
                # Under a data mesh the opaque kernel must be shard_mapped
                # or GSPMD replicates it (see SCALING.md rule 3).
                core = data_shard_map(
                    lambda xx, ww: fbp.fused_block_infer(xx, ww, heads, dtype),
                    n_data_args=1,
                )
                return core(x, w).astype(x.dtype)

        def maybe_drop_path(h):
            if self.drop_path_rate > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
                return drop_path(h, self.drop_path_rate, deterministic, rng)
            return h

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="attn",
        )(h, deterministic=deterministic)
        x = x + maybe_drop_path(h)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        x = x + maybe_drop_path(h)
        return x


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn + MLP (reference multimae_utils.py:235-253)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True):
        dim = x.shape[-1]

        def maybe_drop_path(h):
            if self.drop_path_rate > 0.0 and not deterministic:
                rng = self.make_rng("dropout")
                return drop_path(h, self.drop_path_rate, deterministic, rng)
            return h

        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="self_attn",
        )(h, deterministic=deterministic)
        x = x + maybe_drop_path(h)
        q = LayerNorm(dtype=self.dtype, name="query_norm")(x)
        ctx = LayerNorm(dtype=self.dtype, name="context_norm")(context)
        h = CrossAttention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="cross_attn",
        )(q, ctx, deterministic=deterministic)
        x = x + maybe_drop_path(h)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic=deterministic)
        x = x + maybe_drop_path(h)
        return x
