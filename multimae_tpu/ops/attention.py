"""Fused attention dispatch.

The reference computes dense softmax attention, materialising the
(B, H, N, N) probability tensor in fp32 (multimae/multimae_utils.py:
170-182). On TPU that tensor's HBM traffic dominates the short-sequence
regime this model lives in (99-1025 tokens), so on TPU/bf16 we run a
Pallas flash-attention kernel (jax.experimental.pallas.ops.tpu) that
keeps the softmax in VMEM. Sequences are padded to the 128-token MXU
tile and masked via segment ids; padded query rows are sliced off.

Numerics: flash attention computes the same softmax (fp32 accumulation)
up to reassociation; the einsum path remains the default under fp32 /
non-TPU backends (and is what the CPU parity tests exercise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# Measured on v5e (axon): XLA's fused dense attention beats the shipped
# Pallas flash kernel at every sequence length this model uses (99-token
# pretrain: ~1.6x; 1025-token 512px fine-tune: ~2.4x — the 1152-pad forces
# 128-wide kv blocks; padding 1025->1536 for 512-wide blocks measured
# 19.0 vs 16.5 ms — the padding waste eats the block win). Flash
# therefore stays opt-in until a tuned custom kernel lands; enable with
# MULTIMAE_TPU_FLASH_ATTENTION=1.
import os

FLASH_MIN_KV_LEN = 512


def _use_flash(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    return (
        os.environ.get("MULTIMAE_TPU_FLASH_ATTENTION") == "1"
        and jax.default_backend() == "tpu"
        and q.dtype == jnp.bfloat16
        and q.shape[-1] in (32, 64, 128, 256)
        and k.shape[2] >= FLASH_MIN_KV_LEN
        and q.shape[2] >= 128
    )


def _use_flash_bnhd(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    return (
        os.environ.get("MULTIMAE_TPU_FLASH_ATTENTION") == "1"
        and jax.default_backend() == "tpu"
        and q.dtype == jnp.bfloat16
        and q.shape[-1] in (32, 64, 128, 256)
        and k.shape[1] >= FLASH_MIN_KV_LEN
        and q.shape[1] >= 128
    )


def _pad_len(n: int, multiple: int = 128) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def einsum_attention(q, k, v, sm_scale: float) -> jnp.ndarray:
    """Dense softmax attention, fp32 logits (reference semantics).
    (B, H, N, D) layout."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * sm_scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def einsum_attention_bnhd(q, k, v, sm_scale: float) -> jnp.ndarray:
    """Same math in (B, N, H, D) layout — the natural reshape of a fused
    qkv projection. XLA fuses the head transposes into the matmuls, so
    no materialised moveaxis is needed on this path either."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * sm_scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# Rematerialized variant: autodiff otherwise saves the fp32 (B, H, N, N)
# softmax tensor of EVERY layer as a residual — ~6 GB at B=256 for the
# ViT-B pretrain model (measured HBM OOM dump). Recomputing the softmax in
# the backward pass keeps only q/k/v (bf16) live between fwd and bwd.
# Cost on v5e: ~8% step time at B=128. Mostly superseded by the
# light-residual path below.
einsum_attention_remat = jax.checkpoint(einsum_attention, static_argnums=(3,))
einsum_attention_bnhd_remat = jax.checkpoint(
    einsum_attention_bnhd, static_argnums=(3,)
)


# Light-residual variant: custom VJP that saves the PROBABILITIES IN THE
# COMPUTE DTYPE (bf16 in training) instead of letting autodiff keep the
# fp32 softmax output. Halves (vs fp32) the O(B*H*N^2) residual memory —
# the difference between OOM and fitting batch 256 on a 16 GB v5e —
# with NO recompute tax (unlike jax.checkpoint remat, measured ~8%).
# For fp32 inputs the cast is a no-op, so gradients are bit-identical to
# autodiff; for bf16 the backward uses bf16-rounded probabilities (the
# same rounding the forward's @v matmul already applies).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def einsum_attention_bnhd_lightres(q, k, v, sm_scale: float):
    return einsum_attention_bnhd(q, k, v, sm_scale)


def _lightres_fwd(q, k, v, sm_scale):
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * sm_scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhnm,bmhd->bnhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out, (q, k, v, probs)


def _lightres_bwd(sm_scale, res, g):
    q, k, v, probs = res
    # dv = p^T @ do
    dv = jnp.einsum(
        "bhnm,bnhd->bmhd", probs, g, preferred_element_type=jnp.float32
    ).astype(v.dtype)
    # dp = do @ v^T
    dp = jnp.einsum(
        "bnhd,bmhd->bhnm", g, v, preferred_element_type=jnp.float32
    )
    p32 = probs.astype(jnp.float32)
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    ds = (ds * sm_scale).astype(q.dtype)
    dq = jnp.einsum(
        "bhnm,bmhd->bnhd", ds, k, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    dk = jnp.einsum(
        "bhnm,bnhd->bmhd", ds, q, preferred_element_type=jnp.float32
    ).astype(k.dtype)
    return dq, dk, dv


einsum_attention_bnhd_lightres.defvjp(_lightres_fwd, _lightres_bwd)

_REMAT_ATTENTION = False
_LIGHT_RESIDUALS = os.environ.get("MULTIMAE_TPU_LIGHT_ATTENTION_RESIDUALS") == "1"


def set_attention_remat(enabled: bool):
    """Trade ~8% step time for O(B*H*N^2) fp32 activation memory.

    Must be set BEFORE tracing/jitting the model (read at trace time).
    Prefer set_light_attention_residuals for batch > 128 — same memory
    relief with no recompute.
    """
    global _REMAT_ATTENTION
    _REMAT_ATTENTION = bool(enabled)


def set_light_attention_residuals(enabled: bool):
    """Save attention probabilities as bf16 instead of the fp32 softmax
    output (einsum_attention_bnhd_lightres). Halves the O(B*H*N^2)
    residual memory — lets batch 256 fit a 16 GB v5e with no remat
    recompute. Measured ~3% step cost at B=128 (breaks one XLA bwd
    fusion), so it stays OFF below the memory cliff. Trace-time switch;
    the pretraining CLI enables it automatically for batch > 128.
    """
    global _LIGHT_RESIDUALS
    _LIGHT_RESIDUALS = bool(enabled)


def flash_attention_padded(q, k, v, sm_scale: float) -> jnp.ndarray:
    """Pallas flash attention with 128-multiple padding + segment masking."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_p, nk_p = _pad_len(nq), _pad_len(nk)

    def pad(x, n_to):
        n_from = x.shape[2]
        if n_from == n_to:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n_from), (0, 0)))

    qp, kp, vp = pad(q, nq_p), pad(k, nk_p), pad(v, nk_p)

    if nq_p == nq and nk_p == nk:
        segment_ids = None
    else:
        q_seg = (jnp.arange(nq_p) < nq).astype(jnp.int32)[None].repeat(b, 0)
        kv_seg = (jnp.arange(nk_p) < nk).astype(jnp.int32)[None].repeat(b, 0)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)

    def pick_block(n):
        for cand in (512, 256, 128):
            if n % cand == 0:
                return cand
        return n

    block_q = pick_block(nq_p)
    block_k = pick_block(nk_p)
    block_sizes = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=1,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_k_dkv=block_k, block_q_dkv=block_q,
        block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=segment_ids, causal=False,
        sm_scale=sm_scale, block_sizes=block_sizes,
    )
    return out[:, :, :nq].astype(q.dtype)


# Minimum kv length for the fused short-attention kernel. Measured on
# v5e: at the pretrain/224px shapes (99-197 tokens, head_dim 32-64) the
# per-head matmuls are so small that Mosaic's per-program overhead loses
# to XLA's streamed batched GEMM (632 vs 919 samples/s end-to-end with
# the kernel forced on) — XLA dense stays the default there. At 512px
# fine-tune shapes (1025 tokens) the per-program work is large enough
# for the kernel's zero-N^2-HBM-traffic advantage to pay (measured
# below, see PARITY.md perf notes).
SHORT_KERNEL_MIN_KV = int(os.environ.get("MULTIMAE_TPU_SHORT_KERNEL_MIN_KV", "512"))


def _use_short_kernel(q, k, tp_scoped: bool = False) -> bool:
    from multimae_tpu.ops import short_attention_pallas as sap
    from multimae_tpu.parallel.mesh import (
        constraint_data_size,
        constraint_model_size,
    )

    n_model = constraint_model_size()
    n_data = constraint_data_size()
    return (
        os.environ.get("MULTIMAE_TPU_NO_SHORT_ATTENTION") != "1"
        # TP: at TP-scoped call sites q/k/v heads are 'model'-sharded
        # (constrain_tp) and the kernel runs on the local head slice
        # via bnhd_shard_map; non-TP sites under a model>1 mesh need
        # the heads to be replicable (always true) — they shard over
        # 'data' only, mirroring the XLA path's replication.
        and (n_model == 1 or not tp_scoped or q.shape[2] % n_model == 0)
        # data mesh: the opaque kernel must shard the batch dim
        and (n_data <= 1 or q.shape[0] % n_data == 0)
        and jax.default_backend() == "tpu"
        and q.dtype == jnp.bfloat16
        and k.shape[1] >= SHORT_KERNEL_MIN_KV
        and sap.supported(q, k)
    )


def fused_attention(q, k, v, sm_scale: float) -> jnp.ndarray:
    """q: (B, H, Nq, D), k/v: (B, H, Nk, D) -> (B, H, Nq, D).

    BHND-layout compatibility wrapper around fused_attention_bnhd."""
    out = fused_attention_bnhd(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        sm_scale,
    )
    return jnp.swapaxes(out, 1, 2)


def fused_attention_bnhd(q, k, v, sm_scale: float,
                         tp_scoped: bool = False) -> jnp.ndarray:
    """q: (B, Nq, H, D), k/v: (B, Nk, H, D) -> (B, Nq, H, D).

    Dispatch (TPU, bf16): the fused short-sequence Pallas kernel
    (ops/short_attention_pallas.py) for the 99-1025 token shapes this
    model uses — no N^2 HBM traffic, softmax recomputed in backward so
    no N^2 residuals either (supersedes wholesale attention remat).
    Opt out with MULTIMAE_TPU_NO_SHORT_ATTENTION=1. The shipped flash
    kernel stays opt-in for very long sequences; XLA dense einsum is the
    CPU / fp32 / fallback path (golden-parity reference semantics).

    `tp_scoped`: the caller sits in a Megatron TP scope (encoder
    blocks), i.e. the head dim is 'model'-sharded — the kernel then
    runs per-device on its head slice via bnhd_shard_map.
    """
    if _use_short_kernel(q, k, tp_scoped):
        from multimae_tpu.ops.short_attention_pallas import short_attention
        from multimae_tpu.parallel.mesh import bnhd_shard_map

        core = bnhd_shard_map(
            lambda qq, kk, vv: short_attention(qq, kk, vv, sm_scale),
            tp_scoped=tp_scoped,
        )
        return core(q, k, v)
    if _use_flash_bnhd(q, k):
        out = flash_attention_padded(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), sm_scale,
        )
        return jnp.swapaxes(out, 1, 2)
    if _REMAT_ATTENTION:
        return einsum_attention_bnhd_remat(q, k, v, sm_scale)
    if _LIGHT_RESIDUALS and q.dtype == jnp.bfloat16:
        return einsum_attention_bnhd_lightres(q, k, v, sm_scale)
    return einsum_attention_bnhd(q, k, v, sm_scale)
