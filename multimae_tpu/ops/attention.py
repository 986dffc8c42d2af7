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


def _pad_len(n: int, multiple: int = 128) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def einsum_attention(q, k, v, sm_scale: float) -> jnp.ndarray:
    """Dense softmax attention, fp32 logits (reference semantics)."""
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * sm_scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# Rematerialized variant: autodiff otherwise saves the fp32 (B, H, N, N)
# softmax tensor of EVERY layer as a residual — ~6 GB at B=256 for the
# ViT-B pretrain model (measured HBM OOM dump). Recomputing the softmax in
# the backward pass keeps only q/k/v (bf16) live between fwd and bwd.
# Cost on v5e: ~8% step time at B=128; REQUIRED to fit B>=256 on 16GB.
einsum_attention_remat = jax.checkpoint(einsum_attention, static_argnums=(3,))

_REMAT_ATTENTION = False


def set_attention_remat(enabled: bool):
    """Trade ~8% step time for O(B*H*N^2) fp32 activation memory.

    Must be set BEFORE tracing/jitting the model (read at trace time).
    The pretraining CLI enables it automatically for batch sizes > 128.
    """
    global _REMAT_ATTENTION
    _REMAT_ATTENTION = bool(enabled)


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


def fused_attention(q, k, v, sm_scale: float) -> jnp.ndarray:
    """q: (B, H, Nq, D), k/v: (B, H, Nk, D) -> (B, H, Nq, D)."""
    if _use_flash(q, k):
        return flash_attention_padded(q, k, v, sm_scale)
    if _REMAT_ATTENTION:
        return einsum_attention_remat(q, k, v, sm_scale)
    return einsum_attention(q, k, v, sm_scale)
