from multimae_tpu.ops.attention import (
    einsum_attention,
    fused_attention,
    set_attention_remat,
    set_light_attention_residuals,
)
from multimae_tpu.ops.gather import gather_tokens, select_or_zero
from multimae_tpu.ops.masking import (
    generate_random_masks,
    make_mask,
    masks_to_indices,
    sample_alphas,
)
from multimae_tpu.ops.posemb import build_2d_sincos_posemb
from multimae_tpu.ops.resize import interpolate_2d, interpolate_tokens_2d

__all__ = [
    "build_2d_sincos_posemb",
    "interpolate_2d",
    "interpolate_tokens_2d",
    "gather_tokens",
    "select_or_zero",
    "generate_random_masks",
    "make_mask",
    "masks_to_indices",
    "sample_alphas",
    "einsum_attention",
    "fused_attention",
    "set_attention_remat",
    "set_light_attention_residuals",
]
