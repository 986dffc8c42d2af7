"""Input adapters: tokenize per-modality inputs into encoder tokens.

Parity targets:
  * PatchedInputAdapter (reference: multimae/input_adapters.py:27-119)
  * SemSegInputAdapter  (reference: multimae/input_adapters.py:122-241)

TPU-first design:
  * Inputs are NHWC; patchify is expressed as reshape + one fused Dense
    matmul (identical math to the reference's strided Conv2d with
    kernel == stride, but guaranteed to hit the MXU with no layout
    shuffles).
  * Positional embeddings are stored (1, h, w, D) and resized with the
    torch-parity matmul resize (bicubic for images, bilinear for semseg,
    matching reference :113 and :235).
  * Fixed sin-cos pos-embs are parameters excluded from gradients via the
    optimizer's `frozen` param-group label (reference freezes them with
    requires_grad=False).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimae_tpu.models.vit import Dtype, trunc_normal_02
from multimae_tpu.ops.posemb import build_2d_sincos_posemb
from multimae_tpu.ops.resize import interpolate_2d


def pair(t):
    return t if isinstance(t, tuple) else (t, t)


def patchify(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N_H*N_W, ph*pw*C) with (ph, pw, c) minor order.

    The minor order matches torch Conv2d weight flattening after our
    OIHW -> (ph pw i) o transposition, so checkpoint mapping is a pure
    reshape/transpose.
    """
    b, h, w, c = x.shape
    nh, nw = h // ph, w // pw
    x = x.reshape(b, nh, ph, nw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, ph, pw, c)
    return x.reshape(b, nh * nw, ph * pw * c)


def conv_as_linear_init(key, shape, dtype=jnp.float32):
    """MAE-style patch-projection init (reference multimae/multimae.py:112-116):

    xavier_uniform over the torch weight viewed as (O, I*kh*kw). For our
    dense kernel of shape (ph*pw*C, D) this is U(-a, a) with
    a = sqrt(6 / (fan_in + D)).
    """
    fan_in, fan_out = shape[0], shape[1]
    a = math.sqrt(6.0 / float(fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -a, a)


class PatchedInputAdapter(nn.Module):
    """Dense-image tokenizer (reference input_adapters.py:27-119)."""

    num_channels: int
    stride_level: int
    patch_size_full: Union[int, Tuple[int, int]]
    dim_tokens: Optional[int] = None
    sincos_pos_emb: bool = True
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    dtype: Dtype = jnp.float32

    @property
    def patch_hw(self) -> Tuple[int, int]:
        p = pair(self.patch_size_full)
        return max(1, p[0] // self.stride_level), max(1, p[1] // self.stride_level)

    @property
    def posemb_hw(self) -> Tuple[int, int]:
        img = pair(self.image_size)
        ph, pw = self.patch_hw
        return img[0] // (self.stride_level * ph), img[1] // (self.stride_level * pw)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) at this modality's stride level -> (B, N, D)."""
        assert self.dim_tokens is not None, "dim_tokens must be set (late init)"
        b, h, w, c = x.shape
        ph, pw = self.patch_hw
        assert h % ph == 0 and w % pw == 0, (
            f"Image sizes {h}x{w} must be divisible by patch sizes {ph}x{pw}"
        )
        nh, nw = h // ph, w // pw

        h_pe, w_pe = self.posemb_hw
        if self.sincos_pos_emb:
            pos_emb = self.param(
                "pos_emb",
                lambda key, shape: jnp.asarray(
                    build_2d_sincos_posemb(h_pe, w_pe, self.dim_tokens)
                ),
                (1, h_pe, w_pe, self.dim_tokens),
            )
        else:
            pos_emb = self.param(
                "pos_emb", trunc_normal_02, (1, h_pe, w_pe, self.dim_tokens)
            )

        tokens = patchify(x.astype(self.dtype), ph, pw)
        tokens = nn.Dense(
            self.dim_tokens,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_as_linear_init,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(tokens)

        pe = interpolate_2d(pos_emb, (nh, nw), mode="bicubic", align_corners=False)
        pe = pe.reshape(1, nh * nw, self.dim_tokens).astype(self.dtype)
        return tokens + pe

    def no_weight_decay(self):
        return {"pos_emb"}


class SemSegInputAdapter(nn.Module):
    """Class-map tokenizer (reference input_adapters.py:122-241).

    Input is an int class map at 1/stride_level resolution:
    (B, H/stride, W/stride) int32.
    """

    num_classes: int
    stride_level: int
    patch_size_full: Union[int, Tuple[int, int]]
    dim_tokens: Optional[int] = None
    sincos_pos_emb: bool = True
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    dim_class_emb: int = 64
    interpolate_class_emb: bool = False
    emb_padding_idx: Optional[int] = None
    dtype: Dtype = jnp.float32

    @property
    def total_classes(self) -> int:
        return self.num_classes + (1 if self.emb_padding_idx is not None else 0)

    @property
    def patch_hw(self) -> Tuple[int, int]:
        p = pair(self.patch_size_full)
        return max(1, p[0] // self.stride_level), max(1, p[1] // self.stride_level)

    @property
    def posemb_hw(self) -> Tuple[int, int]:
        img = pair(self.image_size)
        ph, pw = self.patch_hw
        return img[0] // (self.stride_level * ph), img[1] // (self.stride_level * pw)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.dim_tokens is not None, "dim_tokens must be set (late init)"
        b, h, w = x.shape
        ph, pw = self.patch_hw
        assert h % ph == 0 and w % pw == 0, (
            f"Image sizes {h}x{w} must be divisible by patch sizes {ph}x{pw}"
        )
        nh, nw = h // ph, w // pw

        h_pe, w_pe = self.posemb_hw
        if self.sincos_pos_emb:
            pos_emb = self.param(
                "pos_emb",
                lambda key, shape: jnp.asarray(
                    build_2d_sincos_posemb(h_pe, w_pe, self.dim_tokens)
                ),
                (1, h_pe, w_pe, self.dim_tokens),
            )
        else:
            pos_emb = self.param(
                "pos_emb", trunc_normal_02, (1, h_pe, w_pe, self.dim_tokens)
            )

        class_emb = self.param(
            "class_emb", trunc_normal_02, (self.total_classes, self.dim_class_emb)
        )
        if self.emb_padding_idx is not None:
            # torch nn.Embedding(padding_idx=...) pins that row to zero and
            # never updates it; zeroing here makes its gradient identically
            # zero as well.
            class_emb = class_emb.at[self.emb_padding_idx].set(0.0)

        # One-hot matmul instead of jnp.take: the lookup's backward is a
        # scatter-add of B*H*W rows into num_classes rows, measured at
        # ~8.6 ms/step (6%) for the ViT-B pretrain recipe; as a matmul both
        # directions run on the MXU. Bit-exact (single 1.0 term per row,
        # fp32 accumulation).
        onehot = jax.nn.one_hot(x, self.total_classes, dtype=self.dtype)
        emb = jnp.einsum(
            "bhwc,cd->bhwd", onehot, class_emb.astype(self.dtype),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)  # (B, H, W, 64)
        # Under a data mesh GSPMD mis-propagated shardings through the
        # downstream patchify reshape/transpose ("involuntary full
        # rematerialization" warnings); pin batch sharding here so the
        # chain stays batch-sharded. No-op without a registered mesh.
        from multimae_tpu.parallel.mesh import constrain_batch_sharded

        emb = constrain_batch_sharded(emb)

        if self.interpolate_class_emb:
            # Reference downsamples embeddings bilinearly then 1x1-projects
            # (input_adapters.py:198-204).
            emb = interpolate_2d(emb, (nh, nw), mode="bilinear", align_corners=False)
            tokens = emb.reshape(b, nh * nw, self.dim_class_emb)
            tokens = nn.Dense(
                self.dim_tokens,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_as_linear_init,
                bias_init=nn.initializers.zeros,
                name="proj",
            )(tokens)
        else:
            tokens = constrain_batch_sharded(patchify(emb, ph, pw))
            tokens = nn.Dense(
                self.dim_tokens,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_as_linear_init,
                bias_init=nn.initializers.zeros,
                name="proj",
            )(tokens)

        pe = interpolate_2d(pos_emb, (nh, nw), mode="bilinear", align_corners=False)
        pe = pe.reshape(1, nh * nw, self.dim_tokens).astype(self.dtype)
        return tokens + pe

    def no_weight_decay(self):
        return {"pos_emb", "class_emb"}
