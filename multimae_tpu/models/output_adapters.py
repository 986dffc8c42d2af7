"""Output adapters: per-task decoders / heads.

Parity targets (reference: multimae/output_adapters.py):
  * SpatialOutputAdapter            — :33-282  (pretraining decoder)
  * LinearOutputAdapter             — :285-356 (classification head)
  * SegmenterMaskTransformerAdapter — :359-478 (semseg head)
  * ConvNeXtAdapter                 — :481-573 (semseg head)
  * DPTOutputAdapter                — :576-759 (dense prediction head)

All image outputs are NHWC. `input_info` is a static Python dict built
from static shapes (see MultiMAE.generate_input_info), so slicing by task
start/end indices happens at trace time.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimae_tpu.models.conv_utils import ConvNeXtBlock, FeatureFusionBlock
from multimae_tpu.models.input_adapters import pair
from multimae_tpu.models.vit import (
    Block,
    CrossAttention,
    Dtype,
    LayerNorm,
    Mlp,
    trunc_normal_02,
    xavier_uniform,
)
from multimae_tpu.ops.posemb import build_2d_sincos_posemb
from multimae_tpu.ops.resize import interpolate_2d


class SpatialOutputAdapter(nn.Module):
    """Cross-attention decoder for spatial outputs (reference :33-282).

    Re-inserts mask tokens at masked positions (unshuffle via ids_restore),
    adds per-context-task learned embeddings + decoder pos-emb, queries the
    visible-token context through one cross-attention + MLP, runs `depth`
    decoder transformer blocks, and projects each token to a pixel patch.
    """

    num_channels: int
    stride_level: int
    patch_size_full: Union[int, Tuple[int, int]]
    dim_tokens_enc: Optional[int] = None
    dim_tokens: int = 256
    depth: int = 0
    learnable_pos_emb: bool = False
    image_size: Union[int, Tuple[int, int]] = 224
    mlp_ratio: float = 4.0
    num_heads: int = 8
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_task_queries: bool = True
    task: Optional[str] = None
    context_tasks: Optional[Sequence[str]] = None
    use_xattn: bool = True
    dtype: Dtype = jnp.float32
    # Training fast path: return (B, N, C*P_H*P_W) token patches instead of
    # the NHWC image, skipping the 6-D unpatchify transpose (the masked
    # losses consume patches directly; see criterion.py patch-space paths).
    return_patches: bool = False

    @property
    def patch_hw(self) -> Tuple[int, int]:
        p = pair(self.patch_size_full)
        return max(1, p[0] // self.stride_level), max(1, p[1] // self.stride_level)

    def setup(self):
        assert self.dim_tokens_enc is not None, "dim_tokens_enc must be set (late init)"
        img = pair(self.image_size)
        ph, pw = self.patch_hw
        h_pe = img[0] // (self.stride_level * ph)
        w_pe = img[1] // (self.stride_level * pw)

        if self.context_tasks is not None:
            self.task_embeddings = {
                t: self.param(f"task_embeddings_{t}", trunc_normal_02, (1, 1, self.dim_tokens))
                for t in self.context_tasks
            }
        else:
            self.task_embeddings = {}

        self.mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.dim_tokens)
        )
        if not self.learnable_pos_emb:
            self.pos_emb = self.param(
                "pos_emb",
                lambda key, shape: jnp.asarray(
                    build_2d_sincos_posemb(h_pe, w_pe, self.dim_tokens)
                ),
                (1, h_pe, w_pe, self.dim_tokens),
            )
        else:
            self.pos_emb = self.param(
                "pos_emb", trunc_normal_02, (1, h_pe, w_pe, self.dim_tokens)
            )

        self.proj_context = nn.Dense(
            self.dim_tokens,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            name="proj_context",
        )
        if self.use_xattn:
            self.decoder = CrossAttention(
                num_heads=self.num_heads,
                qkv_bias=self.qkv_bias,
                dtype=self.dtype,
                name="decoder",
            )
            self.context_norm = LayerNorm(dtype=self.dtype, name="context_norm")
            self.query_norm = LayerNorm(dtype=self.dtype, name="query_norm")
            self.out_norm = LayerNorm(dtype=self.dtype, name="out_norm")
            self.mlp = Mlp(
                hidden_features=int(self.dim_tokens * self.mlp_ratio),
                dtype=self.dtype,
                name="mlp",
            )
        if self.depth > 0:
            dpr = [
                float(x)
                for x in np.linspace(0, self.drop_path_rate, self.depth)
            ]
            self.decoder_transformer = [
                Block(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate,
                    drop_path_rate=dpr[i],
                    dtype=self.dtype,
                    name=f"decoder_transformer_{i}",
                )
                for i in range(self.depth)
            ]
        else:
            self.decoder_transformer = []
        ph, pw = self.patch_hw
        self.out_proj = nn.Dense(
            self.num_channels * ph * pw,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            name="out_proj",
        )

    def _fused_core_ok(self) -> bool:
        """Gate for the fused Pallas decoder core: TPU (or a test force
        mode), xattn form, no stochastic regularisers, bf16/fp32."""
        from multimae_tpu.ops import fused_decoder_pallas as fdp

        return (
            self.use_xattn
            and self.depth >= 1
            and not self.is_initializing()
            and fdp.enabled()
            and jnp.dtype(self.dtype) in (jnp.dtype(jnp.bfloat16),
                                          jnp.dtype(jnp.float32))
            and self.drop_rate == 0.0
            and self.attn_drop_rate == 0.0
            and self.drop_path_rate == 0.0
        )

    def generate_context_embeddings(self, input_info, bs: int, size: Tuple[int, int]):
        """Reference :160-181."""
        context_embeddings = []
        for task, info in input_info["tasks"].items():
            if task in self.task_embeddings:
                task_emb = jnp.broadcast_to(
                    self.task_embeddings[task], (bs, info["num_tokens"], self.dim_tokens)
                )
            else:
                task_emb = jnp.zeros((bs, info["num_tokens"], self.dim_tokens))
            if info["has_2d_posemb"]:
                pe = interpolate_2d(
                    self.pos_emb, size, mode="bilinear", align_corners=False
                )
                pe = pe.reshape(1, size[0] * size[1], self.dim_tokens)
                assert info["num_tokens"] == pe.shape[1]
                task_emb = task_emb + pe
            context_embeddings.append(task_emb.astype(self.dtype))
        return jnp.concatenate(context_embeddings, axis=1)

    def get_queries_and_context(self, context_tokens, input_info, ids_keep,
                                ids_restore):
        """Reference :183-234, restructured for TPU.

        The reference materialises the FULL unshuffled sequence
        (scatter mask tokens into all N positions, torch.gather with
        ids_restore) and then re-gathers the K visible positions — two
        O(N) gathers whose backward passes are scatter-adds, per decoder.
        Algebraically, only two small pieces of that sequence are ever
        used:
          * queries  = the task's own slice [start:end]:
              q[p] = rank[p] < K ? proj(enc[rank[p]]) : mask_token,
              plus the (batch-independent) context embedding at p.
          * context  = the K visible tokens themselves, which are just
              proj(enc_visible) + context_emb[ids_keep], plus globals.
        Both are expressed as small one-hot matmuls (MXU) instead of
        gather/scatter — ~2x faster fwd+bwd per decoder at ViT-B scale.
        Numerics are identical (same additions, same sources).
        """
        from multimae_tpu.ops.gather import select_or_zero

        b = context_tokens.shape[0]
        h, w = input_info["image_size"]
        ph, pw = self.patch_hw
        nh = h // (self.stride_level * ph)
        nw = w // (self.stride_level * pw)
        num_global = input_info.get("num_global_tokens", 0)
        num_task_tokens = input_info["num_task_tokens"]
        k = ids_keep.shape[1]

        ctx_visible_proj = (
            context_tokens[:, :-num_global] if num_global > 0 else context_tokens
        )
        # (1, N, D) batch-independent task+pos embeddings.
        context_emb = self.generate_context_embeddings(input_info, 1, (nh, nw))

        if self.use_task_queries and self.task in input_info["tasks"]:
            start = input_info["tasks"][self.task]["start_idx"]
            end = input_info["tasks"][self.task]["end_idx"]
            rank_slice = ids_restore[:, start:end]
            # Visible positions pull their encoder token; masked rows of the
            # one-hot are all-zero, replaced by the mask token.
            q_tokens = select_or_zero(ctx_visible_proj, rank_slice, k)
            visible = (rank_slice < k)[..., None]
            queries = jnp.where(
                visible, q_tokens, self.mask_token.astype(self.dtype)
            )
            queries = queries + context_emb[:, start:end]
        else:
            queries = jnp.broadcast_to(
                self.mask_token.astype(self.dtype), (b, nh * nw, self.dim_tokens)
            )
            qpe = interpolate_2d(
                self.pos_emb, (nh, nw), mode="bilinear", align_corners=False
            ).reshape(1, nh * nw, self.dim_tokens)
            queries = queries + qpe.astype(self.dtype)
            if self.task in self.task_embeddings:
                queries = queries + self.task_embeddings[self.task].astype(self.dtype)

        # context_emb rows at the visible positions (one-hot matmul so the
        # backward into task_embeddings is a matmul, not a scatter).
        onehot_keep = jax.nn.one_hot(ids_keep, num_task_tokens, dtype=self.dtype)
        ctx_emb_keep = jnp.einsum(
            "bkn,nd->bkd", onehot_keep, context_emb[0],
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        context_visible = ctx_visible_proj + ctx_emb_keep
        if num_global > 0:
            context = jnp.concatenate(
                [context_visible, context_tokens[:, -num_global:]], axis=1
            )
        else:
            context = context_visible
        return queries, context

    def __call__(
        self,
        encoder_tokens: jnp.ndarray,
        input_info: Dict,
        ids_keep: jnp.ndarray,
        ids_restore: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        h, w = input_info["image_size"]
        ph, pw = self.patch_hw
        nh = h // (self.stride_level * ph)
        nw = w // (self.stride_level * pw)

        context_tokens = self.proj_context(encoder_tokens.astype(self.dtype))
        queries, context = self.get_queries_and_context(
            context_tokens, input_info, ids_keep, ids_restore
        )

        from multimae_tpu.parallel.mesh import (
            constraint_data_size,
            data_shard_map,
        )

        from multimae_tpu.ops import fused_decoder_pallas as _fdp

        if (
            self._fused_core_ok()
            and queries.shape[0] % constraint_data_size() == 0
            # VMEM-fit gate: oversized shapes (large input_size) fall
            # back to the module path instead of a Mosaic compile error.
            and _fdp.supported(
                queries.shape[1], context.shape[1], self.dim_tokens,
                self.num_heads, self.depth, self.dtype, self.mlp_ratio,
            )
        ):
            # TPU hot path: the whole xattn + MLP + transformer stack as
            # one VMEM-resident Pallas program (ops/fused_decoder_pallas),
            # shard_mapped over the data axis under a multi-chip mesh
            # (GSPMD would otherwise replicate the opaque kernel).
            from multimae_tpu.ops import fused_decoder_pallas as fdp

            heads, depth, dtype = self.num_heads, self.depth, self.dtype
            core = data_shard_map(
                lambda q, c, w: fdp.fused_decoder_core(
                    q, c, w, heads, depth, dtype
                )
            )
            x = core(
                queries, context,
                fdp.collect_core_weights(self.variables["params"], self.depth),
            )
        elif self.use_xattn:
            x = self.decoder(
                self.query_norm(queries),
                self.context_norm(context),
                deterministic=not train,
            )
            x = x + self.mlp(self.out_norm(x), deterministic=not train)
            for blk in self.decoder_transformer:
                x = blk(x, deterministic=not train)
        else:
            x = queries
            for blk in self.decoder_transformer:
                x = blk(x, deterministic=not train)

        x = self.out_proj(x)
        if self.return_patches:
            return x  # (B, nh*nw, C*ph*pw), (c, ph, pw) minor order
        # (B, nh*nw, C*ph*pw) -> NHWC image; patch minor order is (c, ph, pw)
        # to match the reference's rearrange (output_adapters.py:276-280).
        b = x.shape[0]
        x = x.reshape(b, nh, nw, self.num_channels, ph, pw)
        x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, nh, ph, nw, pw, C)
        return x.reshape(b, nh * ph, nw * pw, self.num_channels)


class LinearOutputAdapter(nn.Module):
    """Mean-pool (or last global token) -> LayerNorm -> Linear head
    (reference :285-356)."""

    num_classes: int
    dim_tokens_enc: Optional[int] = None
    use_mean_pooling: bool = True
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, encoder_tokens: jnp.ndarray, **kwargs) -> jnp.ndarray:
        if self.use_mean_pooling:
            x = encoder_tokens.mean(axis=1)
        else:
            x = encoder_tokens[:, -1]  # global token is appended at the end
        x = LayerNorm(dtype=self.dtype, name="norm")(x)

        def head_kernel_init(key, shape, dtype=jnp.float32):
            return trunc_normal_02(key, shape, dtype) * self.init_scale

        x = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=head_kernel_init,
            bias_init=nn.initializers.zeros,
            name="head",
        )(x)
        return x


def adapt_tokens(encoder_tokens, input_info, main_tasks):
    """Concatenate this head's main-task token slices channel-wise
    (reference :439-448)."""
    x = []
    for task in main_tasks:
        start = input_info["tasks"][task]["start_idx"]
        end = input_info["tasks"][task]["end_idx"]
        x.append(encoder_tokens[:, start:end])
    return jnp.concatenate(x, axis=-1)


class SegmenterMaskTransformerAdapter(nn.Module):
    """Segmenter-style mask-transformer semseg head (reference :359-478)."""

    num_classes: int
    depth: int = 2
    num_heads: int = 12
    embed_dim: int = 768
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    qkv_bias: bool = True
    main_tasks: Sequence[str] = ("rgb",)
    patch_size: int = 16
    dim_tokens_enc: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, encoder_tokens: jnp.ndarray, input_info: Dict, train: bool = False, **kw
    ) -> jnp.ndarray:
        h, w = input_info["image_size"]
        nh, nw = h // self.patch_size, w // self.patch_size

        x = adapt_tokens(encoder_tokens, input_info, self.main_tasks).astype(self.dtype)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="proj_dec",
        )(x)
        cls_emb = self.param(
            "cls_emb", trunc_normal_02, (1, self.num_classes, self.embed_dim)
        )
        b = x.shape[0]
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls_emb.astype(self.dtype), (b, self.num_classes, self.embed_dim))],
            axis=1,
        )

        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, self.depth)]
        for i in range(self.depth):
            x = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic=not train)

        x = LayerNorm(dtype=self.dtype, name="decoder_norm")(x)

        patches = nn.Dense(
            self.embed_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="patch_proj",
        )(x[:, : -self.num_classes])
        cls_seg_feat = nn.Dense(
            self.embed_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="classes_proj",
        )(x[:, -self.num_classes :])

        def l2norm(v):
            vf = v.astype(jnp.float32)
            n = jnp.linalg.norm(vf, axis=2, keepdims=True)
            return (vf / jnp.maximum(n, 1e-12)).astype(self.dtype)

        patches = l2norm(patches)
        cls_seg_feat = l2norm(cls_seg_feat)

        masks = jnp.einsum(
            "bnd,bcd->bnc", patches, cls_seg_feat, preferred_element_type=jnp.float32
        )
        masks = nn.LayerNorm(
            epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name="mask_norm"
        )(masks)
        masks = masks.reshape(b, nh, nw, self.num_classes)
        masks = interpolate_2d(masks, (h, w), mode="bilinear", align_corners=False)
        return masks


class ConvNeXtAdapter(nn.Module):
    """Semseg head: per-patch sub-pixel reshape + ConvNeXt blocks
    (reference :481-573)."""

    num_classes: int
    embed_dim: int = 6144
    preds_per_patch: int = 16
    main_tasks: Sequence[str] = ("rgb",)
    patch_size: int = 16
    depth: int = 4
    interpolate_mode: str = "bilinear"
    dim_tokens_enc: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, encoder_tokens: jnp.ndarray, input_info: Dict, train: bool = False, **kw
    ) -> jnp.ndarray:
        h, w = input_info["image_size"]
        nh, nw = h // self.patch_size, w // self.patch_size
        class_dim = self.embed_dim // self.preds_per_patch
        sub = int(self.preds_per_patch**0.5)

        x = adapt_tokens(encoder_tokens, input_info, self.main_tasks).astype(self.dtype)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="proj_dec",
        )(x)
        b = x.shape[0]
        # (B, N, p*c): sub-patch index p decomposes (ph, pw) row-major
        # (reference :562-566).
        x = x.reshape(b, nh, nw, sub, sub, class_dim)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, ph, nw, pw, c)
        x = x.reshape(b, nh * sub, nw * sub, class_dim)

        for i in range(self.depth):
            x = ConvNeXtBlock(dim=class_dim, dtype=self.dtype, name=f"blocks_{i}")(x)

        x = nn.Conv(
            self.num_classes,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="final_layer",
        )(x)
        x = interpolate_2d(x, (h, w), mode=self.interpolate_mode, align_corners=False)
        return x


class DPTOutputAdapter(nn.Module):
    """DPT dense-prediction head over 4 hooked encoder layers
    (reference :576-759)."""

    num_classes: int = 3
    stride_level: int = 1
    patch_size: Union[int, Tuple[int, int]] = 16
    main_tasks: Sequence[str] = ("rgb",)
    hooks: Sequence[int] = (2, 5, 8, 11)
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    use_bn: bool = False
    dim_tokens_enc: Optional[int] = None
    head_type: str = "regression"
    dtype: Dtype = jnp.float32

    @property
    def patch_hw(self) -> Tuple[int, int]:
        p = pair(self.patch_size)
        return max(1, p[0] // self.stride_level), max(1, p[1] // self.stride_level)

    @nn.compact
    def __call__(
        self,
        encoder_tokens: Sequence[jnp.ndarray],
        input_info: Dict,
        train: bool = False,
        **kw,
    ) -> jnp.ndarray:
        assert isinstance(encoder_tokens, (list, tuple)), (
            "DPTOutputAdapter needs per-layer encoder outputs (return_all_layers)"
        )
        h, w = input_info["image_size"]
        ph, pw = self.patch_hw
        nh = h // (self.stride_level * ph)
        nw = w // (self.stride_level * pw)

        layers = [encoder_tokens[hook] for hook in self.hooks]
        layers = [
            adapt_tokens(l, input_info, self.main_tasks).astype(self.dtype)
            for l in layers
        ]
        b = layers[0].shape[0]
        layers = [l.reshape(b, nh, nw, l.shape[-1]) for l in layers]

        # Activation post-processing to a 4-scale pyramid (reference :661-715).
        def conv1x1(feat, dim, name):
            return nn.Conv(
                dim, kernel_size=(1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                name=name,
            )(feat)

        l0 = conv1x1(layers[0], self.layer_dims[0], "act_1_postprocess_conv")
        l0 = nn.ConvTranspose(
            self.layer_dims[0],
            kernel_size=(4, 4),
            strides=(4, 4),
            transpose_kernel=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="act_1_postprocess_deconv",
        )(l0)

        l1 = conv1x1(layers[1], self.layer_dims[1], "act_2_postprocess_conv")
        l1 = nn.ConvTranspose(
            self.layer_dims[1],
            kernel_size=(2, 2),
            strides=(2, 2),
            transpose_kernel=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="act_2_postprocess_deconv",
        )(l1)

        l2 = conv1x1(layers[2], self.layer_dims[2], "act_3_postprocess_conv")

        l3 = conv1x1(layers[3], self.layer_dims[3], "act_4_postprocess_conv")
        l3 = nn.Conv(
            self.layer_dims[3],
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="act_4_postprocess_downconv",
        )(l3)

        pyramid = [l0, l1, l2, l3]
        # Project each scale to feature_dim (scratch.layer_rn, reference :138-180).
        pyramid = [
            nn.Conv(
                self.feature_dim,
                kernel_size=(3, 3),
                padding=1,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"layer{i + 1}_rn",
            )(p)
            for i, p in enumerate(pyramid)
        ]

        # RefineNet fusion (reference :751-754).
        path4 = FeatureFusionBlock(
            self.feature_dim, use_bn=self.use_bn, dtype=self.dtype, name="refinenet4"
        )(pyramid[3], train=train)
        path3 = FeatureFusionBlock(
            self.feature_dim, use_bn=self.use_bn, dtype=self.dtype, name="refinenet3"
        )(path4, pyramid[2], train=train)
        path2 = FeatureFusionBlock(
            self.feature_dim, use_bn=self.use_bn, dtype=self.dtype, name="refinenet2"
        )(path3, pyramid[1], train=train)
        path1 = FeatureFusionBlock(
            self.feature_dim, use_bn=self.use_bn, dtype=self.dtype, name="refinenet1"
        )(path2, pyramid[0], train=train)

        # Output head (reference :625-645).
        if self.head_type == "regression":
            x = nn.Conv(
                self.feature_dim // 2, kernel_size=(3, 3), padding=1,
                dtype=self.dtype, param_dtype=jnp.float32, name="head_conv1",
            )(path1)
            hh, ww = x.shape[-3], x.shape[-2]
            x = interpolate_2d(x, (2 * hh, 2 * ww), mode="bilinear", align_corners=True)
            x = nn.Conv(
                32, kernel_size=(3, 3), padding=1,
                dtype=self.dtype, param_dtype=jnp.float32, name="head_conv2",
            )(x)
            x = nn.relu(x)
            x = nn.Conv(
                self.num_classes, kernel_size=(1, 1),
                dtype=self.dtype, param_dtype=jnp.float32, name="head_conv3",
            )(x)
        elif self.head_type == "semseg":
            x = nn.Conv(
                self.feature_dim, kernel_size=(3, 3), padding=1, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32, name="head_conv1",
            )(path1)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype, name="head_bn"
                )(x)
            x = nn.relu(x)
            x = nn.Dropout(0.1)(x, deterministic=not train)
            x = nn.Conv(
                self.num_classes, kernel_size=(1, 1),
                dtype=self.dtype, param_dtype=jnp.float32, name="head_conv2",
            )(x)
            hh, ww = x.shape[-3], x.shape[-2]
            x = interpolate_2d(x, (2 * hh, 2 * ww), mode="bilinear", align_corners=True)
        else:
            raise ValueError('DPT head_type must be "regression" or "semseg".')
        return x
