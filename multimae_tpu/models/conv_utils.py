"""NHWC conv primitives for dense-prediction heads.

Parity targets (reference: multimae/output_adapter_utils.py):
  * ConvNeXtBlock            — :19-57
  * ResidualConvUnit         — :60-123
  * make_scratch (layer_rn)  — :125-182
  * FeatureFusionBlock       — :184-247 (RefineNet-style fusion)
  * Interpolate              — :259-290

Everything is NHWC (TPU-native). Upsampling uses the torch-parity matmul
resize (align_corners semantics preserved; fusion blocks use
align_corners=True like the reference :241-243).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from multimae_tpu.models.vit import Dtype, LayerNorm, gelu, trunc_normal_02
from multimae_tpu.ops.resize import interpolate_2d


class ConvNeXtBlock(nn.Module):
    """7x7 depthwise conv + LN + pointwise MLP, residual (reference :19-57)."""

    dim: int
    layer_scale_init_value: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        x = nn.Conv(
            self.dim,
            kernel_size=(7, 7),
            padding=3,
            feature_group_count=self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="dwconv",
        )(x)
        from multimae_tpu.ops import fused_mlp_pallas as fmp
        from multimae_tpu.parallel.mesh import (
            constraint_data_size,
            data_shard_map,
        )

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        n_data = constraint_data_size()
        if (
            not self.is_initializing()
            and self.layer_scale_init_value == 0
            and fmp.enabled()
            and x.shape[0] % n_data == 0
            and fmp.supported(rows // n_data, self.dim, 4 * self.dim,
                              self.dtype)
        ):
            # LN -> Dense -> gelu -> Dense -> +residual as one row-tiled
            # Pallas pass: at 512px the (B,128,128,1536) intermediate is
            # ~805MB of HBM traffic each way that the fused kernel never
            # materializes, and the LN/residual passes fold into the
            # same tiles. Under a data mesh the opaque kernel must be
            # shard_mapped or GSPMD replicates it (SCALING.md rule 3).
            p = self.variables["params"]
            dim = self.dim
            core = data_shard_map(
                lambda x4d, r4d, w: fmp.fused_ln_mlp_res(
                    x4d.reshape(-1, dim),
                    r4d.astype(x4d.dtype).reshape(-1, dim),
                    *w).reshape(x4d.shape),
                n_data_args=2,
            )
            return core(x, residual,
                        (p["norm"]["ln"]["scale"], p["norm"]["ln"]["bias"],
                         p["pwconv1"]["kernel"], p["pwconv1"]["bias"],
                         p["pwconv2"]["kernel"], p["pwconv2"]["bias"]))

        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            4 * self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="pwconv1",
        )(x)
        x = gelu(x)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            name="pwconv2",
        )(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma.astype(self.dtype) * x
        return residual + x


class ResidualConvUnit(nn.Module):
    """relu-conv(-bn) x2 with skip (reference :60-123)."""

    features: int
    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding=1,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn1"
            )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            padding=1,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv2",
        )(out)
        if self.use_bn:
            out = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="bn2"
            )(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion: add residual branch, refine, 2x upsample,
    1x1 out conv (reference :184-247)."""

    features: int
    use_bn: bool = False
    align_corners: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        # Both units are created unconditionally so the param tree matches
        # the reference checkpoints even for the top fusion block, whose
        # resConfUnit1 exists but is never called (reference :227-239 with
        # a single input at :751).
        self.resConfUnit1 = ResidualConvUnit(
            self.features, use_bn=self.use_bn, dtype=self.dtype
        )
        self.resConfUnit2 = ResidualConvUnit(
            self.features, use_bn=self.use_bn, dtype=self.dtype
        )
        self.out_conv = nn.Conv(
            self.features,
            kernel_size=(1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        res: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        out = x
        if res is not None:
            out = out + self.resConfUnit1(res, train=train)
        out = self.resConfUnit2(out, train=train)
        h, w = out.shape[-3], out.shape[-2]
        out = interpolate_2d(
            out, (2 * h, 2 * w), mode="bilinear", align_corners=self.align_corners
        )
        out = self.out_conv(out)
        return out
