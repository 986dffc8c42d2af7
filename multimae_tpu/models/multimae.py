"""MultiMAE / MultiViT models.

Parity targets:
  * MultiMAE (reference: multimae/multimae.py:40-416) — masked pretraining
    model; masking happens inside the forward pass (here: inside jit, as a
    pure function of the 'masking' RNG collection).
  * MultiViT (reference: multimae/multimae.py:419-539) — dense forward for
    fine-tuning/inference, optional per-layer outputs for DPT hooks.

Adapters are passed as dicts of constructor partials (late-initialized
against the encoder dim, mirroring the reference's `adapter.init(...)`
protocol at multimae/multimae.py:77-85).

TPU-first notes:
  * Token gather/scatter use one-hot matmuls (ops/gather.py) — the MXU
    eats them, and take_along_axis's backward is a slow scatter on TPU.
  * The visible-token count is a static Python int, so the encoder always
    runs a fixed (B, K+G, D) shape — XLA compiles one program.
  * `fp32_output_adapters` constructs those adapters with float32 compute
    dtype and feeds them fp32 encoder tokens (reference :367-377).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from multimae_tpu.models.registry import register_model
from multimae_tpu.models.vit import Block, Dtype, trunc_normal_02
from multimae_tpu.ops import masking as masking_ops

__all__: List[str] = []

AdapterSpec = Callable[..., nn.Module]


def generate_input_info(
    num_tokens_per_task: Dict[str, int],
    image_size: Tuple[int, int],
    num_global_tokens: int,
) -> Dict[str, Any]:
    """Static bookkeeping dict (reference multimae/multimae.py:250-269)."""
    info: Dict[str, Any] = {"tasks": {}}
    i = 0
    for domain, num_tokens in num_tokens_per_task.items():
        info["tasks"][domain] = {
            "num_tokens": num_tokens,
            "has_2d_posemb": True,
            "start_idx": i,
            "end_idx": i + num_tokens,
        }
        i += num_tokens
    info["image_size"] = image_size
    info["num_task_tokens"] = i
    info["num_global_tokens"] = num_global_tokens
    return info


def infer_image_size(
    x: Dict[str, jnp.ndarray], semseg_stride: int = 4
) -> Tuple[int, int]:
    """Full-resolution (H, W) from the available modalities.

    Reference: multimae/multimae.py:302-309. NHWC layout: rgb/depth are
    (B, H, W, C); semseg is (B, H/stride, W/stride) int.
    """
    if "rgb" in x:
        return x["rgb"].shape[1], x["rgb"].shape[2]
    if "semseg" in x:
        return (
            x["semseg"].shape[1] * semseg_stride,
            x["semseg"].shape[2] * semseg_stride,
        )
    first = next(iter(x.values()))
    return first.shape[1], first.shape[2]


class MultiMAE(nn.Module):
    """Multi-task multi-modal masked autoencoder."""

    input_adapters: Dict[str, AdapterSpec]
    output_adapters: Optional[Dict[str, AdapterSpec]]
    num_global_tokens: int = 1
    dim_tokens: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    fp32_output_adapters: Sequence[str] = ()

    def setup(self):
        self.input_adapter_modules = {
            task: spec(dim_tokens=self.dim_tokens, dtype=self.dtype,
                       name=f"input_adapters_{task}")
            for task, spec in self.input_adapters.items()
        }
        if self.output_adapters is not None:
            self.output_adapter_modules = {
                task: spec(
                    dim_tokens_enc=self.dim_tokens,
                    dtype=(
                        jnp.float32
                        if task in self.fp32_output_adapters
                        else self.dtype
                    ),
                    name=f"output_adapters_{task}",
                )
                for task, spec in self.output_adapters.items()
            }
        else:
            self.output_adapter_modules = None

        self.global_tokens = self.param(
            "global_tokens", trunc_normal_02,
            (1, self.num_global_tokens, self.dim_tokens),
        )
        dpr = [
            float(v) for v in np.linspace(0, self.drop_path_rate, self.depth)
        ]
        self.encoder = [
            Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                dtype=self.dtype,
                name=f"encoder_{i}",
            )
            for i in range(self.depth)
        ]

    def tokenize(self, x: Dict[str, jnp.ndarray]):
        input_task_tokens = {
            domain: self.input_adapter_modules[domain](tensor)
            for domain, tensor in x.items()
            if domain in self.input_adapter_modules
        }
        image_size = infer_image_size(x)
        input_info = generate_input_info(
            {d: t.shape[1] for d, t in input_task_tokens.items()},
            image_size,
            self.num_global_tokens,
        )
        return input_task_tokens, input_info

    def run_encoder(self, tokens: jnp.ndarray, train: bool, all_layers: bool = False):
        from multimae_tpu.parallel import pp

        if pp.active() and not all_layers and not self.is_initializing():
            # GPipe over the 'stage' mesh axis (parallel/pp.py). Init and
            # the all_layers (DPT hook) path keep the plain loop, so the
            # param tree layout is identical across dp/fsdp/tp/pp.
            return pp.pipelined_encoder(self, tokens, train)
        outs = []
        for blk in self.encoder:
            tokens = blk(tokens, deterministic=not train)
            if all_layers:
                outs.append(tokens)
        return outs if all_layers else tokens

    def __call__(
        self,
        x: Union[Dict[str, jnp.ndarray], jnp.ndarray],
        *,
        train: bool = False,
        mask_inputs: bool = True,
        task_masks: Optional[Dict[str, jnp.ndarray]] = None,
        num_encoded_tokens: int = 128,
        alphas: Union[float, Sequence[float]] = 1.0,
        sample_tasks_uniformly: bool = False,
        encode_only: bool = False,
    ):
        """Masked forward pass (reference multimae/multimae.py:271-379).

        Returns (preds, task_masks) where preds is a dict of NHWC tensors
        and task_masks a dict of (B, N_task) int32 masks (1 = masked).
        encode_only=True skips the output adapters and returns
        (encoder_tokens, task_masks, ids_keep, ids_restore, input_info) —
        for feature-extraction / probing workflows.
        """
        if not isinstance(x, dict):
            x = {"rgb": x}
        input_task_tokens, input_info = self.tokenize(x)
        b = next(iter(input_task_tokens.values())).shape[0]
        num_tokens_per_task = [t.shape[1] for t in input_task_tokens.values()]

        if mask_inputs:
            k = num_encoded_tokens
        else:
            k = sum(num_tokens_per_task)

        if task_masks is None:
            rng = self.make_rng("masking")
            mask_list, ids_keep, ids_restore = masking_ops.generate_random_masks(
                rng, b, num_tokens_per_task, k,
                alphas=alphas, sample_tasks_uniformly=sample_tasks_uniformly,
            )
            task_masks = {
                d: m for d, m in zip(input_task_tokens.keys(), mask_list)
            }
        else:
            task_masks = {d: task_masks[d] for d in input_task_tokens.keys()}
            ids_keep, ids_restore = masking_ops.masks_to_indices(task_masks, k)

        input_tokens = jnp.concatenate(list(input_task_tokens.values()), axis=1)
        # Visible-token gather as a one-hot matmul (MXU) — take_along_axis's
        # backward is a scatter-add, ~2x slower on TPU at this size.
        from multimae_tpu.ops.gather import gather_tokens

        input_tokens = gather_tokens(input_tokens, ids_keep)

        global_tokens = jnp.broadcast_to(
            self.global_tokens.astype(input_tokens.dtype),
            (b, self.num_global_tokens, self.dim_tokens),
        )
        input_tokens = jnp.concatenate([input_tokens, global_tokens], axis=1)

        encoder_tokens = self.run_encoder(input_tokens, train)

        if encode_only:
            return encoder_tokens, task_masks, ids_keep, ids_restore, input_info

        if self.output_adapter_modules is None:
            return encoder_tokens, task_masks

        preds = {}
        for domain, adapter in self.output_adapter_modules.items():
            tokens_in = encoder_tokens
            if domain in self.fp32_output_adapters:
                tokens_in = encoder_tokens.astype(jnp.float32)
            preds[domain] = adapter(
                encoder_tokens=tokens_in,
                input_info=input_info,
                ids_keep=ids_keep,
                ids_restore=ids_restore,
                train=train,
            )
        return preds, task_masks


class MultiViT(MultiMAE):
    """Dense (unmasked) forward for fine-tuning/inference
    (reference multimae/multimae.py:419-539)."""

    def process_input(self, x):
        if not isinstance(x, dict):
            x = {"rgb": x}
        input_task_tokens, input_info = self.tokenize(x)
        b = next(iter(input_task_tokens.values())).shape[0]
        input_tokens = jnp.concatenate(list(input_task_tokens.values()), axis=1)
        global_tokens = jnp.broadcast_to(
            self.global_tokens.astype(input_tokens.dtype),
            (b, self.num_global_tokens, self.dim_tokens),
        )
        input_tokens = jnp.concatenate([input_tokens, global_tokens], axis=1)
        return input_tokens, input_info

    def __call__(
        self,
        x: Union[Dict[str, jnp.ndarray], jnp.ndarray],
        *,
        train: bool = False,
        return_all_layers: bool = False,
        **kwargs,
    ):
        input_tokens, input_info = self.process_input(x)
        needs_all_layers = return_all_layers or (
            self.output_adapter_modules is not None
            and any(
                getattr(a, "hooks", None) is not None
                and isinstance(a, _dpt_types())
                for a in self.output_adapter_modules.values()
            )
        )
        encoder_out = self.run_encoder(
            input_tokens, train, all_layers=needs_all_layers
        )

        if self.output_adapter_modules is None:
            return encoder_out

        preds = {}
        for domain, adapter in self.output_adapter_modules.items():
            wants_layers = isinstance(adapter, _dpt_types())
            tokens_in = encoder_out if wants_layers else (
                encoder_out[-1] if needs_all_layers else encoder_out
            )
            preds[domain] = adapter(
                encoder_tokens=tokens_in, input_info=input_info, train=train
            )
        return preds


def _dpt_types():
    from multimae_tpu.models.output_adapters import DPTOutputAdapter

    return (DPTOutputAdapter,)


@register_model
def pretrain_multimae_base(input_adapters, output_adapters, **kwargs):
    return MultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=768, depth=12, num_heads=12, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )


@register_model
def pretrain_multimae_large(input_adapters, output_adapters, **kwargs):
    return MultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=1024, depth=24, num_heads=16, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )


@register_model
def multivit_base(input_adapters, output_adapters, **kwargs):
    return MultiViT(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=768, depth=12, num_heads=12, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )


@register_model
def multivit_large(input_adapters, output_adapters, **kwargs):
    return MultiViT(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=1024, depth=24, num_heads=16, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )


# Tiny variants (not in the reference registry): CI smoke tests and CPU
# debugging; same structure as base at 1/12 the size.
@register_model
def pretrain_multimae_tiny(input_adapters, output_adapters, **kwargs):
    return MultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=64, depth=2, num_heads=4, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )


@register_model
def multivit_tiny(input_adapters, output_adapters, **kwargs):
    return MultiViT(
        input_adapters=input_adapters, output_adapters=output_adapters,
        dim_tokens=64, depth=2, num_heads=4, mlp_ratio=4.0, qkv_bias=True,
        **kwargs,
    )
