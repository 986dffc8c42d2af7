"""Golden parity tests: our flax models vs the reference PyTorch models.

Builds the reference modules from /root/reference (read-only), converts
their randomly-initialized state_dict into our flax param tree via
multimae_tpu.utils.torch_compat, and compares forward outputs on
identical inputs. This validates the model math, the adapter wiring, AND
the checkpoint key mapping in one shot.
"""

import functools
import sys

import numpy as np
import pytest

from tests.conftest import (
    REFERENCE_DIR,
    install_reference_import_shim,
    requires_reference,
)

install_reference_import_shim()

import jax
import jax.numpy as jnp

from multimae_tpu.models import (
    ConvNeXtAdapter,
    DPTOutputAdapter,
    LinearOutputAdapter,
    MultiMAE,
    MultiViT,
    PatchedInputAdapter,
    SegmenterMaskTransformerAdapter,
    SemSegInputAdapter,
    SpatialOutputAdapter,
)
from multimae_tpu.utils.torch_compat import state_dict_to_params

B = 1  # reference's task_masks path assumes batch 1 (multimae.py:338)


def _our_input_adapters():
    return {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1, patch_size_full=16
        ),
        "depth": functools.partial(
            PatchedInputAdapter, num_channels=1, stride_level=1, patch_size_full=16
        ),
        "semseg": functools.partial(
            SemSegInputAdapter,
            num_classes=133,
            stride_level=4,
            patch_size_full=16,
            dim_class_emb=64,
        ),
    }


def _ref_input_adapters():
    from multimae.input_adapters import (
        PatchedInputAdapter as RefPatched,
        SemSegInputAdapter as RefSemSeg,
    )

    return {
        "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16),
        "depth": RefPatched(num_channels=1, stride_level=1, patch_size_full=16),
        "semseg": RefSemSeg(
            num_classes=133, stride_level=4, patch_size_full=16, dim_class_emb=64
        ),
    }


def _inputs(rng):
    x_np = {
        "rgb": rng.standard_normal((B, 224, 224, 3)).astype(np.float32),
        "depth": rng.standard_normal((B, 224, 224, 1)).astype(np.float32),
        "semseg": rng.integers(0, 133, (B, 56, 56)).astype(np.int64),
    }
    import torch

    x_t = {
        "rgb": torch.from_numpy(x_np["rgb"]).permute(0, 3, 1, 2),
        "depth": torch.from_numpy(x_np["depth"]).permute(0, 3, 1, 2),
        "semseg": torch.from_numpy(x_np["semseg"]),
    }
    x_j = {
        "rgb": jnp.asarray(x_np["rgb"]),
        "depth": jnp.asarray(x_np["depth"]),
        "semseg": jnp.asarray(x_np["semseg"], dtype=jnp.int32),
    }
    return x_t, x_j


@requires_reference
def test_multimae_pretrain_forward_parity():
    import torch
    from multimae.multimae import MultiMAE as RefMultiMAE
    from multimae.output_adapters import SpatialOutputAdapter as RefSpatial

    torch.manual_seed(0)
    tasks = [("rgb", 3, 1), ("depth", 1, 1), ("semseg", 133, 4)]
    ref_out = {
        t: RefSpatial(
            num_channels=c,
            stride_level=s,
            patch_size_full=16,
            dim_tokens=256,
            depth=2,
            num_heads=8,
            use_task_queries=True,
            task=t,
            context_tasks=["rgb", "depth", "semseg"],
            use_xattn=True,
        )
        for t, c, s in tasks
    }
    ref = RefMultiMAE(
        input_adapters=_ref_input_adapters(),
        output_adapters=ref_out,
        num_global_tokens=1,
        dim_tokens=768,
        depth=12,
        num_heads=12,
    ).eval()

    ours_out = {
        t: functools.partial(
            SpatialOutputAdapter,
            num_channels=c,
            stride_level=s,
            patch_size_full=16,
            dim_tokens=256,
            depth=2,
            num_heads=8,
            use_task_queries=True,
            task=t,
            context_tasks=("rgb", "depth", "semseg"),
            use_xattn=True,
        )
        for t, c, s in tasks
    }
    ours = MultiMAE(
        input_adapters=_our_input_adapters(),
        output_adapters=ours_out,
        num_global_tokens=1,
        dim_tokens=768,
        depth=12,
        num_heads=12,
    )

    rng = np.random.default_rng(0)
    x_t, x_j = _inputs(rng)

    # Fixed task masks: exactly 98 visible across 588 tokens.
    mask_flat = np.ones((B, 588), dtype=np.int64)
    vis = rng.choice(588, size=98, replace=False)
    mask_flat[:, vis] = 0
    task_masks_np = {
        "rgb": mask_flat[:, :196],
        "depth": mask_flat[:, 196:392],
        "semseg": mask_flat[:, 392:],
    }

    with torch.no_grad():
        ref_preds, _ = ref(
            x_t,
            mask_inputs=True,
            task_masks={k: torch.from_numpy(v) for k, v in task_masks_np.items()},
        )

    template = jax.eval_shape(
        lambda: ours.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            x_j,
            num_encoded_tokens=98,
        )
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template, verbose=True
    )
    assert not report["missing"], f"missing: {report['missing']}"
    assert not report["unexpected"], f"unexpected: {report['unexpected']}"

    preds, _ = ours.apply(
        {"params": params},
        x_j,
        mask_inputs=True,
        task_masks={k: jnp.asarray(v, jnp.int32) for k, v in task_masks_np.items()},
        num_encoded_tokens=98,
    )

    for t, _, _ in tasks:
        ref_np = ref_preds[t].permute(0, 2, 3, 1).numpy()
        ours_np = np.asarray(preds[t])
        np.testing.assert_allclose(
            ours_np, ref_np, atol=2e-4, rtol=1e-3,
            err_msg=f"task {t} pretrain decoder output mismatch",
        )


@requires_reference
def test_multivit_cls_forward_parity():
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.output_adapters import LinearOutputAdapter as RefLinear

    torch.manual_seed(1)
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16)
        },
        output_adapters={"cls": RefLinear(num_classes=1000)},
        dim_tokens=768,
        depth=12,
        num_heads=12,
    ).eval()

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1, patch_size_full=16
            )
        },
        output_adapters={
            "cls": functools.partial(LinearOutputAdapter, num_classes=1000)
        },
        dim_tokens=768,
        depth=12,
        num_heads=12,
    )

    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np).permute(0, 3, 1, 2))["cls"].numpy()

    x_j = {"rgb": jnp.asarray(x_np)}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x_j)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    assert not report["missing"] and not report["unexpected"], report

    logits = np.asarray(ours.apply({"params": params}, x_j)["cls"])
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4, rtol=1e-3)


@requires_reference
@pytest.mark.parametrize("head_type", ["regression", "semseg"])
def test_multivit_dpt_forward_parity(head_type):
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.output_adapters import DPTOutputAdapter as RefDPT

    torch.manual_seed(2)
    nc = 1 if head_type == "regression" else 40
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16)
        },
        output_adapters={
            "out": RefDPT(num_classes=nc, main_tasks=["rgb"], head_type=head_type)
        },
        dim_tokens=768,
        depth=12,
        num_heads=12,
    ).eval()

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1, patch_size_full=16
            )
        },
        output_adapters={
            "out": functools.partial(
                DPTOutputAdapter, num_classes=nc, main_tasks=("rgb",),
                head_type=head_type,
            )
        },
        dim_tokens=768,
        depth=12,
        num_heads=12,
    )

    rng = np.random.default_rng(2)
    x_np = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = (
            ref(torch.from_numpy(x_np).permute(0, 3, 1, 2), return_all_layers=True)[
                "out"
            ]
            .permute(0, 2, 3, 1)
            .numpy()
        )

    x_j = {"rgb": jnp.asarray(x_np)}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x_j)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        template,
        head_type=head_type,
    )
    assert not report["missing"] and not report["unexpected"], report

    out = np.asarray(ours.apply({"params": params}, x_j)["out"])
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


@requires_reference
@pytest.mark.parametrize("adapter", ["convnext", "segmenter"])
def test_multivit_semseg_head_parity(adapter):
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.output_adapters import (
        ConvNeXtAdapter as RefConvNeXt,
        SegmenterMaskTransformerAdapter as RefSegmenter,
    )

    torch.manual_seed(3)
    if adapter == "convnext":
        ref_head = RefConvNeXt(num_classes=40, embed_dim=6144, preds_per_patch=16)
        our_head = functools.partial(
            ConvNeXtAdapter, num_classes=40, embed_dim=6144, preds_per_patch=16
        )
    else:
        ref_head = RefSegmenter(num_classes=40)
        our_head = functools.partial(SegmenterMaskTransformerAdapter, num_classes=40)

    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16)
        },
        output_adapters={"semseg": ref_head},
        dim_tokens=768,
        depth=12,
        num_heads=12,
    ).eval()

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1, patch_size_full=16
            )
        },
        output_adapters={"semseg": our_head},
        dim_tokens=768,
        depth=12,
        num_heads=12,
    )

    rng = np.random.default_rng(3)
    x_np = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = (
            ref(torch.from_numpy(x_np).permute(0, 3, 1, 2))["semseg"]
            .permute(0, 2, 3, 1)
            .numpy()
        )

    x_j = {"rgb": jnp.asarray(x_np)}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x_j)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    assert not report["missing"] and not report["unexpected"], report

    out = np.asarray(ours.apply({"params": params}, x_j)["semseg"])
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


@requires_reference
def test_pth_file_roundtrip_load(tmp_path):
    """File-level path: torch.save a reference checkpoint (with the
    {'model': ...} wrapper the releases use) -> load_pretrained_torch ->
    forward parity."""
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.output_adapters import LinearOutputAdapter as RefLinear

    from multimae_tpu.train.checkpoint import load_pretrained_torch

    torch.manual_seed(5)
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16)
        },
        output_adapters={"cls": RefLinear(num_classes=7)},
        dim_tokens=64, depth=1, num_heads=4,
    ).eval()
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save({"model": ref.state_dict(), "epoch": 3}, ckpt_path)

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16,
            )
        },
        output_adapters={"cls": functools.partial(LinearOutputAdapter, num_classes=7)},
        dim_tokens=64, depth=1, num_heads=4,
    )
    rng = np.random.default_rng(5)
    x_np = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    x_j = {"rgb": jnp.asarray(x_np)}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x_j)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = load_pretrained_torch(ckpt_path, template)
    assert not report["missing"] and not report["unexpected"], report

    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(x_np).permute(0, 3, 1, 2))["cls"].numpy()
    logits = np.asarray(ours.apply({"params": params}, x_j)["cls"])
    np.testing.assert_allclose(logits, ref_logits, atol=2e-5, rtol=1e-4)
