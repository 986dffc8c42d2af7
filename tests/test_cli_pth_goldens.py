"""Per-CLI released-format .pth load goldens (round-4 verdict item 8).

Each CLI loads released torch checkpoints through its own --finetune /
--resume code path. These tests prove those exact paths, not just
torch_compat in isolation: a reference-format pretrain .pth is generated
in-process by torch.saving the ACTUAL torch reference MultiMAE
(/root/reference/multimae), the CLI main() is driven on it with
synthetic data until the optimizer-construction call (intercepted)
captures the post-surgery params, and the forward logits of the
CLI-loaded model are compared against a torch fine-tune model whose
trunk was loaded from the same file with the reference's own surgery —
pad class-emb, drop output adapters, interpolate pos-emb, tolerant load
(/root/reference/run_finetuning_semseg.py:409-432). Heads are randomly
initialized on both sides, so the torch head weights are imported into
the captured params (the golden-tested torch->flax direction) before
comparing.
"""

import functools

import numpy as np
import pytest

from tests.conftest import install_reference_import_shim, requires_reference

install_reference_import_shim()

import jax
import jax.numpy as jnp

pytestmark = requires_reference

TINY = dict(dim_tokens=64, depth=2, num_heads=4)


class _CapturedStop(Exception):
    pass


@pytest.fixture(autouse=True)
def _clear_constraint_mesh():
    """CLI mains register the process-global constraint mesh."""
    yield
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    use_constraint_mesh(None)


@pytest.fixture(scope="module")
def ref_pth(tmp_path_factory):
    """torch.save the actual reference pretrain MultiMAE (tiny dims) in
    the released-checkpoint format: {'model': state_dict, 'epoch': N}."""
    import torch
    from multimae.input_adapters import (
        PatchedInputAdapter as RefPatched,
        SemSegInputAdapter as RefSemSeg,
    )
    from multimae.multimae import MultiMAE as RefMultiMAE
    from multimae.output_adapters import SpatialOutputAdapter as RefSpatial

    torch.manual_seed(11)
    tasks = [("rgb", 3, 1), ("depth", 1, 1), ("semseg", 133, 4)]
    input_adapters = {
        "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16),
        "depth": RefPatched(num_channels=1, stride_level=1, patch_size_full=16),
        # Pretrain config: NO emb_padding_idx (reference
        # run_pretraining_multimae.py:64-68) — the fine-tune CLIs must
        # pad the 133-row class_emb to 134 on load.
        "semseg": RefSemSeg(
            num_classes=133, stride_level=4, patch_size_full=16,
            dim_class_emb=64, interpolate_class_emb=False,
        ),
    }
    # norm_rgb: the --extra_norm_pix_loss adapter the released runs
    # train with (reference run_pretraining_multimae.py:271-283) —
    # another rgb decoder under the 'norm_rgb' key.
    tasks.append(("norm_rgb", 3, 1))
    output_adapters = {
        t: RefSpatial(
            num_channels=c, stride_level=s, patch_size_full=16,
            dim_tokens=64, depth=1, num_heads=4, use_task_queries=True,
            task=t if t != "norm_rgb" else "rgb",
            context_tasks=["rgb", "depth", "semseg"], use_xattn=True,
        )
        for t, c, s in tasks
    }
    ref = RefMultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        num_global_tokens=1, **TINY,
    ).eval()
    path = str(tmp_path_factory.mktemp("pth") / "pretrain_tiny.pth")
    # The FULL reference save_model payload (utils/checkpoint.py:75-87):
    # an argparse.Namespace under 'args' and optimizer/scaler state ride
    # along with the weights, so every golden below exercises the
    # tolerant load (torch_compat.torch_load_checkpoint) — plain
    # weights_only=True rejects the Namespace (round-4 advisor finding).
    import argparse

    opt = torch.optim.AdamW(ref.parameters(), lr=1e-4)
    torch.save({
        "model": ref.state_dict(),
        "optimizer": opt.state_dict(),
        "epoch": 3,
        "scaler": {"scale": 65536.0, "growth_factor": 2.0,
                   "backoff_factor": 0.5, "growth_interval": 2000,
                   "_growth_tracker": 0},
        "args": argparse.Namespace(model="pretrain_multimae_tiny",
                                   lr=1e-4, output_dir="/tmp/x"),
    }, path)
    return path


def test_full_save_model_payload_needs_tolerant_load(ref_pth):
    """Pin the behavior the fixture relies on: the Namespace makes plain
    weights_only=True fail, and torch_load_checkpoint recovers by
    allow-listing exactly argparse.Namespace."""
    import torch

    from multimae_tpu.utils.torch_compat import (
        load_torch_state_dict,
        torch_load_checkpoint,
    )

    with pytest.raises(Exception):
        torch.load(ref_pth, map_location="cpu", weights_only=True)
    payload = torch_load_checkpoint(ref_pth)
    assert payload["epoch"] == 3
    assert payload["args"].model == "pretrain_multimae_tiny"
    sd = load_torch_state_dict(ref_pth)
    assert "global_tokens" in sd and sd["global_tokens"].shape[-1] == 64


def _drive_cli(cli_mod, argv, monkeypatch):
    """Run a CLI main() until create_optimizer; return (args, params) —
    the params the CLI was about to train, i.e. after its own --finetune
    load + surgery."""
    import multimae_tpu.train.optim_factory as optim_factory

    captured = {}

    def spy(params, *a, **kw):
        captured["params"] = params
        raise _CapturedStop()

    monkeypatch.setattr(optim_factory, "create_optimizer", spy)
    args = cli_mod.get_args(argv)
    with pytest.raises(_CapturedStop):
        cli_mod.main(args)
    return args, captured["params"]


def _torch_surgery_load(ft_model, pth_path):
    """The reference fine-tune load verbatim
    (run_finetuning_semseg.py:409-432): pad semseg class-emb for the
    void/padding row, drop output adapters, interpolate pos-emb,
    tolerant load."""
    import torch.nn.functional as F
    from utils.pos_embed import interpolate_pos_embed_multimae

    from multimae_tpu.utils.torch_compat import torch_load_checkpoint

    ckpt = torch_load_checkpoint(pth_path)["model"]
    key = "input_adapters.semseg.class_emb.weight"
    sem = getattr(ft_model.input_adapters, "semseg", None)
    if key in ckpt and sem is not None and (
        sem.class_emb.weight.shape[0] == ckpt[key].shape[0] + 1
    ):
        ckpt[key] = F.pad(ckpt[key], (0, 0, 0, 1))
    for k in list(ckpt):
        if "output_adapters" in k:
            del ckpt[k]
    interpolate_pos_embed_multimae(ft_model, ckpt)
    ft_model.load_state_dict(ckpt, strict=False)


def _with_torch_head(captured_params, ft_model, head_type):
    """Overwrite the (random-init) head leaves in the CLI-captured params
    with the torch fine-tune model's head values, leaving the CLI-loaded
    trunk untouched, so forward outputs are directly comparable."""
    from multimae_tpu.utils.torch_compat import state_dict_to_params

    head_sd = {
        k: v.numpy()
        for k, v in ft_model.state_dict().items()
        if k.startswith("output_adapters.")
    }
    params, report = state_dict_to_params(
        head_sd, captured_params, head_type=head_type, verbose=False
    )
    assert not report["unexpected"], report["unexpected"]
    return params


def _ref_patched(image_size):
    from multimae.input_adapters import PatchedInputAdapter as RefPatched

    return RefPatched(
        num_channels=3, stride_level=1, patch_size_full=16,
        image_size=image_size,
    )


@pytest.mark.parametrize("input_size", [224, 112])
def test_cls_cli_finetune_pth_golden(ref_pth, monkeypatch, input_size):
    """cls CLI --finetune: trunk load (+ pos-emb interpolation at 112px,
    where the 14x14 checkpoint grid is bicubic-resized to 7x7 exactly as
    the reference's interpolate_pos_embed_multimae does)."""
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import LinearOutputAdapter as RefLinear

    from multimae_tpu.cli import run_finetuning_cls as cli

    args, params = _drive_cli(cli, [
        "--model", "multivit_tiny", "--synthetic_data",
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", str(input_size), "--nb_classes", "5",
        "--dtype", "float32", "--no_auto_resume", "--finetune", ref_pth,
    ], monkeypatch)

    torch.manual_seed(21)
    ft = RefMultiViT(
        input_adapters={"rgb": _ref_patched(input_size)},
        output_adapters={
            "cls": RefLinear(num_classes=5, use_mean_pooling=args.use_mean_pooling)
        },
        num_global_tokens=1, **TINY,
    ).eval()
    _torch_surgery_load(ft, ref_pth)
    params = _with_torch_head(params, ft, head_type="regression")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, input_size, input_size, 3)).astype(np.float32)
    with torch.no_grad():
        ref_logits = ft(torch.from_numpy(x).permute(0, 3, 1, 2))["cls"].numpy()
    model = cli.build_cls_model(args, jnp.float32)
    logits = np.asarray(model.apply({"params": params}, {"rgb": jnp.asarray(x)})["cls"])
    np.testing.assert_allclose(logits, ref_logits, atol=5e-4, rtol=1e-3)


def test_semseg_cli_finetune_pth_golden(ref_pth, monkeypatch):
    """semseg CLI --finetune with an rgb+semseg model: exercises the
    class-emb pad (133 -> 134 with the padding row) on both sides."""
    import torch
    from multimae.input_adapters import SemSegInputAdapter as RefSemSeg
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import ConvNeXtAdapter as RefConvNeXt

    from multimae_tpu.cli import run_finetuning_semseg as cli

    args, params = _drive_cli(cli, [
        "--model", "multivit_tiny", "--synthetic_data",
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", "224", "--num_classes", "5",
        "--output_adapter", "convnext", "--decoder_dim", "384",
        "--decoder_depth", "1", "--in_domains", "rgb-semseg",
        "--no_fp16", "--no_auto_resume", "--finetune", ref_pth,
    ], monkeypatch)

    torch.manual_seed(22)
    ft = RefMultiViT(
        input_adapters={
            "rgb": _ref_patched(224),
            "semseg": RefSemSeg(
                num_classes=133, stride_level=4, patch_size_full=16,
                dim_class_emb=64, interpolate_class_emb=False,
                emb_padding_idx=133,
            ),
        },
        output_adapters={
            "semseg": RefConvNeXt(
                num_classes=5, embed_dim=384, preds_per_patch=16,
                depth=1, main_tasks=["rgb"], patch_size=16,
            )
        },
        num_global_tokens=1, **TINY,
    ).eval()
    _torch_surgery_load(ft, ref_pth)
    params = _with_torch_head(params, ft, head_type="semseg")

    rng = np.random.default_rng(1)
    x_rgb = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    x_seg = rng.integers(0, 133, (1, 56, 56))
    with torch.no_grad():
        ref_out = ft({
            "rgb": torch.from_numpy(x_rgb).permute(0, 3, 1, 2),
            "semseg": torch.from_numpy(x_seg),
        })["semseg"].permute(0, 2, 3, 1).numpy()
    model, _, _ = cli.build_semseg_model(args, jnp.float32)
    out = np.asarray(model.apply(
        {"params": params},
        {"rgb": jnp.asarray(x_rgb), "semseg": jnp.asarray(x_seg, jnp.int32)},
    )["semseg"])
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def _dense_regression_golden(cli_mod, argv_extra, out_domain, num_channels,
                             ref_pth, monkeypatch):
    """Shared body for the depth / taskonomy CLIs (rgb -> regression
    ConvNeXt head)."""
    import torch
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import ConvNeXtAdapter as RefConvNeXt

    args, params = _drive_cli(cli_mod, [
        "--model", "multivit_tiny", "--synthetic_data",
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", "224", "--in_domains", "rgb",
        "--output_adapter", "convnext",
        "--no_auto_resume", "--finetune", ref_pth,
    ] + argv_extra, monkeypatch)

    torch.manual_seed(23)
    ft = RefMultiViT(
        input_adapters={"rgb": _ref_patched(224)},
        output_adapters={
            out_domain: RefConvNeXt(
                num_classes=num_channels, preds_per_patch=64,
                main_tasks=["rgb"], patch_size=16,
            )
        },
        num_global_tokens=1, **TINY,
    ).eval()
    _torch_surgery_load(ft, ref_pth)
    params = _with_torch_head(params, ft, head_type="regression")

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ft(torch.from_numpy(x).permute(0, 3, 1, 2))[
            out_domain].permute(0, 2, 3, 1).numpy()
    model = cli_mod.__dict__[
        "build_depth_model" if out_domain == "depth" else "build_taskonomy_model"
    ](args, jnp.float32)[0]
    out = np.asarray(model.apply(
        {"params": params}, {"rgb": jnp.asarray(x)})[out_domain])
    np.testing.assert_allclose(out, ref_out, atol=5e-4, rtol=1e-3)


def test_depth_cli_finetune_pth_golden(ref_pth, monkeypatch):
    from multimae_tpu.cli import run_finetuning_depth as cli

    # the depth recipe is always fp32 (run_finetuning_depth.py:239)
    _dense_regression_golden(
        cli, ["--out_domains", "depth"], "depth", 1, ref_pth, monkeypatch,
    )


def test_taskonomy_cli_finetune_pth_golden(ref_pth, monkeypatch):
    from multimae_tpu.cli import run_finetuning_taskonomy as cli

    _dense_regression_golden(
        cli, ["--no_fp16", "--out_domains", "normal"], "normal", 3,
        ref_pth, monkeypatch,
    )


def test_pretrain_cli_resume_pth(ref_pth, monkeypatch, capsys):
    """pretrain CLI --resume on a reference-format .pth: every template
    leaf (input adapters incl. the 133-row class-emb, trunk, spatial
    output adapters) must be filled from the torch file, the epoch must
    be honored, and the loaded leaves must equal a direct torch_compat
    import."""
    import flax.traverse_util

    from multimae_tpu.cli import run_pretraining_multimae as cli
    from multimae_tpu.parallel import mesh as mesh_lib
    from multimae_tpu.utils.torch_compat import (
        load_torch_state_dict,
        state_dict_to_params,
    )

    captured = {}

    def spy(tree, mesh):
        captured.setdefault("params", tree)
        raise _CapturedStop()

    monkeypatch.setattr(mesh_lib, "replicate", spy)
    args = cli.get_args([
        "--model", "pretrain_multimae_tiny", "--synthetic_data",
        "--synthetic_steps_per_epoch", "2", "--epochs", "5",
        "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", "224", "--num_encoded_tokens", "98",
        "--decoder_dim", "64", "--decoder_depth", "1",
        "--decoder_num_heads", "4", "--dtype", "float32",
        "--no_auto_resume", "--resume", ref_pth,
    ])
    with pytest.raises(_CapturedStop):
        cli.main(args)
    assert "(epoch 3)" in capsys.readouterr().out

    model_params = captured["params"]["model"]
    direct, report = state_dict_to_params(
        load_torch_state_dict(ref_pth), model_params, verbose=False
    )
    assert not report["missing"], report["missing"][:8]
    assert not report["unexpected"], report["unexpected"][:8]
    flat_cli = flax.traverse_util.flatten_dict(model_params)
    flat_ref = flax.traverse_util.flatten_dict(direct)
    assert set(flat_cli) == set(flat_ref)
    for k, v in flat_cli.items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_ref[k]), err_msg="/".join(k)
        )
