"""End-to-end CLI tests: tiny models, synthetic + real on-disk data, CPU.

These guard the integration seams (argparse/YAML -> factory -> loader ->
jitted step -> checkpoint) that unit tests can't see. Marked slow-ish
(~2-3 min total on CPU).
"""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.skipif(
    os.environ.get("MULTIMAE_RUN_SLOW_TESTS") != "1",
    reason="slow CLI end-to-end tests; set MULTIMAE_RUN_SLOW_TESTS=1",
)


@pytest.fixture(autouse=True)
def _clear_constraint_mesh():
    """CLI mains register the process-global constraint mesh
    (use_constraint_mesh); don't let it leak into later tests."""
    yield
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    use_constraint_mesh(None)

TINY_PRETRAIN = [
    "--model", "pretrain_multimae_tiny",
    "--synthetic_data", "--synthetic_steps_per_epoch", "2",
    "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
    "--input_size", "64", "--num_encoded_tokens", "12",
    "--decoder_dim", "64", "--decoder_depth", "1", "--decoder_num_heads", "4",
    "--dtype", "float32", "--no_auto_resume",
]


@pytest.fixture(scope="module")
def fake_multitask_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cli_ds"))
    rng = np.random.default_rng(0)
    for i in range(10):
        cls = f"c{i % 2}"
        for task in ("rgb", "depth", "semseg", "mask_valid"):
            os.makedirs(f"{root}/{task}/{cls}", exist_ok=True)
        name = f"i{i:02d}"
        Image.fromarray(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8),
                        "RGB").save(f"{root}/rgb/{cls}/{name}.jpg")
        Image.fromarray(rng.integers(0, 60000, (96, 128), dtype=np.uint16)
                        ).save(f"{root}/depth/{cls}/{name}.png")
        Image.fromarray(rng.integers(0, 10, (96, 128), dtype=np.uint8),
                        "L").convert("P").save(f"{root}/semseg/{cls}/{name}.png")
        Image.fromarray((rng.random((96, 128)) > 0.1).astype(np.uint8) * 255,
                        "L").save(f"{root}/mask_valid/{cls}/{name}.png")
    return root


def test_pretraining_cli_synthetic(tmp_path):
    from multimae_tpu.cli.run_pretraining_multimae import get_args, main

    out = str(tmp_path / "out")
    args = get_args(TINY_PRETRAIN + [
        "--output_dir", out, "--save_ckpt_freq", "1",
        "--task_balancer", "uncertainty",
    ])
    main(args)
    assert os.path.exists(os.path.join(out, "checkpoint-0.msgpack"))
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_pretraining_cli_orbax_backend_resume(tmp_path):
    from multimae_tpu.cli.run_pretraining_multimae import get_args, main

    out = str(tmp_path / "out")
    base = [a for a in TINY_PRETRAIN if a != "--no_auto_resume"]
    try:
        args = get_args(base + [
            "--output_dir", out, "--save_ckpt_freq", "1",
            "--ckpt_backend", "orbax",
        ])
        main(args)
        assert os.path.isdir(os.path.join(out, "checkpoint-0.orbax"))
        # second run must auto-resume from the orbax checkpoint and
        # continue into epoch 1
        args2 = get_args(base + [
            "--output_dir", out, "--save_ckpt_freq", "1",
            "--ckpt_backend", "orbax", "--epochs", "2",
        ])
        main(args2)
        assert os.path.isdir(os.path.join(out, "checkpoint-1.orbax"))
    finally:
        # set_default_backend wrote the process-global env default
        os.environ.pop("MULTIMAE_TPU_CKPT_BACKEND", None)


def test_pretraining_cli_default_balancer_none(tmp_path):
    # regression: NoWeighting balancer has no params (was a KeyError)
    from multimae_tpu.cli.run_pretraining_multimae import get_args, main

    args = get_args(TINY_PRETRAIN)
    main(args)


def test_pretraining_cli_real_data(fake_multitask_root, tmp_path):
    from multimae_tpu.cli.run_pretraining_multimae import get_args, main

    args = get_args([
        "--model", "pretrain_multimae_tiny",
        "--data_path", fake_multitask_root,
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "4",
        "--input_size", "64", "--num_encoded_tokens", "12",
        "--decoder_dim", "64", "--decoder_depth", "1",
        "--decoder_num_heads", "4", "--dtype", "float32",
        "--num_workers", "0", "--no_auto_resume",
        "--standardize_depth",
    ])
    main(args)


def test_semseg_cli_real_data_with_eval(fake_multitask_root):
    from multimae_tpu.cli.run_finetuning_semseg import get_args, main

    args = get_args([
        "--model", "multivit_tiny",
        "--data_path", fake_multitask_root,
        "--eval_data_path", fake_multitask_root,
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", "64", "--num_classes", "10",
        "--decoder_dim", "384", "--decoder_depth", "1",
        "--output_adapter", "convnext", "--no_fp16", "--no_auto_resume",
        "--num_workers", "0", "--eval_freq", "1", "--no_save_ckpt",
    ])
    main(args)


def test_pretraining_cli_model_parallel(tmp_path):
    """--model_parallel 2: (4, 2) mesh, TP-sharded state, checkpoint save."""
    from multimae_tpu.cli.run_pretraining_multimae import get_args, main
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    out = str(tmp_path / "out_tp")
    args = get_args(TINY_PRETRAIN + [
        "--model_parallel", "2",
        "--output_dir", out, "--save_ckpt_freq", "1",
        "--task_balancer", "uncertainty",
    ])
    try:
        main(args)
    finally:
        use_constraint_mesh(None)
    assert os.path.exists(os.path.join(out, "checkpoint-0.msgpack"))


def test_semseg_cli_model_parallel_with_eval(fake_multitask_root):
    """--model_parallel 2 on the semseg CLI: TP train step + TP-sharded
    eval params through the on-device confusion matrix."""
    from multimae_tpu.cli.run_finetuning_semseg import get_args, main
    from multimae_tpu.parallel.mesh import use_constraint_mesh

    args = get_args([
        "--model", "multivit_tiny",
        "--data_path", fake_multitask_root,
        "--eval_data_path", fake_multitask_root,
        "--epochs", "1", "--warmup_epochs", "0", "--batch_size", "2",
        "--input_size", "64", "--num_classes", "10",
        "--decoder_dim", "384", "--decoder_depth", "1",
        "--output_adapter", "convnext", "--no_fp16", "--no_auto_resume",
        "--num_workers", "0", "--eval_freq", "1", "--no_save_ckpt",
        "--model_parallel", "2",
    ])
    try:
        main(args)
    finally:
        use_constraint_mesh(None)
