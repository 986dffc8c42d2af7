"""Fine-tune-regime benchmark: 512px semseg train-step throughput.

The pretrain bench (bench.py) covers the 99-token masked regime; this
one pins the 1025-token (512px, patch 16) fine-tune regime where the
attention engine switches: ops/short_attention_pallas.py auto-dispatches
for kv >= 512 (MULTIMAE_TPU_SHORT_KERNEL_MIN_KV) and was measured ~2x
faster than XLA dense fwd+bwd at this shape, while also saving all
O(N^2) attention residuals.

Measures the FULL jitted semseg fine-tune train step (ViT-B RGB+D ->
ConvNeXt decoder, the ADE20K/NYU recipe shape: reference
run_finetuning_semseg.py:371-447) twice - Pallas auto-dispatch vs
XLA-dense-forced - and prints one JSON line per engine plus the ratio.

Usage: python tools/bench_finetune.py [--batch 16] [--input_size 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _trunk(args):
    """Registry name + trunk facts for the selected encoder width.

    `--large` swaps the 24-block dim-1024 trunk in everywhere: DPT hooks
    scale to the same relative depths as the reference's ViT-B defaults
    (2,5,8,11 of 12 -> 5,11,17,23 of 24) and cls layer-decay resolves
    over 24 blocks (reference utils/optim_factory.py:22-35 keys groups
    off the real trunk depth)."""
    if getattr(args, "large", False):
        return "multivit_large", 24, (5, 11, 17, 23)
    return "multivit_base", 12, (2, 5, 8, 11)


def build(args, dtype):
    import functools

    import jax.numpy as jnp  # noqa: F401

    from multimae_tpu.models import ConvNeXtAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    name, _, _ = _trunk(args)
    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=16, image_size=args.input_size,
        ),
        "depth": functools.partial(
            PatchedInputAdapter, num_channels=1, stride_level=1,
            patch_size_full=16, image_size=args.input_size,
        ),
    }
    output_adapters = {
        "semseg": functools.partial(
            ConvNeXtAdapter, num_classes=args.num_classes,
            preds_per_patch=16, depth=4, embed_dim=6144,
            patch_size=16, main_tasks=("rgb",),
        )
    }
    return create_model(
        name, input_adapters=input_adapters,
        output_adapters=output_adapters, drop_path_rate=0.1, dtype=dtype,
    )


def build_depth(args, dtype):
    """NYUv2 depth recipe shape: rgb@256 -> DPT regression head
    (reference run_finetuning_depth.py:405-450 + cfgs/finetune/depth)."""
    import functools

    from multimae_tpu.models import DPTOutputAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    name, _, hooks = _trunk(args)
    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=16, image_size=args.input_size,
        ),
    }
    output_adapters = {
        "depth": functools.partial(
            DPTOutputAdapter, head_type="regression", stride_level=1,
            num_classes=1, patch_size=16, main_tasks=("rgb",),
            hooks=hooks,
        )
    }
    return create_model(
        name, input_adapters=input_adapters,
        output_adapters=output_adapters, drop_path_rate=0.1, dtype=dtype,
    )


def build_cls(args, dtype):
    """ImageNet-1K fine-tune recipe shape: rgb@224 -> linear head
    (reference run_finetuning_cls.py + cfgs/finetune/cls/
    ft_in1k_100e_multimae-b.yaml: batch 128/device, layer_decay 0.65,
    mixup soft targets)."""
    import functools

    from multimae_tpu.models import LinearOutputAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=16, image_size=args.input_size,
        ),
    }
    name, _, _ = _trunk(args)
    output_adapters = {
        "cls": functools.partial(LinearOutputAdapter,
                                 num_classes=args.num_classes)
    }
    return create_model(
        name, input_adapters=input_adapters,
        output_adapters=output_adapters, drop_path_rate=0.1, dtype=dtype,
    )


def build_taskonomy(args, dtype):
    """Taskonomy recipe shape: rgb@384 -> surface-normal DPT regression
    head, masked L1 (reference run_finetuning_taskonomy.py:130-160,
    398-400: batch 32/GPU, in rgb, out normal, dpt adapter)."""
    import functools

    from multimae_tpu.models import DPTOutputAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=16, image_size=args.input_size,
        ),
    }
    name, _, hooks = _trunk(args)
    output_adapters = {
        "normal": functools.partial(
            DPTOutputAdapter, head_type="regression", stride_level=1,
            num_classes=3, patch_size=16, main_tasks=("rgb",),
            hooks=hooks,
        )
    }
    return create_model(
        name, input_adapters=input_adapters,
        output_adapters=output_adapters, drop_path_rate=0.1, dtype=dtype,
    )


def build_train_step(args):
    """Construct the jitted fine-tune train step for `args.task` and
    return (dp_step, state, sharded_batch). Shared with
    tools/profile_step.py's recipe-profiling modes."""
    import jax
    import jax.numpy as jnp

    from multimae_tpu.cli.run_finetuning_semseg import seg_cross_entropy
    from multimae_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from multimae_tpu.train.finetune_step import make_dense_train_step
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState

    n_chips = jax.device_count()
    mesh = create_mesh()
    b = args.batch * n_chips
    s = args.input_size

    rng = jax.random.PRNGKey(0)
    if args.task == "taskonomy":
        from multimae_tpu.train.regression_losses import masked_l1_loss

        model = build_taskonomy(args, jnp.bfloat16)
        batch = {
            "rgb": jax.random.normal(rng, (b, s, s, 3), jnp.float32),
            "target": jax.random.normal(
                jax.random.PRNGKey(1), (b, s, s, 3), jnp.float32),
            "mask_valid": (jax.random.uniform(
                jax.random.PRNGKey(2), (b, s, s, 1)) > 0.1
            ).astype(jnp.float32),
        }
        task, loss_fn, in_domains = "normal", masked_l1_loss, ("rgb",)
    elif args.task == "depth":
        from multimae_tpu.train.regression_losses import masked_berhu_loss

        model = build_depth(args, jnp.bfloat16)
        batch = {
            "rgb": jax.random.normal(rng, (b, s, s, 3), jnp.float32),
            "target": jax.random.normal(rng, (b, s, s, 1), jnp.float32),
        }
        task, loss_fn, in_domains = (
            "depth",
            lambda p, t, **kw: masked_berhu_loss(p, t),
            ("rgb",),
        )
    elif args.task == "cls":
        from multimae_tpu.train.cross_entropy import soft_target_cross_entropy

        model = build_cls(args, jnp.bfloat16)
        # mixup-style soft targets (the 100e recipe trains through Mixup)
        soft = jax.nn.softmax(
            jax.random.normal(jax.random.PRNGKey(1),
                              (b, args.num_classes), jnp.float32) * 4.0
        )
        batch = {
            "rgb": jax.random.normal(rng, (b, s, s, 3), jnp.float32),
            "target": soft,
        }
        task, loss_fn, in_domains = "cls", soft_target_cross_entropy, ("rgb",)
    else:
        model = build(args, jnp.bfloat16)
        batch = {
            "rgb": jax.random.normal(rng, (b, s, s, 3), jnp.float32),
            "depth": jax.random.normal(rng, (b, s, s, 1), jnp.float32),
            "target": jax.random.randint(
                jax.random.PRNGKey(1), (b, s, s), 0, args.num_classes, jnp.int32
            ),
        }
        task, loss_fn, in_domains = "semseg", seg_cross_entropy, ("rgb", "depth")
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jax.tree.map(lambda x: x[:2], {k: v for k, v in batch.items() if k != "target"}),
            train=False,
        )["params"]
    )()
    lr = as_optax_schedule(
        cosine_scheduler(1e-4, 0.0, epochs=64, niter_per_ep=100, warmup_epochs=1)
    )
    assigner = None
    if args.task == "cls":
        from multimae_tpu.train.optim_factory import LayerDecayValueAssigner

        _, depth, _ = _trunk(args)
        assigner = LayerDecayValueAssigner(
            [0.65 ** (depth + 1 - i) for i in range(depth + 2)]
        )
    tx = create_optimizer(
        params, opt="adamw", lr_schedule=lr, weight_decay=0.05,
        opt_betas=(0.9, 0.999), filter_bias_and_bn=True,
        layer_decay_assigner=assigner,
    )
    state = TrainState.create(params=params, tx=tx)
    state = state.replace(
        params=replicate(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )
    if args.task == "cls":
        from multimae_tpu.train.finetune_step import make_cls_train_step

        step = make_cls_train_step(model, loss_fn)
    else:
        step = make_dense_train_step(
            model, task, loss_fn, in_domains=in_domains,
            needs_target_kwargs=(args.task == "taskonomy"))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.parallel.mesh import data_sharding

    repl = NamedSharding(mesh, P())
    data_sh = data_sharding(mesh)
    dp_step = jax.jit(step, in_shardings=(repl, data_sh, repl),
                      out_shardings=(repl, repl), donate_argnums=(0,))
    return dp_step, state, shard_batch(batch, mesh)


def measure(args, label):
    import jax

    n_chips = jax.device_count()
    b = args.batch * n_chips
    dp_step, state, batch = build_train_step(args)
    key = jax.random.PRNGKey(2)

    for _ in range(3):
        state, metrics = dp_step(state, batch, key)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = dp_step(state, batch, key)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    per_chip = b * args.steps / dt / n_chips
    size = ("large_" if getattr(args, "large", False) else "")
    print(json.dumps({
        "metric": (f"finetune_{args.task}_{args.input_size}px_"
                   f"{size}throughput_{label}"),
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
    }))
    return per_chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=("semseg", "depth", "cls", "taskonomy"),
                    default="semseg",
                    help="semseg: rgb+depth@512 ConvNeXt head (ADE/NYU "
                         "recipe); depth: rgb@256 DPT regression head "
                         "(NYUv2 depth recipe); cls: rgb@224 linear head "
                         "(ImageNet-1K 100e recipe); taskonomy: rgb@384 "
                         "surface-normal DPT head, masked L1 (taskonomy "
                         "recipe)")
    ap.add_argument("--batch", type=int, default=None, help="per-chip batch")
    ap.add_argument("--input_size", type=int, default=None)
    ap.add_argument("--num_classes", type=int, default=150)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--large", action="store_true",
                    help="ViT-L trunk (multivit_large: 24 blocks, dim "
                         "1024, 16 heads). Confirms the training-path "
                         "kernel dispatch (short_attention VMEM budget, "
                         "fused ConvNeXt MLP) off the ViT-B happy path; "
                         "per-chip batch defaults drop 2x (HBM).")
    ap.add_argument("--engine", choices=("both", "pallas", "dense"),
                    default="both",
                    help="measure only one attention engine (skips the "
                         "other leg's multi-minute TPU compile)")
    args = ap.parse_args()
    if args.input_size is None:
        args.input_size = {"semseg": 512, "depth": 256, "cls": 224,
                           "taskonomy": 384}[args.task]
    if args.batch is None:
        args.batch = {"semseg": 16, "depth": 32, "cls": 128,
                      "taskonomy": 32}[args.task]
        if args.large:
            # ~3x params + deeper activations in HBM. semseg512 needs /4:
            # B=8 measured 17.7G > 15.75G HBM (24 blocks x 2049-token
            # activations); B=4 runs both engines (16.35 pallas / 5.28
            # dense, 2026-08-19).
            args.batch //= 4 if args.task == "semseg" else 2
    if args.task == "cls":
        args.num_classes = 1000

    from multimae_tpu.utils.jax_setup import setup_jax

    setup_jax()

    # cls@224 is 197 tokens — below the kernel dispatch threshold, so
    # there is only one engine to measure.
    if args.task == "cls":
        measure(args, "xla_dense")
        return

    # Engine A: auto-dispatch (short-attention Pallas kernel for kv>=512).
    if args.engine != "dense":
        pallas = measure(args, "pallas_auto")
        if args.engine == "pallas":
            return
    # Engine B: XLA dense einsum forced (module attr: the env var is only
    # read at import time).
    import multimae_tpu.ops.attention as attn

    attn.SHORT_KERNEL_MIN_KV = 10**9
    dense = measure(args, "xla_dense")
    if args.engine == "dense":
        return
    size = ("large_" if getattr(args, "large", False) else "")
    print(json.dumps({
        "metric": f"finetune_{args.task}_{args.input_size}px_{size}pallas_speedup",
        "value": round(pallas / dense, 4),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
