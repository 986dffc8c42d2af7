"""NYUv2 depth-regression fine-tuning CLI (TPU-native).

Parity target: reference run_finetuning_depth.py — DPT (or ConvNeXt
preds_per_patch=64) head, berhu/l1/mse losses with mask_valid, NYU
de-standardised rmse/rel/srel/log10/delta metrics, best-delta1
checkpointing. The reference runs this recipe full fp32
(run_finetuning_depth.py:532) — we default to fp32 too.
"""

from __future__ import annotations

import argparse
import datetime
import functools
import math
import os
import sys
import time

import yaml


def get_args(argv=None):
    config_parser = argparse.ArgumentParser(add_help=False)
    config_parser.add_argument("-c", "--config", default="", type=str, metavar="FILE")

    parser = argparse.ArgumentParser("MultiMAE depth fine-tuning script")
    parser.add_argument("--batch_size", default=64, type=int)
    parser.add_argument("--epochs", default=2000, type=int)
    parser.add_argument("--ckpt_backend", default=None,
                        choices=["msgpack", "orbax"],
                        help="msgpack: rank-0 gather-save (torch-interop default); orbax: sharded per-host save (pod-native, no gather)")
    parser.add_argument("--save_ckpt_freq", default=200, type=int)

    parser.add_argument("--in_domains", default="rgb", type=str)
    parser.add_argument("--out_domains", default="depth", type=str)
    parser.add_argument("--standardize_depth", action="store_true")
    parser.add_argument("--no_standardize_depth", action="store_false", dest="standardize_depth")
    parser.set_defaults(standardize_depth=False)
    parser.add_argument("--use_mask_valid", action="store_true")
    parser.add_argument("--no_mask_valid", action="store_false", dest="use_mask_valid")
    parser.set_defaults(use_mask_valid=True)

    parser.add_argument("--model", default="multivit_base", type=str)
    parser.add_argument("--num_global_tokens", default=1, type=int)
    parser.add_argument("--patch_size", default=16, type=int)
    parser.add_argument("--input_size", default=256, type=int)
    parser.add_argument("--drop_path_encoder", type=float, default=0.0)
    parser.add_argument("--learnable_pos_emb", action="store_true")
    parser.add_argument("--no_learnable_pos_emb", action="store_false", dest="learnable_pos_emb")
    parser.set_defaults(learnable_pos_emb=False)
    parser.add_argument("--output_adapter", type=str, default="dpt",
                        choices=["dpt", "convnext"])
    parser.add_argument("--decoder_main_tasks", type=str, default="rgb")
    parser.add_argument("--freeze_transformer", action="store_true")

    parser.add_argument("--opt", default="adamw", type=str)
    parser.add_argument("--opt_eps", default=1e-8, type=float)
    parser.add_argument("--opt_betas", default=[0.9, 0.999], type=float, nargs="+")
    parser.add_argument("--clip_grad", type=float, default=None)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight_decay", type=float, default=1e-4)
    parser.add_argument("--weight_decay_end", type=float, default=None)
    parser.add_argument("--decoder_decay", type=float, default=None)
    parser.add_argument("--no_lr_scale_list", type=str, default="")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--warmup_lr", type=float, default=1e-6)
    parser.add_argument("--min_lr", type=float, default=0.0)
    parser.add_argument("--layer_decay", type=float, default=0.75)
    parser.add_argument("--warmup_epochs", type=int, default=100)
    parser.add_argument("--warmup_steps", type=int, default=-1)

    parser.add_argument("--loss", default="berhu", choices=["berhu", "l1", "mse"])
    parser.add_argument("--aug_name", default="nyu-augs", type=str)
    parser.add_argument("--color_augs", default=False, action="store_true")
    parser.add_argument("--no_color_augs", dest="color_augs", default=False, action="store_false")

    parser.add_argument("--finetune", default="")
    parser.add_argument("--dataset_name", default="nyu", type=str)
    parser.add_argument("--data_path", default="", type=str)
    parser.add_argument("--eval_data_path", default="", type=str)
    parser.add_argument("--test_data_path", default=None, type=str)
    parser.add_argument("--max_train_images", default=None, type=int)
    parser.add_argument("--max_val_images", default=None, type=int)
    parser.add_argument("--max_test_images", default=None, type=int)
    parser.add_argument("--eval_freq", default=250, type=int)

    parser.add_argument("--output_dir", default="")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default="")
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--no_auto_resume", action="store_false", dest="auto_resume")
    parser.set_defaults(auto_resume=True)
    parser.add_argument("--save_ckpt", action="store_true")
    parser.add_argument("--no_save_ckpt", action="store_false", dest="save_ckpt")
    parser.set_defaults(save_ckpt=True)
    parser.add_argument("--start_epoch", default=0, type=int)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument(
        "--dist_eval", action="store_true", default=False,
        help="Accepted for reference-recipe parity; eval here is ALWAYS "
             "process-sharded with exact partial-batch accounting and "
             "cross-process metric reduction (no duplicate-padding bias), "
             "so this flag changes nothing.")
    parser.add_argument("--num_workers", default=16, type=int)
    parser.add_argument("--pin_mem", action="store_true")
    parser.add_argument("--no_pin_mem", action="store_false", dest="pin_mem")
    parser.set_defaults(pin_mem=True)
    parser.add_argument("--find_unused_params", action="store_true")
    parser.add_argument("--no_find_unused_params", action="store_false", dest="find_unused_params")
    parser.set_defaults(find_unused_params=True)
    parser.add_argument("--fp32", action="store_true", default=True)

    parser.add_argument("--log_wandb", default=False, action="store_true")
    parser.add_argument("--wandb_project", default=None, type=str)
    parser.add_argument("--wandb_entity", default=None, type=str)
    parser.add_argument("--wandb_run_name", default=None, type=str)
    parser.add_argument("--log_images_wandb", action="store_true")
    parser.add_argument("--log_images_freq", default=250, type=int)
    parser.add_argument("--show_user_warnings", default=False, action="store_true")

    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--local_rank", default=-1, type=int)
    parser.add_argument("--dist_on_itp", action="store_true")
    parser.add_argument("--dist_url", default="env://")

    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--synthetic_steps_per_epoch", default=4, type=int)

    parser.add_argument("--model_parallel", default=1, type=int,
                        help="Tensor-parallel group size over the 'model' "
                             "mesh axis (Megatron-style, parallel/tp.py). "
                             "batch_size becomes per data-parallel group")

    args_config, remaining = config_parser.parse_known_args(argv)
    if args_config.config:
        with open(args_config.config, "r") as f:
            cfg = yaml.safe_load(f)
        known = {a.dest for a in parser._actions}
        parser.set_defaults(**{k: v for k, v in cfg.items() if k in known})
    return parser.parse_args(remaining)


def build_depth_model(args, dtype):
    """Reference run_finetuning_depth.py:405-450."""
    from multimae_tpu.models import (
        ConvNeXtAdapter,
        DPTOutputAdapter,
        PatchedInputAdapter,
    )
    from multimae_tpu.models.registry import create_model

    in_domains = args.in_domains.split("-")
    out_domains = args.out_domains.split("-")
    domain_conf = {
        "rgb": (3, functools.partial(PatchedInputAdapter, num_channels=3, stride_level=1)),
        "depth": (1, functools.partial(PatchedInputAdapter, num_channels=1, stride_level=1)),
    }
    input_adapters = {
        d: functools.partial(
            domain_conf[d][1], patch_size_full=args.patch_size,
            image_size=args.input_size, learnable_pos_emb=args.learnable_pos_emb,
        )
        for d in in_domains
    }
    main_tasks = tuple(args.decoder_main_tasks.split("-"))
    # ConvNeXtAdapter has no stride_level arg (the reference version
    # swallows it via **kwargs); only DPT takes it.
    adapters_dict = {
        "dpt": functools.partial(
            DPTOutputAdapter, head_type="regression", stride_level=1
        ),
        "convnext": functools.partial(ConvNeXtAdapter, preds_per_patch=64),
    }
    output_adapters = {
        d: functools.partial(
            adapters_dict[args.output_adapter],
            num_classes=domain_conf[d][0],
            patch_size=args.patch_size,
            main_tasks=main_tasks,
        )
        for d in out_domains
    }
    model = create_model(
        args.model,
        input_adapters=input_adapters,
        output_adapters=output_adapters,
        drop_path_rate=args.drop_path_encoder,
        dtype=dtype,
    )
    return model, in_domains, out_domains


def main(args):
    if getattr(args, "ckpt_backend", None):
        from multimae_tpu.train.checkpoint import set_default_backend

        set_default_backend(args.ckpt_backend)
    from multimae_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimae_tpu.data.dataset_folder import MultiTaskImageFolder
    from multimae_tpu.data.loader import build_loader, steps_per_epoch
    from multimae_tpu.data.regression_transforms import (
        DataAugmentationForRegression,
        NYUTransform,
    )
    from multimae_tpu.parallel import mesh as mesh_lib
    from multimae_tpu.train.checkpoint import (
        auto_load_checkpoint,
        load_pretrained_torch,
        save_checkpoint,
    )
    from multimae_tpu.train.finetune_step import (
        make_dense_eval_step,
        make_dense_train_step,
    )
    from multimae_tpu.train.optim_factory import (
        LayerDecayValueAssigner,
        create_optimizer,
    )
    from multimae_tpu.train.regression_losses import LOSSES, masked_nyu_metrics
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.logger import MetricLogger, write_log_line

    mesh_lib.initialize_distributed()
    mesh = mesh_lib.create_mesh(model=args.model_parallel)
    # Register for in-model sharding hints and so shard_mapped Pallas
    # kernels partition over 'data' on pods (SCALING.md rule 3).
    mesh_lib.use_constraint_mesh(mesh)
    n_devices = jax.device_count()
    dtype = jnp.float32  # depth recipe runs fp32 (reference :532)

    model, in_domains, out_domains = build_depth_model(args, dtype)
    task = out_domains[0]
    all_domains = sorted(set(in_domains) | set(out_domains))
    if args.use_mask_valid:
        all_domains.append("mask_valid")
    global_batch = args.batch_size * (n_devices // args.model_parallel)

    def example_batch(b):
        rng = np.random.default_rng(0)
        s = args.input_size
        out = {
            "rgb": rng.standard_normal((b, s, s, 3)).astype(np.float32),
            "target": rng.standard_normal((b, s, s, 1)).astype(np.float32),
            "mask_valid": (rng.random((b, s, s, 1)) > 0.2),
        }
        return out

    if args.synthetic_data:
        num_steps_per_epoch = args.synthetic_steps_per_epoch
    else:
        train_tf = DataAugmentationForRegression(
            NYUTransform(train=True, input_size=args.input_size,
                         color_aug=args.color_augs)
        )
        val_tf = DataAugmentationForRegression(
            NYUTransform(train=False, input_size=args.input_size)
        )
        dataset_train = MultiTaskImageFolder(
            args.data_path, all_domains, max_images=args.max_train_images
        )
        dataset_val = MultiTaskImageFolder(
            args.eval_data_path, all_domains, max_images=args.max_val_images
        )
        num_steps_per_epoch = steps_per_epoch(len(dataset_train), global_batch)
        train_loader = build_loader(
            dataset_train, train_tf, global_batch_size=global_batch,
            shuffle=True, seed=args.seed, num_epochs=None,
            worker_count=args.num_workers,
        )

    rng = jax.random.PRNGKey(args.seed)
    ex = example_batch(2)
    init_inputs = {d: jnp.asarray(ex[d]) for d in in_domains if d in ex}
    params = jax.jit(lambda: model.init({"params": rng}, init_inputs)["params"])()
    if args.finetune:
        params, _ = load_pretrained_torch(args.finetune, params)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.2f}M")

    depth_layers = model.depth  # encoder depth (get_num_layers equivalent)
    assigner = None
    if args.layer_decay < 1.0:
        values = [args.layer_decay ** (depth_layers + 1 - i) for i in range(depth_layers + 2)]
        assigner = LayerDecayValueAssigner(values)

    lr_values = cosine_scheduler(
        args.lr, args.min_lr, args.epochs, num_steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps,
    )
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_values = cosine_scheduler(args.weight_decay, wd_end, args.epochs,
                                 num_steps_per_epoch)
    tx = create_optimizer(
        params, opt=args.opt, lr_schedule=as_optax_schedule(lr_values),
        weight_decay=args.weight_decay, wd_schedule=as_optax_schedule(wd_values),
        opt_betas=tuple(args.opt_betas), opt_eps=args.opt_eps,
        momentum=args.momentum, layer_decay_assigner=assigner,
        filter_bias_and_bn=True, learnable_pos_emb=args.learnable_pos_emb,
    )
    state = TrainState.create(params=params, tx=tx)
    start_epoch = args.start_epoch
    if args.resume:
        from multimae_tpu.train.checkpoint import load_checkpoint

        state, last_epoch = load_checkpoint(args.resume, state)
        start_epoch = last_epoch + 1
        print(f"[checkpoint] resumed from {args.resume} (epoch {last_epoch})")
    elif args.auto_resume and args.output_dir:
        state, start_epoch = auto_load_checkpoint(args.output_dir, state)
    if args.model_parallel > 1:
        from multimae_tpu.parallel.tp import shard_state_tp

        state = shard_state_tp(state, mesh)
    else:
        state = state.replace(
            params=mesh_lib.replicate(state.params, mesh),
            opt_state=mesh_lib.replicate(state.opt_state, mesh),
        )

    loss_fn = LOSSES[args.loss]
    train_step = make_dense_train_step(
        model, task, loss_fn, in_domains=tuple(in_domains),
        clip_grad=args.clip_grad, needs_target_kwargs=True,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    from multimae_tpu.parallel.mesh import data_sharding

    data_sh = data_sharding(mesh)
    if args.model_parallel > 1:
        from multimae_tpu.parallel.tp import jit_tp

        jit_train = jit_tp(train_step, state, mesh)
    else:
        jit_train = jax.jit(
            train_step, in_shardings=(repl, data_sh, repl),
            out_shardings=(repl, repl), donate_argnums=(0,))
    eval_fwd = make_dense_eval_step(model, task, in_domains=tuple(in_domains))

    def prepare_batch(b):
        out = {d: b[d] for d in in_domains if d in b}
        out["target"] = b.get("target", b.get(task))
        if "mask_valid" in b:
            out["mask_valid"] = b["mask_valid"]
        return out

    def run_eval():
        loader = build_loader(
            dataset_val, val_tf, global_batch_size=global_batch,
            shuffle=False, seed=0, num_epochs=1, worker_count=args.num_workers,
            drop_remainder=False,
        )
        sums, count = {}, 0
        for b in loader:
            prep = prepare_batch({k: v for k, v in b.items() if k != "label"})
            pred = eval_fwd(state.params, jax.tree.map(jnp.asarray, prep))
            m = masked_nyu_metrics(
                pred.astype(jnp.float32), jnp.asarray(prep["target"]),
                jnp.asarray(prep.get("mask_valid")) if "mask_valid" in prep else None,
            )
            bs = pred.shape[0]
            count += bs
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v) * bs
        # Distributed eval (reference --dist_eval): the loader is
        # process-sharded, reduce weighted sums + count across processes.
        from multimae_tpu.utils.metrics import sum_across_processes

        keys = sorted(sums)
        reduced = sum_across_processes(np.asarray(
            [sums[k] for k in keys] + [float(count)], np.float64))
        sums = dict(zip(keys, reduced[:-1]))
        count = reduced[-1]
        return {k: v / max(count, 1) for k, v in sums.items()}

    if args.eval and not args.synthetic_data:
        stats = run_eval()
        print(" ".join(f"{k} {v:.4f}" for k, v in stats.items()))
        return

    step_rng = jax.random.PRNGKey(args.seed + 3)
    best_delta1 = 0.0
    print(f"Start training for {args.epochs} epochs")
    start = time.time()
    for epoch in range(start_epoch, args.epochs):
        metric_logger = MetricLogger()
        header = f"Epoch: [{epoch}]"

        def train_batches():
            for _ in range(num_steps_per_epoch):
                if args.synthetic_data:
                    yield prepare_batch(example_batch(global_batch))
                else:
                    b = next(train_loader)
                    yield prepare_batch(
                        {("target" if k == task else k): v for k, v in b.items()
                         if k != "label"}
                    )

        for batch in metric_logger.log_every(
            train_batches(), 20, header, total=num_steps_per_epoch
        ):
            dev = mesh_lib.shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
            state, metrics = jit_train(state, dev, step_rng)
            loss_v = float(metrics["loss"])
            if not math.isfinite(loss_v):
                print(f"Loss is {loss_v}, stopping training")
                sys.exit(1)
            metric_logger.update(loss=loss_v, grad_norm=float(metrics["grad_norm"]))

        metric_logger.synchronize_between_processes()
        train_stats = {k: m.global_avg for k, m in metric_logger.meters.items()}
        log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                     "epoch": epoch}

        if not args.synthetic_data and (epoch + 1) % args.eval_freq == 0:
            stats = run_eval()
            print(" ".join(f"{k} {v:.4f}" for k, v in stats.items()))
            if stats.get("delta_1", 0.0) > best_delta1:
                best_delta1 = stats["delta_1"]
                if args.output_dir and args.save_ckpt:
                    save_checkpoint(args.output_dir, epoch, state,
                                    args=vars(args), tag="checkpoint-best")
            log_stats.update({f"val_{k}": v for k, v in stats.items()})

        if args.output_dir and args.save_ckpt and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            save_checkpoint(args.output_dir, epoch, state, args=vars(args))
        write_log_line(args.output_dir, log_stats)

    from multimae_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    print(f"Training time {datetime.timedelta(seconds=int(time.time() - start))}")


if __name__ == "__main__":
    opts = get_args()
    if opts.output_dir:
        os.makedirs(opts.output_dir, exist_ok=True)
    main(opts)
