"""ImageNet classification fine-tuning CLI (TPU-native).

Same flag surface + YAML precedence as the reference run_finetuning_cls.py
(:46-230). Workload: MultiViT (rgb PatchedInputAdapter + cls
LinearOutputAdapter), RandAugment/mixup/cutmix/random-erasing aug stack,
layer-wise LR decay, optional model EMA, label-smoothing / soft-target
CE, top-1/5 eval (reference :231-613).
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

    parser = argparse.ArgumentParser("MultiMAE classification fine-tuning script")
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--update_freq", default=1, type=int)
    parser.add_argument("--ckpt_backend", default=None,
                        choices=["msgpack", "orbax"],
                        help="msgpack: rank-0 gather-save (torch-interop default); orbax: sharded per-host save (pod-native, no gather)")
    parser.add_argument("--save_ckpt_freq", default=20, type=int)

    parser.add_argument("--model", default="multivit_base", type=str)
    parser.add_argument("--num_global_tokens", default=1, type=int)
    parser.add_argument("--patch_size", default=16, type=int)
    parser.add_argument("--input_size", default=224, type=int)
    parser.add_argument("--drop", type=float, default=0.0)
    parser.add_argument("--attn_drop_rate", type=float, default=0.0)
    parser.add_argument("--drop_path", type=float, default=0.1)
    parser.add_argument("--disable_eval_during_finetuning", action="store_true", default=False)
    parser.add_argument("--model_ema", action="store_true", default=False)
    parser.add_argument("--model_ema_decay", type=float, default=0.9999)
    parser.add_argument("--model_ema_force_cpu", action="store_true", default=False)

    parser.add_argument("--opt", default="adamw", type=str)
    parser.add_argument("--opt_eps", default=1e-8, type=float)
    parser.add_argument("--opt_betas", default=None, type=float, nargs="+")
    parser.add_argument("--clip_grad", type=float, default=None)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight_decay", type=float, default=0.05)
    parser.add_argument("--weight_decay_end", type=float, default=None)
    parser.add_argument("--blr", type=float, default=5e-4)
    parser.add_argument("--layer_decay", type=float, default=0.65)
    parser.add_argument("--warmup_lr", type=float, default=1e-6)
    parser.add_argument("--min_lr", type=float, default=1e-6)
    parser.add_argument("--warmup_epochs", type=int, default=5)
    parser.add_argument("--warmup_steps", type=int, default=-1)

    parser.add_argument("--color_jitter", type=float, default=0.4)
    parser.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    parser.add_argument("--smoothing", type=float, default=0.1)
    parser.add_argument("--train_interpolation", type=str, default="bicubic")
    parser.add_argument("--crop_pct", type=float, default=None)
    parser.add_argument("--reprob", type=float, default=0.0)
    parser.add_argument("--remode", type=str, default="pixel")
    parser.add_argument("--recount", type=int, default=1)
    parser.add_argument("--resplit", action="store_true", default=False)

    parser.add_argument("--mixup", type=float, default=0.8)
    parser.add_argument("--cutmix", type=float, default=1.0)
    parser.add_argument("--cutmix_minmax", type=float, nargs="+", default=None)
    parser.add_argument("--mixup_prob", type=float, default=1.0)
    parser.add_argument("--mixup_switch_prob", type=float, default=0.5)
    parser.add_argument("--mixup_mode", type=str, default="batch")

    parser.add_argument("--finetune", default="")
    parser.add_argument("--model_key", default="model|module", type=str)
    parser.add_argument("--model_prefix", default="", type=str)
    parser.add_argument("--init_scale", default=0.001, type=float)
    parser.add_argument("--use_mean_pooling", default=False, action="store_true")
    parser.add_argument("--no_mean_pooling", action="store_false", dest="use_mean_pooling")
    parser.set_defaults(use_mean_pooling=True)

    parser.add_argument("--data_path", default="", type=str)
    parser.add_argument("--eval_data_path", default="", type=str)
    parser.add_argument("--nb_classes", default=1000, type=int)
    parser.add_argument("--imagenet_default_mean_and_std", default=True, action="store_true")
    parser.add_argument("--data_set", default="IMNET",
                        choices=["CIFAR", "IMNET", "image_folder"])
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
    parser.add_argument(
        "--dist_eval", action="store_true", default=False,
        help="Accepted for reference-recipe parity; eval here is ALWAYS "
             "process-sharded with exact partial-batch accounting and "
             "cross-process metric reduction (no duplicate-padding bias), "
             "so this flag changes nothing.")
    parser.add_argument("--no_dist_eval", action="store_false", dest="dist_eval")
    parser.set_defaults(dist_eval=False)
    parser.add_argument("--num_workers", default=10, type=int)
    parser.add_argument("--pin_mem", action="store_true")
    parser.add_argument("--no_pin_mem", action="store_false", dest="pin_mem")
    parser.set_defaults(pin_mem=True)
    parser.add_argument("--dtype", default="bfloat16", type=str,
                        choices=["bfloat16", "float32"])

    parser.add_argument("--log_wandb", default=False, action="store_true")
    parser.add_argument("--no_log_wandb", action="store_false", dest="log_wandb")
    parser.set_defaults(log_wandb=False)
    parser.add_argument("--wandb_project", default=None, type=str)
    parser.add_argument("--wandb_entity", default=None, type=str)
    parser.add_argument("--wandb_run_name", default=None, type=str)

    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--local_rank", default=-1, type=int)
    parser.add_argument("--dist_on_itp", action="store_true")
    parser.add_argument("--dist_url", default="env://")

    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--synthetic_steps_per_epoch", default=8, type=int)

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


def build_cls_model(args, dtype):
    from multimae_tpu.models import LinearOutputAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=args.patch_size, image_size=args.input_size,
        )
    }
    output_adapters = {
        "cls": functools.partial(
            LinearOutputAdapter, num_classes=args.nb_classes,
            use_mean_pooling=args.use_mean_pooling, init_scale=args.init_scale,
        )
    }
    return create_model(
        args.model,
        input_adapters=input_adapters,
        output_adapters=output_adapters,
        num_global_tokens=args.num_global_tokens,
        drop_path_rate=args.drop_path,
        drop_rate=args.drop,
        attn_drop_rate=args.attn_drop_rate,
        dtype=dtype,
    )


def evaluate(eval_step, params, loader, n_batches=None):
    """top-1/5 over an eval loader (reference run_finetuning_cls.py:580-613).

    Distributed eval (the reference's --dist_eval,
    run_finetuning_cls.py:391-398): the loader is always process-sharded
    (grain ShardOptions), so each process scores its shard and the
    weighted sums are reduced across processes — exact, with none of the
    reference sampler's duplicate-entry padding bias."""
    import numpy as np

    from multimae_tpu.utils.metrics import accuracy, sum_across_processes

    top1s, top5s, count = [], [], 0
    for i, item in enumerate(loader):
        if n_batches is not None and i >= n_batches:
            break
        batch, n_valid = item if isinstance(item, tuple) else (item, None)
        logits = eval_step(params, batch)
        if n_valid is None:
            n_valid = batch["target"].shape[0]
        t1, t5 = accuracy(
            logits[:n_valid], batch["target"][:n_valid], topk=(1, 5)
        )
        top1s.append(float(t1) * n_valid)
        top5s.append(float(t5) * n_valid)
        count += n_valid
    t1_sum, t5_sum, count = sum_across_processes(
        np.asarray([sum(top1s), sum(top5s), float(count)], np.float64)
    )
    return {
        "acc1": t1_sum / max(count, 1),
        "acc5": t5_sum / max(count, 1),
    }


def main(args):
    if getattr(args, "ckpt_backend", None):
        from multimae_tpu.train.checkpoint import set_default_backend

        set_default_backend(args.ckpt_backend)
    from multimae_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimae_tpu.data.cls_transforms import ClsEvalTransform, ClsTrainTransform
    from multimae_tpu.data.dataset_folder import ImageFolder
    from multimae_tpu.data.loader import build_loader, steps_per_epoch
    from multimae_tpu.data.mixup import Mixup
    from multimae_tpu.parallel import mesh as mesh_lib
    from multimae_tpu.train.checkpoint import (
        auto_load_checkpoint,
        load_pretrained_torch,
        save_checkpoint,
    )
    from multimae_tpu.train.cross_entropy import (
        cross_entropy,
        label_smoothing_cross_entropy,
        soft_target_cross_entropy,
    )
    from multimae_tpu.train.finetune_step import (
        make_cls_eval_step,
        make_cls_train_step,
    )
    from multimae_tpu.train.optim_factory import (
        LayerDecayValueAssigner,
        create_optimizer,
    )
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.logger import MetricLogger, write_log_line

    mesh_lib.initialize_distributed()
    mesh = mesh_lib.create_mesh(model=args.model_parallel)
    # Register for in-model sharding hints and so shard_mapped Pallas
    # kernels partition over 'data' on pods (SCALING.md rule 3).
    mesh_lib.use_constraint_mesh(mesh)
    n_devices = jax.device_count()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    model = build_cls_model(args, dtype)
    global_batch = args.batch_size * (n_devices // args.model_parallel)

    # Data
    mean_std = {}
    if args.synthetic_data:
        num_steps_per_epoch = args.synthetic_steps_per_epoch

        def synthetic_batches(n):
            rng = np.random.default_rng(0)
            for _ in range(n):
                yield {
                    "rgb": rng.standard_normal(
                        (global_batch, args.input_size, args.input_size, 3)
                    ).astype(np.float32),
                    "target": rng.integers(0, args.nb_classes, (global_batch,)),
                }
        eval_loader_fn = lambda: synthetic_batches(2)  # noqa: E731
    else:
        train_tf = ClsTrainTransform(
            input_size=args.input_size, color_jitter=args.color_jitter,
            auto_augment=(args.aa if args.aa and args.aa.lower() != "none" else None),
            interpolation=args.train_interpolation,
            re_prob=args.reprob, re_mode=args.remode, re_count=args.recount,
        )
        eval_tf = ClsEvalTransform(input_size=args.input_size, crop_pct=args.crop_pct)
        # Dataset choice (reference utils/datasets.py:128-160).
        if args.data_set == "CIFAR":
            from multimae_tpu.data.dataset_folder import CIFAR100

            train_ds = CIFAR100(args.data_path, train=True)
            val_ds = CIFAR100(args.data_path, train=False)
            assert args.nb_classes == 100, "--data_set CIFAR has 100 classes"
        else:
            train_ds = ImageFolder(args.data_path)
            val_ds = ImageFolder(args.eval_data_path)
            if args.data_set == "image_folder":
                assert len(train_ds.class_to_idx) == args.nb_classes
            assert len(train_ds.class_to_idx) >= 1
        num_steps_per_epoch = steps_per_epoch(len(train_ds), global_batch)
        train_loader = build_loader(
            _ClsDatasetAdapter(train_ds), train_tf, global_batch_size=global_batch,
            shuffle=True, seed=args.seed, num_epochs=None,
            worker_count=args.num_workers,
        )

        def eval_loader_fn():
            return build_loader(
                _ClsDatasetAdapter(val_ds), eval_tf, global_batch_size=global_batch,
                shuffle=False, seed=0, num_epochs=1, worker_count=args.num_workers,
                drop_remainder=False,
            )

    mixup_active = args.mixup > 0 or args.cutmix > 0.0 or args.cutmix_minmax is not None
    mixup_fn = None
    if mixup_active:
        mixup_fn = Mixup(
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            cutmix_minmax=args.cutmix_minmax, prob=args.mixup_prob,
            switch_prob=args.mixup_switch_prob, mode=args.mixup_mode,
            label_smoothing=args.smoothing, num_classes=args.nb_classes,
            seed=args.seed,
        )

    # Loss selection (reference :354-363)
    if mixup_fn is not None:
        loss = soft_target_cross_entropy
    elif args.smoothing > 0.0:
        loss = functools.partial(
            label_smoothing_cross_entropy, smoothing=args.smoothing
        )
    else:
        loss = cross_entropy

    # Params + finetune load
    rng = jax.random.PRNGKey(args.seed)
    example = {"rgb": jnp.zeros((2, args.input_size, args.input_size, 3))}
    params = jax.jit(
        lambda: model.init({"params": rng}, example)["params"]
    )()
    if args.finetune:
        if args.finetune.endswith(".pth"):
            params, report = load_pretrained_torch(args.finetune, params)
        else:
            from multimae_tpu.train.checkpoint import load_checkpoint

            class _Tmp:
                pass
            import flax

            with open(args.finetune, "rb") as f:
                payload = flax.serialization.msgpack_restore(f.read())
            src = payload["params"].get("model", payload["params"])
            # template-merge: keep head init, copy matching trunk params
            flat_t = flax.traverse_util.flatten_dict(params)
            flat_s = flax.traverse_util.flatten_dict(src)
            loaded = 0
            for k in flat_t:
                if k in flat_s and np.shape(flat_s[k]) == np.shape(flat_t[k]):
                    flat_t[k] = jnp.asarray(flat_s[k])
                    loaded += 1
            params = flax.traverse_util.unflatten_dict(flat_t)
            print(f"[finetune] loaded {loaded}/{len(flat_t)} tensors")

    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"params: {n_params / 1e6:.2f}M")

    # Optimizer: layer decay over depth+2 values (reference :369-374)
    depth = model.depth  # encoder depth (get_num_layers equivalent)
    assigner = None
    if args.layer_decay < 1.0:
        values = [args.layer_decay ** (depth + 1 - i) for i in range(depth + 2)]
        assigner = LayerDecayValueAssigner(values)

    lr = args.blr * global_batch * args.update_freq / 256.0
    total_steps_per_epoch = num_steps_per_epoch // args.update_freq
    lr_values = cosine_scheduler(
        lr, args.min_lr, args.epochs, total_steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps,
        start_warmup_value=args.warmup_lr,
    )
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_values = cosine_scheduler(args.weight_decay, wd_end, args.epochs,
                                 total_steps_per_epoch)
    opt_betas = tuple(args.opt_betas) if args.opt_betas else (0.9, 0.999)
    tx = create_optimizer(
        params, opt=args.opt, lr_schedule=as_optax_schedule(lr_values),
        weight_decay=args.weight_decay, wd_schedule=as_optax_schedule(wd_values),
        opt_betas=opt_betas, opt_eps=args.opt_eps, momentum=args.momentum,
        layer_decay_assigner=assigner, filter_bias_and_bn=True,
    )
    if args.update_freq > 1:
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=args.update_freq)

    # EMA lives on-device by default; --model_ema_force_cpu moves it to
    # host RAM (reference utils/model_ema.py device='cpu' path).
    ema_on_device = args.model_ema and not args.model_ema_force_cpu
    host_ema = None
    if args.model_ema and args.model_ema_force_cpu:
        from multimae_tpu.train.train_state import HostEMA

        host_ema = HostEMA(params, args.model_ema_decay)

    state = TrainState.create(
        params=params, tx=tx,
        ema_decay=args.model_ema_decay if ema_on_device else None,
    )
    start_epoch = args.start_epoch
    if args.resume:
        from multimae_tpu.train.checkpoint import load_checkpoint

        out = load_checkpoint(args.resume, state, with_extras=host_ema is not None)
        state, last_epoch = out[0], out[1]
        if host_ema is not None and out[2].get("ema_params"):
            host_ema.load(out[2]["ema_params"])
        start_epoch = last_epoch + 1
        print(f"[checkpoint] resumed from {args.resume} (epoch {last_epoch})")
    elif args.auto_resume and args.output_dir:
        out = auto_load_checkpoint(
            args.output_dir, state, with_extras=host_ema is not None
        )
        state, start_epoch = out[0], out[1]
        if host_ema is not None and out[2].get("ema_params"):
            host_ema.load(out[2]["ema_params"])

    train_step = make_cls_train_step(
        model, loss, clip_grad=args.clip_grad,
        ema_decay=args.model_ema_decay if ema_on_device else None,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    from multimae_tpu.parallel.mesh import data_sharding

    data_sh = data_sharding(mesh)
    if args.model_parallel > 1:
        from multimae_tpu.parallel.tp import (
            jit_tp,
            shard_state_tp,
            tp_state_shardings,
        )

        state = shard_state_tp(state, mesh)
        jit_train = jit_tp(train_step, state, mesh)
        eval_param_sh = tp_state_shardings(state.params, mesh)
    else:
        state = state.replace(
            params=mesh_lib.replicate(state.params, mesh),
            opt_state=mesh_lib.replicate(state.opt_state, mesh),
        )
        jit_train = jax.jit(
            train_step, in_shardings=(repl, data_sh, repl),
            out_shardings=(repl, repl), donate_argnums=(0,),
        )
        eval_param_sh = repl
    eval_step = jax.jit(
        make_cls_eval_step(model), in_shardings=(eval_param_sh, data_sh),
        out_shardings=data_sh,
    )

    step_rng = jax.random.PRNGKey(args.seed + 99)
    max_accuracy = 0.0

    if args.eval:
        stats = evaluate(eval_step, state.params, _to_eval_batches(
            eval_loader_fn(), mesh, args, global_batch))
        print(f"Eval: acc1 {stats['acc1']:.2f} acc5 {stats['acc5']:.2f}")
        return

    print(f"Start training for {args.epochs} epochs")
    start_time = time.time()
    for epoch in range(start_epoch, args.epochs):
        metric_logger = MetricLogger()
        header = f"Epoch: [{epoch}]"

        def train_batches():
            if args.synthetic_data:
                yield from synthetic_batches(num_steps_per_epoch)
            else:
                for _ in range(num_steps_per_epoch):
                    b = next(train_loader)
                    yield {"rgb": b["image"], "target": b["label"]}

        for batch in metric_logger.log_every(
            train_batches(), 10, header, total=num_steps_per_epoch
        ):
            x, y = batch["rgb"], batch["target"]
            if mixup_fn is not None:
                x, y = mixup_fn(x, np.asarray(y))
            dev_batch = mesh_lib.shard_batch(
                {"rgb": jnp.asarray(x), "target": jnp.asarray(y)}, mesh
            )
            state, metrics = jit_train(state, dev_batch, step_rng)
            if host_ema is not None:
                host_ema.update(state.params)
            loss_v = float(metrics["loss"])
            if not math.isfinite(loss_v):
                print(f"Loss is {loss_v}, stopping training")
                sys.exit(1)
            metric_logger.update(loss=loss_v, grad_norm=float(metrics["grad_norm"]))

        metric_logger.synchronize_between_processes()
        train_stats = {k: m.global_avg for k, m in metric_logger.meters.items()}

        if args.output_dir and args.save_ckpt and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            extras = {"ema_params": host_ema.params} if host_ema is not None else None
            save_checkpoint(args.output_dir, epoch, state, args=vars(args),
                            extras=extras)

        log_stats = {**{f"train_{k}": v for k, v in train_stats.items()},
                     "epoch": epoch}
        if not args.disable_eval_during_finetuning and not args.synthetic_data:
            stats = evaluate(eval_step, state.params, _to_eval_batches(
                eval_loader_fn(), mesh, args, global_batch))
            print(f"Accuracy on val: {stats['acc1']:.2f}%")
            if stats["acc1"] > max_accuracy:
                max_accuracy = stats["acc1"]
                if args.output_dir and args.save_ckpt:
                    save_checkpoint(args.output_dir, epoch, state,
                                    args=vars(args), tag="checkpoint-best")
            log_stats.update({f"test_{k}": v for k, v in stats.items()})
            print(f"Max accuracy: {max_accuracy:.2f}%")
        write_log_line(args.output_dir, log_stats)

    total_time = time.time() - start_time
    from multimae_tpu.train.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    print(f"Training time {datetime.timedelta(seconds=int(total_time))}")


class _ClsDatasetAdapter:
    """Adapts ImageFolder (PIL, target) to the grain loader protocol."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def load_raw(self, index):
        return self.ds[index]  # transform applied downstream

    def __getitem__(self, index):
        return self.ds[index]


def _to_eval_batches(loader, mesh, args, global_batch):
    """Yields (sharded_batch, n_valid): the last partial batch is padded
    up to global_batch by repeating row 0; n_valid lets the metric ignore
    the padding (the reference pads via DistributedSampler duplicates)."""
    import numpy as np

    import jax.numpy as jnp

    from multimae_tpu.parallel import mesh as mesh_lib

    for b in loader:
        if "image" in b:
            x, y = b["image"], b["label"]
        else:
            x, y = b["rgb"], b["target"]
        x, y = np.asarray(x), np.asarray(y)
        n = x.shape[0]
        if n < global_batch:
            reps = global_batch - n
            x = np.concatenate([x, np.repeat(x[:1], reps, axis=0)], axis=0)
            y = np.concatenate([y, np.repeat(y[:1], reps, axis=0)], axis=0)
        yield (
            mesh_lib.shard_batch(
                {"rgb": jnp.asarray(x), "target": jnp.asarray(y)}, mesh
            ),
            n,
        )


if __name__ == "__main__":
    opts = get_args()
    if opts.output_dir:
        os.makedirs(opts.output_dir, exist_ok=True)
    main(opts)
