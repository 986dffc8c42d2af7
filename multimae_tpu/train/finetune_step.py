"""Jitted fine-tuning steps (classification / dense prediction).

Reference hot loops:
  * cls   — run_finetuning_cls.py:474-577 (mixup soft targets, EMA,
            update_freq grad accumulation, top-1/5 eval)
  * dense — run_finetuning_semseg.py:593-682 / run_finetuning_depth.py
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from multimae_tpu.train.pretrain_step import global_norm
from multimae_tpu.train.train_state import TrainState


def make_cls_train_step(
    model,
    loss_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    *,
    clip_grad: Optional[float] = None,
    skip_grad: Optional[float] = None,
    ema_decay: Optional[float] = None,
):
    """batch = {'rgb': (B,H,W,3), 'target': int labels or soft targets}."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng_drop = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            logits = model.apply(
                {"params": params}, {"rgb": batch["rgb"]},
                train=True, rngs={"dropout": rng_drop},
            )["cls"]
            return loss_fn(logits, batch["target"]), logits

        (loss, logits), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        grad_norm = global_norm(grads)
        if clip_grad is not None:
            scale = jnp.minimum(1.0, clip_grad / (grad_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        skip = jnp.logical_not(jnp.isfinite(grad_norm))
        if skip_grad is not None:
            skip = jnp.logical_or(skip, grad_norm >= skip_grad)
        new_state = state.apply_gradients(
            grads, skip_update=skip, ema_decay=ema_decay
        )
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped": skip.astype(jnp.float32)}
        return new_state, metrics

    return train_step


def make_cls_eval_step(model, use_ema: bool = False):
    def eval_step(params, batch):
        logits = model.apply({"params": params}, {"rgb": batch["rgb"]}, train=False)[
            "cls"
        ]
        return logits

    return eval_step


def make_dense_train_step(
    model,
    task: str,
    loss_fn: Callable,
    in_domains=("rgb",),
    *,
    clip_grad: Optional[float] = None,
    needs_target_kwargs: bool = False,
    ema_decay: Optional[float] = None,
):
    """Generic dense-prediction step: batch has input modalities + 'target'
    (+ optional 'mask_valid')."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng_drop = jax.random.fold_in(rng, state.step)
        inputs = {d: batch[d] for d in in_domains if d in batch}

        def compute_loss(params):
            variables = {"params": params}
            new_batch_stats = None
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                preds, updated = model.apply(
                    variables, inputs, train=True, rngs={"dropout": rng_drop},
                    mutable=["batch_stats"],
                )
                new_batch_stats = updated.get("batch_stats")
            else:
                preds = model.apply(
                    variables, inputs, train=True, rngs={"dropout": rng_drop}
                )
            pred = preds[task]
            kwargs = {}
            if needs_target_kwargs and "mask_valid" in batch:
                kwargs["mask_valid"] = batch["mask_valid"]
            loss = loss_fn(pred.astype(jnp.float32), batch["target"], **kwargs)
            return loss, (pred, new_batch_stats)

        (loss, (pred, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        grad_norm = global_norm(grads)
        if clip_grad is not None:
            scale = jnp.minimum(1.0, clip_grad / (grad_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        skip = jnp.logical_not(jnp.isfinite(grad_norm))
        new_state = state.apply_gradients(
            grads, skip_update=skip, ema_decay=ema_decay
        )
        if new_bs is not None:
            new_state = new_state.replace(batch_stats=new_bs)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped": skip.astype(jnp.float32)}
        return new_state, metrics

    return train_step


def make_dense_eval_step(model, task: str, in_domains=("rgb",)):
    def eval_step(params, batch, batch_stats=None):
        inputs = {d: batch[d] for d in in_domains if d in batch}
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        preds = model.apply(variables, inputs, train=False)
        return preds[task]

    return eval_step
