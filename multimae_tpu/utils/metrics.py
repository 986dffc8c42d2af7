"""Evaluation metrics.

* top-k accuracy (reference utils/metrics.py:31-38)
* streaming confusion matrix -> mIoU/aAcc/mAcc (replaces the reference's
  CPU pickle-gather + numpy histogram path, utils/semseg_metrics.py —
  here the confusion matrix is accumulated ON DEVICE and psummed by XLA,
  so distributed eval needs no host gather)
* depth metrics (reference run_finetuning_depth.py:86-117)
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def accuracy(logits: jnp.ndarray, targets: jnp.ndarray, topk: Sequence[int] = (1,)):
    """Top-k accuracy in percent, matching utils/metrics.py:31-38."""
    maxk = max(topk)
    top_idx = jnp.argsort(logits, axis=-1)[:, ::-1][:, :maxk]
    correct = top_idx == targets[:, None]
    return [
        (correct[:, :k].any(axis=1).mean() * 100.0) for k in topk
    ]


def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int, ignore_index: int = 255
) -> jnp.ndarray:
    """(num_classes, num_classes) confusion counts; rows = label, cols = pred."""
    valid = label != ignore_index
    label_c = jnp.where(valid, label, 0)
    pred_c = jnp.where(valid, pred, 0)
    idx = label_c.reshape(-1) * num_classes + pred_c.reshape(-1)
    counts = jnp.bincount(
        jnp.where(valid.reshape(-1), idx, num_classes * num_classes),
        length=num_classes * num_classes + 1,
    )[:-1]
    return counts.reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray, nan_to_num=None) -> Dict[str, float]:
    """mean_iou semantics of utils/semseg_metrics.py:107-141."""
    cm = np.asarray(cm, np.float64)
    inter = np.diag(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - inter
    label_total = cm.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = inter / union
        acc = inter / label_total
    aacc = inter.sum() / max(cm.sum(), 1)
    miou = np.nanmean(iou)
    macc = np.nanmean(acc)
    if nan_to_num is not None:
        iou = np.nan_to_num(iou, nan=nan_to_num)
        acc = np.nan_to_num(acc, nan=nan_to_num)
    return {
        "aAcc": float(aacc), "mIoU": float(miou), "mAcc": float(macc),
        "IoU": iou, "Acc": acc,
    }


def depth_metrics(pred: jnp.ndarray, target: jnp.ndarray, mask_valid=None):
    """rmse/rel/srel/log10/delta1-3 (reference run_finetuning_depth.py:86-117)."""
    if mask_valid is None:
        mask_valid = jnp.ones_like(pred, bool)
    n = jnp.maximum(mask_valid.sum(), 1)
    pred = jnp.where(mask_valid, pred, 1.0)
    target = jnp.where(mask_valid, target, 1.0)

    diff = pred - target
    rmse = jnp.sqrt(jnp.where(mask_valid, diff**2, 0).sum() / n)
    rel = (jnp.where(mask_valid, jnp.abs(diff) / target, 0)).sum() / n
    srel = (jnp.where(mask_valid, diff**2 / target, 0)).sum() / n
    log10 = (
        jnp.where(mask_valid, jnp.abs(jnp.log10(pred) - jnp.log10(target)), 0)
    ).sum() / n
    ratio = jnp.maximum(pred / target, target / pred)
    d1 = jnp.where(mask_valid, ratio < 1.25, 0).sum() / n
    d2 = jnp.where(mask_valid, ratio < 1.25**2, 0).sum() / n
    d3 = jnp.where(mask_valid, ratio < 1.25**3, 0).sum() / n
    return {
        "rmse": rmse, "rel": rel, "srel": srel, "log10": log10,
        "delta_1": d1, "delta_2": d2, "delta_3": d3,
    }


def sum_across_processes(values: np.ndarray) -> np.ndarray:
    """Element-wise sum of a host numpy array over all jax processes
    (no-op single-process). Replaces the reference's --dist_eval metric
    sync (run_finetuning_cls.py:391-398 + utils/dist.py:collect_results):
    eval loaders here are ALWAYS process-sharded (grain ShardOptions in
    data/loader.py) with exact partial-batch accounting, so summing
    weighted metric numerators + counts reproduces full-dataset metrics
    exactly — no duplicate-entry padding bias."""
    import jax

    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(values))
    ).sum(axis=0)
