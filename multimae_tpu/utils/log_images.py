"""Wandb image-panel logging (reference: utils/log_images.py:31-138).

Gated on wandb availability; converts NHWC numpy/jax arrays.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from multimae_tpu.utils.data_constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    SEG_IGNORE_INDEX,
)


def _wandb():
    try:
        import wandb

        return wandb
    except ImportError:
        return None


def inv_norm(rgb: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalisation; (H, W, 3) float -> uint8."""
    mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)
    std = np.asarray(IMAGENET_DEFAULT_STD, np.float32)
    x = np.clip(np.asarray(rgb) * std + mean, 0, 1)
    return (x * 255).astype(np.uint8)


def log_semseg_wandb(
    rgb: np.ndarray,
    seg_pred: np.ndarray,
    seg_gt: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    prefix: str = "",
    step: Optional[int] = None,
):
    """Mask-overlay panels (reference log_images.py:31-82)."""
    wandb = _wandb()
    if wandb is None:
        return
    n_classes = int(max(seg_pred.max(), seg_gt[seg_gt != SEG_IGNORE_INDEX].max()) + 1) \
        if (seg_gt != SEG_IGNORE_INDEX).any() else int(seg_pred.max()) + 1
    class_labels = {
        i: (class_names[i] if class_names and i < len(class_names) else str(i))
        for i in range(n_classes)
    }
    class_labels[SEG_IGNORE_INDEX] = "ignore"
    images = []
    for i in range(min(len(rgb), 8)):
        images.append(
            wandb.Image(
                inv_norm(rgb[i]),
                masks={
                    "predictions": {
                        "mask_data": np.asarray(seg_pred[i], np.int32),
                        "class_labels": class_labels,
                    },
                    "ground_truth": {
                        "mask_data": np.asarray(seg_gt[i], np.int32),
                        "class_labels": class_labels,
                    },
                },
            )
        )
    wandb.log({f"{prefix}semseg": images}, step=step)


def log_taskonomy_wandb(
    inputs: Dict[str, np.ndarray],
    preds: Dict[str, np.ndarray],
    gts: Dict[str, np.ndarray],
    prefix: str = "",
    step: Optional[int] = None,
):
    """Pred/gt image grids per task (reference log_images.py:85-138)."""
    wandb = _wandb()
    if wandb is None:
        return

    def to_img(task, arr):
        arr = np.asarray(arr, np.float32)
        if task == "rgb":
            return inv_norm(arr)
        arr = arr[..., 0] if arr.ndim == 3 else arr
        lo, hi = np.percentile(arr, [2, 98])
        arr = np.clip((arr - lo) / max(hi - lo, 1e-6), 0, 1)
        return (arr * 255).astype(np.uint8)

    panels = {}
    for task, arr in inputs.items():
        panels[f"{prefix}input_{task}"] = [
            _wandb().Image(to_img(task, arr[i])) for i in range(min(len(arr), 4))
        ]
    for task in preds:
        panels[f"{prefix}pred_{task}"] = [
            _wandb().Image(to_img(task, preds[task][i]))
            for i in range(min(len(preds[task]), 4))
        ]
        if task in gts:
            panels[f"{prefix}gt_{task}"] = [
                _wandb().Image(to_img(task, gts[task][i]))
                for i in range(min(len(gts[task]), 4))
            ]
    wandb.log(panels, step=step)
