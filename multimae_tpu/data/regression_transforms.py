"""Depth-regression fine-tune augmentations.

Parity targets (reference: utils/dataset_regression.py):
  * nyu_transform (:31-64) — SmallestMaxSize, hflip, optional BYOL color
    jitter + ToGray, RandomCrop / eval CenterCrop, ImageNet normalize.
  * DataAugmentationForRegression (:97-130) — depth -> (x - NYU_MEAN)/
    NYU_STD, mask_valid = (png == 255), invalid depth zeroed.

cv2+numpy implementation, NHWC outputs.
"""

from __future__ import annotations

import random
from typing import Dict, Optional

import cv2
import numpy as np

from multimae_tpu.data.semseg_transforms import _color_jitter, _resize
from multimae_tpu.utils.data_constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    NYU_MEAN,
    NYU_STD,
)

AUG_IS_MASK = {"rgb": False, "depth": True, "mask_valid": True}


class NYUTransform:
    """reference nyu_transform (:31-64)."""

    def __init__(self, train: bool, input_size: int = 256, color_aug: bool = False):
        self.train = train
        self.input_size = input_size
        self.color_aug = color_aug
        self.mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32) * 255
        self.std = np.asarray(IMAGENET_DEFAULT_STD, np.float32) * 255

    def __call__(self, arrays: Dict[str, np.ndarray],
                 rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        rng = rng or random
        s = self.input_size
        out = dict(arrays)

        # SmallestMaxSize: shortest side -> s
        h, w = next(iter(out.values())).shape[:2]
        scale = s / min(h, w)
        size_wh = (round(w * scale), round(h * scale))
        out = {
            k: _resize(v, size_wh, AUG_IS_MASK.get(k, True)) for k, v in out.items()
        }

        if self.train:
            if rng.random() < 0.5:
                out = {k: np.ascontiguousarray(v[:, ::-1]) for k, v in out.items()}
            if self.color_aug and "rgb" in out:
                if rng.random() < 0.5:
                    out["rgb"] = _color_jitter(
                        out["rgb"], rng,
                        brightness=0.1255, contrast=0.4, saturation=0.5, hue=0.2,
                    )
                if rng.random() < 0.3:
                    gray = cv2.cvtColor(out["rgb"], cv2.COLOR_RGB2GRAY)
                    out["rgb"] = np.stack([gray] * 3, axis=-1)
            h, w = next(iter(out.values())).shape[:2]
            top = rng.randint(0, h - s) if h > s else 0
            left = rng.randint(0, w - s) if w > s else 0
        else:
            h, w = next(iter(out.values())).shape[:2]
            top, left = (h - s) // 2, (w - s) // 2
        out = {k: v[top:top + s, left:left + s] for k, v in out.items()}

        if "rgb" in out:
            rgb = out["rgb"].astype(np.float32)
            out["rgb"] = (rgb - self.mean) / self.std
        return out


class DataAugmentationForRegression:
    """reference :97-130."""

    def __init__(self, transform, mask_value: float = 0.0):
        self.transform = transform
        self.mask_value = mask_value

    def __call__(self, task_dict: Dict[str, object],
                 rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        arrays = {k: np.array(v) for k, v in task_dict.items()}
        arrays = self.transform(arrays, rng=rng)

        out = {}
        depth = arrays.pop("depth").astype(np.float32)
        depth = (depth - NYU_MEAN) / NYU_STD
        mask_valid = None
        if "mask_valid" in arrays:
            mask_valid = arrays.pop("mask_valid") == 255
            depth[~mask_valid] = self.mask_value
            out["mask_valid"] = mask_valid[..., None]
        out["depth"] = depth[..., None]
        for task, v in arrays.items():
            out[task] = v.astype(np.float32)
        return out
