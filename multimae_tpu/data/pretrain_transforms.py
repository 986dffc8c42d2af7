"""Pretraining augmentations (reference: utils/datasets.py:66-117).

ONE RandomResizedCrop(scale 0.2-1.0, ratio 3/4-4/3) + horizontal flip is
sampled per example and applied consistently to every modality; then:
  * rgb    -> float32 (H, W, 3), ImageNet-normalized
  * depth  -> float32 (H, W, 1), raw uint16 / 2^16
  * semseg -> int32 (H/4, W/4), 0.25x nearest-resized class map

PIL resize semantics match the reference: default filter (bicubic) for
rgb/depth, NEAREST for palette ('P') semseg maps — PIL picks NEAREST for
'P' mode automatically, exactly as the reference relies on.
All outputs are NHWC numpy arrays (TPU layout).
"""

from __future__ import annotations

import math
import random
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from multimae_tpu.utils.data_constants import (
    IMAGE_TASKS,
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
)


def random_resized_crop_params(
    height: int,
    width: int,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    rng: Optional[random.Random] = None,
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop.get_params algorithm (i, j, h, w)."""
    rng = rng or random
    area = height * width
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect_ratio = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect_ratio)))
        h = int(round(math.sqrt(target_area / aspect_ratio)))
        if 0 < w <= width and 0 < h <= height:
            i = rng.randint(0, height - h)
            j = rng.randint(0, width - w)
            return i, j, h, w
    # Fallback: center crop at a clipped aspect ratio.
    in_ratio = float(width) / float(height)
    if in_ratio < min(ratio):
        w = width
        h = int(round(w / min(ratio)))
    elif in_ratio > max(ratio):
        h = height
        w = int(round(h * max(ratio)))
    else:
        w = width
        h = height
    i = (height - h) // 2
    j = (width - w) // 2
    return i, j, h, w


class DataAugmentationForMultiMAE:
    """Consistent crop/flip across modalities + per-task tensorisation."""

    def __init__(
        self,
        input_size: int = 224,
        hflip: float = 0.5,
        imagenet_default_mean_and_std: bool = True,
    ):
        self.input_size = input_size
        self.hflip = hflip
        if imagenet_default_mean_and_std:
            self.rgb_mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)
            self.rgb_std = np.asarray(IMAGENET_DEFAULT_STD, np.float32)
        else:
            self.rgb_mean = np.asarray(IMAGENET_INCEPTION_MEAN, np.float32)
            self.rgb_std = np.asarray(IMAGENET_INCEPTION_STD, np.float32)

    def __call__(
        self, task_dict: Dict[str, object], rng: Optional[random.Random] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or random
        flip = rng.random() < self.hflip
        ijhw = None
        s = self.input_size

        out = {}
        from PIL import Image

        for task, img in task_dict.items():
            if task not in IMAGE_TASKS:
                out[task] = img
                continue
            if ijhw is None:
                ijhw = random_resized_crop_params(img.height, img.width, rng=rng)
            i, j, h, w = ijhw

            if task == "rgb":
                # Native fused crop + antialiased bicubic resize + flip +
                # normalize (multimae_tpu/native); PIL fallback below.
                arr = self._native_rgb(img, (i, j, h, w), s, flip)
                if arr is not None:
                    out[task] = arr
                    continue

            img = img.crop((j, i, j + w, i + h))
            img = img.resize((s, s))  # PIL default filter; NEAREST for 'P'
            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)

            if task == "depth":
                arr = np.asarray(img, dtype=np.float32) / (2**16)
                out[task] = arr[..., None]  # (H, W, 1)
            elif task == "rgb":
                arr = np.asarray(img, dtype=np.float32) / 255.0
                arr = (arr - self.rgb_mean) / self.rgb_std
                out[task] = arr  # (H, W, 3)
            elif task in ("semseg", "semseg_coco"):
                small = img.resize((s // 4, s // 4))  # NEAREST for 'P' mode
                out[task] = np.asarray(small, dtype=np.int32)  # (H/4, W/4)
            else:
                out[task] = np.asarray(img, dtype=np.float32)
        return out

    def _native_rgb(self, img, crop, size, flip):
        try:
            from multimae_tpu import native

            if not native.available():
                return None
            return native.crop_resize_normalize(
                np.asarray(img), crop, (size, size),
                self.rgb_mean, self.rgb_std, bicubic=True, hflip=flip,
            )
        except Exception:
            return None
