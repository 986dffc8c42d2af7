"""ImageNet classification transforms.

Parity targets:
  * train: RandomResizedCropAndInterpolation + hflip + RandAugment (or
    ColorJitter) + normalize + RandomErasing — the timm `create_transform`
    stack the reference vendors (utils/transforms_factory.py:51-134)
  * eval: Resize(shorter side = input/crop_pct, bicubic) + CenterCrop +
    normalize (utils/datasets.py:190-205; crop_pct 224/256 under 384px)

Outputs are NHWC float32 numpy arrays.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from multimae_tpu.data.auto_augment import create_aa_transform
from multimae_tpu.data.pretrain_transforms import random_resized_crop_params
from multimae_tpu.utils.data_constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
)

_PIL_INTERP = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "nearest": Image.NEAREST,
    "lanczos": Image.LANCZOS,
}


def _interp_of(name: str):
    if name == "random":
        return random.choice([Image.BILINEAR, Image.BICUBIC])
    return _PIL_INTERP[name]


class RandomErasing:
    """timm-style 'pixel' random erasing on a normalized HWC float array
    (reference utils/random_erasing.py)."""

    def __init__(self, probability: float = 0.25,
                 min_area: float = 0.02, max_area: float = 1 / 3,
                 min_aspect: float = 0.3, max_aspect: Optional[float] = None,
                 mode: str = "pixel", count: int = 1):
        self.probability = probability
        self.min_area = min_area
        self.max_area = max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect = (math.log(min_aspect), math.log(max_aspect))
        self.mode = mode
        self.count = count

    def __call__(self, arr: np.ndarray, rng: Optional[random.Random] = None):
        rng = rng or random
        if rng.random() > self.probability:
            return arr
        h, w, c = arr.shape
        area = h * w
        arr = arr.copy()
        for _ in range(self.count):
            for _ in range(10):
                target = area * rng.uniform(self.min_area, self.max_area) / self.count
                aspect = math.exp(rng.uniform(*self.log_aspect))
                eh = int(round(math.sqrt(target * aspect)))
                ew = int(round(math.sqrt(target / aspect)))
                if eh < h and ew < w:
                    top = rng.randint(0, h - eh)
                    left = rng.randint(0, w - ew)
                    if self.mode == "pixel":
                        arr[top:top + eh, left:left + ew] = np.random.default_rng(
                            rng.getrandbits(32)
                        ).standard_normal((eh, ew, c)).astype(arr.dtype)
                    elif self.mode == "const":
                        arr[top:top + eh, left:left + ew] = 0.0
                    break
        return arr


class ColorJitter:
    """brightness/contrast/saturation jitter (random order), PIL-based."""

    def __init__(self, amount: float = 0.4):
        self.amount = amount

    def __call__(self, img, rng: Optional[random.Random] = None):
        from PIL import ImageEnhance

        rng = rng or random
        lo, hi = max(0.0, 1 - self.amount), 1 + self.amount
        ops = [ImageEnhance.Brightness, ImageEnhance.Contrast, ImageEnhance.Color]
        rng.shuffle(ops)
        for op in ops:
            img = op(img).enhance(rng.uniform(lo, hi))
        return img


class ClsTrainTransform:
    def __init__(
        self,
        input_size: int = 224,
        hflip: float = 0.5,
        color_jitter: Optional[float] = 0.4,
        auto_augment: Optional[str] = "rand-m9-mstd0.5-inc1",
        interpolation: str = "bicubic",
        re_prob: float = 0.25,
        re_mode: str = "pixel",
        re_count: int = 1,
        mean: Sequence[float] = IMAGENET_DEFAULT_MEAN,
        std: Sequence[float] = IMAGENET_DEFAULT_STD,
        scale: Tuple[float, float] = (0.08, 1.0),
        ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    ):
        self.input_size = input_size
        self.hflip = hflip
        self.interpolation = interpolation
        self.scale = scale
        self.ratio = ratio
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.aa = None
        self.cj = None
        if auto_augment:
            img_mean = tuple(min(255, round(255 * m)) for m in mean)
            self.aa = create_aa_transform(auto_augment, {"img_mean": img_mean})
        elif color_jitter is not None and color_jitter > 0:
            # timm disables color jitter when AA is active
            self.cj = ColorJitter(color_jitter)
        self.re = RandomErasing(re_prob, mode=re_mode, count=re_count) if re_prob > 0 else None

    def __call__(self, img: Image.Image, rng: Optional[random.Random] = None):
        rng = rng or random
        i, j, h, w = random_resized_crop_params(
            img.height, img.width, scale=self.scale, ratio=self.ratio, rng=rng
        )
        img = img.crop((j, i, j + w, i + h)).resize(
            (self.input_size, self.input_size), _interp_of(self.interpolation)
        )
        if rng.random() < self.hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.aa is not None:
            img = self.aa(img)
        elif self.cj is not None:
            img = self.cj(img, rng)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - self.mean) / self.std
        if self.re is not None:
            arr = self.re(arr, rng)
        return arr


class ClsEvalTransform:
    def __init__(
        self,
        input_size: int = 224,
        crop_pct: Optional[float] = None,
        interpolation: str = "bicubic",
        mean: Sequence[float] = IMAGENET_DEFAULT_MEAN,
        std: Sequence[float] = IMAGENET_DEFAULT_STD,
    ):
        if crop_pct is None:
            crop_pct = 224 / 256 if input_size < 384 else 1.0
        self.input_size = input_size
        self.resize_size = int(input_size / crop_pct)
        self.interpolation = _PIL_INTERP[interpolation]
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img: Image.Image, rng=None):
        # torchvision Resize(size int): shorter side -> size, keep ratio
        w, h = img.size
        short = min(w, h)
        scale = self.resize_size / short
        nw, nh = round(w * scale), round(h * scale)
        img = img.resize((nw, nh), self.interpolation)
        left = (nw - self.input_size) // 2
        top = (nh - self.input_size) // 2
        img = img.crop((left, top, left + self.input_size, top + self.input_size))
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - self.mean) / self.std
