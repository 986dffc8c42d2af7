"""Semantic-segmentation fine-tune augmentations.

Parity targets (reference: utils/datasets_semseg.py):
  * simple_transform (:33-81) — hflip, LongestMaxSize, ColorJitter (rgb
    only), large-scale jitter RandomScale(0.1-2.0), pad-to-top-left with
    image value 128 / mask value 254, RandomCrop, ImageNet normalize.
  * DataAugmentationForSemSeg (:84-172) — robust truncated depth
    standardisation with PAD->NaN handling, void/ignore label adaptation
    incl. reduce_zero_label, pseudo_semseg 0.25x nearest downsample.

Implemented with cv2 + numpy (albumentations is not in the image); 'image'
targets use bilinear resizes, 'mask' targets nearest — the same split the
reference encodes via additional_targets (run_finetuning_semseg.py:50-77).
Outputs are NHWC numpy arrays.
"""

from __future__ import annotations

import random
from typing import Dict, Optional, Tuple

import cv2
import numpy as np

from multimae_tpu.utils.data_constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    PAD_MASK_VALUE,
    SEG_IGNORE_INDEX,
)

AUG_TYPES = {
    "rgb": "image",
    "depth": "mask",
    "semseg": "mask",
    "pseudo_semseg": "mask",
    "mask_valid": "mask",
}


def _resize(arr: np.ndarray, size_wh: Tuple[int, int], is_mask: bool) -> np.ndarray:
    interp = cv2.INTER_NEAREST if is_mask else cv2.INTER_LINEAR
    out = cv2.resize(arr, size_wh, interpolation=interp)
    return out


def _color_jitter(img: np.ndarray, rng: random.Random,
                  brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1) -> np.ndarray:
    """torchvision-style jitter on a uint8 RGB array (random order)."""
    img = img.astype(np.float32)

    def blend(a, b, f):
        return np.clip(a * f + b * (1 - f), 0, 255)

    ops = []
    if brightness > 0:
        f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        ops.append(lambda x: blend(x, 0.0, f))
    if contrast > 0:
        f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        ops.append(
            lambda x: blend(
                x, cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2GRAY).mean(), f
            )
        )
    if saturation > 0:
        f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        ops.append(
            lambda x: blend(
                x,
                cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2GRAY)[..., None]
                .astype(np.float32),
                f,
            )
        )
    if hue > 0:
        shift = rng.uniform(-hue, hue)

        def hue_op(x):
            hsv = cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2HSV).astype(np.int16)
            hsv[..., 0] = (hsv[..., 0] + int(shift * 180)) % 180
            return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB).astype(
                np.float32
            )

        ops.append(hue_op)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img.astype(np.uint8)


class SimpleTransform:
    """reference simple_transform (:33-81)."""

    def __init__(self, train: bool, input_size: int = 512,
                 pad_value: int = 128, pad_mask_value: int = PAD_MASK_VALUE,
                 color_jitter_p: float = 0.5, hflip_p: float = 0.5):
        self.train = train
        self.input_size = input_size
        self.pad_value = pad_value
        self.pad_mask_value = pad_mask_value
        self.color_jitter_p = color_jitter_p
        self.hflip_p = hflip_p
        self.mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32) * 255
        self.std = np.asarray(IMAGENET_DEFAULT_STD, np.float32) * 255

    def __call__(self, arrays: Dict[str, np.ndarray],
                 rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        rng = rng or random
        s = self.input_size
        out = dict(arrays)

        def is_mask(task):
            return AUG_TYPES.get(task, "image") == "mask"

        if self.train and rng.random() < self.hflip_p:
            out = {k: np.ascontiguousarray(v[:, ::-1]) for k, v in out.items()}

        # LongestMaxSize
        h, w = next(iter(out.values())).shape[:2]
        scale = s / max(h, w)
        if scale != 1.0:
            size_wh = (round(w * scale), round(h * scale))
            out = {k: _resize(v, size_wh, is_mask(k)) for k, v in out.items()}

        if self.train:
            if rng.random() < self.color_jitter_p and "rgb" in out:
                out["rgb"] = _color_jitter(out["rgb"], rng)
            # LSJ RandomScale(0.1, 2.0)
            factor = 1.0 + rng.uniform(0.1 - 1.0, 2.0 - 1.0)
            h, w = next(iter(out.values())).shape[:2]
            size_wh = (max(1, round(w * factor)), max(1, round(h * factor)))
            out = {k: _resize(v, size_wh, is_mask(k)) for k, v in out.items()}

        # PadIfNeeded (top-left anchored: pad bottom/right)
        h, w = next(iter(out.values())).shape[:2]
        pad_h, pad_w = max(0, s - h), max(0, s - w)
        if pad_h or pad_w:
            def pad(v, task):
                value = self.pad_mask_value if is_mask(task) else self.pad_value
                pads = ((0, pad_h), (0, pad_w)) + ((0, 0),) * (v.ndim - 2)
                return np.pad(v, pads, constant_values=value)
            out = {k: pad(v, k) for k, v in out.items()}

        if self.train:
            h, w = next(iter(out.values())).shape[:2]
            top = rng.randint(0, h - s) if h > s else 0
            left = rng.randint(0, w - s) if w > s else 0
            out = {k: v[top:top + s, left:left + s] for k, v in out.items()}

        if "rgb" in out:
            rgb = out["rgb"].astype(np.float32)
            out["rgb"] = (rgb - self.mean) / self.std
        return out


def standardize_depth_map(img: np.ndarray, trunc_value: float = 0.1) -> np.ndarray:
    """reference :98-118 — PAD values -> NaN, truncated standardisation."""
    img = img.astype(np.float32).copy()
    img[img == PAD_MASK_VALUE] = np.nan
    flat = np.sort(img.reshape(-1))
    flat = flat[~np.isnan(flat)]
    trunc = flat[int(trunc_value * len(flat)): int((1 - trunc_value) * len(flat))]
    mean = trunc.mean() if len(trunc) else 0.0
    var = trunc.var() if len(trunc) else 1.0
    img = np.nan_to_num(img, nan=mean)
    return (img - mean) / np.sqrt(var + 1e-6)


class DataAugmentationForSemSeg:
    """reference :84-172 — geometric transform + per-task tensorisation."""

    def __init__(self, transform: SimpleTransform, seg_num_classes: int,
                 seg_ignore_index: int = SEG_IGNORE_INDEX,
                 standardize_depth: bool = True,
                 seg_reduce_zero_label: bool = False,
                 seg_use_void_label: bool = False):
        self.transform = transform
        self.seg_num_classes = seg_num_classes
        self.seg_ignore_index = seg_ignore_index
        self.standardize_depth = standardize_depth
        self.seg_reduce_zero_label = seg_reduce_zero_label
        self.seg_use_void_label = seg_use_void_label

    def seg_adapt_labels(self, img: np.ndarray) -> np.ndarray:
        """reference :120-136."""
        img = img.astype(np.int64)
        if self.seg_use_void_label:
            pad_replace = (
                self.seg_num_classes + 1
                if self.seg_reduce_zero_label
                else self.seg_num_classes
            )
        else:
            pad_replace = self.seg_ignore_index
        img[img == PAD_MASK_VALUE] = pad_replace
        if self.seg_reduce_zero_label:
            img[img == 0] = self.seg_ignore_index
            img = img - 1
            img[img == self.seg_ignore_index - 1] = self.seg_ignore_index
        return img

    def __call__(self, task_dict: Dict[str, object],
                 rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        arrays = {k: np.array(v) for k, v in task_dict.items()}
        arrays = self.transform(arrays, rng=rng)

        out = {}
        for task, v in arrays.items():
            if task == "depth":
                img = v.astype(np.float32)
                if self.standardize_depth:
                    img = standardize_depth_map(img)
                if "mask_valid" in arrays:
                    mask_valid = np.squeeze(arrays["mask_valid"] == 255)
                    img[~mask_valid] = 0.0
                out[task] = img[..., None]  # (H, W, 1)
            elif task == "rgb":
                out[task] = v.astype(np.float32)
            elif task == "semseg":
                out[task] = self.seg_adapt_labels(v).astype(np.int32)
            elif task == "pseudo_semseg":
                h, w = v.shape[:2]
                out[task] = _resize(v, (w // 4, h // 4), is_mask=True).astype(np.int32)
            elif task == "mask_valid":
                out[task] = (v == 255)[..., None]
            else:
                out[task] = v
        return out
