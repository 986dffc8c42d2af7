"""Taskonomy dataset + per-task transforms.

Parity targets (reference: utils/taskonomy/):
  * task_parameters table  — task_configs.py:5-99 (channels, clamps, ext)
  * task_transform         — transforms.py:10-133 (8/16-bit decode,
    per-task normalisation, valid-mask max-pool enlargement, Gaussian
    blur for edge_occlusion, bilinear rgb / nearest label resizes)
  * TaskonomyDataset       — taskonomy_dataset.py:12-70 (CSV split of
    building/point/view over root/<task>/<building>/point_P_view_V_
    domain_D.png)

Split CSVs (building,point,view) are data manifests the user supplies via
`splits_dir` (the released MultiMAE repo ships tiny_{val,test}.csv).
Outputs are NHWC numpy arrays.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

from multimae_tpu.utils.data_constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
)

task_parameters: Dict[str, Dict] = {
    "class_object": {"num_classes": 1000, "ext": "npy", "domain_id": "class_object"},
    "class_scene": {"num_classes": 365, "ext": "npy", "domain_id": "class_scene"},
    "depth_zbuffer": {
        "num_channels": 1, "mask_val": 1.0,
        "clamp_to": (0.0, 8000.0 / (2**16 - 1)),
        "ext": "png", "domain_id": "depth_zbuffer",
    },
    "depth_euclidean": {
        "num_channels": 1, "clamp_to": (0.0, 8000.0 / (2**16 - 1)),
        "ext": "png", "domain_id": "depth_euclidean",
    },
    "edge_texture": {
        "num_channels": 1, "clamp_to": (0.0, 0.25),
        "ext": "png", "domain_id": "edge_texture",
    },
    "edge_occlusion": {"num_channels": 1, "ext": "png", "domain_id": "edge_occlusion"},
    "keypoints3d": {"num_channels": 1, "ext": "png", "domain_id": "keypoints3d"},
    "keypoints2d": {"num_channels": 1, "ext": "png", "domain_id": "keypoints2d"},
    "principal_curvature": {
        "num_channels": 3, "mask_val": 0.0, "ext": "png",
        "domain_id": "principal_curvature",
    },
    "reshading": {"num_channels": 1, "ext": "png", "domain_id": "reshading"},
    "normal": {"num_channels": 3, "mask_val": 0.502, "ext": "png",
               "domain_id": "normal"},
    "mask_valid": {"num_channels": 1, "mask_val": 0.0, "ext": "png",
                   "domain_id": "depth_zbuffer"},
    "rgb": {"num_channels": 3, "ext": "png", "domain_id": "rgb"},
    "segment_semantic": {"num_channels": 18, "ext": "png",
                         "domain_id": "segmentsemantic"},
}


def make_valid_mask(mask01: np.ndarray, max_pool_size: int = 4) -> np.ndarray:
    """Enlarge the invalid region with max pooling (transforms.py:43-62).

    mask01: (H, W) float in {0, 1}; returns (H, W) bool (True = valid).
    """
    h, w = mask01.shape
    inv = 1.0 - mask01
    # max_pool2d(kernel=stride=max_pool_size) then nearest-upsample back.
    hp = (h // max_pool_size) * max_pool_size
    wp = (w // max_pool_size) * max_pool_size
    pooled = inv[:hp, :wp].reshape(
        hp // max_pool_size, max_pool_size, wp // max_pool_size, max_pool_size
    ).max(axis=(1, 3))
    up = np.repeat(np.repeat(pooled, max_pool_size, 0), max_pool_size, 1)
    out = np.zeros((h, w), np.float32)
    out[:hp, :wp] = up
    return out == 0


def task_transform(img, task: str, image_size: Optional[int] = 256) -> np.ndarray:
    """Per-task decode + normalise (transforms.py:66-133). PIL in, HWC out."""
    from PIL import Image

    params = task_parameters[task]
    if image_size is not None:
        interp = Image.BILINEAR if task == "rgb" else Image.NEAREST
        w, h = img.size
        short = min(w, h)
        scale = image_size / short
        img = img.resize((round(w * scale), round(h * scale)), interp)

    arr = np.asarray(img)

    if task == "rgb":
        x = arr.astype(np.float32) / 255.0
        x = (x - np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)) / np.asarray(
            IMAGENET_DEFAULT_STD, np.float32
        )
    elif task == "normal":
        x = arr.astype(np.float32) / 255.0
    elif task == "mask_valid":
        x = make_valid_mask((arr > 0).astype(np.float32))[..., None]
        return x
    elif task in ("keypoints2d", "keypoints3d", "depth_euclidean",
                  "depth_zbuffer", "edge_texture"):
        x = arr.astype(np.float32) / (2**16 - 1.0)
        x = x[..., None] if x.ndim == 2 else x[..., :1]
    elif task == "edge_occlusion":
        x = arr.astype(np.float32) / (2**16 - 1.0)
        x = cv2.GaussianBlur(x, (3, 3), sigmaX=1.0)
        x = x[..., None]
    elif task in ("principal_curvature", "curvature"):
        x = arr.astype(np.float32) / 255.0
        x = x[..., :2]
    elif task == "reshading":
        x = arr.astype(np.float32) / 255.0
        x = x[..., :1] if x.ndim == 3 else x[..., None]
    elif task in ("segment_semantic",):
        return arr.astype(np.int32)
    else:
        x = arr.astype(np.float32)

    if "clamp_to" in params:
        lo, hi = params["clamp_to"]
        x = np.clip(x, lo, hi) / hi  # MAKE_RESCALE_0_MAX_0_POS1
    return x


class TaskonomyDataset:
    """CSV-split loader over root/<task>/<building>/point_P_view_V_domain_D.png."""

    def __init__(
        self,
        data_root: str,
        tasks: Sequence[str],
        split: str = "train",
        variant: str = "tiny",
        image_size: int = 256,
        max_images: Optional[int] = None,
        splits_dir: Optional[str] = None,
    ):
        self.data_root = data_root
        self.tasks = list(tasks)
        self.image_size = image_size
        splits_dir = splits_dir or os.path.join(data_root, "splits")
        path = os.path.join(splits_dir, f"{variant}_{split}.csv")
        with open(path) as f:
            reader = csv.reader(f)
            header = next(reader)
            self.image_ids: List[tuple] = [tuple(row) for row in reader]
        if isinstance(max_images, int):
            self.image_ids = self.image_ids[:max_images]
        print(
            f"Initialized TaskonomyDataset with {len(self.image_ids)} images "
            f"from variant {variant} in split {split}."
        )

    def __len__(self) -> int:
        return len(self.image_ids)

    def load_raw(self, index: int):
        from PIL import Image, ImageFile

        ImageFile.LOAD_TRUNCATED_IMAGES = True
        building, point, view = self.image_ids[index]
        result = {}
        for task in self.tasks:
            task_id = "depth_zbuffer" if task == "mask_valid" else task
            path = os.path.join(
                self.data_root, task, building,
                f"point_{point}_view_{view}_domain_{task_id}.png",
            )
            with open(path, "rb") as f:
                img = Image.open(f)
                img.load()
            result[task] = task_transform(img, task=task, image_size=self.image_size)
        return result, 0

    def __getitem__(self, index: int):
        return self.load_raw(index)
