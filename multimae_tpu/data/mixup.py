"""Mixup / CutMix with smoothed soft targets (reference: utils/mixup.py:96-227).

Host-side numpy on NHWC batches. Modes: 'batch' (one lambda for the whole
batch, mixed with the flipped batch), 'pair', 'elem'. CutMix boxes use the
lam-derived ratio with optional min/max override, and lam is corrected to
the realized box area (correct_lam).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np


def one_hot(targets: np.ndarray, num_classes: int, on_value: float, off_value: float):
    out = np.full((targets.shape[0], num_classes), off_value, np.float32)
    out[np.arange(targets.shape[0]), targets] = on_value
    return out


def mixup_target(
    targets: np.ndarray, num_classes: int, lam, smoothing: float = 0.0
) -> np.ndarray:
    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    y1 = one_hot(targets, num_classes, on_value, off_value)
    y2 = one_hot(targets[::-1], num_classes, on_value, off_value)
    lam = np.asarray(lam, np.float32).reshape(-1, 1) if np.ndim(lam) else lam
    return y1 * lam + y2 * (1.0 - lam)


def rand_bbox(shape, lam: float, rng, margin: float = 0.0, count: int = 1):
    """lam-ratio box (reference mixup.py:30-48). shape: (..., H, W, C)."""
    img_h, img_w = shape[-3], shape[-2]
    ratio = np.sqrt(1 - lam)
    cut_h, cut_w = int(img_h * ratio), int(img_w * ratio)
    margin_y, margin_x = int(margin * cut_h), int(margin * cut_w)
    cy = rng.integers(0 + margin_y, img_h - margin_y, size=count)
    cx = rng.integers(0 + margin_x, img_w - margin_x, size=count)
    yl = np.clip(cy - cut_h // 2, 0, img_h)
    yh = np.clip(cy + cut_h // 2, 0, img_h)
    xl = np.clip(cx - cut_w // 2, 0, img_w)
    xh = np.clip(cx + cut_w // 2, 0, img_w)
    return yl, yh, xl, xh


def rand_bbox_minmax(shape, minmax: Sequence[float], rng, count: int = 1):
    img_h, img_w = shape[-3], shape[-2]
    cut_h = rng.integers(int(img_h * minmax[0]), int(img_h * minmax[1]), size=count)
    cut_w = rng.integers(int(img_w * minmax[0]), int(img_w * minmax[1]), size=count)
    yl = rng.integers(0, img_h - cut_h, size=count)
    xl = rng.integers(0, img_w - cut_w, size=count)
    return yl, yl + cut_h, xl, xl + cut_w


def cutmix_bbox_and_lam(shape, lam, ratio_minmax, correct_lam, rng, count=1):
    if ratio_minmax is not None:
        yl, yu, xl, xu = rand_bbox_minmax(shape, ratio_minmax, rng, count)
    else:
        yl, yu, xl, xu = rand_bbox(shape, lam, rng, count=count)
    if correct_lam or ratio_minmax is not None:
        bbox_area = (yu - yl) * (xu - xl)
        lam = 1.0 - bbox_area / float(shape[-3] * shape[-2])
        if count == 1:
            # lam is a size-1 ndarray here; float(array) is deprecated in NumPy.
            lam = float(np.asarray(lam).reshape(-1)[0])
    return (yl, yu, xl, xu), lam


class Mixup:
    def __init__(
        self,
        mixup_alpha: float = 1.0,
        cutmix_alpha: float = 0.0,
        cutmix_minmax: Optional[Sequence[float]] = None,
        prob: float = 1.0,
        switch_prob: float = 0.5,
        mode: str = "batch",
        correct_lam: bool = True,
        label_smoothing: float = 0.1,
        num_classes: int = 1000,
        seed: Optional[int] = None,
    ):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.cutmix_minmax = cutmix_minmax
        if cutmix_minmax is not None:
            assert len(cutmix_minmax) == 2
            self.cutmix_alpha = 1.0
        self.mix_prob = prob
        self.switch_prob = switch_prob
        self.mode = mode
        self.correct_lam = correct_lam
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.rng = np.random.default_rng(seed)

    def _params_per_batch(self) -> Tuple[float, bool]:
        lam, use_cutmix = 1.0, False
        if self.rng.random() < self.mix_prob:
            if self.mixup_alpha > 0.0 and self.cutmix_alpha > 0.0:
                use_cutmix = self.rng.random() < self.switch_prob
                lam = float(
                    self.rng.beta(self.cutmix_alpha, self.cutmix_alpha)
                    if use_cutmix
                    else self.rng.beta(self.mixup_alpha, self.mixup_alpha)
                )
            elif self.mixup_alpha > 0.0:
                lam = float(self.rng.beta(self.mixup_alpha, self.mixup_alpha))
            elif self.cutmix_alpha > 0.0:
                use_cutmix = True
                lam = float(self.rng.beta(self.cutmix_alpha, self.cutmix_alpha))
        return lam, use_cutmix

    def _mix_batch(self, x: np.ndarray) -> float:
        lam, use_cutmix = self._params_per_batch()
        if lam == 1.0:
            return 1.0
        if use_cutmix:
            (yl, yh, xl, xh), lam = cutmix_bbox_and_lam(
                x.shape, lam, self.cutmix_minmax, self.correct_lam, self.rng
            )
            yl, yh, xl, xh = (int(np.asarray(v).reshape(-1)[0]) for v in (yl, yh, xl, xh))
            x[:, yl:yh, xl:xh] = x[::-1][:, yl:yh, xl:xh]
        else:
            x_flipped = x[::-1] * (1.0 - lam)
            x *= lam
            x += x_flipped
        return lam

    def _mix_pair_or_elem(self, x: np.ndarray, pair: bool) -> np.ndarray:
        b = x.shape[0]
        n = b // 2 if pair else b
        lam_batch = np.ones(b, np.float32)
        for i in range(n):
            j = b - i - 1
            lam, use_cutmix = self._params_per_batch()
            if lam == 1.0:
                continue
            if use_cutmix:
                (yl, yh, xl, xh), lam = cutmix_bbox_and_lam(
                    x[i].shape, lam, self.cutmix_minmax, self.correct_lam, self.rng
                )
                yl, yh, xl, xh = (int(np.asarray(v).reshape(-1)[0]) for v in (yl, yh, xl, xh))
                x[i, yl:yh, xl:xh] = x[j, yl:yh, xl:xh]
                if pair:
                    x[j, yl:yh, xl:xh] = x[i, yl:yh, xl:xh]
            else:
                x[i] = x[i] * lam + x[j] * (1 - lam)
                if pair:
                    x[j] = x[j] * lam + x[i] * (1 - lam)
            lam_batch[i] = lam
            if pair:
                lam_batch[j] = lam
        return lam_batch

    def __call__(self, x: np.ndarray, target: np.ndarray):
        assert x.shape[0] % 2 == 0, "Batch size should be even when using this"
        x = np.array(x, np.float32)
        if self.mode == "batch":
            lam = self._mix_batch(x)
        else:
            lam = self._mix_pair_or_elem(x, pair=(self.mode == "pair"))
        target = mixup_target(target, self.num_classes, lam, self.label_smoothing)
        return x, target


class FastCollateMixup(Mixup):
    """Collate-time mixup on uint8 samples (reference utils/mixup.py:230-322).

    Takes a list of (HWC uint8 array, int label) samples, mixes while
    stacking (saving a float copy of the batch), returns (float32 batch,
    soft targets).
    """

    def __call__(self, samples, target=None):
        if target is None:
            arrs = [np.asarray(s[0]) for s in samples]
            labels = np.asarray([s[1] for s in samples])
        else:
            arrs = [np.asarray(s) for s in samples]
            labels = np.asarray(target)
        batch = len(arrs)
        assert batch % 2 == 0, "Batch size should be even when using this"
        out = np.zeros((batch,) + arrs[0].shape, np.float32)

        if self.mode == "batch":
            lam, use_cutmix = self._params_per_batch()
            if use_cutmix and lam != 1.0:
                (yl, yh, xl, xh), lam = cutmix_bbox_and_lam(
                    arrs[0].shape, lam, self.cutmix_minmax, self.correct_lam, self.rng
                )
                yl, yh, xl, xh = (int(np.asarray(v).reshape(-1)[0])
                                  for v in (yl, yh, xl, xh))
            for i in range(batch):
                j = batch - i - 1
                mixed = arrs[i].astype(np.float32)
                if lam != 1.0:
                    if use_cutmix:
                        mixed = mixed.copy()
                        mixed[yl:yh, xl:xh] = arrs[j][yl:yh, xl:xh]
                    else:
                        mixed = mixed * lam + arrs[j].astype(np.float32) * (1 - lam)
                out[i] = mixed
        else:
            # pair/elem fall back to stacking + the tensor-mode mixer.
            out = np.stack([a.astype(np.float32) for a in arrs])
            lam = self._mix_pair_or_elem(out, pair=(self.mode == "pair"))

        soft = mixup_target(labels, self.num_classes, lam, self.label_smoothing)
        return out, soft
