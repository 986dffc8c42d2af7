"""Masked reconstruction losses (reference: multimae/criterion.py).

NHWC layout. jit-safe `nanmean` semantics: the reference divides each
sample's masked loss sum by its mask sum (NaN when a task got zero
visible... zero masked pixels) and then `nanmean`s over the batch,
returning 0 if the whole batch has an empty mask (criterion.py:41-57).
We reproduce that with a where/valid-count formulation that never
produces NaNs (data-dependent early returns don't exist under jit).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multimae_tpu.ops.resize import interpolate_2d


def _upsample_mask(mask: jnp.ndarray, hw, scale: int) -> jnp.ndarray:
    """(B, nh*nw) token mask -> (B, H, W) pixel mask (nearest)."""
    h, w = hw
    nh, nw = h // scale, w // scale
    b = mask.shape[0]
    m = mask.reshape(b, nh, nw).astype(jnp.float32)
    # Nearest-neighbour upsample by integer factor == repeat.
    m = jnp.repeat(jnp.repeat(m, scale, axis=1), scale, axis=2)
    return m


def _masked_mean(loss_pix: jnp.ndarray, mask_pix: jnp.ndarray) -> jnp.ndarray:
    """Per-sample sum/mask-sum, then nanmean over batch (0 if all empty)."""
    b = loss_pix.shape[0]
    loss_flat = loss_pix.reshape(b, -1)
    mask_flat = mask_pix.reshape(b, -1)
    mask_sums = mask_flat.sum(axis=1)
    per_sample = (loss_flat * mask_flat).sum(axis=1) / jnp.maximum(mask_sums, 1.0)
    valid = mask_sums > 0
    count = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_sample, 0.0).sum() / count


def _norm_pix(target: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Per-patch standardisation of the target (criterion.py:89-95).

    target: (B, H, W, C); patches of size scale x scale (all channels
    jointly, matching the reference's (p1 p2 c) patch flattening).
    """
    b, h, w, c = target.shape
    nh, nw = h // scale, w // scale
    t = target.reshape(b, nh, scale, nw, scale, c)
    t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh, nw, scale * scale * c)
    mean = t.mean(axis=-1, keepdims=True)
    var = t.var(axis=-1, keepdims=True)
    t = (t - mean) / jnp.sqrt(var + 1e-6)
    t = t.reshape(b, nh, nw, scale, scale, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(b, h, w, c)


class MaskedMSELoss:
    """reference criterion.py:60-114 (NHWC)."""

    def __init__(self, patch_size: int = 16, stride: int = 1, norm_pix: bool = False):
        self.scale = patch_size // stride
        self.norm_pix = norm_pix

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        input = input.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.norm_pix:
            target = _norm_pix(target, self.scale)
        loss = (input - target) ** 2
        if mask is None:
            return loss.mean()
        h, w = input.shape[1], input.shape[2]
        loss = loss.mean(axis=-1)  # channel mean (B, H, W)
        mask_pix = _upsample_mask(mask, (h, w), self.scale)
        return _masked_mean(loss, mask_pix)


class MaskedL1Loss:
    """reference criterion.py:117-171 (NHWC)."""

    def __init__(self, patch_size: int = 16, stride: int = 1, norm_pix: bool = False):
        self.scale = patch_size // stride
        self.norm_pix = norm_pix

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        input = input.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.norm_pix:
            target = _norm_pix(target, self.scale)
        loss = jnp.abs(input - target)
        if mask is None:
            return loss.mean()
        h, w = input.shape[1], input.shape[2]
        loss = loss.mean(axis=-1)
        mask_pix = _upsample_mask(mask, (h, w), self.scale)
        return _masked_mean(loss, mask_pix)


class MaskedCrossEntropyLoss:
    """reference criterion.py:23-57 (NHWC logits, int targets)."""

    def __init__(
        self, patch_size: int = 16, stride: int = 1, label_smoothing: float = 0.0
    ):
        self.scale = patch_size // stride
        self.label_smoothing = label_smoothing

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """input: (B, H, W, num_classes) logits; target: (B, H, W) int."""
        logits = input.astype(jnp.float32)
        num_classes = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
        if self.label_smoothing > 0.0:
            smooth = -logp.mean(axis=-1)
            nll = (1.0 - self.label_smoothing) * nll + self.label_smoothing * smooth
        if mask is None:
            return nll.mean()
        h, w = logits.shape[1], logits.shape[2]
        mask_pix = _upsample_mask(mask, (h, w), self.scale)
        return _masked_mean(nll, mask_pix)
