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


def patchify_cpp(img: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, C*p*p) with (c, ph, pw) minor order — the
    SpatialOutputAdapter's patch layout (reference rearrange order)."""
    b, h, w, c = img.shape
    nh, nw = h // p, w // p
    x = img.reshape(b, nh, p, nw, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, nh, nw, c, ph, pw)
    return x.reshape(b, nh * nw, c * p * p)


def unpatchify_cpp(x: jnp.ndarray, hw, channels: int, p: int) -> jnp.ndarray:
    """(B, N, C*p*p) patches -> (B, H, W, C) NHWC image."""
    h, w = hw
    b = x.shape[0]
    nh, nw = h // p, w // p
    x = x.reshape(b, nh, nw, channels, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h, w, channels)


def _norm_pix_patches(t: jnp.ndarray) -> jnp.ndarray:
    """Per-patch standardisation on (B, N, D) patch targets — the patch-
    space equivalent of _norm_pix (mean/var over all patch elements are
    invariant to intra-patch element order)."""
    mean = t.mean(axis=-1, keepdims=True)
    var = t.var(axis=-1, keepdims=True)
    return (t - mean) / jnp.sqrt(var + 1e-6)


def _masked_token_mean(
    tok_loss: jnp.ndarray, mask: jnp.ndarray, pixels_per_token: int
) -> jnp.ndarray:
    """Per-sample sum over masked tokens / (masked pixels), then nanmean.

    Identical to _masked_mean after nearest mask upsampling: each token
    contributes `pixels_per_token` pixels with the same mask value.
    """
    m = mask.astype(jnp.float32)
    mask_sums = m.sum(axis=1) * pixels_per_token
    per_sample = (tok_loss * m).sum(axis=1) / jnp.maximum(mask_sums, 1.0)
    valid = mask_sums > 0
    count = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, per_sample, 0.0).sum() / count


class MaskedMSELoss:
    """reference criterion.py:60-114 (NHWC).

    Accepts either an NHWC image prediction or — the TPU training fast
    path — (B, N, C*p*p) token patches straight from the decoder
    (`SpatialOutputAdapter(return_patches=True)`), in which case the
    pixel-space reshapes/upsamples are skipped. Sums of squares are
    invariant to intra-patch element order, so both paths are identical.
    """

    def __init__(self, patch_size: int = 16, stride: int = 1, norm_pix: bool = False):
        self.scale = patch_size // stride
        self.norm_pix = norm_pix

    def _patch_call(self, input, target, mask):
        p = self.scale
        channels = target.shape[-1]
        tgt = patchify_cpp(target, p)
        if self.norm_pix:
            tgt = _norm_pix_patches(tgt)
        loss = (input - tgt) ** 2
        if mask is None:
            return loss.mean()
        tok = loss.sum(axis=-1) / channels  # = sum over pixels of channel-mean
        return _masked_token_mean(tok, mask, p * p)

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        input = input.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if input.ndim == 3:
            return self._patch_call(input, target, mask)
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

    def _patch_call(self, input, target, mask):
        p = self.scale
        channels = target.shape[-1]
        tgt = patchify_cpp(target, p)
        if self.norm_pix:
            tgt = _norm_pix_patches(tgt)
        loss = jnp.abs(input - tgt)
        if mask is None:
            return loss.mean()
        tok = loss.sum(axis=-1) / channels
        return _masked_token_mean(tok, mask, p * p)

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        input = input.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if input.ndim == 3:
            return self._patch_call(input, target, mask)
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

    def _patch_call(self, input, target, mask):
        """input: (B, N, classes*p*p) patches ((class, ph, pw) minor order);
        target: (B, H, W) int at the modality's stride resolution."""
        p = self.scale
        b, n, d = input.shape
        num_classes = d // (p * p)
        logits = input.reshape(b, n, num_classes, p * p)
        logp = jax.nn.log_softmax(logits, axis=2)
        # patchify the int target to (B, N, p*p)
        h, w = target.shape[1], target.shape[2]
        nh, nw = h // p, w // p
        tgt = target.reshape(b, nh, p, nw, p).transpose(0, 1, 3, 2, 4)
        tgt = tgt.reshape(b, n, p * p)
        # one-hot multiply instead of take_along_axis: the gather's
        # backward is a serialized scatter on TPU.
        onehot = jax.nn.one_hot(tgt, num_classes, axis=2, dtype=logp.dtype)
        nll = -(onehot * logp).sum(axis=2)
        if self.label_smoothing > 0.0:
            smooth = -logp.mean(axis=2)
            nll = (1.0 - self.label_smoothing) * nll + self.label_smoothing * smooth
        if mask is None:
            return nll.mean()
        tok = nll.sum(axis=-1)
        return _masked_token_mean(tok, mask, p * p)

    def __call__(
        self,
        input: jnp.ndarray,
        target: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """input: (B, H, W, num_classes) logits or (B, N, classes*p*p)
        patches; target: (B, H, W) int."""
        if input.ndim == 3:
            return self._patch_call(input.astype(jnp.float32), target, mask)
        logits = input.astype(jnp.float32)
        num_classes = logits.shape[-1]
        logp = jax.nn.log_softmax(logits, axis=-1)
        # one-hot reduce: take_along_axis's backward is a serialized
        # scatter on TPU (same rationale as the patch branch above).
        onehot = jax.nn.one_hot(target, num_classes, dtype=logp.dtype)
        nll = -(onehot * logp).sum(axis=-1)
        if self.label_smoothing > 0.0:
            smooth = -logp.mean(axis=-1)
            nll = (1.0 - self.label_smoothing) * nll + self.label_smoothing * smooth
        if mask is None:
            return nll.mean()
        h, w = logits.shape[1], logits.shape[2]
        mask_pix = _upsample_mask(mask, (h, w), self.scale)
        return _masked_mean(nll, mask_pix)
