"""Depth regression losses + metrics (reference: run_finetuning_depth.py:49-117).

NHWC; mask_valid broadcast over channels; berhu threshold
c = max(0.2 * max|diff|, 1e-5) with stop-gradient, matching :78.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from multimae_tpu.utils.data_constants import NYU_MEAN, NYU_STD


def _prep_mask(preds, mask_valid):
    if mask_valid is None:
        return jnp.ones_like(preds, dtype=bool)
    mask = mask_valid
    if mask.shape[-1] != preds.shape[-1]:
        mask = jnp.repeat(mask, preds.shape[-1] // mask.shape[-1], axis=-1)
    return mask.astype(bool)


def masked_mse_loss(preds, target, mask_valid=None):
    mask = _prep_mask(preds, mask_valid)
    loss = jnp.where(mask, (preds - target) ** 2, 0.0)
    return loss.sum() / jnp.maximum(mask.sum(), 1)


def masked_l1_loss(preds, target, mask_valid=None):
    mask = _prep_mask(preds, mask_valid)
    loss = jnp.where(mask, jnp.abs(preds - target), 0.0)
    return loss.sum() / jnp.maximum(mask.sum(), 1)


def masked_berhu_loss(preds, target, mask_valid=None):
    mask = _prep_mask(preds, mask_valid)
    diff = jnp.where(mask, preds - target, 0.0)
    c = jax.lax.stop_gradient(jnp.maximum(jnp.abs(diff).max() * 0.2, 1e-5))
    abs_diff = jnp.abs(diff)
    l1 = abs_diff
    l2 = (jnp.square(diff) + c**2) / 2.0 / c
    berhu = jnp.where(abs_diff < c, l1, l2)
    # zero out invalid (where diff was zeroed, l2 contributes c/2 != 0)
    berhu = jnp.where(mask, berhu, 0.0)
    return berhu.sum() / jnp.maximum(mask.sum(), 1)


def masked_nyu_metrics(preds, target, mask_valid=None) -> Dict[str, jnp.ndarray]:
    """reference :86-117 (NYU de-standardisation then masked metrics)."""
    preds = preds * NYU_STD + NYU_MEAN
    target = target * NYU_STD + NYU_MEAN
    mask = _prep_mask(preds, mask_valid)
    n = jnp.maximum(mask.sum(), 1)

    diff = jnp.where(mask, jnp.abs(preds - target), 0.0)
    tgt_c = jnp.clip(target, 1e-6, None)
    prd_c = jnp.clip(preds, 1e-6, None)
    max_rel = jnp.maximum(preds / tgt_c, target / prd_c)
    log_diff = jnp.where(mask, jnp.log(prd_c) - jnp.log(tgt_c), 0.0)

    return {
        "rmse": jnp.sqrt(jnp.square(diff).sum() / n),
        "rel": jnp.where(mask, diff / tgt_c, 0.0).sum() / n,
        "srel": jnp.where(mask, diff**2 / tgt_c, 0.0).sum() / n,
        "log10": jnp.sqrt(jnp.square(log_diff).sum() / n),
        "delta_1": jnp.where(mask, max_rel < 1.25, 0).sum() / n,
        "delta_2": jnp.where(mask, max_rel < 1.25**2, 0).sum() / n,
        "delta_3": jnp.where(mask, max_rel < 1.25**3, 0).sum() / n,
    }


LOSSES = {
    "mse": masked_mse_loss,
    "l1": masked_l1_loss,
    "berhu": masked_berhu_loss,
}
