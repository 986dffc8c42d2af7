"""Tests for the Dirichlet task-masking sampler (multimae_tpu/ops/masking.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimae_tpu.ops.masking import (
    generate_random_masks,
    masks_to_indices,
    sample_alphas,
)

TOKENS = [196, 196, 196]
K = 98


def test_exact_visible_count():
    key = jax.random.PRNGKey(0)
    masks, ids_keep, ids_restore = generate_random_masks(key, 4, TOKENS, K)
    mask_all = jnp.concatenate(masks, axis=1)
    # Exactly K visible (0) per sample after rounding correction
    # (reference multimae/multimae.py:209-216).
    np.testing.assert_array_equal(np.asarray((mask_all == 0).sum(axis=1)), K)
    assert ids_keep.shape == (4, K)
    assert ids_restore.shape == (4, sum(TOKENS))


def test_ids_keep_are_visible_positions():
    key = jax.random.PRNGKey(1)
    masks, ids_keep, _ = generate_random_masks(key, 3, TOKENS, K)
    mask_all = np.asarray(jnp.concatenate(masks, axis=1))
    keep = np.asarray(ids_keep)
    for b in range(3):
        assert set(keep[b].tolist()) == set(np.where(mask_all[b] == 0)[0].tolist())


def test_ids_restore_is_inverse_permutation():
    key = jax.random.PRNGKey(2)
    _, _, ids_restore = generate_random_masks(key, 2, TOKENS, K)
    n = sum(TOKENS)
    restore = np.asarray(ids_restore)
    for b in range(2):
        assert sorted(restore[b].tolist()) == list(range(n))


def test_deterministic_under_fixed_key():
    key = jax.random.PRNGKey(3)
    m1, k1, r1 = generate_random_masks(key, 2, TOKENS, K)
    m2, k2, r2 = generate_random_masks(key, 2, TOKENS, K)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_jittable():
    fn = jax.jit(
        lambda key: generate_random_masks(key, 2, TOKENS, K, alphas=1.0)
    )
    masks, ids_keep, _ = fn(jax.random.PRNGKey(4))
    assert ids_keep.shape == (2, K)


def test_alpha_concentration_effect():
    # Low alpha should concentrate tokens on fewer tasks than high alpha.
    key = jax.random.PRNGKey(5)
    masks_low, _, _ = generate_random_masks(key, 256, TOKENS, K, alphas=0.01)
    masks_high, _, _ = generate_random_masks(key, 256, TOKENS, K, alphas=100.0)

    def per_task_share_std(masks):
        counts = np.stack(
            [np.asarray((m == 0).sum(axis=1)) for m in masks], axis=1
        ).astype(np.float64)
        return counts.std(axis=1).mean()

    assert per_task_share_std(masks_low) > per_task_share_std(masks_high)


def test_sample_alphas_rows_are_valid():
    alphas = sample_alphas(jax.random.PRNGKey(6), 512, 3, alphas=1.0)
    a = np.asarray(alphas)
    assert a.shape == (512, 3)
    # Each entry is eps or 1+eps.
    assert np.all((np.isclose(a, 1e-5)) | (np.isclose(a, 1.0 + 1e-5)))
    # Each row has at least one active task.
    assert np.all(a.max(axis=1) > 0.5)


def test_masks_to_indices_roundtrip():
    key = jax.random.PRNGKey(7)
    masks, ids_keep, ids_restore = generate_random_masks(key, 2, TOKENS, K)
    task_masks = {f"t{i}": m for i, m in enumerate(masks)}
    ids_keep2, ids_restore2 = masks_to_indices(task_masks, K)
    # Same visible set (order may differ as ties break differently).
    for b in range(2):
        assert set(np.asarray(ids_keep2)[b].tolist()) == set(
            np.asarray(ids_keep)[b].tolist()
        )
