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


def _dirichlet_moments(alphas):
    a = np.asarray(alphas, np.float64)
    s = a.sum()
    mean = a / s
    var = a * (s - a) / (s * s * (s + 1.0))
    return mean, var


def test_dirichlet_moments_flat_alpha():
    # alphas == 1.0 takes the loop-free normalized-exponential fast path.
    from multimae_tpu.ops.masking import dirichlet_task_proportions

    p = np.asarray(
        dirichlet_task_proportions(jax.random.PRNGKey(10), 40000, 3, alphas=1.0)
    )
    assert p.shape == (40000, 3)
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
    mean, var = _dirichlet_moments([1.0, 1.0, 1.0])
    np.testing.assert_allclose(p.mean(axis=0), mean, atol=0.01)
    np.testing.assert_allclose(p.var(axis=0), var, atol=0.01)


def test_dirichlet_moments_general_alpha():
    # Non-flat alphas exercise the fixed-fan-out Marsaglia-Tsang sampler.
    from multimae_tpu.ops.masking import dirichlet_task_proportions

    alphas = (2.0, 5.0, 0.5)
    p = np.asarray(
        dirichlet_task_proportions(
            jax.random.PRNGKey(11), 40000, 3, alphas=alphas
        )
    )
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-5)
    mean, var = _dirichlet_moments(alphas)
    np.testing.assert_allclose(p.mean(axis=0), mean, atol=0.01)
    np.testing.assert_allclose(p.var(axis=0), var, atol=0.01)


def test_gamma_mt_matches_jax_gamma_moments():
    from multimae_tpu.ops.masking import _gamma_mt

    for alpha in (0.5, 1.0, 4.0):
        a = jnp.full((40000,), alpha, jnp.float32)
        g = np.asarray(_gamma_mt(jax.random.PRNGKey(12), a))
        assert np.all(g >= 0)
        np.testing.assert_allclose(g.mean(), alpha, rtol=0.05)
        np.testing.assert_allclose(g.var(), alpha, rtol=0.08)


def test_masking_compiles_loop_free_under_data_mesh():
    """Regression: jax.random.gamma's rejection while_loop turned into a
    per-iteration cross-device all-reduce once the batch was sharded
    (deadlocks CPU rendezvous; ICI chatter on pods). The sampler must
    compile with NO while loop at all under an 8-way data mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimae_tpu.ops.masking import generate_random_masks
    from multimae_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 devices")
    mesh = create_mesh(devices=jax.devices()[:8])

    def fn(key):
        masks, ids_keep, ids_restore = generate_random_masks(
            key, 16, TOKENS, K, alphas=1.0, sample_tasks_uniformly=True
        )
        return ids_keep

    compiled = (
        jax.jit(fn, out_shardings=NamedSharding(mesh, P("data")))
        .lower(jax.random.PRNGKey(0))
        .compile()
    )
    txt = compiled.as_text()
    # XLA CPU lowers threefry PRNG through fixed-trip-count while loops
    # (collective-free); the property that matters is that NO collective
    # exists anywhere (so none can sit inside a loop) and the gamma
    # rejection sampler is gone entirely.
    assert "all-reduce" not in txt and "collective" not in txt, (
        "masking sampler compiled cross-device collectives under a data mesh"
    )
    assert "jit(_gamma)" not in txt, (
        "jax.random.gamma rejection sampler reappeared in the masking path"
    )
