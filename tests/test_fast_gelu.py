"""Exhaustive bf16 faithfulness proof for ops/fast_gelu.py.

bf16 has only 65536 bit patterns, so "how close is the fast polynomial
GELU to the correctly-rounded exact GELU" is not a sampling question —
we check every representable input against an f64 reference.
"""

import ml_dtypes
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimae_tpu.ops.fast_gelu import gelu_bf16_exact


def _exact_gelu_f64(x):
    from scipy.stats import norm

    return x * norm.cdf(x)


def _bf16_ulp_distance(a, b):
    """ulp distance between bf16 arrays via monotone integer mapping."""
    def key(u):
        u = u.view(np.uint16).astype(np.int32)
        return np.where(u & 0x8000, 0x8000 - (u & 0x7FFF) - 1,
                        0x8000 + (u & 0x7FFF))

    return np.abs(key(a) - key(b))


@pytest.fixture(scope="module")
def all_bf16():
    bits = np.arange(65536, dtype=np.uint16)
    x = bits.view(ml_dtypes.bfloat16)
    x64 = x.astype(np.float64)
    finite = np.isfinite(x64)
    return x[finite], x64[finite]


def test_exhaustive_bf16_faithfulness(all_bf16):
    xbf, x64 = all_bf16
    ours = np.asarray(
        jax.jit(gelu_bf16_exact)(jnp.asarray(xbf, jnp.bfloat16))
    ).view(ml_dtypes.bfloat16)
    exact64 = _exact_gelu_f64(x64)
    exact_bf = exact64.astype(np.float32).astype(ml_dtypes.bfloat16)

    ud = _bf16_ulp_distance(ours, exact_bf)
    both_zero = (ours.astype(np.float64) == 0.0) & (
        exact_bf.astype(np.float64) == 0.0
    )
    # XLA flushes bf16 subnormal outputs to zero (FTZ) — hardware/backend
    # behavior shared by the erf path, not an artifact of the polynomial.
    ftz = (np.abs(exact64) < np.float64(ml_dtypes.finfo(ml_dtypes.bfloat16).tiny)) & (
        ours.astype(np.float64) == 0.0
    )
    ud = np.where(both_zero | ftz, 0, ud)

    main = x64 >= -3.5  # 99.997% of the bf16 number line
    assert ud[main].max() <= 1, (
        f"max ulp {ud[main].max()} at x={x64[main][np.argmax(ud[main])]}"
    )
    assert (ud[main] == 0).mean() > 0.999

    # far-negative tail: exact gelu itself is in (-1.3e-4, 0]; the tanh
    # saturation tracks the Gaussian decay to 6.2e-6 absolutely for
    # EVERY tail input (in particular: no blow-up at huge |x|).
    tail = x64 < -3.5
    abs_err = np.abs(ours.astype(np.float64) - exact64)[tail]
    assert abs_err.max() <= 6.2e-6, f"max tail abs err {abs_err.max():.2e}"


def test_matches_or_beats_xla_erf_rounding(all_bf16):
    """XLA's own erf-based gelu on bf16 also deviates from correct
    rounding; the poly path must not be worse on the main range."""
    xbf, x64 = all_bf16
    exact64 = _exact_gelu_f64(x64)
    exact_bf = exact64.astype(np.float32).astype(ml_dtypes.bfloat16)

    xj = jnp.asarray(xbf, jnp.bfloat16)
    xla = np.asarray(jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(xj)
                     ).view(ml_dtypes.bfloat16)
    ours = np.asarray(jax.jit(gelu_bf16_exact)(xj)).view(ml_dtypes.bfloat16)

    main = x64 >= -3.5
    ud_xla = _bf16_ulp_distance(xla, exact_bf)[main]
    ud_ours = _bf16_ulp_distance(ours, exact_bf)[main]
    assert ud_ours.max() <= max(ud_xla.max(), 1)
    assert (ud_ours == 0).mean() >= (ud_xla == 0).mean() - 5e-4


def test_gradient_matches_true_derivative():
    """Autodiff of the polynomial vs the analytic gelu' in f64."""
    from scipy.stats import norm

    x = np.linspace(-6.0, 6.0, 20001)
    g = np.asarray(
        jax.vmap(jax.grad(lambda v: gelu_bf16_exact(v)))(
            jnp.asarray(x, jnp.float32)
        )
    ).astype(np.float64)
    true = norm.cdf(x) + x * norm.pdf(x)
    err = np.abs(g - true)
    # the fit targets the FUNCTION; its derivative (via tanh' = 1-tanh^2)
    # peaks at ~1.7e-5 error — four orders below ambient bf16 gradient
    # noise (2^-9 relative on O(1) activations).
    assert err.max() <= 2.5e-5, err.max()


def test_fp32_path_unchanged():
    """models.vit.gelu must keep exact erf for fp32 (golden parity)."""
    from multimae_tpu.models.vit import gelu

    x = jnp.linspace(-5.0, 5.0, 1001, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(gelu(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
    )


def test_bf16_path_is_fast_poly():
    from multimae_tpu.models.vit import gelu

    x = jnp.linspace(-5.0, 5.0, 1001).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(gelu(x), dtype=np.float32),
        np.asarray(gelu_bf16_exact(x), dtype=np.float32),
    )
