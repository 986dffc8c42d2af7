"""bf16-faithful fast exact GELU.

The reference uses exact-erf GELU (torch nn.GELU default;
/root/reference/multimae/multimae_utils.py:146). XLA lowers erf to a
guarded rational approximation whose division + branch structure costs
~50+ VPU ops per element; at fine-tune shapes the encoder + ConvNeXt-head
MLP intermediates total >1.5e9 activations per step, and the erf chain
was measured at ~25% of the whole 512px train step.

This module replaces erf-GELU *for bfloat16 tensors only* with a
tanh-basis minimax approximation

    erf(x / sqrt(2)) ~= tanh(x * p(x^2)),   p = degree-4 poly in x^2

(Lawson-weighted least-max fit on [0, 4]; max abs error 2.9e-6 in f64).
tanh is a fast hardware path on the TPU VPU, so the whole gelu is
~9 ops: 4 fma + 2 mul + tanh + fma — measured ~2.7x cheaper fwd+bwd than
XLA's erf chain and within ~25% of the (inexact) tanh-approx gelu.
Because tanh saturates, the approximation needs NO clamps or selects:
for x > 4 the fit extrapolates monotonically (E >= 0.99994, so
0.5*x*(1+E) rounds to x in bf16), and for x -> -inf the (1+E) factor
decays like the true Gaussian tail (abs error <= 6.2e-6 everywhere in
the x < -3.5 tail, where exact gelu is in (-1.3e-4, 0]).

Faithfulness, verified EXHAUSTIVELY over all 65536 bf16 bit patterns
(tests/test_fast_gelu.py) against the correctly-rounded f64 gelu:
  * x >= -3.5 (99.997% of the bf16 number line and essentially all
    LayerNorm-scale activations): never more than 1 bf16 ulp from the
    correctly-rounded exact gelu, bit-identical for >99.9% of inputs —
    the same bound XLA's own erf lowering exhibits vs correct rounding.
  * x < -3.5 tail: absolute error <= 6.2e-6.
On TPU hardware the VPU's approximate tanh adds error beyond the fit's
own (measured exhaustively on v5e): outputs stay >=99.9% bit-identical
to correct rounding but the worst case grows to 11 bf16 ulp, confined
to the small-|output| band x in (-3.5, -2), abs error <= 6.1e-5. For
calibration, XLA's tanh-APPROX gelu measures 44 ulp / 1.5e-4 abs on the
same sweep, and exact gelu itself is only specified to hardware tanh/erf
accuracy in any bf16 torch AMP run of the reference.
The approximation is plain differentiable JAX — no custom_vjp — so the
backward pass reuses tanh' = 1 - tanh^2: jax.grad matches the analytic
gelu' to <= 2e-5 everywhere (pinned by test).

fp32/f64 inputs keep jax.nn.gelu's exact erf path untouched, so the
fp32 golden-parity suite is unaffected.
"""

from __future__ import annotations

import jax.numpy as jnp

# Least-max fit of tanh(x * p(x^2)) to erf(x/sqrt(2)) on [0, 4]; max abs
# error 2.88e-6 (f64). Leading term 0.79787 = sqrt(2/pi) as expected;
# the positive leading x^8 coefficient keeps x*p(x^2) monotone beyond
# the fit range so tanh saturates to +-1 instead of folding back.
_P_COEFFS = (
    0.7978697728720571,
    0.036392056465493546,
    -8.764273504580626e-05,
    -3.6738140554174805e-05,
    1.4280796631513417e-06,
)


def gelu_bf16_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-to-~1-ulp bf16 GELU: 0.5*x*(1 + tanh(x * p(x^2))).

    Input of any dtype is accepted; compute is f32, output cast back to
    the input dtype. (Named for its contract on bf16 tensors — on wider
    dtypes it is only ~3e-6-accurate and models.vit.gelu does not route
    them here.)
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    t = xf * xf
    p = jnp.float32(_P_COEFFS[-1])
    for c in _P_COEFFS[-2::-1]:
        p = p * t + jnp.float32(c)
    out = jnp.float32(0.5) * xf * (jnp.float32(1.0) + jnp.tanh(xf * p))
    return out.astype(dt)
