"""Fast exact-erf GELU.

The reference's fresh-model activation is HF ACT2FN['gelu'] — the EXACT
erf formulation (gato_policy.py:27 -> trajectory_gpt2.py:266), and the
image embedder's ResNetV2 block uses torch nn.GELU() (also exact erf).
XLA's erf on TPU is expensive enough that, fused into the MLP projection
operands, it cost 13.3 ms of the 97 ms flagship train step (measured:
swapping to tanh-gelu alone took the step to 84.0 ms; PROFILE.md).

This computes erf with the Abramowitz & Stegun 7.1.26 rational
approximation: |erf_approx(z) - erf(z)| <= 1.5e-7 in exact arithmetic
(~4e-7 observed in fp32, tests/test_dropout.py), i.e. the
gelu error is below fp32 parity-test tolerances and FAR below bf16
activation resolution (~3 decimal digits) — numerically indistinguishable
from the exact op for this framework, at roughly the cost of the tanh
approximation (one exp + a degree-5 polynomial).
"""

from __future__ import annotations

import jax.numpy as jnp

_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_INV_SQRT2 = 0.7071067811865476


def erf_approx(z):
    """A&S 7.1.26 erf, fp32 internals, |abs err| <= 1.5e-7."""
    z32 = z.astype(jnp.float32)
    a = jnp.abs(z32)
    t = 1.0 / (1.0 + _P * a)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(z32) * e


def gelu_erf(x):
    """Exact-formulation GELU x * Phi(x) via the fast erf; returns x.dtype."""
    x32 = x.astype(jnp.float32)
    return (x32 * 0.5 * (1.0 + erf_approx(x32 * _INV_SQRT2))).astype(x.dtype)
