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

The op carries a custom VJP that computes gelu'(x) = Phi(x) + x*phi(x)
IN THE FORWARD PASS — the pdf's exp(-x^2/2) is the same exponential the
A&S erf already evaluates, so the derivative is a few extra VPU flops on
an existing fusion — and saves it as the sole residual.  Without this,
XLA rematerializes the transcendental chain inside the backward pass and
fuses it into the c_proj weight-gradient matmul's operands, dropping that
dot from ~94% to ~58% of MXU peak (measured: PROFILE.md round-3 trace,
0.53 ms/layer/step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_P = 0.3275911
_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def erf_approx(z):
    """A&S 7.1.26 erf, fp32 internals, |abs err| <= 1.5e-7."""
    z32 = z.astype(jnp.float32)
    a = jnp.abs(z32)
    t = 1.0 / (1.0 + _P * a)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    e = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(z32) * e


def _gelu_and_grad(x):
    """(gelu(x), gelu'(x)) sharing one exp: phi(x) reuses erf's exp(-x^2/2)."""
    x32 = x.astype(jnp.float32)
    a = jnp.abs(x32) * _INV_SQRT2
    t = 1.0 / (1.0 + _P * a)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    ex = jnp.exp(-a * a)  # = exp(-x^2/2)
    erf = jnp.sign(x32) * (1.0 - poly * ex)
    cdf = 0.5 * (1.0 + erf)
    y = x32 * cdf
    dy = cdf + x32 * (_INV_SQRT2PI * ex)
    return y, dy


@jax.custom_vjp
def gelu_erf(x):
    """Exact-formulation GELU x * Phi(x) via the fast erf; returns x.dtype."""
    return _gelu_and_grad(x)[0].astype(x.dtype)


def _gelu_fwd(x):
    y, dy = _gelu_and_grad(x)
    # fp32 residual: bf16 would add ~0.4% relative grad noise for 2x less
    # HBM traffic; the traffic is ~0.5 ms/step total, not worth the risk.
    return y.astype(x.dtype), dy


def _gelu_bwd(dy_saved, g):
    return ((g.astype(jnp.float32) * dy_saved).astype(g.dtype),)


gelu_erf.defvjp(_gelu_fwd, _gelu_bwd)

# Measured and rejected: a no-custom-VJP variant for the image embedder's
# conv-sized activations (theory: the fp32 gelu'(x) residual costs ~2 GB of
# HBM traffic there).  Flagship bench said otherwise — 192.4k tokens/sec
# with recompute vs 195.0k with the residual — because autodiff saves the
# fp32 upcast of x as a residual anyway, so recomputing only ADDS
# transcendental work to the backward fusions.  One gelu_erf everywhere.
