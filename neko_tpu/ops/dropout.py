"""Materialized-mask dropout: cheap RNG + fusion-friendly backward.

Why not `flax.linen.Dropout`: its `jax.random.bernoulli` draws 32 random
bits per element and converts to float, and because the mask is pure RNG,
XLA *recomputes* the generator chain inside every backward consumer instead
of storing the mask — profiling the 768d/6L train step showed the rbg xor
chains duplicated into THREE backward fusions per layer (bias-grad, dgrad,
wgrad of mlp/c_proj), dragging those matmuls from ~140-190 to ~54-60
TFLOP/s.

This module instead

* draws 8 random bits per element (`jax.random.bits(..., uint8)`) — the
  keep decision only needs 1/256 probability granularity, and the inverse
  scale uses the REALIZED keep probability `1 - round(rate*256)/256`, so
  E[dropout(x)] == x exactly;
* materializes the boolean keep mask behind `lax.optimization_barrier`, so
  the forward stores one compact mask and every backward consumer reloads
  it instead of re-deriving random bits.

Semantics match the reference's `nn.Dropout` (train.py uses torch dropout
with p=resid/embd/attn_pdrop): each element independently dropped with
probability ~rate and survivors scaled by 1/keep_prob.

Measured on v5e (768d/6L/k1024/bs16, dropout=0.1): 120.1 -> 111.3 ms/step
(+8% throughput); the c_proj backward fusions return to clean matmuls.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def materialized_dropout(rng, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Functional form: dropout with an explicitly materialized keep mask.

    P(drop) is quantized to round(rate*256)/256 and the survivor scale uses
    that realized probability, so the output is exactly unbiased.
    """
    threshold = int(round(rate * 256.0))
    if threshold <= 0:
        return x
    assert threshold < 256, f"dropout rate {rate} rounds to dropping everything"
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    keep = bits >= jnp.uint8(threshold)
    # Barrier: store the compact mask; without it XLA re-derives the RNG
    # chain inside each backward consumer (see module docstring).
    (keep,) = jax.lax.optimization_barrier((keep,))
    scale = 1.0 / (1.0 - threshold / 256.0)
    return jnp.where(keep, x * jnp.asarray(scale, x.dtype), 0)


class Dropout(nn.Module):
    """Drop-in replacement for `nn.Dropout` (rng collection 'dropout')."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate <= 0.0:
            return x
        return materialized_dropout(self.make_rng("dropout"), x, self.rate)
