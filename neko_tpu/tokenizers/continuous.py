"""Continuous-value tokenization: mu-law companding + uniform binning.

Semantics match the reference exactly (/root/reference/gato/policy/
input_tokenizers.py:5-42), including its edge behaviour:

* encode: optional mu-law -> clamp [-1, 1] -> `(x + 1) * (n_bins / 2)` with a
  *truncating* int cast -> `+ offset`.  Note that an input of exactly +1.0
  yields bin `n_bins` (one past the top bin) — the reference does not clip the
  bin index and we reproduce that by default so token streams (and therefore
  loss curves) match bit-for-bit.  Pass ``clip_bins=True`` for the sanitized
  variant.
* decode: only defined for the non-mu-law (action) tokenizer,
  `x = 2*token/n_bins - 1`.

Both numpy (host/packer) and jax (device) implementations are provided; the
jax versions are trivially fusable elementwise ops.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def mu_law_np(x: np.ndarray, mu: float = 100.0, M: float = 256.0) -> np.ndarray:
    return np.sign(x) * np.log1p(mu * np.abs(x)) / math.log(1 + mu * M)


def mu_law(x: jnp.ndarray, mu: float = 100.0, M: float = 256.0) -> jnp.ndarray:
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / math.log(1 + mu * M)


def encode_np(
    x: np.ndarray,
    *,
    use_mu_law: bool,
    mu: float = 100.0,
    M: float = 256.0,
    n_bins: int = 1024,
    offset: int = 0,
    clip_bins: bool = False,
) -> np.ndarray:
    x = np.asarray(x, dtype=np.float32)
    if use_mu_law:
        x = mu_law_np(x, mu, M)
    x = np.clip(x, -1.0, 1.0)
    bins = ((x + 1.0) * (n_bins / 2.0)).astype(np.int32)  # trunc toward zero
    if clip_bins:
        bins = np.minimum(bins, n_bins - 1)
    return bins + offset


def encode(
    x: jnp.ndarray,
    *,
    use_mu_law: bool,
    mu: float = 100.0,
    M: float = 256.0,
    n_bins: int = 1024,
    offset: int = 0,
    clip_bins: bool = False,
) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    if use_mu_law:
        x = mu_law(x, mu, M)
    x = jnp.clip(x, -1.0, 1.0)
    bins = ((x + 1.0) * (n_bins / 2.0)).astype(jnp.int32)
    if clip_bins:
        bins = jnp.minimum(bins, n_bins - 1)
    return bins + offset


def decode_np(tokens: np.ndarray, *, n_bins: int = 1024, offset: int = 0) -> np.ndarray:
    """Inverse of the non-mu-law encode (reference input_tokenizers.py:32-42)."""
    t = np.asarray(tokens, dtype=np.float32) - offset
    return (2.0 * t) / n_bins - 1.0


def mu_law_inverse_np(
    y: np.ndarray, mu: float = 100.0, M: float = 256.0
) -> np.ndarray:
    """Inverse companding: |x| = ((1 + mu*M)^|y| - 1) / mu.

    The reference never needs this (its mu-law tokenizer raises on decode,
    input_tokenizers.py:40-41, because only ACTIONS — encoded without
    mu-law — are ever decoded).  Observation imagination
    (Generator.imagine) does: predicted continuous-obs tokens live in
    mu-law space and must be mapped back to value space, both for the
    returned predictions and so the fed-back history re-encodes to the
    same tokens instead of being companded twice."""
    y = np.asarray(y, dtype=np.float32)
    return np.sign(y) * (
        np.expm1(np.abs(y) * math.log(1 + mu * M)) / mu
    ).astype(np.float32)


def decode_mu_law_np(
    tokens: np.ndarray,
    *,
    mu: float = 100.0,
    M: float = 256.0,
    n_bins: int = 1024,
    offset: int = 0,
) -> np.ndarray:
    """Full inverse of the mu-law encode: bin CENTER -> companding inverse.

    The center (left edge + 1/n_bins in companded space) leaves a half-bin
    margin on both sides, so float32 rounding through the companding
    round-trip cannot cross a bin edge: encode_np(decode_mu_law_np(t)) == t
    for every in-range bin (fuzzed in tests/test_space_properties.py)."""
    y = decode_np(tokens, n_bins=n_bins, offset=offset) + 1.0 / n_bins
    return mu_law_inverse_np(y, mu, M)


def decode(tokens: jnp.ndarray, *, n_bins: int = 1024, offset: int = 0) -> jnp.ndarray:
    t = tokens.astype(jnp.float32) - offset
    return (2.0 * t) / n_bins - 1.0


class ContinuousTokenizer:
    """Stateful convenience wrapper mirroring the reference class API."""

    def __init__(
        self,
        use_mu_law: bool = True,
        mu: float = 100.0,
        M: float = 256.0,
        n_bins: int = 1024,
        offset: Optional[int] = None,
        clip_bins: bool = False,
    ):
        self.use_mu_law = use_mu_law
        self.mu = mu
        self.M = M
        self.n_bins = n_bins
        self.offset = 0 if offset is None else offset
        self.clip_bins = clip_bins

    def encode(self, x):
        fn = encode_np if isinstance(x, np.ndarray) else encode
        return fn(
            x,
            use_mu_law=self.use_mu_law,
            mu=self.mu,
            M=self.M,
            n_bins=self.n_bins,
            offset=self.offset,
            clip_bins=self.clip_bins,
        )

    def decode(self, tokens):
        if self.use_mu_law:
            raise ValueError(
                "mu-law encoding is only used for observations, which are never decoded"
            )
        fn = decode_np if isinstance(tokens, np.ndarray) else decode
        return fn(tokens, n_bins=self.n_bins, offset=self.offset)
