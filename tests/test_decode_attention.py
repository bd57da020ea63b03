"""Decode-step cache-attention kernel vs the XLA reference (interpret mode
on CPU; the real-TPU run is exercised by the decode integration in
inference/generator.py and the TPU suite)."""

import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.ops.decode_attention import decode_cache_attention, supported


def _xla_reference(q, k_cache, v_cache, index, start):
    B, H, S, hd = k_cache.shape
    pos = jnp.arange(S)
    valid = (pos[None, :] >= start[:, None]) & (pos[None, :] <= index[:, None])
    logits = jnp.einsum(
        "bhd,bhsd->bhs", q.astype(jnp.float32), k_cache.astype(jnp.float32)
    ) * (hd ** -0.5)
    logits = jnp.where(valid[:, None, :], logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bhsd->bhd", w, v_cache.astype(jnp.float32))


def test_supported():
    assert supported(8, 24, 1024, 32)
    assert not supported(8, 24, 1000, 32)   # S not 128-divisible
    assert not supported(1, 8, 16384, 128)  # scratch would blow VMEM


def test_decode_attention_matches_xla():
    B, H, S, hd = 3, 16, 256, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, hd), jnp.float32)
    k_cache = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    v_cache = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    index = jnp.asarray([5, 100, 255], jnp.int32)
    start = jnp.asarray([0, 40, 255], jnp.int32)   # row 2: newest token only

    out, kc, vc = jax.jit(decode_cache_attention)(
        q, k_cache, v_cache, index, start
    )
    ref_out = _xla_reference(q, k_cache, v_cache, index, start)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=2e-5)
    # caches pass through unchanged (identity alias)
    np.testing.assert_array_equal(np.asarray(kc), np.asarray(k_cache))
    np.testing.assert_array_equal(np.asarray(vc), np.asarray(v_cache))


def test_decode_attention_single_token_history():
    # start == index: softmax collapses onto that one row's value
    B, H, S, hd = 1, 8, 128, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, H, hd), jnp.float32)
    k_cache = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    v_cache = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    index = jnp.asarray([7], jnp.int32)
    start = jnp.asarray([7], jnp.int32)
    out, _, _ = jax.jit(decode_cache_attention)(
        q, k_cache, v_cache, index, start
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(v_cache[:, :, 7]), atol=2e-5
    )
