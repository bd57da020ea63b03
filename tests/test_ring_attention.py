"""Ring attention over a sequence-sharded 8-device CPU mesh vs full attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neko_tpu.ops.attention import xla_attention
from neko_tpu.ops.ring_attention import ring_attention, sequence_sharded_attention


def _full_reference(q, k, v):
    S = q.shape[2]
    mask = jnp.ones((q.shape[0], S), bool)
    return xla_attention(q, k, v, mask)


@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_ring_matches_full(n_seq):
    devices = jax.devices()[:n_seq]
    mesh = Mesh(np.array(devices), ("seq",))
    B, Hh, S, hd = 2, 3, 16 * n_seq, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)

    out = sequence_sharded_attention(q, k, v, mesh)
    ref = _full_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_single_device_degenerates_to_local():
    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    B, Hh, S, hd = 1, 2, 32, 8
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    out = sequence_sharded_attention(q, q, q, mesh)
    ref = _full_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_key_mask_matches_full():
    """Packed left-padding: the rotating key mask must reproduce the XLA
    path's key-padding semantics on every valid query row."""
    n_seq = 4
    mesh = Mesh(np.array(jax.devices()[:n_seq]).reshape(n_seq), ("seq",))
    B, Hh, S, hd = 2, 2, 8 * n_seq, 8
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, :10] = False  # left pad crossing a shard boundary
    mask[1, :3] = False
    km = jnp.asarray(mask)

    out = np.asarray(sequence_sharded_attention(q, k, v, mesh, key_mask=km))
    ref = np.asarray(xla_attention(q, k, v, km))
    for b in range(B):
        valid = mask[b]
        np.testing.assert_allclose(
            out[b][:, valid], ref[b][:, valid], atol=2e-5
        )


def test_ring_dropout_deterministic_and_scales():
    """Ring dropout: deterministic given the key, differs across keys, and
    rate=0 with a key equals the no-dropout path."""
    n_seq = 2
    mesh = Mesh(np.array(jax.devices()[:n_seq]).reshape(n_seq), ("seq",))
    B, Hh, S, hd = 1, 2, 16 * n_seq, 8
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)

    key1, key2 = jax.random.key(1), jax.random.key(2)
    a = np.asarray(sequence_sharded_attention(
        q, k, v, mesh, dropout_rate=0.3, dropout_key=key1))
    a2 = np.asarray(sequence_sharded_attention(
        q, k, v, mesh, dropout_rate=0.3, dropout_key=key1))
    b = np.asarray(sequence_sharded_attention(
        q, k, v, mesh, dropout_rate=0.3, dropout_key=key2))
    np.testing.assert_array_equal(a, a2)
    assert np.abs(a - b).max() > 1e-4
    nodrop = np.asarray(sequence_sharded_attention(q, k, v, mesh))
    withkey_rate0 = np.asarray(sequence_sharded_attention(
        q, k, v, mesh, dropout_rate=0.0, dropout_key=key1))
    np.testing.assert_allclose(nodrop, withkey_rate0, atol=1e-6)
    assert np.abs(a - nodrop).max() > 1e-4


def test_ring_gradients_match_full():
    n_seq = 4
    mesh = Mesh(np.array(jax.devices()[:n_seq]), ("seq",))
    B, Hh, S, hd = 1, 2, 8 * n_seq, 8
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, Hh, S, hd), jnp.float32)

    def loss_ring(q, k, v):
        return (sequence_sharded_attention(q, k, v, mesh) ** 2).sum()

    def loss_full(q, k, v):
        return (_full_reference(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
