"""Pallas ring attention (ops/ring_kernel.py) vs full attention.

Runs on the 8-device CPU mesh with the pallas_calls in interpret mode
(exact fp32), exercising the REAL ring schedule: shard_map over a 'seq'
axis, ppermute rotation, per-step flash kernels, XLA stat combine, and the
custom-VJP backward ring.  Dropout needs the on-chip PRNG and is covered by
the TPU-only suite (tests/test_attention_tpu.py)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neko_tpu.ops.attention import xla_attention
from neko_tpu.ops.ring_kernel import ring_attention_bsd, supported

HEADS, HD = 2, 64  # g = 128 // 64 = 2 -> one lane group


def _to_bhsd(x2, heads):
    B, S, D = x2.shape
    return x2.reshape(B, S, heads, D // heads).transpose(0, 2, 1, 3)


def _from_bhsd(x):
    B, H, S, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * hd)


def _reference(q2, k2, v2, key_mask):
    out = xla_attention(
        _to_bhsd(q2, HEADS), _to_bhsd(k2, HEADS), _to_bhsd(v2, HEADS), key_mask
    )
    return _from_bhsd(out)


def _ring(mesh, n, q2, k2, v2, key_mask):
    from neko_tpu.ops.attention_kernel import mask_bounds_from_key_mask

    start, end = mask_bounds_from_key_mask(key_mask)

    def local(q, k, v, st, en):
        return ring_attention_bsd(
            q, k, v, st, en, axis_name="seq", n_shards=n, heads=HEADS
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"), P(), P()),
        out_specs=P(None, "seq"),
        check_vma=False,
    )
    return fn(q2, k2, v2, start, end)


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def _rand(B, S, seed=0):
    rng = np.random.RandomState(seed)
    D = HEADS * HD
    return (
        jnp.asarray(rng.randn(B, S, D), jnp.float32),
        jnp.asarray(rng.randn(B, S, D), jnp.float32),
        jnp.asarray(rng.randn(B, S, D), jnp.float32),
    )


def test_supported_predicate():
    assert supported(128, 64, 2)
    assert supported(512, 32, 24)
    assert not supported(136, 64, 2)      # not 128-divisible
    assert not supported(16384, 64, 2)    # beyond the VMEM-verified bound
    assert not supported(128, 48, 3)      # 144 lanes can't group to 128


@pytest.mark.parametrize("n_seq", [2, 4])
def test_ring_kernel_matches_full(n_seq):
    mesh = _mesh(n_seq)
    B, S = 2, 128 * n_seq
    q2, k2, v2 = _rand(B, S)
    key_mask = jnp.ones((B, S), bool)
    out = _ring(mesh, n_seq, q2, k2, v2, key_mask)
    ref = _reference(q2, k2, v2, key_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_kernel_left_padding():
    n = 2
    mesh = _mesh(n)
    B, S = 3, 256
    q2, k2, v2 = _rand(B, S, seed=3)
    key_mask = np.ones((B, S), bool)
    key_mask[0, :100] = False   # left-padded row
    key_mask[2, :255] = False   # nearly-empty row
    key_mask = jnp.asarray(key_mask)
    out = _ring(mesh, n, q2, k2, v2, key_mask)
    ref = _reference(q2, k2, v2, key_mask)
    valid = np.asarray(key_mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * valid, np.asarray(ref) * valid, atol=2e-5
    )


def test_ring_kernel_gradients_match_full():
    n = 4
    mesh = _mesh(n)
    B, S = 2, 128 * n
    q2, k2, v2 = _rand(B, S, seed=7)
    key_mask = np.ones((B, S), bool)
    key_mask[1, :64] = False
    key_mask = jnp.asarray(key_mask)
    w = jnp.asarray(
        np.random.RandomState(9).randn(B, S, HEADS * HD), jnp.float32
    )
    # only valid rows contribute (padded-query outputs differ by convention)
    w = w * key_mask[:, :, None]

    def loss_ring(q, k, v):
        return jnp.sum(_ring(mesh, n, q, k, v, key_mask) * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, key_mask) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q2, k2, v2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gf), atol=5e-5, rtol=1e-4
        )
