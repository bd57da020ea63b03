"""Fused loss-head kernel (ops/loss_kernel.py) vs the XLA reference math.

Runs the EXACT kernel algorithm in interpret mode on CPU (fused_logz_tl
gates interpret on platform); the model's loss path only dispatches to it
on TPU (losses._logz_tl -> fused_supported), where NEKO_TEST_TPU=1 runs
the same comparisons compiled via Mosaic (tests/test_attention_tpu.py
covers the TPU kernels' compiled behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neko_tpu.ops.loss_kernel import _pick_vb, fused_logz_tl


def _ref(x, t, W, valid_vocab):
    logits = jnp.einsum("nd,dv->nv", x, W, preferred_element_type=jnp.float32)
    if valid_vocab is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W.shape[-1]), 1)
        logits = jnp.where(col < valid_vocab, logits, -1e30)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tl = jnp.take_along_axis(logits, t[:, None], axis=-1)[:, 0]
    return logz, tl


def test_pick_vb():
    assert _pick_vb(52480) == 1280  # the flagship padded vocab
    assert 52480 % _pick_vb(52480) == 0
    assert _pick_vb(2560) > 0
    assert _pick_vb(127) == 0


@pytest.mark.parametrize("valid_vocab", [None, 2000])
def test_fused_logz_tl_matches_xla(valid_vocab):
    rng = np.random.default_rng(7)
    N, D, V = 1024, 256, 2560
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((D, V)) * 0.05, jnp.float32)
    t = jnp.asarray(rng.integers(0, valid_vocab or V, N), jnp.int32)
    logz, tl = fused_logz_tl(x, t, W, valid_vocab=valid_vocab)
    ref_logz, ref_tl = _ref(x, t, W, valid_vocab)
    np.testing.assert_allclose(logz, ref_logz, atol=2e-5, rtol=1e-6)
    np.testing.assert_allclose(tl, ref_tl, atol=2e-5, rtol=1e-6)


def test_fused_bf16_multi_row_blocks():
    """bf16 operands + several row blocks (grid dim 0 > 1): the scratch
    accumulators must reset at every new row block's first vocab block."""
    rng = np.random.default_rng(3)
    N, D, V = 2048, 128, 1280
    x32 = rng.standard_normal((N, D)).astype(np.float32)
    W32 = (rng.standard_normal((D, V)) * 0.05).astype(np.float32)
    x = jnp.asarray(x32, jnp.bfloat16)
    W = jnp.asarray(W32, jnp.bfloat16)
    t = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    logz, tl = fused_logz_tl(x, t, W)
    ref_logz, ref_tl = _ref(x, t, W, None)
    np.testing.assert_allclose(logz, ref_logz, atol=1e-5, rtol=1e-6)
    np.testing.assert_allclose(tl, ref_tl, atol=1e-5, rtol=1e-6)
