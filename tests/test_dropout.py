"""Materialized-mask dropout (ops/dropout.py): unbiasedness, determinism,
and the SplitProj projection's parameter/math parity with nn.Dense."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.ops.dropout import Dropout, materialized_dropout


def test_deterministic_is_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    y = Dropout(0.5).apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y = Dropout(0.0).apply(
        {}, x, deterministic=False, rngs={"dropout": jax.random.key(0)}
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_drop_rate_and_unbiasedness():
    rate = 0.1
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(materialized_dropout(jax.random.key(1), x, rate))
    realized_rate = (y == 0).mean()
    # P(drop) is quantized to round(0.1*256)/256 = 26/256
    assert abs(realized_rate - 26 / 256) < 0.01
    # survivors are scaled by the realized keep prob -> exactly unbiased
    expected_scale = 1.0 / (1.0 - 26 / 256)
    survivors = y[y != 0]
    np.testing.assert_allclose(survivors, expected_scale, rtol=1e-6)
    assert abs(y.mean() - 1.0) < 0.01


def test_same_rng_same_mask():
    x = jnp.ones((64, 64))
    a = materialized_dropout(jax.random.key(7), x, 0.3)
    b = materialized_dropout(jax.random.key(7), x, 0.3)
    c = materialized_dropout(jax.random.key(8), x, 0.3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_split_proj_matches_dense():
    """SplitProj('c_attn') must have nn.Dense-identical params (path, shape,
    init) and produce the same q/k/v values as Dense + split."""
    from neko_tpu.models.transformer import SplitProj

    D = 16
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, D), jnp.float32)
    sp = SplitProj(D, dtype=jnp.float32, param_dtype=jnp.float32)
    params = sp.init(jax.random.key(0), x)
    kernel = params["params"]["kernel"]
    bias = params["params"]["bias"]
    assert kernel.shape == (D, 3 * D) and bias.shape == (3 * D,)

    q, k, v = sp.apply(params, x)
    dense = nn.Dense(3 * D)
    ref = dense.apply({"params": {"kernel": kernel, "bias": bias}}, x)
    rq, rk, rv = jnp.split(ref, 3, axis=-1)
    np.testing.assert_allclose(np.asarray(q), np.asarray(rq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(rk), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv), atol=1e-6)


def test_gelu_erf_matches_exact():
    """A&S-rational GELU tracks XLA's exact-erf GELU to <1e-6 absolute.

    The MLP/ResNet activation uses ops/gelu.py instead of jax.nn.gelu
    (XLA's exact erf cost 13 ms of the 97 ms flagship TPU step); this pins
    the accuracy claim that justifies the swap.
    """
    from neko_tpu.ops.gelu import gelu_erf

    x = jnp.linspace(-8.0, 8.0, 4097, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    fast = gelu_erf(x)
    np.testing.assert_allclose(fast, exact, atol=1e-6, rtol=0)
    # bf16 inputs keep bf16 outputs
    xb = x.astype(jnp.bfloat16)
    assert gelu_erf(xb).dtype == jnp.bfloat16


def test_gelu_erf_custom_vjp_grad():
    """gelu_erf's hand-derived VJP matches autodiff of the exact gelu.

    The custom VJP saves gelu'(x) computed in the forward pass (ops/gelu.py);
    this pins d/dx [x*Phi(x)] = Phi(x) + x*phi(x) against jax.nn.gelu's
    autodiff, and the saved-residual path against finite differences.
    """
    from neko_tpu.ops.gelu import gelu_erf

    x = jnp.linspace(-6.0, 6.0, 2049, dtype=jnp.float32)
    g_fast = jax.vmap(jax.grad(gelu_erf))(x)
    g_exact = jax.vmap(jax.grad(lambda z: jax.nn.gelu(z, approximate=False)))(x)
    np.testing.assert_allclose(g_fast, g_exact, atol=2e-6, rtol=0)
    # cotangent scaling flows through the residual
    y, vjp = jax.vjp(gelu_erf, x)
    (gx,) = vjp(2.0 * jnp.ones_like(x))
    np.testing.assert_allclose(gx, 2.0 * g_fast, atol=1e-6, rtol=1e-6)
