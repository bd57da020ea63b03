"""Blocked flash attention (ops/blocked_attention.py).

On CPU the pallas_calls run in interpret mode (exact fp32), so the ALGORITHM
is verified in the default suite; TPU runs (NEKO_TEST_TPU=1, see
tests/test_attention_tpu.py::test_blocked_*) verify the Mosaic lowering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neko_tpu.ops.attention import xla_attention
from neko_tpu.ops.attention_kernel import mask_bounds_from_key_mask
from neko_tpu.ops.blocked_attention import blocked_attention_bsd, supported


def test_supported_predicate():
    assert supported(2048, 32, 24)
    assert supported(1024, 32, 8)
    assert supported(8192, 64, 8)
    assert not supported(16384, 64, 8)      # beyond the TPU-verified VMEM cap
    assert not supported(1000, 32, 24)      # not block-divisible
    assert not supported(32768, 32, 24)     # beyond cap
    assert not supported(2048, 32, 6)       # heads not lane-groupable


def _setup(B, H, S, hd, seed=1):
    D = H * hd
    rng = np.random.RandomState(seed)
    q2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    k2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    v2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, : S // 10] = False           # left pad
    if B > 1:
        mask[1, S - S // 20 :] = False   # right pad
    km = jnp.asarray(mask)
    return q2, k2, v2, km


def _to_bhsd(x, H, hd):
    B, S, D = x.shape
    return x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)


def _to_bsd(x):
    B, H, S, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * hd)


_on_tpu = jax.devices()[0].platform in ("tpu", "axon")


@pytest.mark.skipif(
    _on_tpu, reason="fp32-exact comparison is for interpret mode (CPU); the "
    "TPU (bf16 MXU) variant is test_blocked_matches_xla_tpu",
)
def test_blocked_matches_xla_exact():
    """Interpret-mode fp32: the blocked online-softmax algorithm must equal
    plain XLA attention to float rounding (~1e-5), fwd and grads."""
    B, H, S, hd = 2, 4, 1024, 32
    q2, k2, v2, km = _setup(B, H, S, hd)
    start, end = mask_bounds_from_key_mask(km)
    w = km[:, :, None].astype(jnp.float32)

    def ref(q2, k2, v2):
        return _to_bsd(
            xla_attention(
                _to_bhsd(q2, H, hd), _to_bhsd(k2, H, hd), _to_bhsd(v2, H, hd), km
            )
        )

    def new(q2, k2, v2):
        return blocked_attention_bsd(q2, k2, v2, start, end, heads=H)

    with jax.default_matmul_precision("highest"):
        a = ref(q2, k2, v2)
        b = new(q2, k2, v2)
        np.testing.assert_allclose(
            np.asarray(a * w), np.asarray(b * w), atol=1e-5
        )
        ga = jax.grad(
            lambda *xs: ((ref(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
        )(q2, k2, v2)
        gb = jax.grad(
            lambda *xs: ((new(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
        )(q2, k2, v2)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-4
        )


@pytest.mark.skipif(
    _on_tpu, reason="fp32-exact comparison is for interpret mode (CPU)"
)
def test_fused_backward_matches_three_pass(monkeypatch):
    """The round-5 fused single-pass backward (dq+dk+dv in one banded
    sweep, VMEM-resident accumulators) computes the SAME gradients as the
    original three-pass scheme it replaced for S <= FUSED_MAX."""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 1024, 32
    q2, k2, v2, km = _setup(B, H, S, hd)
    start, end = mask_bounds_from_key_mask(km)
    w = km[:, :, None].astype(jnp.float32)

    def loss(q2, k2, v2):
        out = blocked_attention_bsd(q2, k2, v2, start, end, heads=H)
        return ((out * w) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
        monkeypatch.setattr(ba, "FUSED_MAX", 0)  # force the 3-pass path
        g_3pass = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(g_fused, g_3pass):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(
    _on_tpu, reason="fp32-exact comparison is for interpret mode (CPU)"
)
def test_tall_fwd_qblock_bit_exact(monkeypatch):
    """FWD_QBLOCK = 2*BLOCK (taller fwd q tiles, fewer per-tile overheads)
    must be BIT-identical to the default: blocking along q never changes a
    row's online-softmax accumulation order, and the bwd kernels are
    untouched.  (Dropout-stream parity is chip-tested:
    test_attention_tpu.py exercises the logical-(BLOCK,BLOCK) mask grid.)"""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 2048, 32
    q2, k2, v2, km = _setup(B, H, S, hd, seed=3)
    start, end = mask_bounds_from_key_mask(km)
    w = km[:, :, None].astype(jnp.float32)

    def loss(q2, k2, v2):
        out = blocked_attention_bsd(q2, k2, v2, start, end, heads=H)
        return ((out * w) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        a = blocked_attention_bsd(q2, k2, v2, start, end, heads=H)
        ga = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
        monkeypatch.setattr(ba, "FWD_QBLOCK", 1024)
        b = blocked_attention_bsd(q2, k2, v2, start, end, heads=H)
        gb = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
    assert float(jnp.max(jnp.abs((a - b) * w))) == 0.0
    for x, y in zip(ga, gb):
        assert float(jnp.max(jnp.abs(x - y))) == 0.0


@pytest.mark.skipif(
    _on_tpu, reason="dispatch-structure check; interpret mode is enough"
)
def test_fused_gate_serves_all_shapes_to_cap(monkeypatch):
    """Dispatch structure: the fused backward serves every S <= FUSED_MAX
    including S=4096 + dropout (the q-row sub-tiled variant fixed the
    round-5 Mosaic VMEM crash — runs/blocked_variants_r5_s4096_qsub.json);
    beyond FUSED_MAX the three-pass scheme takes over."""
    import neko_tpu.ops.blocked_attention as ba

    calls = []
    real = ba._pallas_bwd_fused

    def spy(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(ba, "_pallas_bwd_fused", spy)
    B, H, hd = 1, 4, 32
    seed = jnp.asarray([5], jnp.int32)

    def grad_at(S, rate):
        D = H * hd
        rng = np.random.RandomState(0)
        q2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
        start = jnp.zeros((B,), jnp.int32)
        end = jnp.full((B,), S, jnp.int32)

        def loss(q2):
            out = blocked_attention_bsd(
                q2, q2, q2, start, end, seed, heads=H, dropout_rate=rate
            )
            return (out ** 2).sum()

        calls.clear()
        jax.eval_shape(jax.grad(loss), q2)  # trace only: routing, no FLOPs
        return bool(calls)

    assert grad_at(2048, 0.1)        # fused serves S=2048 with dropout
    assert grad_at(4096, 0.0)        # ... and S=4096 without
    assert grad_at(4096, 0.1)        # ... and S=4096 WITH (q_sub=2)
    assert not grad_at(8192, 0.0)    # beyond FUSED_MAX -> three-pass


@pytest.mark.skipif(not _on_tpu, reason="needs a TPU (set NEKO_TEST_TPU=1)")
def test_fused_backward_matches_three_pass_dropout_tpu(monkeypatch):
    """Fused vs 3-pass backward WITH dropout on the real chip: both paths
    slice the identical `_keep_scale_blk` PRNG stream, so the gradients
    must agree to accumulation-order tolerance."""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 1024, 32
    rate = 0.25
    q2, k2, v2, km = _setup(B, H, S, hd, seed=11)
    start, end = mask_bounds_from_key_mask(km)
    seed = jnp.asarray([31], jnp.int32)
    w = km[:, :, None].astype(jnp.float32)

    def loss(q2, k2, v2):
        out = blocked_attention_bsd(
            q2, k2, v2, start, end, seed, heads=H, dropout_rate=rate
        )
        return ((out * w) ** 2).sum()

    g_fused = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q2, k2, v2)
    monkeypatch.setattr(ba, "FUSED_MAX", 0)  # force the 3-pass path
    g_3pass = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q2, k2, v2)
    for a, b in zip(g_fused, g_3pass):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=2e-2 * scale)


@pytest.mark.skipif(
    _on_tpu, reason="fp32-exact comparison is for interpret mode (CPU)"
)
def test_fused_backward_qsub_structure(monkeypatch):
    """q-row sub-tiling of the fused backward (q_sub=2, the S=4096+dropout
    VMEM workaround) restructures every (Bq, Bk) tile into two half-row
    sweeps; without dropout the math per row is identical, so gradients
    must match the full-tile fused path to fp32 accumulation-order
    tolerance.  (The dropout mask slice is chip-tested:
    test_fused_qsub_dropout_tpu — pltpu PRNG has no interpret mode.)"""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 1024, 32
    q2, k2, v2, km = _setup(B, H, S, hd, seed=7)
    start, end = mask_bounds_from_key_mask(km)
    w = km[:, :, None].astype(jnp.float32)

    def loss(q2, k2, v2):
        out = blocked_attention_bsd(q2, k2, v2, start, end, heads=H)
        return ((out * w) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g_full = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
        monkeypatch.setattr(ba, "FUSED_QSUB", 2)
        g_sub = jax.grad(loss, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(g_full, g_sub):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(not _on_tpu, reason="needs a TPU (set NEKO_TEST_TPU=1)")
def test_fused_qsub_dropout_tpu(monkeypatch):
    """The sub-tiled fused backward under dropout slices each logical
    (BLOCK, Bk) mask tile by rows (_keep_scale_rows draws the full tile's
    PRNG stream and slices statically), so its gradients must match the
    three-pass scheme — which regenerates the same per-tile masks — to
    accumulation-order tolerance."""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 1024, 32
    rate = 0.25
    q2, k2, v2, km = _setup(B, H, S, hd, seed=13)
    start, end = mask_bounds_from_key_mask(km)
    seed = jnp.asarray([37], jnp.int32)
    w = km[:, :, None].astype(jnp.float32)

    def loss(q2, k2, v2):
        out = blocked_attention_bsd(
            q2, k2, v2, start, end, seed, heads=H, dropout_rate=rate
        )
        return ((out * w) ** 2).sum()

    monkeypatch.setattr(ba, "FUSED_QSUB", 2)
    g_sub = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q2, k2, v2)
    monkeypatch.setattr(ba, "FUSED_QSUB", None)
    monkeypatch.setattr(ba, "FUSED_MAX", 0)  # force the 3-pass path
    g_3pass = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q2, k2, v2)
    for a, b in zip(g_sub, g_3pass):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=2e-2 * scale)


@pytest.mark.skipif(not _on_tpu, reason="needs a TPU (set NEKO_TEST_TPU=1)")
def test_tall_fwd_qblock_dropout_stream_tpu(monkeypatch):
    """FWD_QBLOCK with dropout on the real chip: the tall fwd block builds
    its keep mask from stacked (BLOCK, BLOCK) logical tiles, so its output
    must EQUAL the default fwd (identical PRNG stream), and the backward
    (which regenerates per-(BLOCK,BLOCK) masks independently) must match
    the default path's gradients."""
    import neko_tpu.ops.blocked_attention as ba

    B, H, S, hd = 2, 4, 2048, 32
    rate = 0.2
    q2, k2, v2, km = _setup(B, H, S, hd, seed=17)
    start, end = mask_bounds_from_key_mask(km)
    seed = jnp.asarray([23], jnp.int32)
    w = km[:, :, None].astype(jnp.float32)

    def fwd(q2):
        return blocked_attention_bsd(
            q2, k2, v2, start, end, seed, heads=H, dropout_rate=rate
        )

    def loss(q2):
        return ((fwd(q2) * w) ** 2).sum()

    a = jax.jit(fwd)(q2)
    ga = jax.jit(jax.grad(loss))(q2)
    monkeypatch.setattr(ba, "FWD_QBLOCK", 1024)
    b = jax.jit(fwd)(q2)
    gb = jax.jit(jax.grad(loss))(q2)
    np.testing.assert_allclose(
        np.asarray(a * w), np.asarray(b * w), atol=1e-6
    )
    sc = max(np.abs(np.asarray(ga)).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), atol=1e-4 * sc
    )


@pytest.mark.skipif(not _on_tpu, reason="needs a TPU (set NEKO_TEST_TPU=1)")
def test_blocked_matches_xla_tpu():
    """Real-chip Mosaic lowering at S=2048: bf16-MXU-pass tolerances."""
    B, H, S, hd = 2, 8, 2048, 32
    q2, k2, v2, km = _setup(B, H, S, hd)
    start, end = mask_bounds_from_key_mask(km)
    w = km[:, :, None].astype(jnp.float32)

    def ref(q2, k2, v2):
        return _to_bsd(
            xla_attention(
                _to_bhsd(q2, H, hd), _to_bhsd(k2, H, hd), _to_bhsd(v2, H, hd), km
            )
        )

    def new(q2, k2, v2):
        return blocked_attention_bsd(q2, k2, v2, start, end, heads=H)

    with jax.default_matmul_precision("default"):
        a = jax.jit(ref)(q2, k2, v2)
    b = jax.jit(new)(q2, k2, v2)
    np.testing.assert_allclose(
        np.asarray(a * w), np.asarray(b * w), atol=2e-2
    )
    gb = jax.jit(jax.grad(
        lambda *xs: ((new(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
    ))(q2, k2, v2)
    with jax.default_matmul_precision("default"):
        ga = jax.jit(jax.grad(
            lambda *xs: ((ref(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
        ))(q2, k2, v2)
    for x, y in zip(ga, gb):
        scale_ref = np.abs(np.asarray(x)).max()
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), atol=8e-3 * max(scale_ref, 1.0)
        )


@pytest.mark.skipif(
    not _on_tpu,
    reason="pltpu PRNG has no interpret-mode implementation (needs a TPU)",
)
def test_blocked_dropout_matches_exported_mask():
    """Dropout fwd/bwd must equal an XLA attention applying the IDENTICAL
    keep/scale matrices (exported via dropout_keep_scale)."""
    from neko_tpu.ops.blocked_attention import dropout_keep_scale

    B, H, S, hd = 1, 2, 1024, 32
    rate = 0.25
    q2, k2, v2, km = _setup(B, H, S, hd, seed=3)
    start, end = mask_bounds_from_key_mask(km)
    seed = jnp.asarray([29], jnp.int32)
    w = km[:, :, None].astype(jnp.float32)
    ks = dropout_keep_scale(seed, B, H, S, rate)
    scale = hd ** -0.5

    def ref(q2, k2, v2):
        q = _to_bhsd(q2, H, hd)
        k = _to_bhsd(k2, H, hd)
        v = _to_bhsd(v2, H, hd)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
        allowed = causal[None, None] & km[:, None, None, :]
        logits = jnp.where(allowed, logits, -1e9)
        p = jax.nn.softmax(logits, axis=-1) * ks
        return _to_bsd(jnp.einsum("bhqk,bhkd->bhqd", p, v))

    def new(q2, k2, v2):
        return blocked_attention_bsd(
            q2, k2, v2, start, end, seed, heads=H, dropout_rate=rate
        )

    with jax.default_matmul_precision("default"):
        a = jax.jit(ref)(q2, k2, v2)
    b = jax.jit(new)(q2, k2, v2)
    np.testing.assert_allclose(
        np.asarray(a * w), np.asarray(b * w), atol=2e-2
    )
    gb = jax.jit(jax.grad(
        lambda *xs: ((new(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
    ))(q2, k2, v2)
    with jax.default_matmul_precision("default"):
        ga = jax.jit(jax.grad(
            lambda *xs: ((ref(*xs) * w) ** 2).sum(), argnums=(0, 1, 2)
        ))(q2, k2, v2)
    # tolerance note: rows whose softmax is (near-)one-hot — e.g. the first
    # valid row after left-padding, which can only attend itself — have a
    # true gradient that is an exact cancellation (dp - delta == 0).  The
    # kernel computes dp on the bf16 MXU while delta comes from fp32 XLA
    # (the standard flash-attention bwd split), so the cancellation leaves
    # a bf16-rounding residue ~1e-2 relative; same behaviour as the official
    # flash kernels.
    for x, y in zip(ga, gb):
        scale_ref = np.abs(np.asarray(x)).max()
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=4e-2 * max(scale_ref, 1.0)
        )
