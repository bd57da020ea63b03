"""Native C packing kernel: availability + bit-parity with the numpy path."""

import numpy as np
import pytest

from neko_tpu import native
from neko_tpu.config import ModelConfig
from neko_tpu.data.packing import SequencePacker

CFG = ModelConfig(
    embed_dim=32, layers=1, heads=2, context_len=512, max_patches=0,
    text_tokens=256, continuous_tokens=64, discrete_tokens=64,
)


def numpy_packer():
    p = SequencePacker(CFG)
    p._pack_control_native = lambda ex: None  # force numpy path
    return p


@pytest.fixture(scope="module")
def clib():
    L = native.lib()
    if L is None:
        pytest.skip("no C toolchain available")
    return L


@pytest.mark.parametrize(
    "example",
    [
        {
            "continuous_obs": "randn:12x8",
            "continuous_actions": "tanh:12x3",
        },
        {
            "continuous_obs": "bigrandn:7x5",
            "discrete_actions": "randint:7x1",
        },
        {
            "discrete_obs": "randint:9x2",
            "discrete_actions": "randint:9x1",
        },
    ],
)
def test_native_matches_numpy(clib, example):
    rng = np.random.RandomState(0)

    def mk(spec):
        kind, shape = spec.split(":")
        t, d = (int(x) for x in shape.split("x"))
        if kind == "randn":
            return rng.randn(t, d).astype(np.float32)
        if kind == "bigrandn":
            return (rng.randn(t, d) * 100).astype(np.float32)
        if kind == "tanh":
            x = np.tanh(rng.randn(t, d)).astype(np.float32)
            x[0, 0] = 1.0   # exercise the unclipped top-bin edge case
            x[0, -1] = -1.0
            return x
        return rng.randint(0, 50, (t, d)).astype(np.int32)

    ex = {k: mk(v) for k, v in example.items()}

    fast = SequencePacker(CFG).pack_example(ex)
    ref = numpy_packer().pack_example(ex)
    np.testing.assert_array_equal(fast.tokens, ref.tokens)
    np.testing.assert_array_equal(fast.target_mask, ref.target_mask)
    np.testing.assert_array_equal(fast.inner_pos, ref.inner_pos)


def test_native_used_for_control_examples(clib):
    """The fast path actually engages (returns non-None)."""
    p = SequencePacker(CFG)
    ex = {
        "continuous_obs": np.zeros((3, 2), np.float32),
        "continuous_actions": np.zeros((3, 1), np.float32),
    }
    assert p._pack_control_native(ex) is not None
    # but not for examples with text or images
    assert p._pack_control_native({"text": [1, 2]}) is None


def test_native_speedup_smoke(clib):
    """Native path should not be slower than numpy on a realistic episode."""
    import time

    p_fast = SequencePacker(CFG)
    p_np = numpy_packer()
    ex = {
        "continuous_obs": np.random.randn(21, 17).astype(np.float32),
        "continuous_actions": np.random.randn(21, 6).astype(np.float32),
    }
    for p in (p_fast, p_np):
        p.pack_example(ex)  # warm
    t0 = time.perf_counter()
    for _ in range(200):
        p_fast.pack_example(ex)
    fast = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        p_np.pack_example(ex)
    slow = time.perf_counter() - t0
    assert fast < slow * 1.5, (fast, slow)
