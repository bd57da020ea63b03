"""Golden-value and reference-parity tests for continuous tokenization."""

import importlib.util
import math
import os

import numpy as np
import pytest

from neko_tpu.config import TokenSpace
from neko_tpu.tokenizers import continuous as ct

REF = "/root/reference/gato/policy/input_tokenizers.py"


def _load_reference_tokenizer():
    torch = pytest.importorskip("torch")
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_input_tokenizers", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, torch


def test_mu_law_golden():
    # hand-computed: mu=100, M=256 -> log(1 + 25600) denominator
    x = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 10.0], np.float32)
    denom = math.log(1 + 100 * 256)
    expected = np.sign(x) * np.log1p(100 * np.abs(x)) / denom
    np.testing.assert_allclose(ct.mu_law_np(x), expected, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ct.mu_law(x)), expected, rtol=2e-5)


def test_encode_bins_no_mu_law():
    # (x + 1) * 512, truncating cast
    x = np.array([-1.0, -0.999, 0.0, 0.5, 0.999, 1.0], np.float32)
    got = ct.encode_np(x, use_mu_law=False, n_bins=1024, offset=0)
    expected = ((np.clip(x, -1, 1) + 1) * 512).astype(np.int32)
    np.testing.assert_array_equal(got, expected)
    # NOTE: x == 1.0 yields bin 1024 (one past the last bin) — reference
    # behaviour (input_tokenizers.py:24-25 has no bin clip).
    assert got[-1] == 1024
    clipped = ct.encode_np(x, use_mu_law=False, n_bins=1024, offset=0, clip_bins=True)
    assert clipped[-1] == 1023


def test_decode_round_trip_centers():
    # decode(encode(x)) lands on the lower edge of x's bin
    x = np.linspace(-0.99, 0.99, 101).astype(np.float32)
    toks = ct.encode_np(x, use_mu_law=False, n_bins=1024, offset=7)
    dec = ct.decode_np(toks, n_bins=1024, offset=7)
    assert np.all(np.abs(dec - x) <= 2.0 / 1024 + 1e-6)


def test_jnp_matches_np():
    rng = np.random.RandomState(0)
    x = rng.uniform(-50, 50, size=(17, 9)).astype(np.float32)
    for mu_law in (True, False):
        a = ct.encode_np(x, use_mu_law=mu_law, offset=100)
        b = np.asarray(ct.encode(x, use_mu_law=mu_law, offset=100))
        np.testing.assert_array_equal(a, b)


def test_parity_with_reference_implementation():
    """Bit-exact token parity against the actual reference code."""
    mod, torch = _load_reference_tokenizer()
    ts = TokenSpace()
    rng = np.random.RandomState(42)
    x = rng.uniform(-300, 300, size=(64, 11)).astype(np.float32)
    # also exercise exact boundary values
    x[0, :5] = [1.0, -1.0, 0.0, 256.0, -256.0]

    for use_mu_law, offset in [(True, ts.continuous_start), (False, ts.continuous_start)]:
        ref = mod.ContinuousTokenizer(
            use_mu_law=use_mu_law, mu=100, M=256, n_bins=1024, offset=offset
        )
        ref_tokens = ref.encode(torch.tensor(x)).numpy()
        got = ct.encode_np(x, use_mu_law=use_mu_law, offset=offset)
        np.testing.assert_array_equal(got, ref_tokens)

    # decode parity (action tokenizer only)
    toks = np.arange(0, 1024, 13, dtype=np.int32) + ts.continuous_start
    ref = mod.ContinuousTokenizer(
        use_mu_law=False, n_bins=1024, offset=ts.continuous_start
    )
    ref_dec = ref.decode(torch.tensor(toks)).numpy()
    got_dec = ct.decode_np(toks, n_bins=1024, offset=ts.continuous_start)
    np.testing.assert_allclose(got_dec, ref_dec, rtol=1e-6)


def test_token_space_layout():
    ts = TokenSpace()
    assert ts.vocab_size == 50257 + 1024 + 1024 == 52305
    assert ts.start("text") == 0 and ts.end("text") == 50256
    assert ts.start("continuous") == 50257 and ts.end("continuous") == 51280
    assert ts.start("discrete") == 51281 and ts.end("discrete") == 52304
    assert ts.separator_id == 52305
    assert ts.embed_rows == 52306
