"""int8 KV-cache quantization (`ModelConfig.kv_cache_dtype='int8'`).

The decode/serving path is HBM-bandwidth-bound on the cache streams
(README "Roadmap"); storing symmetric per-row int8 + fp32 scales halves
the bytes read per token.  These tests pin (1) the quantized-attention
math against the exact path at the op level, (2) end-to-end generation
against the native-cache Generator, and (3) the rollout (extend-mode)
cache.  Reference has no cache at all (gato_policy.py:444-445 re-runs
the full context per token), so 'native' remains the bit-exact default.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference.generator import Generator
from neko_tpu.models.policy import NekoModel
from neko_tpu.models.transformer import (
    _dot_product_attention,
    _quant_cache_attention,
    _quant_rows,
)

CFG = ModelConfig(
    embed_dim=64,
    layers=2,
    heads=4,
    dropout=0.0,
    context_len=64,
    max_patches=0,
    dtype="float32",
    attention_impl="xla",
    text_tokens=128,
    continuous_tokens=64,
    discrete_tokens=64,
)


def test_quant_rows_roundtrip_error_bound():
    x = jax.random.normal(jax.random.key(0), (3, 5, 7, 32), jnp.float32) * 4.0
    q, s = _quant_rows(x)
    assert q.dtype == jnp.int8 and s.shape == x.shape[:-1]
    deq = q.astype(jnp.float32) * s[..., None]
    # symmetric row quant: |err| <= scale/2 = max|row|/254 per element
    bound = np.asarray(s) / 2.0 + 1e-7
    err = np.abs(np.asarray(deq) - np.asarray(x))
    assert (err <= bound[..., None]).all()
    # all-zero rows must quantize to zeros, not NaN/Inf
    q0, s0 = _quant_rows(jnp.zeros((2, 8)))
    assert not np.isnan(np.asarray(s0)).any()
    assert (np.asarray(q0) == 0).all()


def test_quant_cache_attention_matches_exact():
    key = jax.random.key(1)
    kq_, kk_, kv_ = jax.random.split(key, 3)
    B, H, Sq, Sk, hd = 2, 4, 1, 48, 32
    q = jax.random.normal(kq_, (B, H, Sq, hd), jnp.float32)
    k = jax.random.normal(kk_, (B, H, Sk, hd), jnp.float32)
    v = jax.random.normal(kv_, (B, H, Sk, hd), jnp.float32)
    bias = jnp.zeros((B, H, Sq, Sk), jnp.float32)
    exact = _dot_product_attention(q, k, v, bias, None, 0.0, True)
    kq8, ks = _quant_rows(k)
    vq8, vs = _quant_rows(v)
    approx = _quant_cache_attention(q, kq8, ks, vq8, vs, bias)
    # int8 per-row quant: ~0.2% rms per element; outputs are O(1)
    np.testing.assert_allclose(
        np.asarray(approx), np.asarray(exact), atol=5e-2
    )


def _make_generator(cfg):
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer), packer, params


def test_int8_generation_matches_native():
    """Greedy text generation: int8 cache follows the native-cache path.

    Same params, same prompt; the KV quantization perturbs logits by
    ~0.2% rms, so greedy argmax over a randomly-initialized (near-flat)
    logit landscape may legitimately flip on close calls — require >=
    90% token agreement and compare the first-step logits numerically.
    """
    gen, packer, params = _make_generator(CFG)
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    gen8 = Generator(NekoModel(cfg8), params, packer)
    ts = CFG.token_space
    prompt = [5, 17, 99, 3, 42, 8]
    out, logits = gen.generate_batch(
        [{"text": prompt}], max_new_tokens=12,
        start=ts.start("text"), end=ts.end("text"), return_logits=True,
    )
    out8, logits8 = gen8.generate_batch(
        [{"text": prompt}], max_new_tokens=12,
        start=ts.start("text"), end=ts.end("text"), return_logits=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits8[0, 0]), np.asarray(logits[0, 0]),
        atol=0.05 * float(np.abs(np.asarray(logits[0, 0])).max() + 1.0),
    )
    agree = (np.asarray(out) == np.asarray(out8)).mean()
    assert agree >= 0.9, f"token agreement {agree}"


def test_int8_generation_through_window_overflow():
    """int8 cache through the ring-overflow wrap: generation that overflows
    the context (token-granular cache ring, generator.py:_decode_scan_impl
    ring=True) stays in-range and tracks the native path."""
    gen, packer, params = _make_generator(CFG)
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    gen8 = Generator(NekoModel(cfg8), params, packer)
    ts = CFG.token_space
    prompt = list(range(5, 5 + CFG.context_len - 8))  # 8 free slots, then wrap
    n_new = 24
    (out,) = gen.generate_batch(
        [{"text": prompt}], max_new_tokens=n_new,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    (out8,) = gen8.generate_batch(
        [{"text": prompt}], max_new_tokens=n_new,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    a, b = np.asarray(out)[0], np.asarray(out8)[0]
    assert ((b >= ts.start("text")) & (b <= ts.end("text"))).all()
    # pre-wrap tokens should agree; post-wrap the quantized histories may
    # legitimately drift apart token-wise, but both must stay sane
    assert (a[:8] == b[:8]).mean() >= 0.9
    assert len(b) == n_new


def test_int8_cache_structure():
    """Prefill under kv_cache_dtype='int8' stores int8 keys/values plus
    fp32 per-row scales; the native config stores the activation dtype."""
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    gen8, packer, params = _make_generator(cfg8)
    emb, L, _ = gen8._pack_prompt({"text": [5, 17, 99]})
    mask = np.zeros((1, CFG.context_len), bool)
    mask[0, :L] = True
    _, cache = gen8._prefill(params, emb, jnp.asarray(mask))
    leaves = {
        jax.tree_util.keystr(path).rsplit("'", 2)[-2]: leaf
    for path, leaf in jax.tree_util.tree_leaves_with_path(cache)}
    assert leaves["key"].dtype == jnp.int8
    assert leaves["value"].dtype == jnp.int8
    assert leaves["key_scale"].dtype == jnp.float32
    assert leaves["value_scale"].dtype == jnp.float32
    assert leaves["key_scale"].shape == leaves["key"].shape[:-1]
