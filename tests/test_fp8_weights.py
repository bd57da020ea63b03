"""fp8 (e4m3) weight-only serving (`Generator(weight_dtype='fp8')`).

Decode streams every matmul kernel from HBM per generated token; fp8
weight storage halves those bytes on top of the bf16 serve-cast
(inference/quant.py).  These tests pin (1) the quantize/dequantize math
and its error bound, (2) the eligibility rules (matmul kernels only —
never the gathered embedding table, LayerNorms, or LoRA adapters),
(3) end-to-end generation against the unquantized Generator on every
decode discipline (plain scan, ring overflow, beam, speculative), and
(4) the TP sharding specs of a quantized tree.  The reference has no
quantized serving at all (full fp32 forwards per token,
gato_policy.py:434-470).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference import quant
from neko_tpu.inference.generator import Generator
from neko_tpu.models.policy import NekoModel

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


def _params(cfg, lora_r=0):
    if lora_r:
        cfg = dataclasses.replace(cfg, lora_r=lora_r)
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return model, packer, params


# ------------------------------------------------------------- quant math
def test_quantize_roundtrip_error_bound():
    """e4m3 with per-channel max scaling: relative error <= 2^-4 for
    elements within 2^9 of their channel max (the normal range of the
    scaled space); smaller elements get ABSOLUTE error <= the subnormal
    step of the channel (scale * 2^-9)."""
    key = jax.random.key(0)
    w = jax.random.normal(key, (128, 96), jnp.float32) * 3.0
    node = quant.quantize_weights({"m": {"kernel": w}})["m"]["kernel"]
    assert quant.is_quantized_leaf(node)
    assert node["q8"].dtype == jnp.float8_e4m3fn
    assert node["qscale"].shape == (96,)
    deq = np.asarray(
        quant.dequantize({"m": {"kernel": node}}, jnp.float32)["m"]["kernel"]
    )
    assert not np.isnan(deq).any()
    wf = np.asarray(w)
    scale = np.asarray(node["qscale"])
    err = np.abs(deq - wf)
    bound = np.maximum(np.abs(wf) * 2.0 ** -4, scale[None, :] * 2.0 ** -9)
    assert (err <= bound + 1e-12).all()


def test_quantize_channel_max_is_exact_and_finite():
    # the channel max maps to FP8_MAX exactly (the clip prevents the
    # e4m3fn overflow->nan trap); huge and tiny channels both survive
    w = jnp.zeros((64, 4), jnp.float32)
    w = w.at[0, 0].set(1e8).at[1, 1].set(1e-12).at[2, 2].set(-7.0)
    node = quant.quantize_weights({"m": {"kernel": w}})["m"]["kernel"]
    deq = np.asarray(
        quant.dequantize({"m": {"kernel": node}}, jnp.float32)["m"]["kernel"]
    )
    assert not np.isnan(deq).any() and np.isfinite(deq).all()
    np.testing.assert_allclose(deq[0, 0], 1e8, rtol=1e-6)
    np.testing.assert_allclose(deq[2, 2], -7.0, rtol=1e-6)
    # all-zero channel: scale floors at tiny, quantizes to zeros
    assert (deq[:, 3] == 0).all()


def test_eligibility_rules():
    """Only 2D matmul kernels quantize; the gathered embedding table,
    LayerNorm scale/bias, biases, and LoRA adapters stay untouched."""
    _, _, params = _params(CFG, lora_r=4)
    qp = quant.quantize_weights(params)
    assert not quant.is_quantized_leaf(qp["embed_token"]["embedding"])
    h0 = qp["transformer"]["h_0"]
    assert quant.is_quantized_leaf(h0["attn"]["c_attn"]["kernel"])
    assert quant.is_quantized_leaf(h0["mlp"]["c_fc"]["kernel"])
    assert quant.is_quantized_leaf(qp["predict_token"]["kernel"])
    assert not quant.is_quantized_leaf(h0["attn"]["lora_a"]["kernel"])
    assert not quant.is_quantized_leaf(h0["attn"]["lora_b"]["kernel"])
    assert not quant.is_quantized_leaf(h0["ln_1"]["scale"])
    assert not quant.is_quantized_leaf(h0["attn"]["c_attn"]["bias"])
    # dequantize restores the exact tree structure and shapes
    dq = quant.dequantize(qp, jnp.float32)
    assert jax.tree_util.tree_structure(dq) == jax.tree_util.tree_structure(
        params
    )
    for a, b in zip(jax.tree.leaves(dq), jax.tree.leaves(params)):
        assert a.shape == b.shape
    # idempotent on unquantized trees
    again = quant.dequantize(params, jnp.float32)
    assert jax.tree_util.tree_structure(again) == (
        jax.tree_util.tree_structure(params)
    )


# --------------------------------------------------------- generation e2e
def test_fp8_generation_matches_unquantized():
    """Greedy text generation under fp8 weights tracks the plain path.

    e4m3 perturbs each kernel by ~2-3% rms; on a randomly-initialized
    near-flat logit landscape greedy argmax may flip on close calls —
    require >= 85% token agreement and bounded first-step logit error."""
    model, packer, params = _params(CFG)
    gen = Generator(model, params, packer)
    gen8 = Generator(model, params, packer, weight_dtype="fp8")
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
        atol=0.15 * float(np.abs(np.asarray(logits[0, 0])).max() + 1.0),
    )
    agree = (np.asarray(out) == np.asarray(out8)).mean()
    assert agree >= 0.85, f"token agreement {agree}"


def test_fp8_through_window_overflow():
    """fp8 weights through the ring-overflow wrap (generator.py
    _decode_scan_impl ring=True): in-range, full length, sane."""
    model, packer, params = _params(CFG)
    gen8 = Generator(model, params, packer, weight_dtype="fp8")
    ts = CFG.token_space
    prompt = list(range(5, 5 + CFG.context_len - 8))
    (out8,) = gen8.generate_batch(
        [{"text": prompt}], max_new_tokens=24,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    b = np.asarray(out8)[0]
    assert ((b >= ts.start("text")) & (b <= ts.end("text"))).all()
    assert len(b) == 24


def test_fp8_composes_with_int8_kv_cache():
    model, packer, params = _params(CFG)
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    gen = Generator(model, params, packer)
    genq = Generator(NekoModel(cfg8), params, packer, weight_dtype="fp8")
    ts = CFG.token_space
    prompt = [5, 17, 99, 3, 42, 8]
    (out,) = gen.generate_batch(
        [{"text": prompt}], max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    (outq,) = genq.generate_batch(
        [{"text": prompt}], max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    a, b = np.asarray(out)[0], np.asarray(outq)[0]
    assert ((b >= ts.start("text")) & (b <= ts.end("text"))).all()
    assert (a == b).mean() >= 0.7  # both quantizations stacked


def test_fp8_beam_search_matches():
    model, packer, params = _params(CFG)
    gen = Generator(model, params, packer)
    gen8 = Generator(model, params, packer, weight_dtype="fp8")
    ts = CFG.token_space
    prompt = [5, 17, 99, 3]
    toks, scores = gen.generate_beam(
        [{"text": prompt}], max_new_tokens=6, num_beams=3,
        start=ts.start("text"), end=ts.end("text"),
    )
    toks8, scores8 = gen8.generate_beam(
        [{"text": prompt}], max_new_tokens=6, num_beams=3,
        start=ts.start("text"), end=ts.end("text"),
    )
    assert toks8.shape == toks.shape
    # top beam should usually survive the quantization
    agree = (np.asarray(toks[0, 0]) == np.asarray(toks8[0, 0])).mean()
    assert agree >= 0.5
    np.testing.assert_allclose(
        np.asarray(scores8[0, 0]), np.asarray(scores[0, 0]), atol=0.5
    )


def test_fp8_speculative_decode_lossless_vs_its_own_greedy():
    """Spec decode under fp8 must equal PLAIN fp8 greedy token-for-token
    (the lossless invariant is within-engine, whatever the weights)."""
    model, packer, params = _params(CFG)
    gen8 = Generator(model, params, packer, weight_dtype="fp8")
    ts = CFG.token_space
    prompt = [7, 8, 9, 7, 8, 9, 7, 8]
    (plain,) = gen8.generate_batch(
        [{"text": prompt}], max_new_tokens=16,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    spec = gen8.generate_spec(
        [{"text": prompt}], max_new_tokens=16,
        start=ts.start("text"), end=ts.end("text"),
    )[0]
    np.testing.assert_array_equal(np.asarray(plain)[0], np.asarray(spec)[0])


# --------------------------------------------------------------- sharding
def test_quant_shardings_specs():
    """q8 keeps the kernel's TP spec; qscale inherits its LAST-dim entry
    (sharded for column-parallel kernels, replicated for row-parallel)."""
    from jax.sharding import PartitionSpec as P

    from neko_tpu.parallel.mesh import create_mesh

    _, _, params = _params(CFG)
    qp = quant.quantize_weights(params)
    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    sh = quant.quant_shardings(mesh, qp)
    h0 = sh["transformer"]["h_0"]
    assert h0["attn"]["c_attn"]["kernel"]["q8"].spec == P(None, "model")
    assert h0["attn"]["c_attn"]["kernel"]["qscale"].spec == P("model")
    assert h0["attn"]["c_proj"]["kernel"]["q8"].spec == P("model", None)
    assert h0["attn"]["c_proj"]["kernel"]["qscale"].spec == P()
    assert sh["predict_token"]["kernel"]["q8"].spec == P(None, "model")
    assert sh["predict_token"]["kernel"]["qscale"].spec == P("model")
    # unquantized leaves keep the plain rules
    assert sh["embed_token"]["embedding"].spec == P("model", None)
    assert h0["ln_1"]["scale"].spec == P()


def test_fp8_tp_serving_generates():
    """fp8 + tensor-parallel mesh: quantized leaves device_put by
    quant_shardings, generation runs and stays in range."""
    from neko_tpu.parallel.mesh import create_mesh

    model, packer, params = _params(CFG)
    mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
    gen8 = Generator(model, params, packer, mesh=mesh, weight_dtype="fp8")
    ts = CFG.token_space
    (out,) = gen8.generate_batch(
        [{"text": [5, 17, 99, 3]}], max_new_tokens=8,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    b = np.asarray(out)[0]
    assert ((b >= ts.start("text")) & (b <= ts.end("text"))).all()
