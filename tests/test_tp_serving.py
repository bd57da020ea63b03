"""Tensor-parallel serving: Generator(mesh=...) shards params over 'model'
and produces the single-device results.

The reference has no distributed inference (its eval re-runs the whole
model per DDP rank); here one Generator serves a model sharded across
chips — params placed by the training pspecs, the KV cache and every
activation sharded by XLA SPMD propagation.  Runs on the conftest's
8-virtual-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference.generator import Generator
from neko_tpu.models.policy import NekoModel
from neko_tpu.parallel.mesh import create_mesh

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


@pytest.fixture(scope="module")
def setup():
    model = NekoModel(CFG)
    packer = SequencePacker(CFG)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return model, packer, params


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_generate_matches_single_device(setup, tp):
    model, packer, params = setup
    gen = Generator(model, params, packer)
    gen_tp = Generator(model, params, packer, mesh=create_mesh(model=tp))
    ts = CFG.token_space
    examples = [{"text": [5, 17, 99, 3]}, {"text": [88, 2, 41]}]
    out, logits = gen.generate_batch(
        examples, max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=True,
    )
    out_tp, logits_tp = gen_tp.generate_batch(
        examples, max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=True,
    )
    # TP changes only the contraction/reduction split; fp32 psum noise is
    # ~1e-6 of O(1) logits — far from flipping a greedy argmax here
    np.testing.assert_allclose(
        np.asarray(logits_tp), np.asarray(logits), atol=1e-4
    )
    assert np.asarray(out_tp).tolist() == np.asarray(out).tolist()


def test_tp_params_actually_sharded(setup):
    model, packer, params = setup
    mesh = create_mesh(model=4)
    gen_tp = Generator(model, params, packer, mesh=mesh)
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(gen_tp.params)
    }
    sharded = [
        k for k, v in flat.items()
        if any(s.spec != jax.sharding.PartitionSpec()
               for s in [v.sharding] if hasattr(v, "sharding"))
    ]
    assert any("c_attn" in k for k in sharded), sharded
    assert any("c_fc" in k for k in sharded)
    assert any("embed_token" in k for k in sharded)


def test_tp_composes_with_int8_kv_cache(setup):
    """TP sharding and int8 KV quantization stack: the int8 cache + scales
    shard on the head dim exactly like the native cache."""
    import dataclasses

    model, packer, params = setup
    cfg8 = dataclasses.replace(CFG, kv_cache_dtype="int8")
    gen8 = Generator(NekoModel(cfg8), params, packer)
    gen8_tp = Generator(
        NekoModel(cfg8), params, packer, mesh=create_mesh(model=2)
    )
    ts = CFG.token_space
    examples = [{"text": [5, 17, 99, 3]}, {"text": [88, 2, 41]}]
    (out,) = gen8.generate_batch(
        examples, max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    (out_tp,) = gen8_tp.generate_batch(
        examples, max_new_tokens=10,
        start=ts.start("text"), end=ts.end("text"), return_logits=False,
    )
    assert np.asarray(out_tp).tolist() == np.asarray(out).tolist()


def test_tp_predict_text(setup):
    model, packer, params = setup
    gen = Generator(model, params, packer)
    gen_tp = Generator(model, params, packer, mesh=create_mesh(model=2))
    prompt = [7, 3, 19, 55, 2]
    _, t_ref = gen.predict_text({"text": prompt}, max_length=6)
    _, t_tp = gen_tp.predict_text({"text": prompt}, max_length=6)
    assert [int(t) for t in t_tp] == [int(t) for t in t_ref]
