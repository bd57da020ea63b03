"""Draft-model speculative decoding (`Generator.generate_spec_draft`).

The classic two-model scheme (Leviathan/Chen): a small draft proposes K
tokens per round from its own KV cache, the target verifies K+1 in one
extend_step with the exact min(1, p/q) rejection rule and the (p-q)+
residual.  These tests pin:

* greedy LOSSLESSNESS against plain decoding for an INDEPENDENT draft
  (acceptance incidental) and a SELF-draft (acceptance ~K, so rounds
  collapse — the speedup mechanism);
* sampled-mode marginal preservation (TV distance vs plain categorical
  sampling, the strongest check of the residual rule — unlike the
  prompt-lookup point-mass case, q here is a full distribution);
* batched rows, mixed-width models, knob warps.

The reference has no speculative decoding or serving of any kind
(gato_policy.py:434-470 re-runs full forwards per token).
"""

import numpy as np
import pytest

import jax

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.inference.generator import Generator
from neko_tpu.models.policy import NekoModel


def _make(embed_dim, layers, heads, seed):
    cfg = ModelConfig(
        embed_dim=embed_dim, layers=layers, heads=heads, dropout=0.0,
        context_len=64, max_patches=0, dtype="float32",
        attention_impl="xla", text_tokens=128, continuous_tokens=64,
        discrete_tokens=64,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(seed)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer, seed=seed + 100)


@pytest.fixture(scope="module")
def tgt():
    return _make(64, 2, 4, 0)


@pytest.fixture(scope="module")
def drf():
    # narrower AND shallower than the target, independent init — the
    # realistic draft shape
    return _make(32, 1, 2, 7)


def _plain(gen, prompt, n, s, e):
    (toks,) = gen.generate_batch(
        [prompt], max_new_tokens=n, start=s, end=e, return_logits=False,
    )
    return list(np.asarray(toks)[0])


@pytest.mark.parametrize("prompt,k", [
    ({"text": [5, 17, 99, 3, 42, 8]}, 4),
    ({"text": [7, 7, 7, 7]}, 2),
    ({"text": [1]}, 6),
])
def test_greedy_lossless_independent_draft(tgt, drf, prompt, k):
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    plain = _plain(tgt, prompt, 16, s, e)
    toks, rounds = tgt.generate_spec_draft(
        prompt, drf, max_new_tokens=16, start=s, end=e, speculate_k=k,
    )
    assert list(toks) == plain
    assert rounds >= 1


def test_self_draft_collapses_rounds(tgt):
    """Draft == target: every proposal verifies, so 16 tokens need
    ceil(16 / (K+1)) rounds — the acceptance mechanism works end to
    end (and stays lossless)."""
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    prompt = {"text": [5, 17, 99, 3, 42, 8]}
    plain = _plain(tgt, prompt, 16, s, e)
    self_draft = Generator(tgt.model, tgt.params, tgt.packer)
    toks, rounds = tgt.generate_spec_draft(
        prompt, self_draft, max_new_tokens=16, start=s, end=e,
        speculate_k=4,
    )
    assert list(toks) == plain
    assert rounds <= 5  # 16 tokens / 5-per-round, +1 slack for ties


def test_batched_matches_singles(tgt, drf):
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    prompts = [
        {"text": [5, 17, 99]},
        {"text": [8, 8, 8, 8, 8]},
        {"text": [3]},
    ]
    toks, _ = tgt.generate_spec_draft(
        prompts, drf, max_new_tokens=10, start=s, end=e, speculate_k=3,
    )
    for i, p in enumerate(prompts):
        single, _ = tgt.generate_spec_draft(
            p, drf, max_new_tokens=10, start=s, end=e, speculate_k=3,
        )
        np.testing.assert_array_equal(toks[i], single)
        assert list(single) == _plain(tgt, p, 10, s, e)


def test_sampled_matches_plain_distribution(tgt, drf):
    """The full p/q rejection + (p-q)+ residual preserves the target
    distribution: per-position marginals of draft-spec sampling equal
    plain categorical sampling's (TV distance over a 64-token window).
    This is the sharpest test of the residual carry — the draft's q is a
    real distribution here, not a point mass."""
    ts = tgt.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    W = end - start + 1
    N, R, T = 192, 8, 3
    prompts = [{"text": [7, 8, 7, 8]}] * N

    def marginals(fn):
        counts = np.zeros((T, W), np.int64)
        for r in range(R):
            toks = fn(jax.random.key(2000 + r))
            for t in range(T):
                counts[t] += np.bincount(toks[:, t] - start, minlength=W)
        return counts / counts.sum(axis=1, keepdims=True)

    p_spec = marginals(lambda k: np.asarray(tgt.generate_spec_draft(
        prompts, drf, max_new_tokens=T, start=start, end=end,
        speculate_k=2, deterministic=False, rng=k,
    )[0]))
    p_plain = marginals(lambda k: np.asarray(tgt.generate_batch(
        prompts, max_new_tokens=T, start=start, end=end,
        deterministic=False, rng=k, return_logits=False,
    )[0]))
    tv = 0.5 * np.abs(p_spec - p_plain).sum(axis=1)
    assert (tv < 0.1).all(), f"per-position TV distances {tv}"


def test_sampled_tiny_temperature_equals_greedy(tgt, drf):
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    greedy, _ = tgt.generate_spec_draft(
        {"text": [5, 9, 2]}, drf, max_new_tokens=8, start=s, end=e,
    )
    sampled, _ = tgt.generate_spec_draft(
        {"text": [5, 9, 2]}, drf, max_new_tokens=8, start=s, end=e,
        deterministic=False, temperature=1e-4, rng=jax.random.key(3),
    )
    np.testing.assert_array_equal(greedy, sampled)


def test_token_space_mismatch_rejected(tgt):
    cfg = ModelConfig(
        embed_dim=32, layers=1, heads=2, dropout=0.0, context_len=64,
        max_patches=0, dtype="float32", attention_impl="xla",
        text_tokens=64, continuous_tokens=64, discrete_tokens=64,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(1)}, to_device_batch(arrays)
    )["params"]
    bad = Generator(model, params, packer)
    ts = tgt.cfg.token_space
    with pytest.raises(AssertionError, match="token space"):
        tgt.generate_spec_draft(
            {"text": [1, 2]}, bad, max_new_tokens=4,
            start=ts.start("text"), end=ts.end("text"),
        )


# ------------------------------------------------------------- HTTP layer
def test_served_draft_speculation(tgt, drf):
    """speculative:true prefers the loaded draft; 'lookup' forces the
    draft-free path; 'draft' without a draft loaded is a client error."""
    import json
    import urllib.request

    from neko_tpu.serving.server import NekoServer

    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    prompt = [5, 17, 99, 3]
    direct, _ = tgt.generate_spec_draft(
        {"text": prompt}, drf, max_new_tokens=8, start=s, end=e,
        speculate_k=3,
    )

    def post(srv, payload):
        host, port = srv.address[0], srv.address[1]
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as err:
            return err.code, json.loads(err.read())

    with NekoServer(tgt, port=0, draft_generator=drf) as srv:
        code, body = post(srv, {
            "text": prompt, "max_new_tokens": 8, "speculative": True,
            "speculate_k": 3,
        })
        assert code == 200
        assert body["tokens"] == [int(t) - s for t in direct]
        # forcing lookup still answers (and is lossless, hence identical
        # greedy tokens)
        code, body2 = post(srv, {
            "text": prompt, "max_new_tokens": 8, "speculative": "lookup",
            "speculate_k": 3,
        })
        assert code == 200 and body2["tokens"] == body["tokens"]
    with NekoServer(tgt, port=0) as srv:
        code, body = post(srv, {
            "text": prompt, "max_new_tokens": 8, "speculative": "draft",
        })
        assert code == 400 and "draft" in body["error"]


def test_truncated_self_draft_is_lossless(tgt):
    """Layer-truncated self-draft (no extra weights): still lossless."""
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    prompt = {"text": [5, 17, 99, 3, 42, 8]}
    plain = _plain(tgt, prompt, 12, s, e)
    draft = tgt.truncated_draft(1)
    assert draft.cfg.layers == 1
    toks, rounds = tgt.generate_spec_draft(
        prompt, draft, max_new_tokens=12, start=s, end=e, speculate_k=3,
    )
    assert list(toks) == plain


def test_truncated_draft_composes_with_fp8(tgt):
    """truncated_draft of an fp8-serving target reuses the quantized
    leaves; generation stays lossless within the fp8 engine."""
    gen8 = Generator(tgt.model, tgt.params, tgt.packer, weight_dtype="fp8")
    ts = tgt.cfg.token_space
    s, e = ts.start("text"), ts.end("text")
    prompt = {"text": [5, 17, 99, 3]}
    plain = _plain(gen8, prompt, 10, s, e)
    draft = gen8.truncated_draft(1)
    toks, _ = gen8.generate_spec_draft(
        prompt, draft, max_new_tokens=10, start=s, end=e, speculate_k=3,
    )
    assert list(toks) == plain
