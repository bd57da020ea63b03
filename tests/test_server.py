"""HTTP serving layer (neko_tpu/serving/server.py): JSON API over the
KV-cache Generator with micro-batched request coalescing.

The reference has a serving Docker image but NO server code; these tests pin
the new surface: real HTTP round-trips, batching of concurrent compatible
requests into one generate_batch call, parity of batched responses with
direct Generator calls, and error isolation."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from neko_tpu.inference.generator import Generator
from neko_tpu.serving.server import NekoServer


@pytest.fixture(scope="module")
def gen():
    from neko_tpu.config import ModelConfig
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker

    cfg = ModelConfig(
        embed_dim=32, layers=2, heads=2, dropout=0.0, context_len=64,
        max_patches=4, patch_size=16, dtype="float32", attention_impl="xla",
        text_tokens=128, continuous_tokens=32, discrete_tokens=16,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer, seed=11)


@pytest.fixture(scope="module")
def server(gen):
    with NekoServer(gen, port=0, max_batch=4, batch_window_ms=30.0) as s:
        yield s


def _url(server, path):
    host, port = server.address[0], server.address[1]
    return f"http://{host}:{port}{path}"


def _post(server, path, payload):
    req = urllib.request.Request(
        _url(server, path), data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server, gen):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200
    assert body["status"] == "ok"
    assert body["model"]["embed_dim"] == gen.cfg.embed_dim


def test_generate_matches_direct(server, gen):
    code, body = _post(server, "/v1/generate",
                       {"text": [5, 6, 7], "max_new_tokens": 6})
    assert code == 200
    ts = gen.cfg.token_space
    direct, _ = gen.generate_batch(
        [{"text": [5, 6, 7]}], max_new_tokens=6,
        start=ts.start("text"), end=ts.end("text"),
    )
    assert body["tokens"] == (direct[0] - ts.start("text")).tolist()


def test_generate_beam_via_http(server, gen):
    code, body = _post(server, "/v1/generate",
                       {"text": [9, 2], "max_new_tokens": 4, "num_beams": 3})
    assert code == 200
    assert len(body["tokens"]) == 4 and "score" in body


def test_action_continuous(server, gen):
    obs = np.random.RandomState(0).randn(2, 4).tolist()
    code, body = _post(server, "/v1/action", {
        "continuous_obs": obs, "action_kind": "continuous",
        "action_tokens": 2,
    })
    assert code == 200
    assert len(body["action"]) == 2
    # parity with a direct call (zero slot per obs timestep)
    direct = gen.predict_control_batch(
        [{"continuous_obs": np.asarray(obs, np.float32),
          "continuous_actions": np.zeros((2, 2), np.float32)}],
        action_kind="continuous", action_tokens=2,
    )[0]
    np.testing.assert_allclose(body["action"], direct, atol=1e-6)


def test_action_discrete(server, gen):
    code, body = _post(server, "/v1/action", {
        "discrete_obs": [[3], [5]], "action_kind": "discrete",
        "action_tokens": 1, "num_actions": 4,
    })
    assert code == 200
    assert 0 <= body["action"] < 4


def test_concurrent_requests_coalesce(server, gen):
    """Concurrent compatible requests are served in ONE generate_batch call
    (batched_with > 0) and still return per-request-correct tokens."""
    prompts = [[5, 6, 7], [8, 9], [3, 3, 3, 3]]
    results = [None] * len(prompts)

    def call(i):
        results[i] = _post(server, "/v1/generate",
                           {"text": prompts[i], "max_new_tokens": 5})

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    ts = gen.cfg.token_space
    direct, _ = gen.generate_batch(
        [{"text": p} for p in prompts], max_new_tokens=5,
        start=ts.start("text"), end=ts.end("text"),
    )
    batched_with = 0
    for i, (code, body) in enumerate(results):
        assert code == 200
        assert body["tokens"] == (direct[i] - ts.start("text")).tolist()
        batched_with = max(batched_with, body["batched_with"])
    assert batched_with > 0, "no coalescing observed"


def test_server_composes_with_tensor_parallel(gen):
    """A server over a TP-sharded Generator returns the same tokens as the
    single-device one (the serving mesh threads through every jitted fn)."""
    from neko_tpu.parallel.mesh import create_mesh

    gen_tp = Generator(
        gen.model, gen.params, gen.packer, mesh=create_mesh(model=2)
    )
    with NekoServer(gen_tp, port=0, max_batch=2) as s:
        code, body = _post(s, "/v1/generate",
                           {"text": [5, 6, 7], "max_new_tokens": 4})
    assert code == 200
    ts = gen.cfg.token_space
    direct, _ = gen.generate_batch(
        [{"text": [5, 6, 7]}], max_new_tokens=4,
        start=ts.start("text"), end=ts.end("text"),
    )
    assert body["tokens"] == (direct[0] - ts.start("text")).tolist()


def test_bad_requests(server):
    code, body = _post(server, "/v1/generate", {"max_new_tokens": 4})
    assert code == 400 and "error" in body
    code, body = _post(server, "/v1/nope", {"text": [1]})
    assert code == 404
    # invalid knob VALUES are rejected, not silently defaulted (0 is not
    # "absent"); a bad action payload is refused before queueing
    code, body = _post(server, "/v1/generate",
                       {"text": [1], "temperature": 0})
    assert code == 400
    code, body = _post(server, "/v1/generate", {"text": [1], "top_p": 0})
    assert code == 400
    code, body = _post(server, "/v1/generate",
                       {"text": [1], "num_beams": 999})
    assert code == 400
    code, body = _post(server, "/v1/action", {
        "text": [1], "action_kind": "continuous", "action_tokens": 2,
    })
    assert code == 400 and "observation" in body["error"]
    code, body = _post(server, "/v1/action", {
        "discrete_obs": [[1]], "action_kind": "discrete", "action_tokens": 1,
    })
    assert code == 400 and "num_actions" in body["error"]


def test_speculative_generate_matches_plain(server, gen):
    """'speculative': true returns bit-identical tokens (lossless) plus the
    round count."""
    code, plain = _post(server, "/v1/generate",
                        {"text": [7, 8, 7, 8], "max_new_tokens": 8})
    assert code == 200
    code, spec = _post(server, "/v1/generate",
                       {"text": [7, 8, 7, 8], "max_new_tokens": 8,
                        "speculative": True})
    assert code == 200
    assert spec["tokens"] == plain["tokens"]
    assert 1 <= spec["rounds"] <= 8
    # sampled + speculative is served too (distribution-preserving rule)
    code, body = _post(server, "/v1/generate",
                       {"text": [1], "speculative": True,
                        "deterministic": False, "temperature": 0.8})
    assert code == 200 and len(body["tokens"]) == 16
    # beams + speculative stays rejected
    code, body = _post(server, "/v1/generate",
                       {"text": [1], "speculative": True, "num_beams": 2})
    assert code == 400


def test_stop_tokens_truncate(server, gen):
    """`stop` ids cut the response at the first hit (host post-processing —
    not part of the coalescing key)."""
    code, body = _post(server, "/v1/generate",
                       {"text": [5, 6], "max_new_tokens": 6})
    assert code == 200
    full = body["tokens"]
    stop_at = full[2]
    code, body = _post(server, "/v1/generate",
                       {"text": [5, 6], "max_new_tokens": 6,
                        "stop": [stop_at]})
    assert code == 200
    assert body["tokens"] == full[: full.index(stop_at)]


def test_top_k_snapped_to_allowlist(server, gen):
    """Arbitrary top_k values snap to the static-compile allowlist instead
    of forcing a fresh decode-scan compile per value."""
    code, body = _post(server, "/v1/generate", {
        "text": [5, 6], "max_new_tokens": 3, "deterministic": False,
        "top_k": 7,  # snaps to 10
    })
    assert code == 200 and len(body["tokens"]) == 3


def test_bucketed_length_preserves_prefix(server, gen):
    """max_new_tokens=5 runs in the 8-token compile bucket; the response
    must equal the direct 5-token generation (same RNG chain prefix)."""
    ts = gen.cfg.token_space
    code, body = _post(server, "/v1/generate",
                       {"text": [7, 7], "max_new_tokens": 5})
    assert code == 200 and len(body["tokens"]) == 5
    direct, _ = gen.generate_batch(
        [{"text": [7, 7]}], max_new_tokens=5,
        start=ts.start("text"), end=ts.end("text"),
    )
    assert body["tokens"] == (direct[0] - ts.start("text")).tolist()


def test_pow2_batch_padding_preserves_rows(gen):
    """Coalesced groups run at a pow2 batch size (server._pad_pow2) so the
    compile-variant set is {1, 2, 4, ...} instead of one program per group
    size.  Pad rows trail the real rows, and per-step random bits are
    counter-indexed by (row, col) — so even SAMPLED rows must be identical
    with and without the padding."""
    from neko_tpu.serving.server import _pad_pow2

    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    exs = [{"text": [5, 6, 7]}, {"text": [9]}, {"text": [2, 4]}]
    padded = _pad_pow2(exs)
    assert len(padded) == 4 and padded[3] is exs[-1]
    key = jax.random.key(42)
    a, _ = gen.generate_batch(
        exs, max_new_tokens=6, start=start, end=end,
        deterministic=False, temperature=1.0, rng=key,
    )
    b, _ = gen.generate_batch(
        padded, max_new_tokens=6, start=start, end=end,
        deterministic=False, temperature=1.0, rng=key,
    )
    np.testing.assert_array_equal(a, b[: len(exs)])
