"""Speculative greedy decoding (prompt-lookup proposals, chunked verify).

THE invariant: generate_spec is LOSSLESS — token-for-token equal to plain
greedy decoding for every prompt; speculation only changes how many device
rounds produce them.  On repetitive prompts the accepted proposals make
rounds < tokens (the speedup on a bandwidth-bound decode step)."""

import numpy as np
import pytest

import jax

from neko_tpu.inference.generator import Generator


@pytest.fixture(scope="module")
def gen():
    from neko_tpu.config import ModelConfig
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker

    cfg = ModelConfig(
        embed_dim=32, layers=2, heads=2, dropout=0.0, context_len=96,
        max_patches=0, dtype="float32", attention_impl="xla",
        text_tokens=128, continuous_tokens=32, discrete_tokens=16,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer, seed=5)


PROMPTS = [
    [5, 9, 2, 77, 3],                          # arbitrary
    [7, 8, 7, 8, 7, 8, 7, 8],                  # periodic (lookup-friendly)
    [42],                                      # minimal
    [3, 3, 3, 3, 3, 3],                        # constant
]


@pytest.mark.parametrize("prompt", PROMPTS)
@pytest.mark.parametrize("k", [1, 4])
def test_spec_decode_is_lossless(gen, prompt, k):
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    greedy, _ = gen.generate_batch(
        [{"text": prompt}], max_new_tokens=12, start=start, end=end
    )
    spec, rounds = gen.generate_spec(
        {"text": prompt}, max_new_tokens=12, start=start, end=end,
        speculate_k=k,
    )
    np.testing.assert_array_equal(spec, greedy[0])
    assert 1 <= rounds <= 12


def test_spec_decode_accepts_on_repetitive_output(gen):
    """A greedy continuation that repeats (tiny random models loop quickly)
    must be produced in FEWER rounds than tokens once the loop is in the
    history — the whole point of speculation."""
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    # find a prompt whose greedy continuation enters a cycle
    for seed_tok in range(1, 30):
        greedy, _ = gen.generate_batch(
            [{"text": [seed_tok]}], max_new_tokens=24, start=start, end=end
        )
        tail = (greedy[0] - ts.start("text"))[8:]
        if len(set(tail.tolist())) <= 4:  # cycled
            spec, rounds = gen.generate_spec(
                {"text": [seed_tok]}, max_new_tokens=24, start=start,
                end=end, speculate_k=4,
            )
            np.testing.assert_array_equal(spec, greedy[0])
            assert rounds < 24, (
                f"no acceptance on a cyclic continuation (rounds={rounds})"
            )
            return
    pytest.skip("no cyclic greedy continuation found for this init")


def test_spec_decode_batched_matches_singles(gen):
    """Batched rows decode in lockstep rounds with per-row acceptance;
    results equal each prompt's single-row spec decode (== greedy)."""
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    prompts = [PROMPTS[0], PROMPTS[1], PROMPTS[3]]
    batch_toks, rounds = gen.generate_spec(
        [{"text": p} for p in prompts],
        max_new_tokens=10, start=start, end=end, speculate_k=3,
    )
    assert batch_toks.shape == (3, 10)
    greedy, _ = gen.generate_batch(
        [{"text": p} for p in prompts], max_new_tokens=10,
        start=start, end=end,
    )
    np.testing.assert_array_equal(batch_toks, greedy)
    assert 1 <= rounds <= 10


def test_spec_decode_composes_with_int8_cache(gen):
    import dataclasses

    from neko_tpu.models.policy import NekoModel

    cfg8 = dataclasses.replace(gen.cfg, kv_cache_dtype="int8")
    g8 = Generator(NekoModel(cfg8), gen.params, gen.packer)
    ts = cfg8.token_space
    start, end = ts.start("text"), ts.end("text")
    greedy, _ = g8.generate_batch(
        [{"text": [7, 8, 7, 8]}], max_new_tokens=10, start=start, end=end
    )
    spec, _ = g8.generate_spec(
        {"text": [7, 8, 7, 8]}, max_new_tokens=10, start=start, end=end
    )
    np.testing.assert_array_equal(spec, greedy[0])


def test_spec_sampled_matches_plain_distribution(gen):
    """deterministic=False uses the point-mass rejection rule, which must
    preserve the target distribution EXACTLY: per-position marginals of
    spec-sampled tokens equal plain categorical sampling's (TV distance on
    ~1.5k samples over a 16-token window)."""
    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    W = end - start + 1
    N, R, T = 192, 8, 3
    prompts = [{"text": [7, 8, 7, 8]}] * N

    def marginals(fn):
        counts = np.zeros((T, W), np.int64)
        for r in range(R):
            toks = fn(jax.random.key(1000 + r))
            for t in range(T):
                counts[t] += np.bincount(toks[:, t] - start, minlength=W)
        return counts / counts.sum(axis=1, keepdims=True)

    p_spec = marginals(lambda k: np.asarray(gen.generate_spec(
        prompts, max_new_tokens=T, start=start, end=end, speculate_k=2,
        deterministic=False, rng=k,
    )[0]))
    p_plain = marginals(lambda k: np.asarray(gen.generate_batch(
        prompts, max_new_tokens=T, start=start, end=end,
        deterministic=False, rng=k, return_logits=False,
    )[0]))
    tv = 0.5 * np.abs(p_spec - p_plain).sum(axis=1)
    assert (tv < 0.1).all(), f"per-position TV distances {tv}"


def test_spec_sampled_tiny_temperature_equals_greedy(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    greedy, _ = gen.generate_spec(
        {"text": [5, 9, 2]}, max_new_tokens=8, start=start, end=end
    )
    sampled, _ = gen.generate_spec(
        {"text": [5, 9, 2]}, max_new_tokens=8, start=start, end=end,
        deterministic=False, temperature=1e-4, rng=jax.random.key(3),
    )
    np.testing.assert_array_equal(greedy, sampled)


def test_spec_sampled_respects_top_k(gen):
    """With top_k on, every spec-sampled token lies in the warped support:
    verify against the teacher-forced true conditional's top-k."""
    from tests.test_beam import _forced_window_logits

    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    prompt = {"text": [5, 9, 2]}
    toks, _ = gen.generate_spec(
        prompt, max_new_tokens=4, start=start, end=end,
        deterministic=False, top_k=3, rng=jax.random.key(9),
    )
    wins = _forced_window_logits(gen, prompt, [int(t) for t in toks],
                                 start, end)
    for i, t in enumerate(toks):
        order = np.argsort(-wins[i])
        assert (t - start) in order[:3]


def test_spec_decode_lossless_fuzz(gen):
    """Hypothesis fuzz of THE invariant over random prompts/K/ngram."""
    from hypothesis import given, settings, strategies as st

    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(st.integers(0, ts.text_tokens - 1), min_size=1, max_size=24),
        st.integers(1, 5),
        st.integers(1, 3),
    )
    def check(prompt, k, ngram):
        greedy, _ = gen.generate_batch(
            [{"text": prompt}], max_new_tokens=9, start=start, end=end
        )
        spec, _ = gen.generate_spec(
            {"text": prompt}, max_new_tokens=9, start=start, end=end,
            speculate_k=k, lookup_ngram=ngram,
        )
        np.testing.assert_array_equal(spec, greedy[0])

    check()


def test_spec_decode_rejects_images(gen):
    ts = gen.cfg.token_space
    with pytest.raises(AssertionError):
        gen.generate_spec(
            {"images": np.zeros((1, 16, 16, 3), np.float32)},
            max_new_tokens=4, start=ts.start("text"), end=ts.end("text"),
        )
