"""Beam search over the KV cache (Generator.generate_beam).

A capability the reference lacks (generation there is greedy or plain
multinomial with a full re-forward per token, gato_policy.py:434-470).
Correctness is pinned against brute force: with num_beams = W and 2 steps
the beam MUST return the globally optimal sequence, scored by teacher-forced
full forwards assembled exactly like the decode path (prompt embeddings +
raw `embed_tokens` for generated tokens — no inner positions,
gato_policy.py:462-465).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neko_tpu.inference.generator import Generator


@pytest.fixture(scope="module")
def gen():
    from neko_tpu.config import ModelConfig
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker

    cfg = ModelConfig(
        embed_dim=32, layers=2, heads=2, dropout=0.0, context_len=48,
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
    return Generator(model, params, packer, seed=3)


PROMPT = {"text": [5, 9, 2, 77]}


def _forced_window_logits(gen, prompt, forced, start, end):
    """Teacher-force `forced` token ids after the prompt with ONE full
    forward; returns the restricted window logits at each step (the logits
    that *selected* forced[i], i.e. from stream position L-1+i)."""
    arrays = gen.packer.pack_batch([prompt], pad_side="right")
    L = int(arrays.pop("lengths")[0])
    from neko_tpu.data.batch import to_device_batch

    emb = gen._embed_batch(gen.params, to_device_batch(arrays))
    for i, t in enumerate(forced):
        te = gen._embed_tokens(gen.params, jnp.asarray([[t]], jnp.int32))
        emb = emb.at[:, L + i].set(te[:, 0])
    S = emb.shape[1]
    mask = np.zeros((1, S), bool)
    mask[0, : L + len(forced)] = True
    logits, _ = gen._prefill(gen.params, emb, jnp.asarray(mask))
    steps = [logits[0, L - 1 + i, start : end + 1] for i in range(len(forced))]
    return np.asarray(jnp.stack(steps), np.float64)


def _seq_logprob(gen, prompt, forced, start, end):
    wins = _forced_window_logits(gen, prompt, forced, start, end)
    lp = 0.0
    for i, t in enumerate(forced):
        logp = wins[i] - np.log(np.exp(wins[i] - wins[i].max()).sum()) - wins[i].max()
        lp += logp[t - start]
    return lp


def test_beam_1_equals_greedy(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    greedy, _ = gen.generate_batch(
        [PROMPT], max_new_tokens=5, start=start, end=end
    )
    beams, scores = gen.generate_beam(
        [PROMPT], max_new_tokens=5, start=start, end=end, num_beams=1
    )
    np.testing.assert_array_equal(beams[0, 0], greedy[0])
    assert scores.shape == (1, 1)


def test_beam_full_width_is_exhaustive(gen):
    """num_beams = W over 2 steps explores every sequence: the result must
    equal the brute-force optimum under teacher forcing."""
    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    W = end - start + 1  # 16 in the test config
    beams, scores = gen.generate_beam(
        [PROMPT], max_new_tokens=2, start=start, end=end, num_beams=W
    )
    # brute force: logp1 from the prompt, logp2 teacher-forced per t1
    best_lp, best_seq = -np.inf, None
    for t1 in range(start, end + 1):
        wins = _forced_window_logits(gen, PROMPT, [t1, start], start, end)
        logp1 = wins[0] - np.log(np.exp(wins[0] - wins[0].max()).sum()) - wins[0].max()
        logp2 = wins[1] - np.log(np.exp(wins[1] - wins[1].max()).sum()) - wins[1].max()
        t2 = int(np.argmax(logp2)) + start
        lp = logp1[t1 - start] + logp2[t2 - start]
        if lp > best_lp:
            best_lp, best_seq = lp, [t1, t2]
    assert list(beams[0, 0]) == best_seq
    np.testing.assert_allclose(scores[0, 0], best_lp, rtol=0, atol=2e-4)
    # scores are sorted descending
    assert (np.diff(scores[0]) <= 1e-6).all()


def test_beam_score_matches_forced_recompute(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    beams, scores = gen.generate_beam(
        [PROMPT], max_new_tokens=4, start=start, end=end, num_beams=3
    )
    for b in range(3):
        lp = _seq_logprob(gen, PROMPT, [int(t) for t in beams[0, b]], start, end)
        np.testing.assert_allclose(scores[0, b], lp, rtol=0, atol=3e-4)


def test_beam_never_worse_than_greedy(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    greedy, _ = gen.generate_batch(
        [PROMPT], max_new_tokens=4, start=start, end=end
    )
    greedy_lp = _seq_logprob(gen, PROMPT, [int(t) for t in greedy[0]], start, end)
    _, scores = gen.generate_beam(
        [PROMPT], max_new_tokens=4, start=start, end=end, num_beams=4
    )
    assert scores[0, 0] >= greedy_lp - 1e-4


def test_beam_batched_rows_independent(gen):
    """Each example's search is independent of its batch neighbours."""
    ts = gen.cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    a = {"text": [4, 4, 8]}
    b = {"text": [100, 3]}
    both_t, both_s = gen.generate_beam(
        [a, b], max_new_tokens=3, start=start, end=end, num_beams=3
    )
    for i, ex in enumerate([a, b]):
        solo_t, solo_s = gen.generate_beam(
            [ex], max_new_tokens=3, start=start, end=end, num_beams=3
        )
        np.testing.assert_array_equal(both_t[i], solo_t[0])
        np.testing.assert_allclose(both_s[i], solo_s[0], atol=1e-5)


def test_beam_return_logits_along_path(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    beams, _, logits = gen.generate_beam(
        [PROMPT], max_new_tokens=3, start=start, end=end, num_beams=2,
        return_logits=True,
    )
    wins = _forced_window_logits(
        gen, PROMPT, [int(t) for t in beams[0, 0]], start, end
    )
    np.testing.assert_allclose(logits[0, 0], wins, rtol=0, atol=2e-4)


def test_beam_wider_than_window_rejected(gen):
    ts = gen.cfg.token_space
    start, end = ts.start("discrete"), ts.end("discrete")
    W = end - start + 1
    with pytest.raises(AssertionError, match="num_beams"):
        gen.generate_beam([PROMPT], max_new_tokens=2, start=start, end=end,
                          num_beams=W + 1)


def test_predict_text_beam(gen):
    logits, ids = gen.predict_text(PROMPT, max_length=4, num_beams=3)
    ts = gen.cfg.token_space
    W = ts.end("text") - ts.start("text") + 1
    assert ids.shape == (4,) and logits.shape == (4, W)
    assert (ids >= 0).all() and (ids < W).all()


def test_predict_caption_beam(gen):
    img = np.full((1, 32, 32, 3), 128, np.uint8)
    logits, ids = gen.predict_caption(img, max_length=3, num_beams=2)
    assert ids.shape == (3,)
