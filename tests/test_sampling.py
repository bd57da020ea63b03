"""Serving-time sampling knobs: temperature / top-k / top-p.

These are strict extensions over the reference's two modes (argmax and plain
multinomial, gato_policy.py:453-458); with the knobs at their defaults the
decode path is trace-identical to the plain multinomial, which the trace-
equality test below pins.  Filters warp only the SAMPLING distribution —
returned window logits (used by text/caption/VQA eval for CE) stay raw.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neko_tpu.inference.generator import Generator, apply_logit_filters


# ------------------------------------------------------------ filter math
def test_filters_default_identity():
    x = jnp.asarray([0.1, -2.0, 3.5, 0.0])
    y = apply_logit_filters(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_temperature_scales_logits():
    x = jnp.asarray([1.0, 2.0, -4.0])
    y = apply_logit_filters(x, temperature=0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) / 0.5)


def test_top_k_masks_all_but_k():
    x = jnp.asarray([0.5, 3.0, -1.0, 2.0, 0.9])
    y = np.asarray(apply_logit_filters(x, top_k=2))
    assert np.isfinite(y[[1, 3]]).all()
    assert np.isneginf(y[[0, 2, 4]]).all()
    np.testing.assert_allclose(y[[1, 3]], [3.0, 2.0])


def test_top_k_larger_than_window_is_off():
    x = jnp.asarray([0.5, 3.0, -1.0])
    y = apply_logit_filters(x, top_k=3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_top_p_keeps_minimal_prefix():
    # probs = [0.5, 0.3, 0.15, 0.05] (descending by construction)
    p = np.array([0.5, 0.3, 0.15, 0.05])
    x = jnp.asarray(np.log(p))
    # cumulative-before: [0, .5, .8, .95]; top_p=0.7 keeps the first two
    y = np.asarray(apply_logit_filters(x, top_p=0.7))
    assert np.isfinite(y[:2]).all() and np.isneginf(y[2:]).all()
    # top_p just above a boundary keeps the third token too
    y = np.asarray(apply_logit_filters(x, top_p=0.81))
    assert np.isfinite(y[:3]).all() and np.isneginf(y[3:]).all()


def test_top_p_always_keeps_top_token():
    x = jnp.asarray([0.0, 5.0, 1.0])
    y = np.asarray(apply_logit_filters(x, top_p=1e-6))
    assert np.isfinite(y[1])
    assert np.isneginf(y[[0, 2]]).all()


def test_top_p_batched_rows_independent():
    x = jnp.asarray([[5.0, 1.0, 0.0], [0.0, 1.0, 5.0]])
    y = np.asarray(apply_logit_filters(x, top_p=0.5))
    assert np.isfinite(y[0, 0]) and np.isneginf(y[0, 1:]).all()
    assert np.isfinite(y[1, 2]) and np.isneginf(y[1, :2]).all()


def test_temperature_applies_before_top_p():
    # flat-ish logits: high temperature flattens further -> more survivors
    x = jnp.asarray([1.0, 0.8, 0.6, 0.4])
    cold = np.isfinite(np.asarray(apply_logit_filters(x, temperature=0.05,
                                                      top_p=0.9))).sum()
    hot = np.isfinite(np.asarray(apply_logit_filters(x, temperature=20.0,
                                                     top_p=0.9))).sum()
    assert cold < hot


# --------------------------------------------------------- generator paths
@pytest.fixture(scope="module")
def gen():
    from neko_tpu.config import ModelConfig
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker

    cfg = ModelConfig(
        embed_dim=32, layers=2, heads=2, dropout=0.0, context_len=64,
        max_patches=4, patch_size=16, dtype="float32", attention_impl="xla",
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch([{"text": [1, 2, 3]}])
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer, seed=7)


PROMPT = {"text": [11, 42, 7, 300]}


def test_knob_defaults_match_plain_sampling(gen):
    """Structural no-op knob values must reproduce the plain multinomial
    token-for-token (same rng)."""
    rng = jax.random.key(123)
    base, _ = gen.predict_text(PROMPT, max_length=6, deterministic=False,
                               rng=rng)
    same, _ = gen.predict_text(PROMPT, max_length=6, deterministic=False,
                               rng=rng, temperature=1.0, top_k=0, top_p=1.0)
    np.testing.assert_array_equal(base, same)


def test_deterministic_ignores_knobs(gen):
    a, _ = gen.predict_text(PROMPT, max_length=5)
    b, _ = gen.predict_text(PROMPT, max_length=5, temperature=3.0, top_k=2,
                            top_p=0.5)
    np.testing.assert_array_equal(a, b)


def test_top_k_1_equals_greedy(gen):
    greedy_logits, greedy = gen.predict_text(PROMPT, max_length=6)
    _, sampled = gen.predict_text(
        PROMPT, max_length=6, deterministic=False, top_k=1,
        rng=jax.random.key(0),
    )
    np.testing.assert_array_equal(greedy, sampled)


def test_tiny_temperature_equals_greedy(gen):
    _, greedy = gen.predict_text(PROMPT, max_length=6)
    _, sampled = gen.predict_text(
        PROMPT, max_length=6, deterministic=False, temperature=1e-4,
        rng=jax.random.key(1),
    )
    np.testing.assert_array_equal(greedy, sampled)


def test_top_k_samples_stay_in_top_k(gen):
    """Every sampled token must rank within the top-k of the RAW window
    logits the scan reports for that step (logits stay unwarped)."""
    ts = gen.cfg.token_space
    k = 3
    for seed in range(4):
        toks, windows = gen.generate_batch(
            [PROMPT, {"text": [9, 9, 2]}],
            max_new_tokens=5, start=ts.start("text"), end=ts.end("text"),
            deterministic=False, top_k=k, rng=jax.random.key(seed),
        )
        ids = toks - ts.start("text")  # [N, T]
        order = np.argsort(-windows, axis=-1)  # descending
        for n in range(ids.shape[0]):
            for t in range(ids.shape[1]):
                assert ids[n, t] in order[n, t, :k]


def test_top_p_restricts_support(gen):
    """With a tiny nucleus every sample is the per-step argmax."""
    ts = gen.cfg.token_space
    toks, windows = gen.generate_batch(
        [PROMPT], max_new_tokens=6,
        start=ts.start("text"), end=ts.end("text"),
        deterministic=False, top_p=1e-6, rng=jax.random.key(5),
    )
    ids = toks[0] - ts.start("text")
    np.testing.assert_array_equal(ids, np.argmax(windows[0], axis=-1))


def test_invalid_knobs_rejected(gen):
    with pytest.raises(AssertionError):
        gen.predict_text(PROMPT, max_length=2, temperature=0.0)
    with pytest.raises(AssertionError):
        gen.predict_text(PROMPT, max_length=2, top_p=0.0)
    with pytest.raises(AssertionError):
        gen.predict_text(PROMPT, max_length=2, top_k=-1)


def test_temperature_top_p_do_not_recompile(gen):
    """temperature/top_p are traced operands of the decode scan — a serving
    process must not recompile per client-supplied value (top_k and the
    nucleus on/off switch stay static)."""
    ts = gen.cfg.token_space
    kw = dict(max_new_tokens=3, start=ts.start("text"), end=ts.end("text"),
              deterministic=False)
    gen.generate_batch([PROMPT], temperature=0.7, top_p=0.9,
                       rng=jax.random.key(0), **kw)
    before = gen._decode_scan._cache_size()
    for t, p in [(0.71, 0.91), (1.3, 0.5), (0.25, 0.999)]:
        gen.generate_batch([PROMPT], temperature=t, top_p=p,
                           rng=jax.random.key(1), **kw)
    assert gen._decode_scan._cache_size() == before


def test_generator_level_defaults(gen):
    """Knobs set at Generator construction apply to every call; per-call
    arguments override them (eval.py --temperature/--sample_top_k/
    --sample_top_p wire through this)."""
    g2 = Generator(gen.model, gen.params, gen.packer, top_k=1)
    _, greedy = gen.predict_text(PROMPT, max_length=5)
    _, via_default = g2.predict_text(
        PROMPT, max_length=5, deterministic=False, rng=jax.random.key(9)
    )
    np.testing.assert_array_equal(greedy, via_default)
    # per-call override back to plain sampling diverges from greedy for
    # at least one of several seeds (flat-ish random-init logits)
    diverged = False
    for s in range(5):
        _, t = g2.predict_text(
            PROMPT, max_length=5, deterministic=False, top_k=0,
            rng=jax.random.key(s),
        )
        diverged = diverged or list(t) != list(greedy)
    assert diverged


def test_rollout_session_accepts_knobs(gen):
    """The rollout cache path compiles and runs with the knobs on."""
    sess = gen.rollout_session(
        obs_str="continuous_obs", action_str="continuous_actions",
        obs_tokens=4, action_tokens=2, action_kind="continuous",
        context_timesteps=4,
    )
    sess.start([None])
    obs = np.random.RandomState(0).randn(1, 4).astype(np.float32)
    a = sess.step([obs], deterministic=False, temperature=0.7, top_k=5)
    assert len(a) == 1 and a[0].shape == (2,)
