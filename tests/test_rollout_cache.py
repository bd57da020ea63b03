"""Rollout-cache (ring KV cache) tests: the session must reproduce the
re-pack path EXACTLY while no timestep has been evicted, run correctly
through evictions (TransformerXL-style memory), and drive ControlTask.evaluate
end to end.  VERDICT.md round-2 item #5."""

import jax
import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.envs.setup_env import load_env_dataset
from neko_tpu.inference.generator import Generator
from neko_tpu.models.policy import NekoModel
from neko_tpu.tasks.control import ControlTask

CFG = ModelConfig(
    embed_dim=32,
    layers=2,
    heads=2,
    dropout=0.0,
    context_len=35,  # tpt for the 4-obs/2-act env below = 7 -> ctx_ts = 5
    max_patches=4,
    dtype="float32",
    text_tokens=64,
    continuous_tokens=64,
    discrete_tokens=64,
)

OBS_DIM, ACT_DIM = 4, 2
TPT = OBS_DIM + 1 + ACT_DIM
CTX_TS = CFG.context_len // TPT


def make_generator(cfg=CFG, seed=0):
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch(
        [{"continuous_obs": np.zeros((1, OBS_DIM), np.float32),
          "continuous_actions": np.zeros((1, ACT_DIM), np.float32)}]
    )
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(seed)}, to_device_batch(arrays)
    )["params"]
    return Generator(model, params, packer)


def _session(gen):
    return gen.rollout_session(
        obs_str="continuous_obs",
        action_str="continuous_actions",
        obs_tokens=OBS_DIM,
        action_tokens=ACT_DIM,
        action_kind="continuous",
        context_timesteps=CTX_TS,
    )


def _repack_action(gen, obs_hist, act_hist):
    """The reference-semantics re-pack path (evaluate's rollout_cache=False
    branch, control_task.py:144-159)."""
    example = {
        "continuous_obs": obs_hist[-CTX_TS:],
        "continuous_actions": act_hist[-CTX_TS:],
    }
    return gen.predict_control(
        example,
        action_kind="continuous",
        action_tokens=ACT_DIM,
        deterministic=True,
    )


def test_session_matches_repack_before_eviction():
    """Promptless start: while the ring has never evicted (steps 1..ctx_ts)
    both paths see identical contexts and must pick identical actions."""
    gen = make_generator()
    sess = _session(gen)
    sess.start([None])
    rng = np.random.RandomState(0)

    obs_hist = np.zeros((0, OBS_DIM), np.float32)
    act_hist = np.zeros((0, ACT_DIM), np.float32)
    for t in range(CTX_TS):
        obs = rng.randn(1, OBS_DIM).astype(np.float32)
        a_sess = np.asarray(sess.step([obs])[0], np.float32)

        obs_hist = np.concatenate([obs_hist, obs], axis=0)
        act_hist = np.concatenate(
            [act_hist, np.zeros((1, ACT_DIM), np.float32)], axis=0
        )
        a_ref = np.asarray(_repack_action(gen, obs_hist, act_hist), np.float32)
        np.testing.assert_array_equal(a_sess, a_ref), f"step {t}"
        act_hist[-1] = a_ref


def test_session_short_prompt_matches_repack():
    """Prompted start shorter than the window: parity holds until the ring
    fills (first eviction)."""
    gen = make_generator(seed=1)
    rng = np.random.RandomState(1)
    T0 = CTX_TS - 2
    prompt = {
        "continuous_obs": rng.randn(T0, OBS_DIM).astype(np.float32),
        "continuous_actions": np.tanh(rng.randn(T0, ACT_DIM)).astype(np.float32),
    }
    sess = _session(gen)
    sess.start([prompt])
    obs_hist = prompt["continuous_obs"].copy()
    act_hist = prompt["continuous_actions"].copy()
    for t in range(2):  # T0 + 2 == ctx_ts: still no eviction
        obs = rng.randn(1, OBS_DIM).astype(np.float32)
        a_sess = np.asarray(sess.step([obs])[0], np.float32)
        obs_hist = np.concatenate([obs_hist, obs], axis=0)
        act_hist = np.concatenate(
            [act_hist, np.zeros((1, ACT_DIM), np.float32)], axis=0
        )
        a_ref = np.asarray(_repack_action(gen, obs_hist, act_hist), np.float32)
        np.testing.assert_array_equal(a_sess, a_ref), f"step {t}"
        act_hist[-1] = a_ref


def test_session_survives_eviction_and_stays_sane():
    """Past the window the ring evicts; actions must remain valid bin centers
    and the window logits must stay finite for many steps (2.5 revolutions)."""
    gen = make_generator(seed=2)
    sess = _session(gen)
    sess.start([None])
    rng = np.random.RandomState(2)
    for t in range(int(CTX_TS * 2.5)):
        a = np.asarray(sess.step([rng.randn(1, OBS_DIM).astype(np.float32)])[0])
        assert np.isfinite(a).all()
        assert (np.abs(a) <= 1.0 + 1e-6).all()


def test_session_batched_matches_serial():
    """A 3-row session must give each row the same actions as a 1-row
    session fed the same observations."""
    gen = make_generator(seed=3)
    rng = np.random.RandomState(3)
    all_obs = [rng.randn(CTX_TS, 1, OBS_DIM).astype(np.float32) for _ in range(3)]

    batched = _session(gen)
    batched.start([None, None, None])
    serial_actions = [[] for _ in range(3)]
    for r in range(3):
        s = _session(gen)
        s.start([None])
        for t in range(CTX_TS):
            serial_actions[r].append(np.asarray(s.step([all_obs[r][t]])[0]))
    for t in range(CTX_TS):
        acts = batched.step([all_obs[r][t] for r in range(3)])
        for r in range(3):
            np.testing.assert_array_equal(
                np.asarray(acts[r]), serial_actions[r][t]
            )


def test_ring_text_generation_overflow():
    """Sliding-window text generation: the ring decode must (a) run as ONE
    scan instead of per-token re-prefills, (b) match the exact re-prefill
    path token-for-token until the window first wraps, and (c) keep emitting
    in-range tokens far past the wrap."""
    gen = make_generator(seed=5)
    ts = CFG.token_space
    rng = np.random.RandomState(5)
    S = CFG.context_len
    prompt = {"text": list(rng.randint(1, ts.text_tokens, size=S - 8))}
    max_new = 20  # prompt(28) + sep(1) + 20 > 35: overflows

    toks_ring, _ = gen.generate(
        prompt, max_new_tokens=max_new, start=ts.start("text"),
        end=ts.end("text"), deterministic=True,
    )
    toks_exact, _ = gen.generate(
        prompt, max_new_tokens=max_new, start=ts.start("text"),
        end=ts.end("text"), deterministic=True, exact_window=True,
    )
    prompt_len = len(prompt["text"]) + 1  # + separator
    pre_wrap = S - prompt_len
    np.testing.assert_array_equal(
        toks_ring[:pre_wrap], toks_exact[:pre_wrap]
    )
    assert ((toks_ring >= ts.start("text")) & (toks_ring <= ts.end("text"))).all()
    assert len(toks_ring) == max_new


def test_evaluate_with_rollout_cache_end_to_end():
    """ControlTask.evaluate(rollout_cache=True) runs prompted + promptless,
    serial + parallel, and promptless short-horizon metrics match the
    re-pack path exactly (horizon < ctx_ts -> no eviction -> identical)."""
    env, ds = load_env_dataset(
        "neko-synth-continuous-v0",
        {"n_episodes": 4, "horizon": CTX_TS - 1, "obs_dim": OBS_DIM,
         "act_dim": ACT_DIM},
    )
    task = ControlTask("synth", env, ds, context_len=CFG.context_len, seed=0)
    gen = make_generator(seed=4)

    env.reset(seed=7)  # pin the episode stream for the comparison
    m_cached = task.evaluate(
        gen, n_iterations=2, deterministic=True, promptless_eval=True,
        rollout_cache=True,
    )
    env.reset(seed=7)
    m_repack = task.evaluate(
        gen, n_iterations=2, deterministic=True, promptless_eval=True,
        rollout_cache=False,
    )
    assert m_cached["mean_episode_len"] == m_repack["mean_episode_len"]
    np.testing.assert_allclose(
        m_cached["mean_return"], m_repack["mean_return"], rtol=1e-6
    )

    # prompted + parallel, through evictions: runs and yields finite metrics
    m_par = task.evaluate(
        gen, n_iterations=2, deterministic=True, parallel_episodes=2,
        rollout_cache=True,
    )
    assert np.isfinite(m_par["mean_return"])
    assert m_par["mean_episode_len"] == CTX_TS - 1
