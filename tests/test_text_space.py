"""gym.spaces.Text support.

The reference supports Box and Discrete only (control_task.py:53-71) and its
wishlist names Text explicitly (misc/todo.md "implement others:
https://gymnasium.farama.org/api/spaces/, like spaces.Text").  A Text space
maps to one discrete token per character slot: index 0 is padding for strings
shorter than max_length, 1..len(charset) follow the space's sorted character
table — i.e. Text reduces to MultiDiscrete([charset+1] * max_length) plus
string<->index conversion at the env boundary, so decode-time range
enforcement rides the existing per-component logit limits.
"""

import numpy as np
import pytest

import gymnasium as gym

from neko_tpu.tasks.control import (
    ControlTask,
    decode_text,
    encode_text,
    space_nvec,
    tokens_per_space,
)


# ------------------------------------------------------------ space maths
def test_tokens_and_nvec():
    t = gym.spaces.Text(max_length=4, min_length=1, charset="abcde")
    assert tokens_per_space(t) == 4
    assert space_nvec(t) == [6, 6, 6, 6]  # 5 chars + pad


def test_encode_decode_roundtrip():
    t = gym.spaces.Text(max_length=4, min_length=1, charset="abcde")
    for s in ["a", "ab", "edcb", "aaaa", "e"]:
        enc = encode_text(t, [s])
        assert enc.shape == (1, 4) and enc.dtype == np.int32
        assert decode_text(t, enc[0]) == s
    # padding really is index 0 and trails the string
    enc = encode_text(t, ["ab"])
    assert list(enc[0]) == [1, 2, 0, 0]


def test_decode_enforces_min_length():
    t = gym.spaces.Text(max_length=4, min_length=2, charset="abcde")
    # all-pad prediction still yields a string the space contains
    s = decode_text(t, np.zeros(4, np.int32))
    assert t.contains(s) and s == "aa"


def test_default_charset_roundtrip():
    t = gym.spaces.Text(max_length=6)  # full alphanumeric charset
    enc = encode_text(t, ["Zz09aA"])
    assert decode_text(t, enc[0]) == "Zz09aA"
    assert space_nvec(t) == [63] * 6  # 62 chars + pad


# --------------------------------------------------------- train + rollout
@pytest.fixture(scope="module")
def setup():
    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=90, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.0,
        text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-text-v0"],
        training_steps=4, log_eval_freq=4, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "text_space_test", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    return tasks[0], gen


def test_classification(setup):
    task, _ = setup
    assert task.obs_str == "discrete_obs"
    assert task.action_kind == "discrete"
    assert task.action_tokens == 4
    assert task.observation_tokens == 4
    assert task.action_nvec == [6, 6, 6, 6]
    assert task.tokens_per_timestep == 9  # 4 obs + 1 sep + 4 act
    assert task.text_obs_space is not None
    assert task.text_action_space is not None


def test_sampled_batches_are_encoded(setup):
    task, _ = setup
    exs = task.sample_batch(4, {}, max_tokens=90)
    for ex in exs:
        assert ex["discrete_obs"].shape[1] == 4
        assert ex["discrete_actions"].shape[1] == 4
        assert ex["discrete_obs"].dtype == np.int32
        assert (ex["discrete_obs"] >= 0).all() and (ex["discrete_obs"] < 6).all()
        assert (ex["discrete_actions"] < 6).all()


def test_rollout_emits_valid_strings(setup):
    """The env receives decoded strings its space contains, on both the
    rollout-cache and re-pack eval paths."""
    from neko_tpu.envs.synthetic import SyntheticTextEnv

    task, gen = setup
    env = task.env
    seen = []
    orig_step = env.step

    def spy_step(action):
        seen.append(action)
        return orig_step(action)

    env.step = spy_step
    try:
        task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True)
        task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True, rollout_cache=False)
    finally:
        env.step = orig_step
    assert len(seen) == 2 * env.horizon
    for a in seen:
        assert isinstance(a, str) and env.action_space.contains(a), a


def test_eval_both_paths_match_pre_wrap(setup):
    """Horizon inside the context window -> rollout-cache and re-pack paths
    are bit-equal (greedy), same as the Discrete/MultiDiscrete pins."""
    from neko_tpu.envs.synthetic import SyntheticTextEnv, collect_expert_dataset

    task, gen = setup
    ctx_ts = gen.cfg.context_len // task.tokens_per_timestep
    env = SyntheticTextEnv(horizon=ctx_ts - 2)
    ds = collect_expert_dataset(env, n_episodes=4, env_id="text-short")
    short = ControlTask(
        "text-short", env, ds, context_len=gen.cfg.context_len, seed=0,
    )
    env.reset(seed=3)
    m1 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True)
    env.reset(seed=3)
    m2 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True, rollout_cache=False)
    assert m1["mean_return"] == m2["mean_return"]
    assert m1["mean_episode_len"] == m2["mean_episode_len"]


def test_expert_dataset_stores_strings():
    from neko_tpu.envs.synthetic import SyntheticTextEnv, collect_expert_dataset

    env = SyntheticTextEnv(horizon=4)
    ds = collect_expert_dataset(env, n_episodes=2, env_id="text-v0")
    ep = ds.sample_episodes(1, rng=np.random.default_rng(0))[0]
    assert ep.observations.dtype.kind == "U"
    assert ep.actions.dtype.kind == "U"
    # echo expert: action t == observation t
    assert list(ep.actions) == list(ep.observations[:-1])
