"""Dict / Tuple ACTION spaces.

Composite actions (robot arm + gripper) concatenate into one token run per
timestep (tasks/control.py::DictActCodec): all-discrete component mixes ride
the existing per-component decode limits (concatenated nvec), all-continuous
mixes concatenate into continuous tokens; env.step receives the decoded
dict (or tuple).  Episode storage holds dict actions per component, same as
dict observations.  The reference supports single Box/Discrete actions only
(control_task.py:66-71).
"""

import numpy as np
import pytest

import gymnasium as gym

from neko_tpu.data.episodes import Episode, InMemoryEpisodeDataset
from neko_tpu.tasks.control import ControlTask, DictActCodec


# ------------------------------------------------------------------ codec
def test_codec_discrete_concat():
    space = gym.spaces.Dict({
        "arm": gym.spaces.MultiDiscrete([3, 3]),
        "gripper": gym.spaces.Discrete(2),
    })
    c = DictActCodec(space)
    assert c.kind == "discrete"
    assert c.tokens == 3
    assert c.nvec == [3, 3, 2]  # sorted: arm, gripper
    enc = c.encode({"arm": np.asarray([[1, 2], [0, 1]]),
                    "gripper": np.asarray([1, 0])})
    assert enc.shape == (2, 3) and enc.dtype == np.int32
    assert list(enc[0]) == [1, 2, 1]
    dec = c.decode(np.asarray([2, 0, 1]))
    assert list(dec["arm"]) == [2, 0] and dec["gripper"] == 1
    assert space.contains(dec)


def test_codec_continuous_concat():
    space = gym.spaces.Dict({
        "torso": gym.spaces.Box(-1, 1, (1,), np.float32),
        "arm": gym.spaces.Box(-1, 1, (2,), np.float32),
    })
    c = DictActCodec(space)
    assert c.kind == "continuous" and c.tokens == 3 and c.nvec is None
    enc = c.encode({"arm": np.asarray([[0.1, -0.2]]),
                    "torso": np.asarray([[0.5]])})
    assert enc.shape == (1, 3) and enc.dtype == np.float32
    assert list(enc[0]) == pytest.approx([0.1, -0.2, 0.5])  # arm first
    dec = c.decode(np.asarray([0.1, -0.2, 0.5], np.float32))
    assert dec["arm"].shape == (2,) and dec["torso"].shape == (1,)
    assert space.contains(dec)


def test_codec_rejects_mixed_kinds():
    space = gym.spaces.Dict({
        "a": gym.spaces.Box(-1, 1, (2,), np.float32),
        "b": gym.spaces.Discrete(3),
    })
    with pytest.raises(AssertionError):
        DictActCodec(space)


def test_codec_tuple_roundtrip():
    space = gym.spaces.Tuple((
        gym.spaces.Discrete(4),
        gym.spaces.MultiBinary(2),
    ))
    c = DictActCodec(space)
    assert c.tokens == 3 and c.nvec == [4, 2, 2]
    dec = c.decode(np.asarray([3, 1, 0]))
    assert isinstance(dec, tuple)
    assert dec[0] == 3 and list(dec[1]) == [1, 0]
    assert space.contains(dec)


# -------------------------------------------------------- train + rollout
@pytest.fixture(scope="module")
def setup():
    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=96, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.0,
        text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-dictact-v0"],
        training_steps=4, log_eval_freq=4, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "dictact_test", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    return tasks[0], gen


def test_classification(setup):
    task, _ = setup
    assert task.dict_act is not None
    assert task.action_kind == "discrete"
    assert task.action_tokens == 3
    assert task.action_nvec == [3, 3, 2]
    assert task.action_str == "discrete_actions"
    assert task.tokens_per_timestep == 7  # 3 obs + sep + 3 act


def test_sampled_batches_encode_components(setup):
    task, _ = setup
    exs = task.sample_batch(4, {}, max_tokens=96)
    for ex in exs:
        a = ex["discrete_actions"]
        assert a.shape[1] == 3
        assert (a[:, 0] < 3).all() and (a[:, 1] < 3).all()
        assert (a[:, 2] < 2).all()


def test_rollout_steps_env_with_dict_actions(setup):
    """Both eval paths deliver dict actions the env's space contains."""
    task, gen = setup
    env = task.env
    seen = []
    orig_step = env.step

    def spy(action):
        seen.append(action)
        return orig_step(action)

    env.step = spy
    try:
        task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True)
        task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True, rollout_cache=False)
    finally:
        env.step = orig_step
    assert len(seen) == 2 * env.horizon
    for a in seen:
        assert isinstance(a, dict) and env.action_space.contains(a), a


def test_eval_both_paths_match_pre_wrap(setup):
    from neko_tpu.envs.synthetic import (
        SyntheticDictActEnv, collect_expert_dataset,
    )

    task, gen = setup
    ctx_ts = gen.cfg.context_len // task.tokens_per_timestep
    env = SyntheticDictActEnv(horizon=ctx_ts - 2)
    ds = collect_expert_dataset(env, n_episodes=4, env_id="dictact-short")
    short = ControlTask(
        "dictact-short", env, ds, context_len=gen.cfg.context_len, seed=0,
    )
    env.reset(seed=3)
    m1 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True)
    env.reset(seed=3)
    m2 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True, rollout_cache=False)
    assert m1["mean_return"] == m2["mean_return"]
    assert m1["mean_episode_len"] == m2["mean_episode_len"]


def test_continuous_dict_action_task(setup):
    """All-continuous Dict actions: concat to continuous tokens, decode
    splits back into the dict."""
    _, gen = setup

    class CDEnv(gym.Env):
        def __init__(self, horizon=6):
            self.observation_space = gym.spaces.Box(-1, 1, (3,), np.float32)
            self.action_space = gym.spaces.Dict({
                "arm": gym.spaces.Box(-1, 1, (2,), np.float32),
                "torso": gym.spaces.Box(-1, 1, (1,), np.float32),
            })
            self.horizon = horizon
            self._t = 0

        def reset(self, *, seed=None, options=None):
            super().reset(seed=seed)
            self._t = 0
            return np.zeros(3, np.float32), {}

        def step(self, action):
            self._t += 1
            return (np.zeros(3, np.float32), 0.0, False,
                    self._t >= self.horizon, {})

    env = CDEnv()
    eps = [Episode(
        observations=np.zeros((7, 3), np.float32),
        actions={
            "arm": np.random.RandomState(i).uniform(-1, 1, (6, 2)).astype(
                np.float32),
            "torso": np.random.RandomState(i + 9).uniform(-1, 1, (6, 1)).astype(
                np.float32),
        },
        rewards=np.zeros(6, np.float32),
    ) for i in range(3)]
    ds = InMemoryEpisodeDataset(eps, spec_env_id="cd-v0")
    task = ControlTask("cd-v0", env, ds, context_len=96, seed=0)
    assert task.action_kind == "continuous"
    assert task.action_tokens == 3
    exs = task.sample_batch(2, {"end": 1}, max_tokens=96)
    assert exs[0]["continuous_actions"].shape[1] == 3

    seen = []
    orig = env.step

    def spy(a):
        seen.append(a)
        return orig(a)

    env.step = spy
    try:
        task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True)
    finally:
        env.step = orig
    assert len(seen) == env.horizon
    for a in seen:
        assert env.action_space.contains(a), a


def test_h5_roundtrip_dict_actions(tmp_path):
    from neko_tpu.data.episodes import H5EpisodeDataset, save_h5

    eps = [Episode(
        observations=np.zeros((5, 3), np.float32),
        actions={"arm": np.ones((4, 2), np.int64),
                 "gripper": np.zeros(4, np.int64)},
        rewards=np.ones(4, np.float32),
    )]
    path = str(tmp_path / "dictact.h5")
    save_h5(path, eps, env_id="da-v0")
    ds = H5EpisodeDataset(path)
    ep = ds.get_episode(0)
    assert isinstance(ep.actions, dict)
    assert ep.total_timesteps == 4
    assert (ep.actions["arm"] == 1).all()
    ds.close()
