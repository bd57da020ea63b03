"""Dict / Tuple observation spaces.

Gato itself trains on camera images + proprioception in ONE timestep, but
the reference's obs classification is single-space (control_task.py:53-65)
so it cannot represent composite observations.  Here a Dict/Tuple obs space
maps onto the packer's per-timestep modality slots in canonical interleave
order [image | continuous_obs | discrete_obs | SEP | actions]
(tasks/control.py::DictObsCodec): at most one image Box, all 1-D Boxes
concatenated (sorted by key) into continuous_obs, every discrete-family
component (Discrete/MultiDiscrete/MultiBinary/Text) concatenated into
discrete_obs.  Storage keeps observations as dicts of per-component arrays
(episodes.py::slice_obs/concat_obs, HDF5 subgroup layout).
"""

import numpy as np
import pytest

import gymnasium as gym

from neko_tpu.data.episodes import (
    Episode, InMemoryEpisodeDataset, concat_obs, slice_obs,
)
from neko_tpu.tasks.control import ControlTask, DictObsCodec


# ------------------------------------------------------------------ codec
def test_codec_grouping_and_token_counts():
    space = gym.spaces.Dict({
        "cam": gym.spaces.Box(0, 255, (16, 16), np.uint8),
        "qpos": gym.spaces.Box(-1, 1, (5,), np.float32),
        "qvel": gym.spaces.Box(-1, 1, (3,), np.float32),
        "mode": gym.spaces.Discrete(4),
        "flags": gym.spaces.MultiBinary(2),
    })
    c = DictObsCodec(space, patch_size=16)
    assert c.image_key == "cam"
    assert c.patches_per_timestep == 1
    assert [k for k, _ in c.cont_items] == ["qpos", "qvel"]
    assert c.cont_tokens == 8
    assert c.disc_tokens == 3  # Discrete(4) -> 1, MultiBinary(2) -> 2
    assert c.obs_tokens == 1 + 8 + 3
    assert c.entry_keys == ["images", "continuous_obs", "discrete_obs"]

    obs = {
        "cam": np.zeros((2, 16, 16), np.uint8),
        "qpos": np.zeros((2, 5), np.float32),
        "qvel": np.ones((2, 3), np.float32),
        "mode": np.asarray([1, 3]),
        "flags": np.asarray([[0, 1], [1, 0]]),
    }
    enc = c.encode(obs)
    assert enc["images"].shape == (2, 16, 16, 3)
    assert enc["continuous_obs"].shape == (2, 8)
    assert (enc["continuous_obs"][:, 5:] == 1.0).all()  # qvel after qpos
    assert enc["discrete_obs"].shape == (2, 3)
    assert list(enc["discrete_obs"][1]) == [1, 0, 3]  # sorted: flags, mode


def test_codec_rejects_two_images():
    space = gym.spaces.Dict({
        "a": gym.spaces.Box(0, 255, (16, 16), np.uint8),
        "b": gym.spaces.Box(0, 255, (16, 16, 3), np.uint8),
    })
    with pytest.raises(AssertionError):
        DictObsCodec(space, patch_size=16)


def test_tuple_space_maps_to_indexed_keys():
    space = gym.spaces.Tuple((
        gym.spaces.Box(-1, 1, (2,), np.float32),
        gym.spaces.Discrete(3),
    ))
    c = DictObsCodec(space, patch_size=16)
    assert c.cont_items == [("0", 2)]
    assert [k for k, _ in c.disc_items] == ["1"]
    assert c.obs_tokens == 3


# ---------------------------------------------------------------- storage
def test_slice_and_concat_obs_dict():
    obs = {"a": np.arange(10), "b": np.arange(20).reshape(10, 2)}
    s = slice_obs(obs, 2, 5)
    assert list(s["a"]) == [2, 3, 4] and s["b"].shape == (3, 2)
    c = concat_obs(s, slice_obs(obs, 0, 1))
    assert list(c["a"]) == [2, 3, 4, 0]
    # array fallback unchanged
    assert list(slice_obs(np.arange(5), 1, 3)) == [1, 2]


def test_h5_roundtrip_dict_obs(tmp_path):
    from neko_tpu.data.episodes import H5EpisodeDataset, save_h5

    eps = [Episode(
        observations={"img": np.full((4, 2, 2), i, np.uint8),
                      "vec": np.arange(8, dtype=np.float32).reshape(4, 2)},
        actions=np.arange(3, dtype=np.int64),
        rewards=np.ones(3, np.float32),
    ) for i in range(2)]
    path = str(tmp_path / "dict.h5")
    save_h5(path, eps, env_id="dict-v0")
    ds = H5EpisodeDataset(path)
    assert len(ds) == 2
    ep = ds.get_episode(1)
    assert isinstance(ep.observations, dict)
    assert (ep.observations["img"] == 1).all()
    assert ep.observations["vec"].shape == (4, 2)
    ds.close()


# -------------------------------------------------------- train + rollout
@pytest.fixture(scope="module")
def setup():
    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=98, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.0,
        text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-dict-v0"],
        training_steps=4, log_eval_freq=4, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "dict_test", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    return tasks[0], gen


def test_classification(setup):
    task, _ = setup
    assert task.dict_obs is not None
    assert task.obs_entry_keys == ["images", "continuous_obs"]
    assert task.patches_per_timestep == 1
    assert task.observation_tokens == 5  # 1 patch + 4 state dims
    assert task.tokens_per_timestep == 7
    assert task.action_kind == "discrete" and task.num_actions == 3


def test_sampled_batches_carry_both_modalities(setup):
    task, _ = setup
    exs = task.sample_batch(2, {"end": 2}, max_tokens=98)
    for ex in exs:
        T = ex["continuous_obs"].shape[0]
        assert ex["images"].shape == (T, 16, 16, 3)
        assert ex["continuous_obs"].shape == (T, 4)
        assert ex["discrete_actions"].shape == (T, 1)


def test_eval_paths_agree(setup):
    """Rollout-cache, re-pack, and prompted eval all run; cache and re-pack
    bit-equal with the horizon inside the context window."""
    from neko_tpu.envs.synthetic import SyntheticDictEnv, collect_expert_dataset

    task, gen = setup
    ctx_ts = gen.cfg.context_len // task.tokens_per_timestep
    env = SyntheticDictEnv(horizon=ctx_ts - 2)
    ds = collect_expert_dataset(env, n_episodes=4, env_id="dict-short")
    short = ControlTask(
        "dict-short", env, ds, context_len=gen.cfg.context_len, seed=0,
    )
    env.reset(seed=3)
    m1 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True)
    env.reset(seed=3)
    m2 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True, rollout_cache=False)
    assert m1["mean_return"] == m2["mean_return"]
    assert m1["mean_episode_len"] == m2["mean_episode_len"]
    # prompted path: prompt histories carry every obs entry key
    m3 = short.evaluate(gen, n_iterations=1, deterministic=True)
    assert m3["mean_episode_len"] > 0


def test_parallel_lockstep_eval(setup):
    task, gen = setup
    m = task.evaluate(gen, n_iterations=2, deterministic=True,
                      promptless_eval=True, parallel_episodes=2)
    assert m["mean_episode_len"] == task.env.horizon


def test_mixture_training_with_composite_spaces():
    """One run mixing a Dict-obs env (patches + vectors), a Text-space env,
    and synthetic text: the trainer's mixture split, patch budget, and
    packer coexist across heterogeneous control tasks."""
    from neko_tpu.cli import build as B
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=98, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.25,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        control_datasets=["neko-synth-dict-v0", "neko-synth-text-v0"],
        training_steps=2, log_eval_freq=2, eval_episodes=1,
        eval_text_num_examples=1, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    import time

    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "mix_dict_test", targs)
    trainer.init_state()
    trainer.start_time = time.time()
    logs = trainer.train_iteration(2, 0)
    assert np.isfinite(logs["training/train_loss_mean"])
    assert "evaluation/neko-synth-dict-v0/mean_return" in logs
    assert "evaluation/neko-synth-text-v0/mean_return" in logs


def test_served_dict_obs_action(setup):
    """/v1/action accepts a composite observation — multiple packer entry
    keys in one payload (the wire format IS the packer schema, so Dict obs
    serve with no server changes)."""
    import json
    import urllib.request

    from neko_tpu.serving.server import NekoServer

    task, gen = setup
    with NekoServer(gen, port=0) as srv:
        host, port = srv.address[0], srv.address[1]
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/action",
            data=json.dumps({
                "images": np.zeros((1, 16, 16, 3), np.float32).tolist(),
                "continuous_obs": [[0.1, -0.2, 0.3, 0.0]],
                "action_kind": "discrete",
                "action_tokens": 1,
                "num_actions": 3,
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            body = json.loads(r.read())
        assert r.status == 200
        a = body["action"]
        assert 0 <= int(a if np.isscalar(a) else a[0]) < 3


def test_tuple_obs_env_end_to_end(setup):
    """A Tuple(Box, Discrete) obs env trains/evals through the same path."""
    _, gen = setup

    class TupleEnv(gym.Env):
        def __init__(self, horizon=6):
            self.observation_space = gym.spaces.Tuple((
                gym.spaces.Box(-1, 1, (2,), np.float32),
                gym.spaces.Discrete(3),
            ))
            self.action_space = gym.spaces.Discrete(3)
            self.horizon = horizon
            self._t = 0
            self._d = 0

        def _obs(self):
            return (np.zeros(2, np.float32), self._d)

        def reset(self, *, seed=None, options=None):
            super().reset(seed=seed)
            self._t = 0
            self._d = int(self.np_random.integers(3))
            return self._obs(), {}

        def step(self, action):
            r = float(int(action) == self._d)
            self._d = int(self.np_random.integers(3))
            self._t += 1
            return self._obs(), r, False, self._t >= self.horizon, {}

    env = TupleEnv()
    eps = []
    for i in range(3):
        o, _ = env.reset(seed=i)
        obs_seq, act_seq, rew = [o], [], []
        done = False
        while not done:
            a = env._d
            o, r, term, trunc, _ = env.step(a)
            obs_seq.append(o)
            act_seq.append(a)
            rew.append(r)
            done = term or trunc
        eps.append(Episode(
            observations={
                "0": np.asarray([x[0] for x in obs_seq], np.float32),
                "1": np.asarray([x[1] for x in obs_seq], np.int64),
            },
            actions=np.asarray(act_seq, np.int64),
            rewards=np.asarray(rew, np.float32),
        ))
    ds = InMemoryEpisodeDataset(eps, spec_env_id="tuple-v0")
    task = ControlTask("tuple-v0", env, ds, context_len=98, seed=0)
    assert task.obs_entry_keys == ["continuous_obs", "discrete_obs"]
    assert task.observation_tokens == 3
    exs = task.sample_batch(2, {}, max_tokens=98)
    assert exs[0]["continuous_obs"].shape[1] == 2
    assert exs[0]["discrete_obs"].shape[1] == 1
    m = task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True)
    assert m["mean_episode_len"] == env.horizon
