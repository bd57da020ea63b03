"""MultiDiscrete / MultiBinary Gym space support.

The reference supports Box and Discrete only (control_task.py:53-71) and
lists "implement others" on its own wishlist (misc/todo.md).  Here a
MultiDiscrete space maps to one discrete token per component, and at
decode time token i is restricted to its component's [0, nvec[i]) range
via per-STEP logit limits threaded through the compiled decode scan
(generator.py::_decode_scan_impl `limits`).  Covers: classification,
training, both eval paths (rollout cache + re-pack, bit-equal pre-wrap),
range enforcement under sampling, and MultiBinary reduction.
"""

import numpy as np
import pytest

import gymnasium as gym
import jax

from neko_tpu.tasks.control import (
    ControlTask,
    space_nvec,
    tokens_per_space,
)


# ------------------------------------------------------------ space maths
def test_tokens_per_space_and_nvec():
    md = gym.spaces.MultiDiscrete([4, 3, 7])
    mb = gym.spaces.MultiBinary(5)
    assert tokens_per_space(md) == 3
    assert tokens_per_space(mb) == 5
    assert space_nvec(md) == [4, 3, 7]
    assert space_nvec(mb) == [2, 2, 2, 2, 2]
    assert space_nvec(gym.spaces.Discrete(4)) is None
    assert space_nvec(gym.spaces.Box(-1, 1, (3,))) is None


@pytest.fixture(scope="module")
def setup():
    from neko_tpu.cli import build as B
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer
    from neko_tpu.inference.generator import Generator

    targs = TrainingArgs(
        cpu=True, sequence_length=96, embed_dim=32, layers=2, heads=2,
        batch_size=8, text_prop=0.0,
        text_datasets=[], text_datasets_paths=[],
        control_datasets=["neko-synth-multidiscrete-v0"],
        training_steps=4, log_eval_freq=4, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "md_test", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    return tasks[0], gen


def test_classification(setup):
    task, _ = setup
    assert task.obs_str == "discrete_obs"
    assert task.action_kind == "discrete"
    assert task.action_tokens == 2
    assert task.action_nvec == [4, 3]
    assert task.observation_tokens == 3
    assert task.tokens_per_timestep == 6  # 3 obs + 1 sep + 2 act


def test_trained_and_sampled_batches(setup):
    task, _ = setup
    exs = task.sample_batch(4, {}, max_tokens=96)
    for ex in exs:
        assert ex["discrete_obs"].shape[1] == 3
        assert ex["discrete_actions"].shape[1] == 2
        assert (ex["discrete_actions"][:, 0] < 4).all()
        assert (ex["discrete_actions"][:, 1] < 3).all()


def test_eval_both_paths_match_pre_wrap(setup):
    """With the horizon inside the context window the rollout-cache and
    re-pack paths are bit-equal (greedy) — the MultiDiscrete decode rides
    the same machinery the pre-wrap equality tests pin for Discrete."""
    from neko_tpu.envs.synthetic import (
        SyntheticMultiDiscreteEnv, collect_expert_dataset,
    )

    task, gen = setup
    ctx_ts = gen.cfg.context_len // task.tokens_per_timestep
    env = SyntheticMultiDiscreteEnv(horizon=ctx_ts - 2)
    ds = collect_expert_dataset(env, n_episodes=4, env_id="md-short")
    short = ControlTask(
        "md-short", env, ds, context_len=gen.cfg.context_len, seed=0,
    )
    env.reset(seed=3)
    m1 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True)
    env.reset(seed=3)
    m2 = short.evaluate(gen, n_iterations=2, deterministic=True,
                        promptless_eval=True, rollout_cache=False)
    assert m1["mean_return"] == m2["mean_return"]
    assert m1["mean_episode_len"] == m2["mean_episode_len"]


def test_sampled_actions_respect_component_ranges(setup):
    """Stochastic decode NEVER leaves a component's range — the per-step
    -inf mask is the enforcement, not clamping."""
    task, gen = setup
    ex = {
        "discrete_obs": np.asarray([[3, 1, 5], [0, 2, 7]], np.int32),
        "discrete_actions": np.zeros((2, 2), np.int32),
    }
    for i in range(8):
        a = gen.predict_control(
            ex, action_kind="discrete", action_tokens=2,
            action_nvec=task.action_nvec, deterministic=False,
            temperature=3.0,  # flatten: without the mask this WOULD stray
            rng=jax.random.key(i),
        )
        assert a.shape == (2,)
        assert 0 <= a[0] < 4 and 0 <= a[1] < 3, a


def test_predict_control_batch_nvec(setup):
    task, gen = setup
    exs = [{
        "discrete_obs": np.asarray([[i, 1, 2]], np.int32),
        "discrete_actions": np.zeros((1, 2), np.int32),
    } for i in range(3)]
    acts = gen.predict_control_batch(
        exs, action_kind="discrete", action_tokens=2,
        action_nvec=task.action_nvec,
    )
    assert len(acts) == 3
    for a in acts:
        assert a.shape == (2,) and a[0] < 4 and a[1] < 3


def test_multibinary_action_env():
    """MultiBinary actions reduce to MultiDiscrete([2]*n)."""
    from neko_tpu.data.episodes import Episode, InMemoryEpisodeDataset

    class MBEnv(gym.Env):
        def __init__(self, horizon=8):
            self.observation_space = gym.spaces.Box(
                -1, 1, (3,), np.float32)
            self.action_space = gym.spaces.MultiBinary(3)
            self.horizon = horizon
            self._t = 0

        def reset(self, *, seed=None, options=None):
            super().reset(seed=seed)
            self._t = 0
            return np.zeros(3, np.float32), {}

        def step(self, action):
            self._t += 1
            r = float(np.sum(action))
            return (np.zeros(3, np.float32), r, False,
                    self._t >= self.horizon, {})

    env = MBEnv()
    eps = [Episode(
        observations=np.zeros((9, 3), np.float32),
        actions=np.asarray(
            np.random.RandomState(i).randint(0, 2, (8, 3)), np.int64),
        rewards=np.ones(8, np.float32),
    ) for i in range(3)]
    ds = InMemoryEpisodeDataset(eps, spec_env_id="mb-v0")
    task = ControlTask("mb-v0", env, ds, context_len=96, seed=0)
    assert task.action_nvec == [2, 2, 2]
    assert task.action_tokens == 3
    assert task.obs_str == "continuous_obs"
    exs = task.sample_batch(2, {}, max_tokens=96)
    assert exs[0]["discrete_actions"].shape[1] == 3
    assert (exs[0]["discrete_actions"] < 2).all()


def test_served_multidiscrete_action(setup):
    """/v1/action with action_nvec: per-component-restricted action ids."""
    import json
    import urllib.request

    from neko_tpu.serving.server import NekoServer

    task, gen = setup
    with NekoServer(gen, port=0) as srv:
        host, port = srv.address[0], srv.address[1]
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/action",
            data=json.dumps({
                "discrete_obs": [[3, 1, 5]],
                "action_kind": "discrete",
                "action_tokens": 2,
                "action_nvec": [4, 3],
            }).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        assert r.status == 200
        a = body["action"]
        assert len(a) == 2 and 0 <= a[0] < 4 and 0 <= a[1] < 3
