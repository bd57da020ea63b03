"""Control task: offline-RL episode sampling + live-env rollout evaluation.

Sampling semantics mirror /root/reference/gato/tasks/control_task.py:

* timestep budget = max_tokens // tokens_per_timestep (control_task.py:223)
* main chunk: whole episode if it fits, else a uniform random slice — note
  the reference's asymmetry: a fitting episode contributes ep_len-1 steps
  (`end = ep_len - 1` exclusive-sliced, control_task.py:247-253) which we
  reproduce for distribution parity
* prompt types 'start' | 'end' | 'uniform' prepended at
  training_prompt_len_proportion of the budget (control_task.py:268-292)
* share_prompt_episodes=False rotates prompts one episode over
  (control_task.py:239-241)
* top-k-return episode filter for eval prompts (control_task.py:96-103)
* evaluation: env rollout with a full-context 'end' prompt, per-step action
  prediction and context trimming (control_task.py:106-173) — but through the
  KV-cache Generator instead of full-context re-forwards per token

Observation/action-space classification follows control_task.py:53-83,
including image transforms (grayscale -> 3-channel, pad to patch multiple).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import gymnasium as gym
import numpy as np

from neko_tpu.data.episodes import EpisodeDataset, concat_obs, slice_obs
from neko_tpu.inference.generator import Generator
from neko_tpu.tasks.base import Task

# Box + Discrete are the reference's whole space support
# (control_task.py:53-71); MultiDiscrete/MultiBinary/Text extend it — an
# item on the reference's own wishlist (misc/todo.md "currently supporting
# Box and Discrete spaces, implement others ... like spaces.Text").
SUPPORTED_SPACES = (
    gym.spaces.Box, gym.spaces.Discrete,
    gym.spaces.MultiDiscrete, gym.spaces.MultiBinary,
    gym.spaces.Text,
)


def tokens_per_space(space) -> int:
    if isinstance(space, gym.spaces.Box):
        return int(space.shape[0])
    if isinstance(space, gym.spaces.Discrete):
        return 1
    if isinstance(space, gym.spaces.MultiDiscrete):
        return int(len(space.nvec))
    if isinstance(space, gym.spaces.MultiBinary):
        return int(np.prod(space.shape))
    if isinstance(space, gym.spaces.Text):
        return int(space.max_length)
    raise NotImplementedError(f"Unsupported space: {space}")


def space_nvec(space):
    """Per-component discrete ranges, or None for non-multi spaces."""
    if isinstance(space, gym.spaces.MultiDiscrete):
        return [int(n) for n in np.asarray(space.nvec).reshape(-1)]
    if isinstance(space, gym.spaces.MultiBinary):
        return [2] * int(np.prod(space.shape))
    if isinstance(space, gym.spaces.Text):
        # one slot per character; index 0 = padding for strings shorter
        # than max_length, 1..len(charset) = space.characters (sorted)
        return [len(space.characters) + 1] * int(space.max_length)
    return None


def encode_text(space: "gym.spaces.Text", strings) -> np.ndarray:
    """[T] strings -> [T, max_length] int32 (0 = pad, i+1 = characters[i])."""
    chars = space.characters
    index = {c: i + 1 for i, c in enumerate(chars)}
    out = np.zeros((len(strings), int(space.max_length)), np.int32)
    for t, s in enumerate(strings):
        for j, ch in enumerate(str(s)[: int(space.max_length)]):
            out[t, j] = index[ch]
    return out


def decode_text(space: "gym.spaces.Text", indices) -> str:
    """[max_length] component indices -> string (pads stripped, min_length
    enforced with the charset's first character so env.contains holds)."""
    chars = space.characters
    s = "".join(
        chars[int(i) - 1] for i in np.asarray(indices).reshape(-1) if int(i) > 0
    )
    if len(s) < int(space.min_length):
        s = s + chars[0] * (int(space.min_length) - len(s))
    return s


class ControlImageTransform:
    """Grayscale->3ch, ensure HWC, zero-pad H/W to patch multiples.

    Reference ControlImageTransform (control_task.py:345-389) works in CHW
    for torch; the TPU packer consumes HWC (NHWC is the TPU conv layout).
    Accepts an env or a Box space directly (Dict obs sub-components).
    """

    def __init__(self, env, patch_size: int = 16):
        space = getattr(env, "observation_space", env)
        assert isinstance(space, gym.spaces.Box)
        assert len(space.shape) in (2, 3)
        self.patch_size = patch_size
        self.grayscale = len(space.shape) == 2
        if self.grayscale:
            self.height, self.width = space.shape
            self.channel_first = False
        else:
            assert space.shape[0] == 3 or space.shape[-1] == 3
            self.channel_first = space.shape[0] == 3
            if self.channel_first:
                self.height, self.width = space.shape[1], space.shape[2]
            else:
                self.height, self.width = space.shape[0], space.shape[1]
        self.padding_h = (-self.height) % patch_size
        self.padding_w = (-self.width) % patch_size
        self.out_height = self.height + self.padding_h
        self.out_width = self.width + self.padding_w

    def transform(self, images: np.ndarray) -> np.ndarray:
        """[T, ...] -> [T, H', W', 3] float32."""
        images = np.asarray(images, np.float32)
        if self.grayscale:
            images = images.reshape(-1, self.height, self.width, 1)
            images = np.repeat(images, 3, axis=-1)
        elif self.channel_first:
            images = images.transpose(0, 2, 3, 1)
        if self.padding_h or self.padding_w:
            images = np.pad(
                images,
                ((0, 0), (0, self.padding_h), (0, self.padding_w), (0, 0)),
            )
        return images


class DictObsCodec:
    """Maps a Dict/Tuple observation space onto the packer's per-timestep
    modality slots — the Gato-paper setup (camera image + proprioception in
    ONE timestep) that the reference's single-space obs classification
    cannot represent (control_task.py:53-65).

    Components are grouped into the packer's canonical interleave order
    [image | continuous_obs | discrete_obs] (data/packing.py): at most one
    image Box; all 1-D Boxes concatenate (sorted by key) into
    continuous_obs; Discrete/MultiDiscrete/MultiBinary/Text concatenate
    into discrete_obs."""

    def __init__(self, space, patch_size: int = 16):
        if isinstance(space, gym.spaces.Tuple):
            items = [(str(i), s) for i, s in enumerate(space.spaces)]
        else:
            items = sorted(space.spaces.items())
        self.image_key = None
        self.image_transform = None
        self.cont_items = []
        self.disc_items = []
        for k, s in items:
            if isinstance(s, gym.spaces.Box) and len(s.shape) in (2, 3):
                assert self.image_key is None, (
                    "at most one image component per Dict obs space"
                )
                self.image_key = k
                self.image_transform = ControlImageTransform(s, patch_size)
            elif isinstance(s, gym.spaces.Box):
                assert len(s.shape) == 1, f"unsupported Box shape {s.shape}"
                self.cont_items.append((k, int(s.shape[0])))
            elif isinstance(s, SUPPORTED_SPACES):
                self.disc_items.append((k, s))
            else:
                raise NotImplementedError(f"unsupported Dict component {s}")
        t = self.image_transform
        self.patches_per_timestep = (
            0 if t is None
            else (t.out_height // patch_size) * (t.out_width // patch_size)
        )
        self.cont_tokens = sum(n for _, n in self.cont_items)
        self.disc_tokens = sum(tokens_per_space(s) for _, s in self.disc_items)
        self.obs_tokens = (
            self.patches_per_timestep + self.cont_tokens + self.disc_tokens
        )
        self.entry_keys = []
        if self.image_key is not None:
            self.entry_keys.append("images")
        if self.cont_items:
            self.entry_keys.append("continuous_obs")
        if self.disc_items:
            self.entry_keys.append("discrete_obs")

    def _disc_component(self, s, v, T: int) -> np.ndarray:
        if isinstance(s, gym.spaces.Text):
            return encode_text(s, list(v))
        return np.asarray(v, np.int32).reshape(T, -1)

    def encode(self, obs: Dict) -> Dict[str, np.ndarray]:
        """{component key: [T, ...]} -> packer modality entries."""
        T = len(next(iter(obs.values())))
        out: Dict[str, np.ndarray] = {}
        if self.image_key is not None:
            out["images"] = self.image_transform.transform(obs[self.image_key])
        if self.cont_items:
            out["continuous_obs"] = np.concatenate(
                [
                    np.asarray(obs[k], np.float32).reshape(T, -1)
                    for k, _ in self.cont_items
                ],
                axis=1,
            )
        if self.disc_items:
            out["discrete_obs"] = np.concatenate(
                [self._disc_component(s, obs[k], T) for k, s in self.disc_items],
                axis=1,
            )
        return out


def _obs_tail(h, n: int):
    """history[-n:], dict-aware (slice_obs with a tail window)."""
    return slice_obs(h, -n, None)


class DictActCodec:
    """Maps a Dict/Tuple ACTION space onto one token run per timestep.

    All components must share a kind: every component discrete-family
    (Discrete/MultiDiscrete/MultiBinary/Text — concatenated per-component
    nvec rides the existing MultiDiscrete decode limits) or every component
    a 1-D Box (concatenated continuous tokens).  Mixed kinds would need two
    token ranges inside one decode run — unsupported, assert early."""

    def __init__(self, space):
        self.is_tuple = isinstance(space, gym.spaces.Tuple)
        if self.is_tuple:
            items = [(str(i), s) for i, s in enumerate(space.spaces)]
        else:
            items = sorted(space.spaces.items())
        kinds = set()
        for _, s in items:
            if isinstance(s, gym.spaces.Box):
                assert len(s.shape) == 1, f"unsupported Box action {s.shape}"
                kinds.add("continuous")
            elif isinstance(s, SUPPORTED_SPACES):
                kinds.add("discrete")
            else:
                raise NotImplementedError(f"unsupported Dict component {s}")
        assert len(kinds) == 1, (
            "Dict action components must all be continuous or all discrete"
        )
        self.kind = kinds.pop()
        self.items = items
        self.widths = [
            int(s.shape[0]) if isinstance(s, gym.spaces.Box)
            else tokens_per_space(s)
            for _, s in items
        ]
        self.tokens = sum(self.widths)
        if self.kind == "discrete":
            self.nvec = []
            for _, s in items:
                if isinstance(s, gym.spaces.Discrete):
                    self.nvec.append(int(s.n))
                else:
                    self.nvec.extend(space_nvec(s))
        else:
            self.nvec = None

    def _enc_component(self, s, v, T: int) -> np.ndarray:
        if isinstance(s, gym.spaces.Text):
            return encode_text(s, list(v)).astype(np.float32)
        return np.asarray(v, np.float32).reshape(T, -1)

    def encode(self, actions) -> np.ndarray:
        """{component key: [T, ...]} -> [T, tokens] (int32/float32)."""
        T = len(next(iter(actions.values())))
        out = np.concatenate(
            [self._enc_component(s, actions[k], T) for k, s in self.items],
            axis=1,
        )
        return out.astype(
            np.float32 if self.kind == "continuous" else np.int32
        )

    def decode(self, vec) -> Dict:
        """[tokens] decoded components -> dict action for env.step."""
        vec = np.asarray(vec).reshape(-1)
        out, i = {}, 0
        for (k, s), w in zip(self.items, self.widths):
            part = vec[i : i + w]
            i += w
            if isinstance(s, gym.spaces.Text):
                out[k] = decode_text(s, part)
            elif isinstance(s, gym.spaces.Discrete):
                out[k] = int(part[0])
            elif isinstance(s, gym.spaces.Box):
                out[k] = np.asarray(part, s.dtype).reshape(s.shape)
            else:  # MultiDiscrete / MultiBinary
                out[k] = np.asarray(part, s.dtype).reshape(s.shape)
        if self.is_tuple:
            return tuple(out[str(i)] for i in range(len(self.items)))
        return out


class ControlTask(Task):
    def __init__(
        self,
        env_name: str,
        env: gym.Env,
        dataset: EpisodeDataset,
        context_len: int,
        patch_size: int = 16,
        training_prompt_len_proportion: float = 0.5,
        share_prompt_episodes: bool = True,
        top_k_prompting: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        self.name = env_name
        self.is_atari = "ALE" in env_name
        self.env = env
        self.dataset = dataset
        self.context_len = context_len
        self.rng = np.random.default_rng(seed)
        # evaluation prompts draw from their own stream so in-loop eval
        # never perturbs the training sample stream (exact-resume contract,
        # utils/host_state.py)
        self.eval_rng = np.random.default_rng(
            None if seed is None else (seed + 0x5EED) % 2**32
        )

        act_space, obs_space = env.action_space, env.observation_space
        assert isinstance(
            act_space, SUPPORTED_SPACES + (gym.spaces.Dict, gym.spaces.Tuple)
        ), f"unsupported {act_space}"
        assert isinstance(
            obs_space, SUPPORTED_SPACES + (gym.spaces.Dict, gym.spaces.Tuple)
        ), f"unsupported {obs_space}"

        # observation modality (control_task.py:53-65); Text obs become
        # per-character discrete tokens (pad index 0); Dict/Tuple obs map
        # to multiple packer modalities in one timestep (DictObsCodec)
        self.dict_obs = (
            DictObsCodec(obs_space, patch_size)
            if isinstance(obs_space, (gym.spaces.Dict, gym.spaces.Tuple))
            else None
        )
        if self.dict_obs is not None:
            self.obs_str = None
        elif isinstance(obs_space, gym.spaces.Box):
            self.obs_str = "images" if len(obs_space.shape) in (2, 3) else "continuous_obs"
        else:
            self.obs_str = "discrete_obs"
        self.image_transform = (
            ControlImageTransform(env, patch_size) if self.obs_str == "images" else None
        )
        self.text_obs_space = (
            obs_space if isinstance(obs_space, gym.spaces.Text) else None
        )
        self.obs_entry_keys = (
            self.dict_obs.entry_keys if self.dict_obs is not None
            else [self.obs_str]
        )

        # Dict/Tuple actions: components concatenate into one token run
        # (uniform kind — DictActCodec)
        self.dict_act = (
            DictActCodec(act_space)
            if isinstance(act_space, (gym.spaces.Dict, gym.spaces.Tuple))
            else None
        )
        if self.dict_act is not None:
            self.action_kind = self.dict_act.kind
            self.action_tokens = self.dict_act.tokens
            self.num_actions = None
            self.action_nvec = self.dict_act.nvec
            self.text_action_space = None
        else:
            self.action_kind = (
                "continuous" if isinstance(act_space, gym.spaces.Box)
                else "discrete"
            )
            self.action_tokens = tokens_per_space(act_space)
            self.num_actions = (
                int(act_space.n)
                if isinstance(act_space, gym.spaces.Discrete) else None
            )
            # MultiDiscrete/MultiBinary/Text actions: one token per
            # component, each restricted to its own range at decode time
            self.action_nvec = space_nvec(act_space)
            self.text_action_space = (
                act_space if isinstance(act_space, gym.spaces.Text) else None
            )
        self.action_str = f"{self.action_kind}_actions"

        if self.dict_obs is not None:
            self.patches_per_timestep = self.dict_obs.patches_per_timestep
            self.observation_tokens = self.dict_obs.obs_tokens
        elif self.obs_str == "images":
            t = self.image_transform
            self.patches_per_timestep = (t.out_height // patch_size) * (
                t.out_width // patch_size
            )
            self.observation_tokens = self.patches_per_timestep
        else:
            self.patches_per_timestep = 0
            self.observation_tokens = tokens_per_space(obs_space)

        self.tokens_per_timestep = self.action_tokens + self.observation_tokens + 1
        assert context_len >= self.tokens_per_timestep, (
            f"context must fit one timestep ({self.tokens_per_timestep}) "
            f"for env {env_name}"
        )

        self.training_prompt_len_proportion = training_prompt_len_proportion
        assert 0.0 <= training_prompt_len_proportion <= 1.0
        self.share_prompt_episodes = share_prompt_episodes
        self.prompt_types = ["start", "end", "uniform"]

        self.top_k_prompting = top_k_prompting
        if top_k_prompting is not None:
            assert 0 < top_k_prompting <= dataset.total_episodes
            returns = dataset.episode_returns()
            self.top_ids = np.argsort(returns)[-top_k_prompting:]
        else:
            self.top_ids = None

    # --------------------------------------------------------------- util
    @property
    def context_timesteps(self) -> int:
        return self.context_len // self.tokens_per_timestep

    @property
    def required_patches(self) -> int:
        """Static patch budget this task needs in the packer."""
        return self.context_timesteps * self.patches_per_timestep

    def _obs_array(self, observations: np.ndarray) -> np.ndarray:
        if self.image_transform is not None:
            return self.image_transform.transform(observations)
        if self.text_obs_space is not None:
            return encode_text(self.text_obs_space, list(observations))
        if self.obs_str == "discrete_obs":
            return np.asarray(observations, np.int32)
        return np.asarray(observations, np.float32)

    def _obs_entries(self, observations) -> Dict[str, np.ndarray]:
        """[T, ...] raw obs (dict of arrays for Dict/Tuple spaces) ->
        packer modality entries."""
        if self.dict_obs is not None:
            return self.dict_obs.encode(observations)
        return {self.obs_str: self._obs_array(observations)}

    def _raw_obs_step(self, observation):
        """One env observation -> [1, ...] raw batch (dict-aware)."""
        if isinstance(observation, (dict, tuple)):
            if isinstance(observation, tuple):  # Tuple obs -> indexed keys
                observation = {str(i): o for i, o in enumerate(observation)}
            return {k: np.asarray(v)[None] for k, v in observation.items()}
        return np.asarray(observation)[None]

    def _act_array(self, actions: np.ndarray) -> np.ndarray:
        if self.dict_act is not None:
            return self.dict_act.encode(actions)
        if self.text_action_space is not None:
            return encode_text(self.text_action_space, list(actions))
        if self.action_kind == "continuous":
            a = np.asarray(actions, np.float32)
        else:
            a = np.asarray(actions, np.int32)
        return a.reshape(a.shape[0], self.action_tokens)

    # ------------------------------------------------------------ sampling
    def sample_batch(
        self,
        vanilla_batch_size: int,
        prompted_batch_sizes: Dict[str, int],
        max_tokens: int = 1024,
    ) -> List[Dict]:
        """Expand vanilla + per-prompt-type counts into per-example lists
        (reference control_task.py:175-207)."""
        prompt_proportions: List[float] = []
        prompt_types: List[Optional[str]] = []
        for _ in range(vanilla_batch_size):
            prompt_proportions.append(0.0)
            prompt_types.append(None)
        for ptype, n in prompted_batch_sizes.items():
            assert ptype in self.prompt_types
            prompt_proportions += [self.training_prompt_len_proportion] * n
            prompt_types += [ptype] * n
        return self.sample_batch_configurable(
            len(prompt_proportions),
            prompt_proportions,
            prompt_types,
            max_tokens=max_tokens,
            share_prompt_episodes=self.share_prompt_episodes,
        )

    def sample_batch_configurable(
        self,
        batch_size: int,
        prompt_proportions: List[float],
        prompt_types: List[Optional[str]],
        max_tokens: int = 1024,
        share_prompt_episodes: bool = True,
        ep_ids: Optional[np.ndarray] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> List[Dict]:
        """Reference control_task.py:209-325, numpy end to end."""
        rng = self.rng if rng is None else rng
        num_timesteps = max_tokens // self.tokens_per_timestep

        episodes = self.dataset.sample_episodes(
            batch_size, rng=rng, episode_indices=ep_ids
        )
        main_episodes = episodes
        prompt_episodes = (
            episodes if share_prompt_episodes else episodes[1:] + episodes[:1]
        )

        out: List[Dict] = []
        obs_list, act_list, prompt_budget = [], [], []
        for i, ep in enumerate(main_episodes):
            timesteps_for_main = round(num_timesteps * (1 - prompt_proportions[i]))
            prompt_budget.append(num_timesteps - timesteps_for_main)
            ep_len = ep.total_timesteps
            if timesteps_for_main >= ep_len:
                start, end = 0, ep_len - 1  # reference keeps ep_len-1 steps
            else:
                start = int(rng.integers(0, ep_len - timesteps_for_main))
                end = start + timesteps_for_main
            obs_list.append(slice_obs(ep.observations, start, end))
            act_list.append(slice_obs(ep.actions, start, end))

        for i, ep in enumerate(prompt_episodes):
            n_prompt = prompt_budget[i]
            if n_prompt <= 0:
                continue
            ptype = prompt_types[i]
            assert ptype in self.prompt_types, f"invalid prompt type {ptype}"
            ep_len = ep.total_timesteps
            if n_prompt >= ep_len:
                p_start, p_end = 0, ep_len - 1
            elif ptype == "start":
                p_start, p_end = 0, n_prompt - 1
            elif ptype == "end":
                p_end = ep_len - 1
                p_start = p_end - n_prompt + 1
            else:  # uniform
                p_start = int(rng.integers(0, ep_len - n_prompt))
                p_end = p_start + n_prompt - 1
            obs_list[i] = concat_obs(
                slice_obs(ep.observations, p_start, p_end + 1), obs_list[i]
            )
            act_list[i] = concat_obs(
                slice_obs(ep.actions, p_start, p_end + 1), act_list[i]
            )

        for obs, act in zip(obs_list, act_list):
            out.append(
                {
                    **self._obs_entries(obs),
                    self.action_str: self._act_array(act),
                }
            )
        return out

    # ---------------------------------------------------------- evaluation
    def _clone_env(self):
        """Fresh env instance for parallel rollouts (deepcopy, falling back
        to re-making from the registered spec)."""
        import copy

        try:
            return copy.deepcopy(self.env)
        except Exception:
            spec = getattr(self.env, "spec", None)
            if spec is None:
                raise
            import gymnasium as gym

            return gym.make(spec)

    def _make_session(self, generator: Generator):
        ctx_ts = generator.cfg.context_len // self.tokens_per_timestep
        return generator.rollout_session(
            obs_str=self.obs_str,
            action_str=self.action_str,
            obs_tokens=self.observation_tokens,
            action_tokens=self.action_tokens,
            action_kind=self.action_kind,
            num_actions=self.num_actions,
            action_nvec=self.action_nvec,
            context_timesteps=ctx_ts,
            patches_per_timestep=self.patches_per_timestep,
        )

    def _env_action(self, action):
        """Decoded action -> what env.step expects."""
        if self.dict_act is not None:
            return self.dict_act.decode(action)
        if self.action_kind != "discrete":
            return np.asarray(action, np.float32)
        if self.text_action_space is not None:
            return decode_text(self.text_action_space, action)
        if self.action_nvec is not None:
            return np.asarray(action, np.int64)
        return int(action)

    def _sample_eval_prompt(self, generator: Generator) -> Dict:
        return self.sample_batch_configurable(
            1, [1.0], ["end"],
            max_tokens=generator.cfg.context_len,
            share_prompt_episodes=True,
            ep_ids=self.top_ids,
            rng=self.eval_rng,  # eval never perturbs the training stream
        )[0]

    def evaluate(
        self,
        generator: Generator,
        n_iterations: int = 10,
        deterministic: bool = True,
        promptless_eval: bool = False,
        parallel_episodes: int = 1,
        rollout_cache: bool = True,
    ) -> Dict[str, float]:
        """Env-rollout evaluation (reference control_task.py:106-173).

        rollout_cache=True (default) keeps the KV cache alive across env
        steps: one compiled ring-extend + action-decode call per step instead
        of re-packing and re-prefilling the full context
        (inference/generator.py::RolloutSession).  False falls back to the
        re-pack path (exact reference sliding-window semantics; used by the
        parity tests)."""
        if parallel_episodes > 1:
            try:
                clones = [self._clone_env() for _ in range(
                    min(parallel_episodes, n_iterations))]
            except Exception as e:  # env not clonable -> serial
                print(f"[neko-tpu] env not clonable ({e}); serial eval")
                clones = None
            if clones is not None:
                # genuine rollout errors propagate — only clone failures
                # demote to the serial path
                return self._evaluate_parallel(
                    generator, n_iterations, deterministic, promptless_eval,
                    clones, rollout_cache,
                )
        returns, clipped_returns, ep_lens = [], [], []
        ctx_ts = generator.cfg.context_len // self.tokens_per_timestep
        session = self._make_session(generator) if rollout_cache else None

        for it in range(n_iterations):
            observation, _ = self.env.reset()

            if promptless_eval:
                obs_hist = None
                act_hist = None
                if session is not None:
                    session.start([None])
            else:
                prompt = self._sample_eval_prompt(generator)
                obs_hist = {k: prompt[k] for k in self.obs_entry_keys}
                act_hist = prompt[self.action_str]
                if session is not None:
                    session.start([prompt])

            done = False
            ep_return = ep_clip = 0.0
            ep_len = 0
            while not done:
                new_obs = self._obs_entries(self._raw_obs_step(observation))
                if session is not None:
                    action = session.step(
                        [new_obs], deterministic=deterministic
                    )[0]
                else:
                    new_act = np.zeros(
                        (1, self.action_tokens),
                        np.float32 if self.action_kind == "continuous" else np.int32,
                    )
                    if obs_hist is None:
                        obs_hist, act_hist = new_obs, new_act
                    else:
                        obs_hist = concat_obs(obs_hist, new_obs)
                        act_hist = np.concatenate([act_hist, new_act], axis=0)
                    obs_hist = _obs_tail(obs_hist, ctx_ts)
                    act_hist = act_hist[-ctx_ts:]

                    example = {**obs_hist, self.action_str: act_hist}
                    action = generator.predict_control(
                        example,
                        action_kind=self.action_kind,
                        action_tokens=self.action_tokens,
                        num_actions=self.num_actions,
                        action_nvec=self.action_nvec,
                        deterministic=deterministic,
                        rng=None,
                    )
                    act_hist[-1] = action
                env_action = self._env_action(action)
                observation, reward, term, trunc, _ = self.env.step(env_action)
                done = term or trunc
                ep_return += reward
                ep_clip += float(np.clip(reward, -1.0, 1.0))
                ep_len += 1
            returns.append(ep_return)
            clipped_returns.append(ep_clip)
            ep_lens.append(ep_len)

        metrics = {
            "mean_return": float(np.mean(returns)),
            "mean_episode_len": float(np.mean(ep_lens)),
        }
        if self.is_atari:
            metrics["mean_clipped_return"] = float(np.mean(clipped_returns))
        return metrics

    def _evaluate_parallel(
        self,
        generator: Generator,
        n_iterations: int,
        deterministic: bool,
        promptless_eval: bool,
        clones: List,
        rollout_cache: bool = True,
    ) -> Dict[str, float]:
        """Lockstep rollouts over cloned envs: one batched device call
        serves every active episode per env step (the reference runs
        episodes strictly serially, control_task.py:113-166).  With
        rollout_cache the call is a ring-extend + decode instead of a full
        re-prefill (see evaluate)."""
        ctx_ts = generator.cfg.context_len // self.tokens_per_timestep
        returns, clipped_returns, ep_lens = [], [], []
        remaining = n_iterations
        act_dtype = (
            np.float32 if self.action_kind == "continuous" else np.int32
        )
        session = self._make_session(generator) if rollout_cache else None
        while remaining > 0:
            G = min(len(clones), remaining)
            envs = clones[:G]
            obs = []
            obs_hist: List = []
            act_hist: List = []
            prompts: List = []
            for env in envs:
                o, _ = env.reset()
                obs.append(o)
                if promptless_eval:
                    prompts.append(None)
                    obs_hist.append(None)
                    act_hist.append(None)
                else:
                    prompt = self._sample_eval_prompt(generator)
                    prompts.append(prompt)
                    obs_hist.append(
                        {k: prompt[k] for k in self.obs_entry_keys}
                    )
                    act_hist.append(prompt[self.action_str])
            if session is not None:
                session.start(prompts)
            done = [False] * G
            ep_ret = [0.0] * G
            ep_clip = [0.0] * G
            ep_len = [0] * G

            while not all(done):
                if session is not None:
                    # done rows keep stepping on their stale obs (static
                    # batch shape); their actions are ignored below
                    new_obs = [
                        self._obs_entries(self._raw_obs_step(obs[i]))
                        for i in range(G)
                    ]
                    actions = session.step(
                        new_obs, deterministic=deterministic
                    )
                else:
                    examples = []
                    for i in range(G):
                        if not done[i]:
                            new_obs = self._obs_entries(
                                self._raw_obs_step(obs[i])
                            )
                            new_act = np.zeros((1, self.action_tokens), act_dtype)
                            if obs_hist[i] is None:
                                obs_hist[i], act_hist[i] = new_obs, new_act
                            else:
                                obs_hist[i] = _obs_tail(
                                    concat_obs(obs_hist[i], new_obs), ctx_ts
                                )
                                act_hist[i] = np.concatenate(
                                    [act_hist[i], new_act], axis=0
                                )[-ctx_ts:]
                        examples.append(
                            {
                                **obs_hist[i],
                                self.action_str: act_hist[i],
                            }
                        )
                    actions = generator.predict_control_batch(
                        examples,
                        action_kind=self.action_kind,
                        action_tokens=self.action_tokens,
                        num_actions=self.num_actions,
                        action_nvec=self.action_nvec,
                        deterministic=deterministic,
                    )
                for i in range(G):
                    if done[i]:
                        continue
                    if session is None:
                        act_hist[i][-1] = actions[i]
                    env_action = self._env_action(actions[i])
                    o, reward, term, trunc, _ = envs[i].step(env_action)
                    obs[i] = o
                    done[i] = term or trunc
                    ep_ret[i] += reward
                    ep_clip[i] += float(np.clip(reward, -1.0, 1.0))
                    ep_len[i] += 1
            returns += ep_ret
            clipped_returns += ep_clip
            ep_lens += ep_len
            remaining -= G

        metrics = {
            "mean_return": float(np.mean(returns)),
            "mean_episode_len": float(np.mean(ep_lens)),
        }
        if self.is_atari:
            metrics["mean_clipped_return"] = float(np.mean(clipped_returns))
        return metrics
