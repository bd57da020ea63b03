"""VQ image-tokenized control: image obs -> discrete code grids.

Composes the VQ-VAE tokenizer (models/vq.py) with the MultiDiscrete
machinery: wrapping an image env turns its observation space into
MultiDiscrete([K] * grid_cells), so the EXISTING control task trains on
image codes with one discrete token per grid cell — the RoboCat-style
pipeline the reference's wishlist names (misc/todo.md "could try RoboCat
style VQGAN image tokenization") but never built.

vs patch embeddings (the default image path): codes are 4-16x fewer
tokens per frame (a 16x16 frame -> 16 codes vs 1 patch... a 256x256
frame -> 4096 codes at /4 downscale vs 256 patches — pick the downscale
for the resolution), are LOSSY (quantized through the codebook), and
make the image stream *predictable* (codes are ordinary discrete tokens
the LM head can model — image prediction for free, which patch
embeddings can never give since they are input-only).

NOTE: codes must fit the discrete token band — codebook_size <=
ModelConfig.discrete_tokens (default 1024 holds the default 512)."""

from __future__ import annotations

from typing import Optional, Tuple

import gymnasium as gym
import numpy as np

import jax
import jax.numpy as jnp

from neko_tpu.data.episodes import Episode, InMemoryEpisodeDataset
from neko_tpu.models.vq import VQVAE


def _to_float_rgb(obs: np.ndarray) -> np.ndarray:
    """[H, W] or [H, W, C] (uint8 or float) -> float32 [H, W, 3] in [0,1]."""
    x = np.asarray(obs)
    if x.ndim == 2:
        x = np.repeat(x[..., None], 3, axis=-1)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return x.astype(np.float32)


class VQImageCodec:
    """Jitted encode/decode around trained VQ-VAE variables."""

    def __init__(self, model: VQVAE, params, codebook):
        self.model = model
        self.params = params
        self.codebook = codebook
        self._encode = jax.jit(
            lambda imgs: model.apply(
                {"params": params, "codebook": codebook}, imgs,
                method=VQVAE.encode_indices,
            )
        )
        self._grid: Optional[Tuple[int, int]] = None

    def grid_for(self, hw: Tuple[int, int]) -> Tuple[int, int]:
        d = self.model.cfg.downscale
        return (hw[0] + d - 1) // d, (hw[1] + d - 1) // d

    def encode(self, images: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] float in [0,1] -> int64 [B, h*w] codes."""
        return np.asarray(self._encode(jnp.asarray(images)), np.int64)

    def decode(self, codes: np.ndarray, grid: Tuple[int, int]) -> np.ndarray:
        return np.asarray(self.model.apply(
            {"params": self.params, "codebook": self.codebook},
            jnp.asarray(codes), grid, method=VQVAE.decode_indices,
        ))


class VQObservationWrapper(gym.ObservationWrapper):
    """Image obs -> MultiDiscrete code grid (one int per grid cell)."""

    def __init__(self, env: gym.Env, codec: VQImageCodec):
        super().__init__(env)
        space = env.observation_space
        assert isinstance(space, gym.spaces.Box) and len(space.shape) in (
            2, 3,
        ), f"VQ wrapper needs an image observation space, got {space}"
        self.codec = codec
        h, w = codec.grid_for(space.shape[:2])
        self.grid = (h, w)
        K = codec.model.cfg.codebook_size
        self.observation_space = gym.spaces.MultiDiscrete([K] * (h * w))

    def observation(self, obs):
        imgs = _to_float_rgb(obs)[None]
        return self.codec.encode(imgs)[0]

    # collect_expert_dataset and eval prompts call through to the raw
    # env's expert policy; it expects the RAW observation, so decode is
    # not needed — synthetic experts read env state, not obs
    def expert_action(self, obs=None):
        return self.env.expert_action(obs)


def encode_episode_dataset(
    dataset, codec: VQImageCodec, batch: int = 64, env_id: str = "vq",
) -> InMemoryEpisodeDataset:
    """Replace every episode's image observations with VQ code grids
    ([T, H, W(,C)] -> int64 [T, h*w]); actions/rewards untouched.  One
    batched device encode per chunk — tokenize once at load, not per
    sample (the packer then treats codes as ordinary discrete obs)."""
    episodes = []
    for i in range(dataset.total_episodes):
        ep = dataset.get_episode(i)
        obs = np.stack([_to_float_rgb(o) for o in np.asarray(
            ep.observations)])
        codes = []
        for s in range(0, len(obs), batch):
            codes.append(codec.encode(obs[s:s + batch]))
        episodes.append(Episode(
            observations=np.concatenate(codes, axis=0),
            actions=np.asarray(ep.actions),
            rewards=np.asarray(ep.rewards, np.float32),
        ))
    return InMemoryEpisodeDataset(episodes, spec_env_id=env_id)
