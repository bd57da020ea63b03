"""Atari environment loading + game registries.

Mirrors /root/reference/gato/envs/atari.py: the 45-game roster with the 5
Scaled-QL holdout (test) games, and the preprocessing recipe
(gym.make(frameskip=1, repeat_action_probability=0) wrapped in
AtariPreprocessing(frame_skip=4, noop_max=0), optional reward clipping —
atari.py:6-20).  Import of the ALE binding is gated so the rest of the
framework works without it.
"""

from __future__ import annotations

import numpy as np

# 45-game roster (atari.py:22-68); game titles are factual identifiers.
ALL_GAMES = [
    "Alien", "Amidar", "Assault", "Asterix", "Atlantis", "BankHeist",
    "BattleZone", "BeamRider", "Boxing", "Breakout", "Carnival", "Centipede",
    "ChopperCommand", "CrazyClimber", "DemonAttack", "DoubleDunk", "Enduro",
    "FishingDerby", "Freeway", "Frostbite", "Gopher", "Gravitar", "Hero",
    "IceHockey", "Jamesbond", "Kangaroo", "Krull", "KungFuMaster", "MsPacman",
    "NameThisGame", "Phoenix", "Pong", "Pooyan", "Qbert", "Riverraid",
    "Robotank", "Seaquest", "SpaceInvaders", "StarGunner", "TimePilot",
    "UpNDown", "VideoPinball", "WizardOfWor", "YarsRevenge", "Zaxxon",
]

# Scaled-QL holdouts (atari.py:71-77)
TEST_GAMES = ["Alien", "MsPacman", "Pong", "SpaceInvaders", "StarGunner"]

TRAIN_GAMES = [g for g in ALL_GAMES if g not in TEST_GAMES]

assert len(TRAIN_GAMES) == 40 and len(ALL_GAMES) == 45


def load_atari_env(env_name: str, load_kwargs: dict):
    """Build an ALE env with Gato preprocessing (reference atari.py:6-20)."""
    import gymnasium as gym
    from gymnasium.wrappers import AtariPreprocessing

    assert "v5" in env_name, f"expected an ALE v5 env name, got {env_name}"

    repeat_action_probability = load_kwargs.get("repeat_action_probability", 0)
    clip_rewards = load_kwargs.get("clip_rewards", False)
    render_mode = load_kwargs.get("render_mode", None)

    env = gym.make(
        env_name,
        frameskip=1,
        repeat_action_probability=repeat_action_probability,
        render_mode=render_mode,
    )
    env = AtariPreprocessing(env, frame_skip=4, noop_max=0)
    if clip_rewards:
        from gymnasium.wrappers import TransformReward

        env = TransformReward(env, lambda r: np.clip(r, -1.0, 1.0))
    return env
