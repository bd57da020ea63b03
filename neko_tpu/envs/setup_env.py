"""Dataset-name -> (env, dataset) resolution.

Mirrors /root/reference/gato/envs/setup_env.py: keyword expansion
(TOP1_ATARI_TRAIN/TEST -> '{Game}-top1-s1-v0' lists), prefix-dispatched custom
env loaders ('ALE/' -> Atari preprocessing), Minari dataset loading with the
env rebuilt from the dataset spec — plus TPU-framework additions:

* synthetic offline datasets (neko-synth-*) with zero native deps
* HDF5 episode files loadable by path ('h5:/path/file.h5:EnvId' or a bare
  .h5/.hdf5 path whose env id is stored in file attrs)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from neko_tpu.data.episodes import (
    EpisodeDataset,
    H5EpisodeDataset,
    MinariEpisodeDataset,
)
from neko_tpu.envs.atari import TEST_GAMES as ATARI_TEST
from neko_tpu.envs.atari import TRAIN_GAMES as ATARI_TRAIN
from neko_tpu.envs.atari import load_atari_env
from neko_tpu.envs.synthetic import SYNTHETIC_SPECS, load_synthetic

custom_env_loaders = {
    "ALE/": load_atari_env,
}

_MINARI_FMT = "{}-top1-s1-v0"
custom_key_words = {
    "TOP1_ATARI_TRAIN": [_MINARI_FMT.format(g) for g in ATARI_TRAIN],
    "TOP1_ATARI_TEST": [_MINARI_FMT.format(g) for g in ATARI_TEST],
}


def expand_dataset_names(dataset_names: List[str]) -> List[str]:
    out: List[str] = []
    for name in dataset_names:
        if name in custom_key_words:
            out.extend(custom_key_words[name])
        else:
            out.append(name)
    return out


def load_envs(
    dataset_names: List[str], load_kwargs: Optional[Dict] = None
) -> Tuple[list, List[EpisodeDataset]]:
    load_kwargs = load_kwargs or {}
    envs, datasets = [], []
    for name in expand_dataset_names(dataset_names):
        env, dataset = load_env_dataset(name, load_kwargs)
        envs.append(env)
        datasets.append(dataset)
    return envs, datasets


def _make_env_for_id(env_id: str, load_kwargs: Dict):
    if env_id in SYNTHETIC_SPECS:
        kw = {k: v for k, v in load_kwargs.items()
              if k not in ("n_episodes", "seed", "render_mode")}
        return SYNTHETIC_SPECS[env_id](kw)
    for prefix, loader in custom_env_loaders.items():
        if prefix in env_id:
            return loader(env_id, load_kwargs)
    import gymnasium as gym

    return gym.make(env_id, **{k: v for k, v in load_kwargs.items()
                               if k in ("render_mode",)})


def load_env_dataset(
    dataset_name: str, load_kwargs: Optional[Dict] = None
) -> Tuple[object, EpisodeDataset]:
    load_kwargs = load_kwargs or {}

    # 1. synthetic
    if dataset_name in SYNTHETIC_SPECS:
        return load_synthetic(dataset_name, load_kwargs)

    # 2. explicit HDF5 episode file
    if dataset_name.startswith("h5:") or dataset_name.endswith((".h5", ".hdf5")):
        path = dataset_name
        env_id = None
        if path.startswith("h5:"):
            parts = path[3:].split(":", 1)
            path = parts[0]
            env_id = parts[1] if len(parts) > 1 else None
        dataset = H5EpisodeDataset(path)
        env_id = env_id or dataset.spec_env_id
        if env_id is None:
            raise ValueError(
                f"HDF5 dataset {path} carries no env_id attr; use "
                "'h5:<path>:<EnvId>'"
            )
        return _make_env_for_id(str(env_id), load_kwargs), dataset

    # 3. Minari (reference path; import-gated)
    try:
        import minari
    except ImportError as e:
        raise ImportError(
            f"dataset '{dataset_name}' requires the 'minari' package, which "
            "is not installed. Use a synthetic dataset "
            f"({sorted(SYNTHETIC_SPECS)}) or an HDF5 episode file instead."
        ) from e

    md = minari.load_dataset(dataset_name)
    dataset = MinariEpisodeDataset(md)
    env_id = dataset.spec_env_id
    return _make_env_for_id(str(env_id), load_kwargs), dataset
