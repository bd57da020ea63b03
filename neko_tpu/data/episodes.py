"""Episode storage: a thin, backend-agnostic offline-RL trajectory store.

The reference reaches into Minari's private internals
(`dataset._episode_indices`, `dataset._generator`, `dataset._data.get_episodes`
— control_task.py:328-340).  Here the same sampling distribution runs against
a small abstraction with three backends:

* in-memory (synthetic datasets, tests)
* HDF5 files in the Minari on-disk layout (h5py), streamed per episode
* a Minari adapter when the `minari` package is installed
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Episode:
    observations: np.ndarray  # [T(+1), ...]; observations/actions may be
    actions: np.ndarray       # dict[str, array] for Dict/Tuple spaces
    rewards: np.ndarray       # [T]

    @property
    def total_timesteps(self) -> int:
        a = self.actions
        if isinstance(a, dict):
            return int(next(iter(a.values())).shape[0])
        return int(a.shape[0])


def slice_obs(obs, start: int, end: int):
    """observations[start:end], dict-aware (Dict/Tuple obs spaces store a
    dict of per-component arrays sharing the leading time dim)."""
    if isinstance(obs, dict):
        return {k: v[start:end] for k, v in obs.items()}
    return obs[start:end]


def concat_obs(a, b):
    """Time-axis concatenation, dict-aware."""
    if isinstance(a, dict):
        return {k: np.concatenate([a[k], b[k]], axis=0) for k in a}
    return np.concatenate([a, b], axis=0)


class EpisodeDataset:
    """Base interface; subclasses implement __len__ / get_episode."""

    spec_env_id: Optional[str] = None

    def __len__(self) -> int:
        raise NotImplementedError

    @property
    def total_episodes(self) -> int:
        return len(self)

    def get_episode(self, idx: int) -> Episode:
        raise NotImplementedError

    def get_episodes(self, indices: Sequence[int]) -> List[Episode]:
        return [self.get_episode(int(i)) for i in indices]

    def sample_episodes(
        self,
        n_episodes: int,
        rng: Optional[np.random.Generator] = None,
        episode_indices: Optional[Sequence[int]] = None,
        replace: bool = False,
    ) -> List[Episode]:
        """Uniform sampling without replacement (reference
        control_task.py:328-340 via Minari's generator.choice)."""
        rng = rng or np.random.default_rng()
        if episode_indices is None:
            episode_indices = np.arange(len(self))
        idx = rng.choice(episode_indices, size=n_episodes, replace=replace)
        return self.get_episodes(idx)

    def episode_returns(self) -> np.ndarray:
        return np.array(
            [self.get_episode(i).rewards.sum() for i in range(len(self))]
        )


class InMemoryEpisodeDataset(EpisodeDataset):
    def __init__(self, episodes: List[Episode], spec_env_id: Optional[str] = None):
        self._episodes = episodes
        self.spec_env_id = spec_env_id

    def __len__(self) -> int:
        return len(self._episodes)

    def get_episode(self, idx: int) -> Episode:
        return self._episodes[idx]


class H5EpisodeDataset(EpisodeDataset):
    """Minari-style HDF5 layout: groups `episode_{i}` with datasets
    observations / actions / rewards, plus attrs `total_episodes` and
    `env_spec` when present."""

    def __init__(self, path: str):
        import h5py

        self._path = path
        self._file = h5py.File(path, "r")
        if "total_episodes" in self._file.attrs:
            self._n = int(self._file.attrs["total_episodes"])
        else:
            self._n = len(
                [k for k in self._file.keys() if k.startswith("episode_")]
            )
        self.spec_env_id = self._file.attrs.get("env_id")

    def __len__(self) -> int:
        return self._n

    def get_episode(self, idx: int) -> Episode:
        import h5py

        g = self._file[f"episode_{idx}"]

        def _load(node):  # Dict spaces: one dataset per component key
            if isinstance(node, h5py.Group):
                return {k: np.asarray(v) for k, v in node.items()}
            return np.asarray(node)

        return Episode(
            observations=_load(g["observations"]),
            actions=_load(g["actions"]),
            rewards=np.asarray(g["rewards"]),
        )

    def close(self):
        self._file.close()


def save_h5(
    path: str, episodes: List[Episode], env_id: Optional[str] = None
) -> None:
    import h5py

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["total_episodes"] = len(episodes)
        if env_id is not None:
            f.attrs["env_id"] = env_id
        for i, ep in enumerate(episodes):
            g = f.create_group(f"episode_{i}")
            for name, val in (("observations", ep.observations),
                              ("actions", ep.actions)):
                if isinstance(val, dict):
                    sub = g.create_group(name)
                    for k, v in val.items():
                        sub.create_dataset(k, data=v)
                else:
                    g.create_dataset(name, data=val)
            g.create_dataset("rewards", data=ep.rewards)


class MinariEpisodeDataset(EpisodeDataset):
    """Adapter over a loaded minari.MinariDataset (import-gated)."""

    def __init__(self, minari_dataset):
        self._ds = minari_dataset
        self._indices = np.asarray(getattr(minari_dataset, "episode_indices",
                                           np.arange(minari_dataset.total_episodes)))
        try:
            self.spec_env_id = minari_dataset.spec.env_spec.id
        except Exception:
            self.spec_env_id = None

    def __len__(self) -> int:
        return len(self._indices)

    def get_episode(self, idx: int) -> Episode:
        ep = list(self._ds.iterate_episodes([int(self._indices[idx])]))[0]

        def _conv(v):
            if isinstance(v, tuple):  # Tuple spaces -> indexed keys, same
                v = {str(i): x for i, x in enumerate(v)}  # as DictObsCodec
            return (
                {k: np.asarray(x) for k, x in v.items()}
                if isinstance(v, dict) else np.asarray(v)
            )

        return Episode(
            observations=_conv(ep.observations),
            actions=_conv(ep.actions),
            rewards=np.asarray(ep.rewards),
        )
