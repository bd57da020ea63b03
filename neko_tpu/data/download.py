"""Dataset download utilities.

The reference ships `gato/data/download_custom_datasets.py` which gdown-fetches
the pre-converted MuJoCo expert Minari datasets (d4rl_{halfcheetah,hopper,
walker2d}-expert-v2) into ~/.minari/datasets.  This module provides the same
capability without the gdown dependency, plus a converter from any loaded
Minari dataset into the framework's portable HDF5 episode layout
(neko_tpu/data/episodes.py) so datasets can be staged onto TPU VMs that do
not have Minari installed.

Usage:
    python -m neko_tpu.data.download --datasets d4rl_halfcheetah-expert-v2
    python -m neko_tpu.data.download --to_h5 out/ --datasets <minari names>
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

# Google Drive folder the reference pulls from
# (/root/reference/gato/data/download_custom_datasets.py:4-26)
REFERENCE_DRIVE_FOLDER = (
    "https://drive.google.com/drive/folders/1Qd1hb_YCSnWkyLOfPyn2mGIbGnNx9aA0"
)

CUSTOM_DATASETS = [
    "d4rl_halfcheetah-expert-v2",
    "d4rl_hopper-expert-v2",
    "d4rl_walker2d-expert-v2",
]


def minari_root() -> str:
    return os.environ.get(
        "MINARI_DATASETS_PATH",
        os.path.join(os.path.expanduser("~"), ".minari", "datasets"),
    )


def download_minari(dataset_names: List[str]) -> None:
    """Fetch datasets through Minari's own remote registry."""
    import minari

    for name in dataset_names:
        print(f"downloading {name} via minari...")
        minari.download_dataset(name)


def export_to_h5(dataset_names: List[str], out_dir: str) -> List[str]:
    """Convert loaded Minari datasets to portable HDF5 episode files."""
    import minari

    from neko_tpu.data.episodes import Episode, MinariEpisodeDataset, save_h5

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for name in dataset_names:
        md = minari.load_dataset(name)
        ds = MinariEpisodeDataset(md)
        episodes = [ds.get_episode(i) for i in range(len(ds))]
        path = os.path.join(out_dir, f"{name}.h5")
        save_h5(path, episodes, env_id=ds.spec_env_id)
        print(f"wrote {path} ({len(episodes)} episodes)")
        paths.append(path)
    return paths


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--datasets", nargs="+", default=CUSTOM_DATASETS)
    p.add_argument("--to_h5", type=str, default=None,
                   help="also export to portable HDF5 episode files here")
    args = p.parse_args(argv)
    try:
        download_minari(args.datasets)
    except ImportError:
        raise SystemExit(
            "minari is not installed; the reference's pre-converted datasets "
            f"live at {REFERENCE_DRIVE_FOLDER} — download manually into "
            f"{minari_root()} or use HDF5 episode files "
            "(see neko_tpu/data/episodes.py)."
        )
    if args.to_h5:
        export_to_h5(args.datasets, args.to_h5)


if __name__ == "__main__":
    main()
