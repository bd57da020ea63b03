"""Dataset download utilities.

The reference ships `gato/data/download_custom_datasets.py` which gdown-fetches
its pre-converted MuJoCo expert Minari datasets (d4rl_{halfcheetah,hopper,
walker2d}-expert-v2) from per-dataset Google Drive folders into
~/.minari/datasets (download_custom_datasets.py:4-26).  These are CUSTOM
uploads — Minari's own remote registry does not host them — so this module
reproduces the same Drive fetch (import-gated on gdown), falls back to the
Minari registry for names it does host, and adds a converter from any loaded
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

# The reference's per-dataset Google Drive folders
# (/root/reference/gato/data/download_custom_datasets.py:4-9).
CUSTOM_DATASET_URLS = {
    "d4rl_halfcheetah-expert-v2":
        "https://drive.google.com/drive/folders/1YcUMTS7cMrUP8KJ6aQL87D9uYnrvGT02?usp=drive_link",
    "d4rl_hopper-expert-v2":
        "https://drive.google.com/drive/folders/1upUt_aCRc3MCWhfVwpDlnW7YoVFEHre9?usp=drive_link",
    "d4rl_walker2d-expert-v2":
        "https://drive.google.com/drive/folders/1ncu2DEhADWQBH6EeU_SrywQm8ETMM15M?usp=drive_link",
}

CUSTOM_DATASETS = list(CUSTOM_DATASET_URLS)


def minari_root() -> str:
    return os.environ.get(
        "MINARI_DATASETS_PATH",
        os.path.join(os.path.expanduser("~"), ".minari", "datasets"),
    )


def dataset_path(name: str) -> str:
    return os.path.join(minari_root(), name)


def download_drive_folder(name: str, url: str, target: str) -> None:
    """Fetch one pre-converted dataset folder from Google Drive, matching the
    reference's gdown.download_folder call (download_custom_datasets.py:26)."""
    try:
        import gdown
    except ImportError as e:
        raise ImportError(
            "gdown is required to fetch the reference's custom Drive "
            f"datasets; `pip install gdown`, or download {url} manually "
            f"into {target}, or stage an HDF5 episode file instead "
            "(see neko_tpu/data/episodes.py)."
        ) from e
    os.makedirs(os.path.dirname(target), exist_ok=True)
    gdown.download_folder(url=url, output=target, quiet=False, use_cookies=False)


def download(dataset_names: List[str]) -> None:
    """Fetch datasets into the Minari root.

    Per dataset: skip if already present; fetch the reference's custom
    uploads from their Drive folders; otherwise fall back to Minari's remote
    registry."""
    for name in dataset_names:
        target = dataset_path(name)
        if os.path.exists(target):
            print(f"{name} already exists at {target}, skipping")
            continue
        if name in CUSTOM_DATASET_URLS:
            print(f"downloading {name} from the reference Drive folder...")
            download_drive_folder(name, CUSTOM_DATASET_URLS[name], target)
        else:
            download_minari([name])


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
    download(args.datasets)
    if args.to_h5:
        export_to_h5(args.datasets, args.to_h5)


if __name__ == "__main__":
    main()
