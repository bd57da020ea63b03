"""Dataset downloader: the reference's custom d4rl uploads must fetch from
their Drive folders (reference download_custom_datasets.py:4-26) — Minari's
remote registry does not host them.  Network is mocked (gdown stub)."""

import sys
import types

import pytest

from neko_tpu.data import download as dl


@pytest.fixture()
def fake_gdown(monkeypatch):
    calls = []
    mod = types.SimpleNamespace(
        download_folder=lambda url, output, quiet, use_cookies: calls.append(
            (url, output)
        )
    )
    monkeypatch.setitem(sys.modules, "gdown", mod)
    return calls


def test_custom_dataset_fetches_drive_folder(tmp_path, monkeypatch, fake_gdown):
    monkeypatch.setenv("MINARI_DATASETS_PATH", str(tmp_path))
    dl.download(["d4rl_halfcheetah-expert-v2"])
    assert len(fake_gdown) == 1
    url, output = fake_gdown[0]
    assert url == dl.CUSTOM_DATASET_URLS["d4rl_halfcheetah-expert-v2"]
    assert output == str(tmp_path / "d4rl_halfcheetah-expert-v2")


def test_existing_dataset_skipped(tmp_path, monkeypatch, fake_gdown):
    monkeypatch.setenv("MINARI_DATASETS_PATH", str(tmp_path))
    (tmp_path / "d4rl_hopper-expert-v2").mkdir(parents=True)
    dl.download(["d4rl_hopper-expert-v2"])
    assert fake_gdown == []


def test_all_reference_datasets_have_urls():
    for name in (
        "d4rl_halfcheetah-expert-v2",
        "d4rl_hopper-expert-v2",
        "d4rl_walker2d-expert-v2",
    ):
        assert name in dl.CUSTOM_DATASET_URLS


def test_missing_gdown_gives_actionable_error(tmp_path, monkeypatch):
    monkeypatch.setenv("MINARI_DATASETS_PATH", str(tmp_path))
    monkeypatch.setitem(sys.modules, "gdown", None)  # import -> ImportError
    with pytest.raises(ImportError, match="gdown"):
        dl.download(["d4rl_walker2d-expert-v2"])


def test_cli_entry(tmp_path, monkeypatch, fake_gdown):
    monkeypatch.setenv("MINARI_DATASETS_PATH", str(tmp_path))
    dl.main(["--datasets", "d4rl_walker2d-expert-v2"])
    assert len(fake_gdown) == 1
