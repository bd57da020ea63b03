"""Caption + VQA task tests with synthetic on-disk datasets (tar shards,
COCO-style json) — exercising the exact ingestion paths."""

import io
import json
import os
import tarfile

import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.caption_data import TarShardCaptionSource
from neko_tpu.tasks.caption import CaptionTask
from neko_tpu.tasks.vqa import VqaTask

pytest.importorskip("PIL")

CFG = ModelConfig(
    embed_dim=32,
    layers=1,
    heads=2,
    dropout=0.0,
    context_len=32,
    max_patches=4,
    patch_size=16,
    dtype="float32",
    text_tokens=256,
    continuous_tokens=32,
    discrete_tokens=32,
)

IMG_SIZE = 32  # 2x2 patches with patch 16


def _jpeg_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb.astype(np.uint8)).save(buf, format="JPEG")
    return buf.getvalue()


def make_caption_shard(path, n=6, seed=0):
    rng = np.random.RandomState(seed)
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = rng.randint(0, 255, (IMG_SIZE, IMG_SIZE, 3))
            data = _jpeg_bytes(img)
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def make_generator():
    import jax

    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel

    model = NekoModel(CFG)
    packer = SequencePacker(CFG)
    arrays = packer.pack_batch([{"text": [1, 2]}])
    arrays.pop("lengths")
    params = model.init({"params": jax.random.key(0)}, to_device_batch(arrays))[
        "params"
    ]
    return Generator(model, params, packer)


def test_tar_source_index_and_decode(tmp_path):
    make_caption_shard(str(tmp_path / "shard0.tar"))
    src = TarShardCaptionSource([str(tmp_path)], image_size=IMG_SIZE)
    assert len(src) == 6
    s = src.get(3)
    assert s["image"].shape == (IMG_SIZE, IMG_SIZE, 3)
    assert s["caption"] == "caption number 3"


def test_caption_task_split_and_sampling(tmp_path):
    make_caption_shard(str(tmp_path / "shard0.tar"), n=10)
    task = CaptionTask(
        str(tmp_path), test_data_prop=0.3, seed=0, image_size=IMG_SIZE
    )
    # persisted mask
    assert os.path.exists(tmp_path / "test_data_mask.json")
    assert len(task.test_indices) == 3 and len(task.train_indices) == 7
    batch = task.sample_batch(2)
    assert batch[0]["images"].shape == (1, IMG_SIZE, IMG_SIZE, 3)
    assert len(batch[0]["text"]) > 0
    # re-init reuses the same split
    task2 = CaptionTask(str(tmp_path), seed=99, image_size=IMG_SIZE)
    np.testing.assert_array_equal(task.test_indices, task2.test_indices)


def test_caption_evaluate(tmp_path):
    make_caption_shard(str(tmp_path / "shard0.tar"), n=6)
    task = CaptionTask(str(tmp_path), test_data_prop=0.4, seed=0, image_size=IMG_SIZE)
    # keep targets inside the tiny test vocab
    task.text_tokenizer = _TinyTok()
    gen = make_generator()
    m = task.evaluate(gen, num_examples_to_test=2)
    assert np.isfinite(m["loss"]) and m["perplexity"] > 0


class _TinyTok:
    vocab_size = 256
    is_fallback = True

    def encode(self, text):
        return [b % 200 for b in text.encode()][:8]

    def decode(self, ids):
        return bytes(int(i) % 256 for i in ids).decode(errors="replace")


def make_vqa_dir(base, sub="train0", n=4):
    d = base / sub
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    questions, annotations = [], []
    for i in range(n):
        img = rng.randint(0, 255, (IMG_SIZE, IMG_SIZE, 3))
        fname = f"img{str(i).zfill(6)}.jpg"
        with open(d / fname, "wb") as fh:
            fh.write(_jpeg_bytes(img))
        questions.append(
            {"question_id": i, "image_id": i, "question": f"what is {i}?"}
        )
        annotations.append(
            {"question_id": i, "answers": [{"answer": f"thing {i}"}]}
        )
    with open(d / "questions.json", "w") as fh:
        json.dump({"questions": questions}, fh)
    with open(d / "annotations.json", "w") as fh:
        json.dump({"annotations": annotations}, fh)


def test_vqa_task(tmp_path):
    make_vqa_dir(tmp_path, "train0")
    make_vqa_dir(tmp_path, "test0")
    task = VqaTask(
        str(tmp_path),
        train_data=["train0"],
        test_data=["test0"],
        train_img_name_prefix=["img"],
        train_img_file_name_len=[9],
        test_img_name_prefix=["img"],
        test_img_file_name_len=[9],
        seed=0,
        image_size=IMG_SIZE,
    )
    assert len(task.train_items) == 4 and len(task.test_items) == 4
    task.text_tokenizer = _TinyTok()
    batch = task.sample_batch(2)
    assert batch[0]["images"].shape == (1, IMG_SIZE, IMG_SIZE, 3)
    gen = make_generator()
    m = task.evaluate(gen, num_examples_to_test=2)
    assert np.isfinite(m["loss"])


def test_generator_predict_caption_and_answer(tmp_path):
    """Reference-API conveniences on the Generator."""
    gen = make_generator()
    img = np.random.RandomState(0).randint(0, 255, (1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32)
    logits, ids = gen.predict_caption(img, max_length=4)
    assert logits.shape[0] == 4 and len(ids) == 4
    logits, ids = gen.predict_answer(img, [5, 6, 7], max_length=3)
    assert logits.shape[0] == 3
    assert (np.asarray(ids) < CFG.text_tokens).all()
