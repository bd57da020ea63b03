"""Image-captioning task.

Mirrors /root/reference/gato/tasks/caption_task.py: tar-shard ingestion,
train/test split either from explicit subdirectories or a random mask
persisted to test_data_mask.json (caption_task.py:47-68); sample_batch returns
{image, caption-token} examples; evaluate generates a caption of the target's
length and scores CE + perplexity (caption_task.py:122-163).

Training examples pack as one timestep [image patches | caption tokens | SEP]
with the caption as prediction target — the packer's modality order already
places text after images, which is the reference's explicit re-ordering for
caption training (gato_policy.py:350-355 comment).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from neko_tpu.data.caption_data import TarShardCaptionSource
from neko_tpu.inference.generator import Generator
from neko_tpu.tasks.base import Task
from neko_tpu.tokenizers.text import get_text_tokenizer


class CaptionTask(Task):
    name = "caption"
    task_kind = "caption"

    def __init__(
        self,
        dataset_dir: str,
        train_data: Optional[List[str]] = None,
        test_data: Optional[List[str]] = None,
        test_data_prop: float = 0.1,
        tokenizer_model: str = "gpt2",
        image_size: int = 256,
        patch_size: int = 16,
        context_length: int = 1024,
        seed: Optional[int] = None,
        source_factory=TarShardCaptionSource,
    ):
        self.rng = np.random.RandomState(seed)
        self.text_tokenizer = get_text_tokenizer(tokenizer_model)
        self.image_size = image_size
        assert image_size % patch_size == 0, (
            f"image_size={image_size} must be a multiple of "
            f"patch_size={patch_size}"
        )
        self.patches_per_image = (image_size // patch_size) ** 2
        # a caption example is ONE timestep [patches | text | SEP]; cap the
        # text so it always fits the context
        assert self.patches_per_image + 2 <= context_length, (
            f"a {image_size}x{image_size} image needs "
            f"{self.patches_per_image} patch tokens but the context is only "
            f"{context_length}; lower the image size or raise -k"
        )
        self.max_text_tokens = max(1, context_length - self.patches_per_image - 1)

        if train_data and test_data:
            self.train_source = source_factory(
                [os.path.join(dataset_dir, d) for d in train_data],
                image_size=image_size,
            )
            self.test_source = source_factory(
                [os.path.join(dataset_dir, d) for d in test_data],
                image_size=image_size,
            )
            self.train_indices = np.arange(len(self.train_source))
            self.test_indices = np.arange(len(self.test_source))
        else:
            # single pool, persisted random split (caption_task.py:47-68)
            source = source_factory(
                [os.path.join(dataset_dir, d) for d in (train_data or [""])],
                image_size=image_size,
            )
            self.train_source = self.test_source = source
            mask_path = os.path.join(dataset_dir, "test_data_mask.json")
            n = len(source)
            if os.path.exists(mask_path):
                with open(mask_path) as fh:
                    test_mask = np.asarray(json.load(fh), dtype=bool)
                assert len(test_mask) == n, "stale test_data_mask.json"
            else:
                test_mask = np.zeros(n, dtype=bool)
                n_test = int(n * test_data_prop)
                test_mask[self.rng.choice(n, size=n_test, replace=False)] = True
                with open(mask_path, "w") as fh:
                    json.dump([bool(b) for b in test_mask], fh)
            self.train_indices = np.flatnonzero(~test_mask)
            self.test_indices = np.flatnonzero(test_mask)

    # ------------------------------------------------------------ sampling
    def _example(self, source, idx: int) -> Dict:
        sample = source.get(int(idx))
        ids = list(self.text_tokenizer.encode(sample["caption"]))
        return {
            "images": sample["image"][None],
            "text": ids[: self.max_text_tokens],
        }

    def sample_batch(self, batch_size: int, is_test: bool = False) -> List[Dict]:
        source = self.test_source if is_test else self.train_source
        pool = self.test_indices if is_test else self.train_indices
        idx = self.rng.choice(pool, size=batch_size, replace=len(pool) < batch_size)
        return [self._example(source, i) for i in idx]

    # ---------------------------------------------------------- evaluation
    def evaluate(
        self,
        generator: Generator,
        num_examples_to_test: int = 100,
        deterministic: bool = True,
        log_examples_to_output: bool = False,
    ) -> Dict[str, float]:
        num = min(num_examples_to_test, len(self.test_indices))
        ts = generator.cfg.token_space
        items = []
        for n in range(num):
            sample = self.test_source.get(
                int(self.test_indices[n % len(self.test_indices)])
            )
            target = list(self.text_tokenizer.encode(sample["caption"]))
            target = target[: self.max_text_tokens]
            if len(target) > 0:
                items.append((sample, target))

        # predict_response semantics: prompt = [image patches] (+ text so
        # far); logits read at the last non-separator position — dropping
        # the trailing SEP is causally identical (gato_policy.py:477-544).
        # Batched KV-cache decode amortizes per-step dispatch.
        total_loss, tested = 0.0, 0
        GROUP = 8
        for g in range(0, len(items), GROUP):
            group = items[g : g + GROUP]
            max_new = max(len(t) for _, t in group)
            tgt_mat = np.zeros((len(group), max_new), np.int32)
            for i, (_, t) in enumerate(group):
                tgt_mat[i, : len(t)] = t
            toks, nlls = generator.generate_batch(
                [{"images": s["image"][None], "text": []} for s, _ in group],
                max_new_tokens=max_new,
                start=ts.start("text"),
                end=ts.end("text"),
                deterministic=deterministic,
                drop_trailing=1,
                inner_pos_continuation=True,
                targets=tgt_mat,       # per-target CE computed on device
                return_logits=False,
            )
            for i, (sample, target) in enumerate(group):
                if log_examples_to_output and tested % 50 == 0:
                    pred = toks[i, : len(target)] - ts.start("text")
                    print(
                        f"caption target: {sample['caption']!r} | "
                        f"pred: {self.text_tokenizer.decode(list(pred))!r}"
                    )
                total_loss += float(nlls[i, : len(target)].mean())
                tested += 1
        avg = total_loss / max(tested, 1)
        return {"loss": avg, "perplexity": float(np.exp(avg))}
