"""Visual question answering task.

Mirrors /root/reference/gato/tasks/vqa_task.py: COCO-style questions.json +
annotations.json per data subdirectory, image files found by zero-padded
name prefix + fixed filename length (vqa_task.py:55-83); training text is
"question answer" with a random answer choice per sample (vqa_task.py:85-98);
evaluation generates an answer from (image, question) and scores CE +
perplexity (vqa_task.py:100-143).  Images are decoded on demand rather than
materialized up front, and the reference's shared-dict aliasing bug
(vqa_task.py:47/78, one `item` mutated across rows) is not reproduced.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from neko_tpu.data.caption_data import decode_image_rgb
from neko_tpu.inference.generator import Generator
from neko_tpu.tasks.base import Task
from neko_tpu.tokenizers.text import get_text_tokenizer


def _load_split(
    base_dir: str,
    sub_dirs: List[str],
    name_prefixes: List[str],
    name_lens: List[int],
    questions_file: str,
    annotations_file: str,
) -> List[Dict]:
    items: List[Dict] = []
    for i, sub in enumerate(sub_dirs):
        d = os.path.join(base_dir, sub)
        with open(os.path.join(d, questions_file)) as fh:
            questions = json.load(fh)["questions"]
        with open(os.path.join(d, annotations_file)) as fh:
            annotations = json.load(fh)["annotations"]
        answers_by_qid = {
            a["question_id"]: [ans["answer"] for ans in a["answers"]]
            for a in annotations
        }
        prefix = name_prefixes[i] if i < len(name_prefixes) else ""
        name_len = name_lens[i] if i < len(name_lens) else 0
        for q in questions:
            img_id = str(q["image_id"])
            if name_len:
                fname = prefix + img_id.zfill(name_len - len(prefix)) + ".jpg"
            else:
                fname = prefix + img_id + ".jpg"
            path = os.path.join(d, fname)
            if not os.path.exists(path):
                continue
            items.append(
                {
                    "image_path": path,
                    "question": q["question"],
                    "answers": answers_by_qid.get(q["question_id"], []),
                }
            )
    return items


class VqaTask(Task):
    name = "vqa"
    task_kind = "vqa"

    def __init__(
        self,
        dataset_dir: str,
        train_data: List[str],
        test_data: List[str],
        train_img_name_prefix: Optional[List[str]] = None,
        train_img_file_name_len: Optional[List[int]] = None,
        test_img_name_prefix: Optional[List[str]] = None,
        test_img_file_name_len: Optional[List[int]] = None,
        questions_file: str = "questions.json",
        annotations_file: str = "annotations.json",
        tokenizer_model: str = "gpt2",
        image_size: int = 256,
        patch_size: int = 16,
        context_length: int = 1024,
        seed: Optional[int] = None,
    ):
        self.rng = np.random.RandomState(seed)
        # eval answer choices draw from their own stream so in-loop eval
        # never perturbs the training stream (exact-resume contract)
        self.eval_rng = np.random.RandomState(
            None if seed is None else (seed + 0x5EED) % 2**32
        )
        self.text_tokenizer = get_text_tokenizer(tokenizer_model)
        self.image_size = image_size
        assert image_size % patch_size == 0, (
            f"image_size={image_size} must be a multiple of "
            f"patch_size={patch_size}"
        )
        self.patches_per_image = (image_size // patch_size) ** 2
        assert self.patches_per_image + 2 <= context_length, (
            f"a {image_size}x{image_size} image needs "
            f"{self.patches_per_image} patch tokens but the context is only "
            f"{context_length}; lower the image size or raise -k"
        )
        self.max_text_tokens = max(1, context_length - self.patches_per_image - 1)
        self.train_items = _load_split(
            dataset_dir, train_data, train_img_name_prefix or [],
            train_img_file_name_len or [], questions_file, annotations_file,
        )
        self.test_items = _load_split(
            dataset_dir, test_data, test_img_name_prefix or [],
            test_img_file_name_len or [], questions_file, annotations_file,
        )

    def _image(self, item: Dict) -> np.ndarray:
        with open(item["image_path"], "rb") as fh:
            return decode_image_rgb(fh.read(), self.image_size)

    def sample_batch(self, batch_size: int, is_test: bool = False) -> List[Dict]:
        items = self.test_items if is_test else self.train_items
        idx = self.rng.randint(0, len(items), size=batch_size)
        out = []
        for i in idx:
            item = items[int(i)]
            answer = (
                item["answers"][self.rng.randint(len(item["answers"]))]
                if item["answers"] else ""
            )
            text = item["question"] + " " + answer
            ids = list(self.text_tokenizer.encode(text))
            out.append(
                {
                    "images": self._image(item)[None],
                    "text": ids[: self.max_text_tokens],
                }
            )
        return out

    def evaluate(
        self,
        generator: Generator,
        num_examples_to_test: int = 100,
        deterministic: bool = True,
        log_examples_to_output: bool = False,
    ) -> Dict[str, float]:
        num = min(num_examples_to_test, len(self.test_items))
        ts = generator.cfg.token_space
        items = []
        for n in range(num):
            item = self.test_items[n]
            if not item["answers"]:
                continue
            answer = item["answers"][self.eval_rng.randint(len(item["answers"]))]
            target = self.text_tokenizer.encode(" " + answer)
            if len(target) == 0:
                continue
            prompt = list(self.text_tokenizer.encode(item["question"]))
            target = list(target)
            if len(prompt) + len(target) > self.max_text_tokens:
                prompt = prompt[: max(0, self.max_text_tokens - len(target))]
                target = target[: self.max_text_tokens]
            items.append((item, answer, prompt, target))

        total_loss, tested = 0.0, 0
        GROUP = 8  # batched KV-cache decode
        for g in range(0, len(items), GROUP):
            group = items[g : g + GROUP]
            max_new = max(len(t) for _, _, _, t in group)
            tgt_mat = np.zeros((len(group), max_new), np.int32)
            for i, (_, _, _, t) in enumerate(group):
                tgt_mat[i, : len(t)] = t
            toks, nlls = generator.generate_batch(
                [{"images": self._image(it)[None], "text": pr}
                 for it, _, pr, _ in group],
                max_new_tokens=max_new,
                start=ts.start("text"),
                end=ts.end("text"),
                deterministic=deterministic,
                drop_trailing=1,  # SEP is causally invisible to the read pos
                inner_pos_continuation=True,
                targets=tgt_mat,       # per-target CE computed on device
                return_logits=False,
            )
            for i, (item, answer, _, target) in enumerate(group):
                if log_examples_to_output and tested % 50 == 0:
                    pred = toks[i, : len(target)] - ts.start("text")
                    print(
                        f"Q: {item['question']!r} A: {answer!r} | "
                        f"pred: {self.text_tokenizer.decode(list(pred))!r}"
                    )
                total_loss += float(nlls[i, : len(target)].mean())
                tested += 1
        avg = total_loss / max(tested, 1)
        return {"loss": avg, "perplexity": float(np.exp(avg))}
