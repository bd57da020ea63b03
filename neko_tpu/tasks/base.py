"""Task interface (reference: /root/reference/gato/tasks/task.py:3-8).

Tasks produce raw example dicts (the packer turns them into device batches)
and evaluate a model via a `Generator` — host-side logic only, no device code.
"""

from __future__ import annotations

from typing import Dict, List

from neko_tpu.inference.generator import Generator


class Task:
    name: str = "task"

    def sample_batch(self, batch_size: int, **kwargs) -> List[Dict]:
        raise NotImplementedError

    def evaluate(self, generator: Generator, **kwargs) -> Dict[str, float]:
        raise NotImplementedError
