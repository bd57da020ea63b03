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

    # ------------------------------------------------------ exact resume
    # The training-sampling RNG (`self.rng`) is part of the checkpointed
    # host data-stream state (utils/host_state.py): a resumed run replays
    # the uninterrupted run's example stream exactly.  Evaluation draws
    # from a SEPARATE `eval_rng` so in-loop eval never perturbs the
    # training stream.  Tasks with extra stream state (cursors, shard
    # positions) override these.
    def host_state(self) -> Dict:
        from neko_tpu.utils import host_state as hs

        state: Dict = {}
        if getattr(self, "rng", None) is not None:
            state["rng"] = hs.rng_state(self.rng)
        return state

    def load_host_state(self, state: Dict) -> None:
        from neko_tpu.utils import host_state as hs

        if "rng" in state and getattr(self, "rng", None) is not None:
            hs.set_rng_state(self.rng, state["rng"])
