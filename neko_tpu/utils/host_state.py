"""Host data-stream state: capture/restore of every numpy RNG that feeds
training-batch sampling, so `--resume_from` reproduces the uninterrupted
run's example stream bit-for-bit.

The reference checkpoints weights only — resume is approximate by design
(/root/reference/gato/utils/utils.py:19-32): no optimizer state, no RNG, no
dataloader position.  The Orbax checkpoint here already restores the device
state exactly (params + AdamW moments + step + device RNG); this module adds
the HOST side: the trainer's mixture RNG and each task's sampling RNG.  The
Trainer snapshots this state *immediately after sampling each batch* (inside
the sampling lock, threaded through the prefetch queue), and the snapshot of
the batch consumed at step N is what gets persisted with checkpoint_N — so a
resumed run's prefetcher regenerates batches N+1, N+2, ... identically even
though the live RNGs had raced ahead when the checkpoint was written.

Episode stores are stateless given the RNG (data/episodes.py:69-82 draws
with `rng.choice`, no hidden cursor) and evaluation draws from separate
`eval_rng` streams, so the states below are the complete host stream state.

Exactness requires `--prefetch_workers=1` (the default): with several
producer threads the batch order itself is scheduler-dependent, which no
amount of RNG snapshotting can replay (data/pipeline.py:18-21).
"""

from __future__ import annotations

import copy
import os
import pickle
from typing import Any, Dict, List, Optional

import numpy as np


def rng_state(rng) -> Dict[str, Any]:
    """Picklable state of a np.random.Generator or legacy RandomState."""
    if isinstance(rng, np.random.Generator):
        return {"kind": "generator", "state": copy.deepcopy(rng.bit_generator.state)}
    if isinstance(rng, np.random.RandomState):
        return {"kind": "random_state", "state": copy.deepcopy(rng.get_state())}
    raise TypeError(f"unsupported RNG type {type(rng)!r}")


def set_rng_state(rng, state: Dict[str, Any]) -> None:
    if isinstance(rng, np.random.Generator):
        assert state["kind"] == "generator", state["kind"]
        rng.bit_generator.state = state["state"]
    elif isinstance(rng, np.random.RandomState):
        assert state["kind"] == "random_state", state["kind"]
        rng.set_state(state["state"])
    else:
        raise TypeError(f"unsupported RNG type {type(rng)!r}")


def collect(trainer_rng, tasks: List) -> Dict[str, Any]:
    """Snapshot the trainer RNG + every task's training-sampling state."""
    return {
        "version": 1,
        "trainer_rng": rng_state(trainer_rng),
        "tasks": [
            {"name": getattr(t, "name", "task"), "state": t.host_state()}
            for t in tasks
        ],
    }


def restore(snapshot: Dict[str, Any], trainer_rng, tasks: List) -> None:
    set_rng_state(trainer_rng, snapshot["trainer_rng"])
    saved = snapshot["tasks"]
    assert len(saved) == len(tasks), (
        f"checkpoint has {len(saved)} task states but the run builds "
        f"{len(tasks)} tasks — resume with the same task configuration"
    )
    for entry, task in zip(saved, tasks):
        name = getattr(task, "name", "task")
        assert entry["name"] == name, (
            f"task order mismatch on resume: checkpoint={entry['name']!r} "
            f"run={name!r}"
        )
        task.load_host_state(entry["state"])


# ------------------------------------------------------------- persistence
def _host_file(exp_dir: str, step: int, proc_index: int) -> str:
    return os.path.join(exp_dir, f"host_state_{step}_p{proc_index}.pkl")


def save_host_state(
    exp_dir: str, step: int, snapshot: Dict[str, Any], proc_index: int = 0
) -> str:
    os.makedirs(exp_dir, exist_ok=True)
    path = _host_file(exp_dir, step, proc_index)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(snapshot, fh)
    os.replace(tmp, path)
    return path


def load_host_state_for(
    checkpoint_path: str, proc_index: int = 0
) -> Optional[Dict[str, Any]]:
    """Host sidecar for a checkpoint_<N> dir; None if absent (pre-round-5
    checkpoints resume with the device state only — the old, approximate
    behavior)."""
    base = os.path.basename(os.path.normpath(checkpoint_path))
    if not base.startswith("checkpoint_"):
        return None
    try:
        step = int(base.split("_", 1)[1])
    except ValueError:
        return None
    exp_dir = os.path.dirname(os.path.abspath(os.path.normpath(checkpoint_path)))
    path = _host_file(exp_dir, step, proc_index)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        return pickle.load(fh)
