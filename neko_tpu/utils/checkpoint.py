"""Checkpointing: Orbax state save/load + args.json sidecar.

The reference writes `args.json` once plus `checkpoint_{steps}.pt` state_dicts
with no optimizer/RNG state (utils/utils.py:19-32 — resume is approximate by
design).  Here the FULL train state (params + AdamW moments + step + device
RNG) is checkpointed via Orbax, and the HOST data-stream state (trainer
mixture RNG + every task's sampling RNG, snapshotted at the consumed batch)
is persisted alongside as host_state_<step>_p<proc>.pkl via
utils/host_state.py — so resume is exact end to end: a resumed run replays
the uninterrupted run's example stream and loss trajectory bit-for-bit.
Directory contract unchanged: <save_dir>/<exp_name>/args.json +
checkpoint_<steps>/.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_args(exp_dir: str, args: Any) -> None:
    os.makedirs(exp_dir, exist_ok=True)
    path = os.path.join(exp_dir, "args.json")
    if os.path.exists(path):
        return  # reference writes args.json only once (utils.py:25-28)
    d = dataclasses.asdict(args) if dataclasses.is_dataclass(args) else dict(args)
    with open(path, "w") as fh:
        json.dump(d, fh, indent=2)


def load_args_dict(exp_dir_or_file: str) -> dict:
    path = exp_dir_or_file
    if os.path.isdir(path):
        path = os.path.join(path, "args.json")
    with open(path) as fh:
        return json.load(fh)


def save_checkpoint(exp_dir: str, state: Any, step: int, args: Any = None) -> str:
    """Write <exp_dir>/checkpoint_<step>/ and return its path.

    Multi-host: every process must call this (Orbax gathers each host's
    shards of the pod-sharded state); the args.json sidecar is written by
    process 0 only."""
    import jax

    if args is not None and jax.process_index() == 0:
        save_args(exp_dir, args)
    path = os.path.join(os.path.abspath(exp_dir), f"checkpoint_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def resolve_checkpoint_dir(model_path: str) -> str:
    """`model_path` may be a checkpoint_<N> dir or an experiment dir (the
    LATEST checkpoint is used) — the shared resolution step behind eval.py,
    serve.py and the tools/."""
    if os.path.isdir(model_path) and not os.path.basename(
        model_path
    ).startswith("checkpoint_"):
        found = latest_checkpoint(model_path)
        assert found, f"no checkpoint_* under {model_path}"
        return found
    return model_path


def latest_checkpoint(exp_dir: str) -> Optional[str]:
    if not os.path.isdir(exp_dir):
        return None
    steps = []
    for name in os.listdir(exp_dir):
        if name.startswith("checkpoint_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(exp_dir, f"checkpoint_{max(steps)}")


def load_checkpoint(path: str, abstract_state: Any) -> Any:
    """Restore into the sharded layout described by `abstract_state`
    (a pytree of jax.ShapeDtypeStruct with shardings, or a concrete state).

    Checkpoints written before the TrainState grew its `ema_params` field
    lack that entry in their tree metadata; when the target's ema_params is
    None (EMA disabled) the restore retries against the legacy field set so
    old artifacts keep loading."""
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), abstract_state)
    except ValueError:
        if getattr(abstract_state, "ema_params", "absent") is not None:
            raise
        fields = {
            f.name: getattr(abstract_state, f.name)
            for f in dataclasses.fields(abstract_state)
            if f.name != "ema_params"
        }
        restored = ckptr.restore(os.path.abspath(path), fields)
        return type(abstract_state)(**restored, ema_params=None)


def load_params_only(path: str, abstract_state: Any) -> Any:
    """Weights-only warm start (reference --init_checkpoint semantics,
    train.py:114-117): restore the full state but return just params."""
    return load_checkpoint(path, abstract_state).params
