"""Device mesh construction.

The reference's distribution is HF Accelerate DDP over NCCL (train.py:26-40);
the TPU-native equivalent is a `jax.sharding.Mesh` with ('data', 'model')
axes: batch sharded on 'data', attention heads / MLP hidden / vocab sharded on
'model', with XLA emitting the all-reduce / all-gather collectives over ICI
from sharding annotations (SURVEY.md §2.2, §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    pipe: int = 1,
    *,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'seq', 'model') mesh — ('data', 'pipe', ...) when
    `pipe` > 1.

    data=None uses all remaining devices for the data axis.  `seq` > 1
    enables sequence (context) parallelism: activations shard their S dim
    over 'seq' and attention runs as ring attention over the axis
    (ops/ring_attention.py) — the long-context capability the reference
    lacks (it truncates; SURVEY.md §5.7).  `pipe` > 1 enables GPipe
    pipeline parallelism over the stack (parallel/pipeline.py) on a
    ('data', 'pipe') mesh — or ('data', 'pipe', 'model') when model > 1:
    the pipelined step is manual only over 'pipe' (shard_map axis_names)
    and GSPMD lays Megatron tensor parallelism over the innermost 'model'
    axis inside each stage.  `seq` does not compose with `pipe` (ring
    attention is its own shard_map over 'seq'; nesting manual collectives
    inside the pipe schedule is not supported).  On multi-host TPU slices
    call `jax.distributed.initialize()` first; `jax.devices()` then spans
    the full slice and the mesh rides ICI within a slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pipe > 1:
        assert seq == 1, (
            "pipeline parallelism does not compose with sequence "
            "parallelism (parallel/pipeline.py module doc)"
        )
        if data is None:
            assert n % (pipe * model) == 0, (
                f"{n} devices not divisible by pipe={pipe} * model={model}"
            )
            data = n // (pipe * model)
        assert data * pipe * model == n, (
            f"mesh {data}x{pipe}x{model} != {n} available devices"
        )
        if model > 1:
            arr = np.asarray(devices).reshape(data, pipe, model)
            return Mesh(arr, ("data", "pipe", "model"))
        arr = np.asarray(devices).reshape(data, pipe)
        return Mesh(arr, ("data", "pipe"))
    if data is None:
        assert n % (model * seq) == 0, (
            f"{n} devices not divisible by model={model} * seq={seq}"
        )
        data = n // (model * seq)
    assert data * seq * model == n, (
        f"mesh {data}x{seq}x{model} != {n} available devices"
    )
    arr = np.asarray(devices).reshape(data, seq, model)
    return Mesh(arr, ("data", "seq", "model"))


def single_device_mesh() -> Mesh:
    return create_mesh(data=1, model=1, devices=jax.devices()[:1])


def seq_axis_size(mesh: Optional[Mesh]) -> int:
    """Size of the sequence-parallel axis of a mesh (1 when absent)."""
    if mesh is None:
        return 1
    return dict(mesh.shape).get("seq", 1)
