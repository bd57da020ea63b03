"""Sharding rules: parameter and batch PartitionSpecs over ('data', 'model').

Tensor-parallel layout (the BASELINE.json north-star "pjit data+tensor
sharding over ICI"):

* attention qkv / MLP up / gate kernels: shard the OUTPUT (hidden) dim on
  'model' — heads and MLP hidden split across chips;
* attention/MLP down-projections: shard the INPUT dim on 'model' (XLA emits a
  reduce-scatter/all-reduce pair per block, the Megatron pattern);
* embedding table and LM head: shard the vocab dim on 'model';
* everything small (LayerNorms, biases of down-projections, positional
  tables, patch-conv kernels): replicated;
* batch dims of every input array: sharded on 'data'.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match rules, applied in order; first hit wins)
_RULES = [
    # token / output embeddings: vocab on model axis
    (("embed_token", "embedding"), P("model", None)),
    (("predict_token", "kernel"), P(None, "model")),
    # attention
    (("attn", "c_attn", "kernel"), P(None, "model")),
    (("attn", "c_attn", "bias"), P("model")),
    (("attn", "c_proj", "kernel"), P("model", None)),
    (("attn", "c_proj", "bias"), P(None)),
    # MLP (incl. GEGLU gate)
    (("mlp", "c_fc", "kernel"), P(None, "model")),
    (("mlp", "c_fc", "bias"), P("model")),
    (("mlp", "gate", "kernel"), P(None, "model")),
    (("mlp", "gate", "bias"), P("model")),
    (("mlp", "c_proj", "kernel"), P("model", None)),
    (("mlp", "c_proj", "bias"), P(None)),
]


def _path_names(path) -> tuple:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return tuple(names)


def param_pspec(path, value) -> P:
    names = _path_names(path)
    for suffix, spec in _RULES:
        if names[-len(suffix):] == suffix:
            if len(spec) <= value.ndim:
                return spec
    return P()  # replicate


def param_pspecs(params) -> Any:
    """PartitionSpec pytree matching a params pytree."""
    return jax.tree_util.tree_map_with_path(param_pspec, params)


def prune_spec(spec: P, mesh: Optional[Mesh]) -> P:
    """Drop axes the mesh doesn't have (e.g. 'model' on a ('data','pipe')
    pipeline mesh — parameters are then simply replicated on those dims)."""
    if mesh is None:
        return spec
    names = set(mesh.axis_names)

    def keep(entry):
        if entry is None:
            return None
        if isinstance(entry, tuple):
            kept = tuple(a for a in entry if a in names)
            return kept if kept else None
        return entry if entry in names else None

    return P(*(keep(e) for e in spec))


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(mesh, prune_spec(param_pspec(p, v), mesh)),
        params,
    )


# --fsdp: minimum leaf size (elements) worth sharding over 'data'.  Below
# this the per-use all-gather latency outweighs the memory win (LayerNorm
# scales, biases, patch-conv kernels stay replicated; every matmul kernel,
# embedding table and positional table is far above it).
FSDP_MIN_SIZE = 1 << 16


def fsdp_param_pspec(path, value, mesh: Optional[Mesh]) -> P:
    """ZeRO-3/FSDP spec: the TP spec plus one eligible dim sharded on 'data'.

    The reference's only distribution is DDP replication (Accelerate,
    /root/reference/train.py:26-40): every rank holds full params + AdamW
    moments.  Under --fsdp each large leaf additionally shards its largest
    tensor-parallel-unsharded dim over the 'data' mesh axis; XLA/GSPMD then
    emits the all-gather at each use site in the forward/backward and a
    reduce-scatter for the gradients — ZeRO-3 semantics with no hand-written
    collectives, and AdamW moments shard identically for free (the state
    pspec rules are path-suffix matched, train_state.py::_state_pspec).
    """
    base = prune_spec(param_pspec(path, value), mesh)
    if mesh is None:
        return base
    data = dict(mesh.shape).get("data", 1)
    size = int(np_prod(value.shape)) if value.shape else 0
    if data <= 1 or value.ndim == 0 or size < FSDP_MIN_SIZE:
        return base
    entries = list(base) + [None] * (value.ndim - len(base))
    cand = [
        i for i, e in enumerate(entries)
        if e is None and value.shape[i] % data == 0
    ]
    if not cand:
        return base
    i = max(cand, key=lambda j: value.shape[j])
    entries[i] = "data"
    return P(*entries)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def stacked_param_pspec(path, value, mesh: Optional[Mesh], fsdp: bool = False) -> P:
    """Spec for a stage-local stacked leaf [n_stages, Lp, <layer dims>]
    (parallel/pipeline.py::STACK_KEY): 'pipe' on the stage dim, the leaf's
    Megatron 'model' spec on its own trailing dims, and — under --fsdp —
    additionally the largest still-replicated dim on 'data' (ZeRO-3 composes
    with stage-local PP: each device then holds stage_layers/data_shards of
    the body + moments)."""
    base = prune_spec(param_pspec(path, value), mesh)
    entries = ["pipe", None] + list(base)
    entries += [None] * (value.ndim - len(entries))
    if fsdp and mesh is not None:
        data = dict(mesh.shape).get("data", 1)
        if data > 1 and np_prod(value.shape) >= FSDP_MIN_SIZE:
            cand = [
                i for i, e in enumerate(entries)
                if e is None and value.shape[i] % data == 0
            ]
            if cand:
                entries[max(cand, key=lambda j: value.shape[j])] = "data"
    return prune_spec(P(*entries), mesh)


# [B, S] fields whose sequence dim shards over 'seq' under sequence
# parallelism (the patch pool and gathered-loss index arrays are pooled over
# the whole batch, not laid out along S — they stay seq-replicated and XLA
# inserts the scatter/gather collectives).
_SEQ_DIM_FIELDS = frozenset({"tokens", "input_mask", "target_mask", "inner_pos"})


def _field_name(path) -> str:
    k = path[0]
    return str(getattr(k, "name", getattr(k, "key", k)))


def _batch_spec(path, v, seq: bool) -> P:
    if seq and v.ndim == 2 and _field_name(path) in _SEQ_DIM_FIELDS:
        return P("data", "seq")
    return P("data", *([None] * (v.ndim - 1)))


def _has_seq(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and dict(mesh.shape).get("seq", 1) > 1


def batch_pspecs(batch, mesh: Optional[Mesh] = None) -> Any:
    """Shard the leading (batch) dim of every array on 'data'; under a mesh
    with a 'seq' axis > 1, additionally shard the S dim of [B, S] token/mask
    fields on 'seq'."""
    seq = _has_seq(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda p, v: _batch_spec(p, v, seq), batch
    )


def batch_shardings(mesh: Mesh, batch) -> Any:
    seq = _has_seq(mesh)
    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(mesh, _batch_spec(p, v, seq)), batch
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Place an (unsharded) params pytree onto the mesh."""
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_shardings(mesh, batch))
