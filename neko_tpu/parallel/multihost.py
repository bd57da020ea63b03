"""Multi-host data loading: per-process batch shards -> one global jax.Array.

The reference distributes data loading via HF Accelerate's
`DataLoaderConfiguration(split_batches=True)` (train.py:26-40): the batch
size is GLOBAL and each rank consumes 1/world_size of it.  The TPU-native
equivalent for multi-host pods: every process samples only its
`batch_size // process_count` slice on its own host CPU, packs it locally
(data/packing.py), and the global sharded array is assembled with
`jax.make_array_from_process_local_data` — no host ever materializes the
full batch, and host-side tokenize/pack work scales out with the pod.

Two of the packed arrays index BATCH ROWS and must be re-based from local to
global coordinates before assembly (`globalize_arrays`):

* `patch_batch` i32[N]: the pool entry's batch row; == local_B marks unused.
* `loss_pos` i32[Nt, 2]: (batch_row, position) of gathered loss targets;
  row == local_B marks unused.

Used rows get `+ process_index * local_B`; unused markers become global_B
(any value >= global_B is dropped by the device-side scatter/gather — see
ops/losses.py:112, models/policy.py patch scatter).  NOTE the naive
`arr + process_index * local_B` would alias process p's unused marker with
process p+1's first row.

Mesh/device-order contract: `create_mesh` builds the mesh from
`jax.devices()` order, which groups devices by process — so the 'data' axis
shards batch rows process-contiguously, matching the concatenation order
assumed here (process p owns global rows [p*local_B, (p+1)*local_B)).
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

# arrays whose values (not layout) reference batch rows
_ROW_INDEX_FIELDS = ("patch_batch",)
_ROW_INDEX_2D_FIELDS = ("loss_pos",)  # column 0 is the batch row


def process_info() -> tuple:
    """(process_index, process_count) of the current jax runtime."""
    return jax.process_index(), jax.process_count()


def host_seed(seed: int, process_index: int = None) -> int:
    """Per-host sampling seed: identical task RNGs on every host would make
    each process draw the SAME examples (duplicated data, not a bigger
    batch).  Process 0 keeps the user's seed unchanged."""
    if process_index is None:
        process_index = jax.process_index()
    return seed + process_index * 100_003


def local_batch_size(global_batch_size: int, process_count: int) -> int:
    """The per-host slice of the reference's global batch semantics."""
    assert global_batch_size % process_count == 0, (
        f"batch_size={global_batch_size} must be divisible by the number of "
        f"hosts ({process_count}) — the reference's split_batches contract"
    )
    return global_batch_size // process_count


def globalize_arrays(
    arrays: Dict[str, np.ndarray],
    process_index: int,
    process_count: int,
) -> Dict[str, np.ndarray]:
    """Re-base a locally-packed batch's row-index arrays to global rows.

    `arrays` is the packer output for THIS process's local slice; [B, S]
    token/mask arrays need no change (their global position comes from the
    sharding), only the values of the row-index fields do."""
    if process_count == 1:
        return arrays
    local_b = arrays["tokens"].shape[0]
    global_b = local_b * process_count
    offset = process_index * local_b
    out = dict(arrays)
    for name in _ROW_INDEX_FIELDS:
        if name in out:
            a = out[name]
            out[name] = np.where(a < local_b, a + offset, global_b).astype(
                a.dtype
            )
    for name in _ROW_INDEX_2D_FIELDS:
        if name in out:
            a = out[name].copy()
            rows = a[:, 0]
            a[:, 0] = np.where(rows < local_b, rows + offset, global_b)
            out[name] = a
    return out


def eval_replica(mesh, params):
    """Device-side replica of pod-sharded params for main-process eval.

    One jitted identity with fully-replicated out-shardings makes XLA emit
    the all-gather over ICI; the returned tree holds THIS process's local
    on-device view (`addressable_shards[0].data` — zero-copy single-device
    arrays the Generator's jitted decode consumes directly).  Unlike
    `multihost_utils.process_allgather` this never copies params to host
    memory on ANY process: the main process keeps one on-device replica for
    the decode-loop eval, non-main processes drop the result immediately
    (dropping the tree frees their transient device buffers).  Every process
    MUST call this (it is a collective).

    The reference evaluates under DDP where every rank already holds a host
    replica (/root/reference/gato/training/trainer.py:83-103); here the
    steady-state layout can be pod-sharded (--fsdp / tensor parallel), so
    the replica is formed only when eval needs it and lives only on device.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params
    )
    rep = jax.jit(lambda t: t, out_shardings=rep_sh)(params)
    return jax.tree_util.tree_map(
        lambda x: x.addressable_shards[0].data, rep
    )


def form_global_batch(mesh, batch, process_count: int = None):
    """Assemble a global PackedBatch from this process's local shard.

    `batch` is a PackedBatch (or pytree of arrays) of LOCAL shape — leading
    dims are the per-process slice.  Single-process: plain device_put with
    the mesh shardings (the existing path).  Multi-process: every leaf
    becomes a global jax.Array whose addressable shards are this process's
    data.

    `process_count` should come from the same `process_info()` snapshot the
    caller used for `globalize_arrays` — a single source of truth for the
    local-vs-global decision (the Trainer passes its own)."""
    from neko_tpu.parallel import sharding as shd

    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return shd.shard_batch(mesh, batch)

    shardings = shd.batch_shardings(mesh, batch)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        batch,
        shardings,
    )
