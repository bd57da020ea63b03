"""The fixed-shape packed batch schema — the core TPU-native design decision.

The reference tokenizes/embeds/interleaves/pads *inside the model's forward
pass over a python list of ragged dicts* (gato_policy.py:195-432), which on
TPU would retrace per shape and serialize host and device work.  Here all
ragged work happens on the host (see neko_tpu/data/packing.py) and the device
step consumes one static-shape record:

    tokens      i32[B, S]   unified token ids (separator = vocab_size; image
                            patch slots and padding = 0)
    input_mask  bool[B, S]  True for real (non-pad) tokens; sequences are
                            LEFT-padded, matching gato_policy.py:408-416
    target_mask bool[B, S]  True where the token is a prediction target
                            (text + actions; gato_policy.py:276,322,335)
    inner_pos   i32[B, S]   within-timestep observation position, -1 where no
                            inner positional embedding applies (separator /
                            action / pad slots; gato_policy.py:381-385)
    patches     u8[N, ps, ps, 3]  raw image patches (0..255, NHWC; uint8 on
                            the wire — the model casts+normalizes on device,
                            see ModelConfig.patch_dtype) — a GLOBAL
                            pool across the whole batch, not per-example: in
                            mixed text+control batches most examples carry no
                            images, and a per-example [B, P, ...] budget made
                            the patch conv 3x more expensive than needed
    patch_pos   i32[N, 4]   quantized (h_lo, h_hi, w_lo, w_hi) position
                            intervals per patch (embeddings.py:80-100)
    patch_batch i32[N]      batch row the patch belongs to; B marks unused
    patch_slot  i32[N]      index into S where the patch embedding is
                            scattered; S marks an unused pool slot

Every array has a static shape so one jit-compiled train step serves text,
control, caption and VQA batches alike.  The pool size N is a per-batch
budget (see SequencePacker.pack_batch); keep it stable across steps to avoid
recompiles.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class PackedBatch:
    tokens: jnp.ndarray
    input_mask: jnp.ndarray
    target_mask: jnp.ndarray
    inner_pos: jnp.ndarray
    patches: Optional[jnp.ndarray] = None
    patch_pos: Optional[jnp.ndarray] = None
    patch_batch: Optional[jnp.ndarray] = None
    patch_slot: Optional[jnp.ndarray] = None
    # Optional gathered-loss indices: in mixed batches only a fraction of
    # positions are prediction targets (obs/image/separator tokens are not),
    # so the [*, V] head matmul is computed only at these positions.
    # loss_pos: i32[Nt, 2] (batch_row, position) of the PREDICTING token;
    # loss_tgt: i32[Nt] the target id; batch_row == B marks unused entries.
    loss_pos: Optional[jnp.ndarray] = None
    loss_tgt: Optional[jnp.ndarray] = None

    @property
    def batch_size(self) -> int:
        return self.tokens.shape[0]

    @property
    def seq_len(self) -> int:
        return self.tokens.shape[1]

    @property
    def has_patches(self) -> bool:
        return self.patches is not None and self.patches.shape[0] > 0


def empty_batch_np(
    batch_size: int,
    seq_len: int,
    patch_budget: int = 0,
    patch_size: int = 16,
    patch_dtype=np.float32,
) -> dict:
    """Host-side zeroed numpy arrays for the packer to fill in."""
    out = {
        "tokens": np.zeros((batch_size, seq_len), dtype=np.int32),
        "input_mask": np.zeros((batch_size, seq_len), dtype=bool),
        "target_mask": np.zeros((batch_size, seq_len), dtype=bool),
        "inner_pos": np.full((batch_size, seq_len), -1, dtype=np.int32),
    }
    if patch_budget > 0:
        out["patches"] = np.zeros(
            (patch_budget, patch_size, patch_size, 3), dtype=patch_dtype
        )
        out["patch_pos"] = np.zeros((patch_budget, 4), dtype=np.int32)
        # batch == batch_size / slot == seq_len mark unused pool entries;
        # the device scatter drops them (out-of-range indices).
        out["patch_batch"] = np.full((patch_budget,), batch_size, dtype=np.int32)
        out["patch_slot"] = np.full((patch_budget,), seq_len, dtype=np.int32)
    return out


def add_loss_entries_np(out: dict, target_budget: int) -> None:
    """Append gathered-loss index arrays derived from the packed masks."""
    B, S = out["tokens"].shape
    loss_pos = np.full((target_budget, 2), [B, 0], dtype=np.int32)
    loss_tgt = np.zeros((target_budget,), dtype=np.int32)
    n = 0
    pred_mask = out["input_mask"][:, :-1] & out["target_mask"][:, 1:]
    for b in range(B):
        (ts,) = np.nonzero(pred_mask[b])
        if n + len(ts) > target_budget:
            raise ValueError(
                f"batch has more than target_budget={target_budget} loss "
                "targets; raise the budget"
            )
        loss_pos[n : n + len(ts), 0] = b
        loss_pos[n : n + len(ts), 1] = ts
        loss_tgt[n : n + len(ts)] = out["tokens"][b, ts + 1]
        n += len(ts)
    out["loss_pos"] = loss_pos
    out["loss_tgt"] = loss_tgt


def from_arrays(arrays: dict) -> PackedBatch:
    """Wrap packer output in a PackedBatch WITHOUT transferring to device —
    the caller device_puts the whole pytree once with its target shardings
    (one transfer instead of per-leaf default-device puts + a resharding
    copy).  The hot-path constructor for the training pipeline."""
    return PackedBatch(**arrays)


def to_device_batch(arrays: dict) -> PackedBatch:
    return PackedBatch(
        tokens=jnp.asarray(arrays["tokens"]),
        input_mask=jnp.asarray(arrays["input_mask"]),
        target_mask=jnp.asarray(arrays["target_mask"]),
        inner_pos=jnp.asarray(arrays["inner_pos"]),
        patches=jnp.asarray(arrays["patches"]) if "patches" in arrays else None,
        patch_pos=jnp.asarray(arrays["patch_pos"]) if "patch_pos" in arrays else None,
        patch_batch=jnp.asarray(arrays["patch_batch"]) if "patch_batch" in arrays else None,
        patch_slot=jnp.asarray(arrays["patch_slot"]) if "patch_slot" in arrays else None,
        loss_pos=jnp.asarray(arrays["loss_pos"]) if "loss_pos" in arrays else None,
        loss_tgt=jnp.asarray(arrays["loss_tgt"]) if "loss_tgt" in arrays else None,
    )
