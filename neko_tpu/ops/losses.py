"""Chunked (logit-free) masked softmax cross-entropy over a large vocabulary.

The naive path materializes fp32 logits [B, S, V] (3.4 GB at B=16, S=1024,
V=52480) and re-reads them through the loss forward AND backward — tens of GB
of HBM traffic per step.  Here the sequence is processed in chunks under
`jax.checkpoint`: each chunk's logits live only transiently in VMEM/HBM and
are recomputed in the backward pass, cutting peak memory and bandwidth at the
cost of one extra head matmul (compute is cheap; bandwidth is the TPU
bottleneck).

Semantically identical to models.policy.masked_next_token_loss: shifted
next-token CE, masked by input_mask[t] * target_mask[t+1], averaged over
unmasked targets, padded vocab columns excluded from the partition function.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def chunked_masked_xent(
    hidden: jnp.ndarray,       # [B, S, D] activations (bf16 ok)
    kernel: jnp.ndarray,       # [D, V] head weights (param dtype)
    tokens: jnp.ndarray,       # i32 [B, S]
    input_mask: jnp.ndarray,   # bool [B, S]
    target_mask: jnp.ndarray,  # bool [B, S]
    valid_vocab: Optional[int] = None,
    chunk_size: int = 256,
    return_sum_count: bool = False,
    one_hot_gather: bool = False,
) -> jnp.ndarray:
    B, S, D = hidden.shape
    V = kernel.shape[-1]
    compute_dtype = hidden.dtype

    # per-position shifted targets/mask (position t predicts token t+1)
    tgt = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((B, 1), tokens.dtype)], axis=1
    )
    mask = (
        input_mask.astype(jnp.float32)
        * jnp.concatenate(
            [target_mask[:, 1:], jnp.zeros((B, 1), target_mask.dtype)], axis=1
        ).astype(jnp.float32)
    )
    if valid_vocab is not None:
        # masked positions can hold out-of-vocab ids (separator); clip for the
        # gather — their contribution is zeroed by `mask`.
        tgt = jnp.clip(tgt, 0, min(V, valid_vocab) - 1)

    C = min(chunk_size, S)
    if S % C != 0:
        pad = C - S % C
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        tgt = jnp.pad(tgt, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        S = S + pad
    n_chunks = S // C

    kernel_c = kernel.astype(compute_dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)

    @jax.checkpoint
    def chunk_nll(x, t, m):
        # x: [B, C, D]; t,m: [B, C]
        logits = jnp.einsum(
            "bcd,dv->bcv", x, kernel_c, preferred_element_type=jnp.float32
        )
        if valid_vocab is not None and valid_vocab < V:
            logits = jnp.where(col < valid_vocab, logits, -1e30)
        logz = jax.nn.logsumexp(logits, axis=-1)
        if one_hot_gather:
            # compare-and-reduce instead of take_along_axis: a GATHER along
            # a 'model'-sharded vocab dim inside a manual shard_map region
            # trips a grouped-sharding CHECK in the SPMD partitioner
            # (spmd_partitioner_util.cc:495); the masked reduce partitions
            # as an ordinary cross-'model' all-reduce.  Same value: the
            # target column is selected exactly once.
            tl = jnp.where(col == t[..., None], logits, 0.0).sum(-1)
        else:
            tl = jnp.take_along_axis(logits, t[..., None], axis=-1)[..., 0]
        nll = jnp.where(m > 0, logz - tl, 0.0)
        return nll.sum()

    # Unrolled static loop: no scan input-stacking/transpose, and XLA can
    # pipeline consecutive chunks' matmuls (a lax.scan serialized them and
    # spent ~15% of the step shuffling operands).
    total = jnp.zeros((), jnp.float32)
    for i in range(n_chunks):
        sl = slice(i * C, (i + 1) * C)
        total = total + chunk_nll(hidden[:, sl], tgt[:, sl], mask[:, sl])
    if return_sum_count:
        # un-normalized (sum, count): the 1F1B pipeline accumulates
        # per-microbatch sums against a precomputed GLOBAL count so the
        # combined loss equals the full-batch masked mean exactly
        return total, mask.sum()
    denom = jnp.maximum(mask.sum(), 1.0)
    return total / denom


def gathered_masked_xent(
    hidden: jnp.ndarray,    # [B, S, D]
    kernel: jnp.ndarray,    # [D, V]
    loss_pos: jnp.ndarray,  # i32 [Nt, 2] (batch_row, predicting position)
    loss_tgt: jnp.ndarray,  # i32 [Nt]
    valid_vocab: Optional[int] = None,
    chunk_size: int = 4096,
) -> jnp.ndarray:
    """Chunked CE evaluated ONLY at gathered target positions.

    chunk_size: chip-swept r5 (runs/loss_head_r5.json, Nt=12288 fwd+bwd):
    C=1024 24.76 / 2048 23.84 / 4096 23.61 / 12288 23.77 ms — the head's
    dots run at what XLA gives for [Nt,V]x[V,D] regardless of chunking
    (the 153 TF/s dx dot is shape-bound, not a chunking artifact); 4096 is
    the flat optimum and the ledger's answer to "chase the 77%-of-peak
    dot".

    In mixed multimodal batches most positions carry no loss (image patches,
    observations, separators are never targets — gato_policy.py:292,301,312,
    345), so projecting every position through the [D, V] head wastes the
    majority of the dominant matmul.  The packer precomputes (row, pos, tgt)
    triples (data/batch.py::add_loss_entries_np); entries with row == B are
    padding and masked out.  Numerically identical to the dense path:
    masked-sum / count over the same target set.
    """
    B = hidden.shape[0]
    V = kernel.shape[-1]
    Nt = loss_pos.shape[0]
    compute_dtype = hidden.dtype

    valid = (loss_pos[:, 0] < B).astype(jnp.float32)
    rows = jnp.minimum(loss_pos[:, 0], B - 1)
    cols = loss_pos[:, 1]
    h = hidden[rows, cols]  # [Nt, D]
    if valid_vocab is not None:
        tgt = jnp.clip(loss_tgt, 0, min(V, valid_vocab) - 1)
    else:
        tgt = loss_tgt

    C = min(chunk_size, Nt)
    if Nt % C != 0:
        pad = C - Nt % C
        h = jnp.pad(h, ((0, pad), (0, 0)))
        tgt = jnp.pad(tgt, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        Nt += pad
    n_chunks = Nt // C

    kernel_c = kernel.astype(compute_dtype)

    total = jnp.zeros((), jnp.float32)
    for i in range(n_chunks):
        sl = slice(i * C, (i + 1) * C)
        total = total + _chunk_nll(
            h[sl], tgt[sl], valid[sl], kernel_c,
            valid_vocab if (valid_vocab is not None and valid_vocab < V) else None,
        )
    return total / jnp.maximum(valid.sum(), 1.0)


def _chunk_logits(x, W, valid_vocab):
    logits = jnp.einsum(
        "nd,dv->nv", x, W, preferred_element_type=jnp.float32
    )
    if valid_vocab is not None:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, W.shape[-1]), 1)
        logits = jnp.where(col_ids < valid_vocab, logits, -1e30)
    return logits


def _logz_tl(x, t, W, valid_vocab):
    """(logsumexp, target logit) per row.

    A fused Pallas kernel computing the logits tile-by-tile in VMEM with an
    online logsumexp (ops/loss_kernel.py) was built, verified, and measured
    SLOWER than this XLA path on v5e (1.545 vs 1.461 ms per 2048x52480
    call): the forward is compute-bound — XLA hides the [C, V] fp32
    write/read behind the matmul, while the in-kernel exp/max/sum VPU work
    contends with the MXU tiles.  The kernel and its parity tests are kept
    (tests/test_loss_kernel.py) as the measured record."""
    logits = _chunk_logits(x, W, valid_vocab)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tl = jnp.take_along_axis(logits, t[:, None], axis=-1)[:, 0]
    return logz, tl


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _chunk_nll(x, t, m, W, valid_vocab):
    """Chunk NLL-sum with a hand-written VJP.

    `jax.checkpoint` here would recompute the full forward in the backward —
    including the logsumexp reduction, a pure-HBM-bandwidth pass over the
    [C, V] fp32 logits (~2.3 ms/step at the flagship config, per the xprof
    op table in PROFILE.md).  The softmax gradient only needs logz itself,
    which is C floats: save it, recompute just the logits matmul, and form
    dlogits = (softmax - onehot) directly.

    The (logz, target-logit) pair comes from _logz_tl — on TPU a fused
    Pallas kernel that never materializes the [C, V] fp32 logits."""
    logz, tl = _logz_tl(x, t, W, valid_vocab)
    return (jnp.where(m > 0, logz - tl, 0.0)).sum()


def _chunk_nll_fwd(x, t, m, W, valid_vocab):
    logz, tl = _logz_tl(x, t, W, valid_vocab)
    out = (jnp.where(m > 0, logz - tl, 0.0)).sum()
    return out, (x, t, m, W, logz)


def _chunk_nll_bwd(valid_vocab, res, g):
    x, t, m, W, logz = res
    V = W.shape[-1]
    logits = _chunk_logits(x, W, valid_vocab)
    p = jnp.exp(logits - logz[:, None])          # softmax (masked cols -> 0)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, V), 1) == t[:, None]
    )
    scale = (m * g)[:, None]
    dlogits = ((p - onehot.astype(p.dtype)) * scale).astype(x.dtype)
    dx = jnp.einsum(
        "nv,dv->nd", dlogits, W, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dW = jnp.einsum(
        "nd,nv->dv", x, dlogits, preferred_element_type=jnp.float32
    ).astype(W.dtype)
    return dx, None, None, dW


_chunk_nll.defvjp(_chunk_nll_fwd, _chunk_nll_bwd)
