"""Attention implementations: XLA reference path + TPU Pallas flash attention.

The reference materializes [B, H, S, S] fp32 attention logits
(trajectory_gpt2.py:163-188) or defers to torch SDPA (238-250).  On TPU the
naive path is HBM-bandwidth-bound; the flash kernel keeps the softmax
accumulation in VMEM and never materializes the score matrix.

Key-padding is expressed through segment ids (pad tokens get segment 0, real
tokens 1): real queries cannot attend pad keys, matching the reference's
additive -1e4 padding mask for every loss-visible position (pad *query* rows
produce zeros here vs garbage there — both are masked out of the loss).

Multi-chip: attention is independent per (batch, head), so under an active
('data','model') mesh the kernel runs inside shard_map with batch on 'data'
and heads on 'model' — no collectives inside the kernel.

Attention-weight dropout (reference trajectory_gpt2.py:179,249) is applied on
BOTH paths: the XLA path uses jax.random.bernoulli; the whole-head Pallas
kernel regenerates a deterministic keep mask from the on-chip PRNG
(attention_kernel._keep_scale) so fwd and custom-VJP bwd agree.  The generic
bundled flash kernel has no dropout — Attention routes train-mode dropout
through the XLA path when the whole-head kernel doesn't support the shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_BIG_NEG = -1e9


def flash_supported() -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def xla_attention(
    q, k, v, key_mask, *, dropout_rng=None, dropout_rate=0.0, deterministic=True
):
    """Causal attention with key-padding mask; fp32 softmax.
    q,k,v: [B, H, S, hd]; key_mask: bool [B, S]."""
    S = q.shape[2]
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
    allowed = causal[None, None, :, :] & key_mask[:, None, None, :]
    logits = jnp.where(allowed, logits, _BIG_NEG)
    weights = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _flash_block_sizes(S: int):
    """Large blocks amortize grid overhead: with head_dim 32 the default
    128-blocks ran at ~3% MXU; 512-blocks measured 2x faster end to end."""
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    b = min(512, S)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b, block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def _flash_local(q, k, v, key_mask, sm_scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    seg = key_mask.astype(jnp.int32)
    return flash_attention(
        q, k, v,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=sm_scale,
        block_sizes=_flash_block_sizes(q.shape[2]),
    )


def _active_mesh():
    # the `with mesh:` context manager sets thread-local resources; the old
    # public accessor (jax.interpreters.pxla.thread_resources) is deprecated
    from jax._src import mesh as mesh_lib

    mesh = mesh_lib.thread_resources.env.physical_mesh
    if mesh is None or mesh.empty:
        return None
    return mesh


def _kernel_local(q, k, v, key_mask, seed, sm_scale, dropout_rate, axes=()):
    """Pick the authored whole-head kernel when the workload fits (small
    heads, S <= 1024 — 2x faster than the generic flash kernel there),
    else the generic flash kernel.

    `axes`: mesh axis names this runs under (inside shard_map) — folded into
    the dropout seed so shards draw independent masks."""
    from neko_tpu.ops import attention_kernel as whk

    if whk.supported(q.shape[2], q.shape[3], q.dtype):
        start, end = whk.mask_bounds_from_key_mask(key_mask)
        if dropout_rate > 0.0:
            for i, name in enumerate(axes):
                seed = seed + jax.lax.axis_index(name) * (100_003 + i)
            return whk.whole_head_attention(
                q, k, v, start, end, seed, sm_scale, dropout_rate
            )
        return whk.whole_head_attention(q, k, v, start, end, None, sm_scale)
    assert dropout_rate == 0.0, (
        "the generic flash kernel has no dropout; the caller must route "
        "train-mode dropout through the XLA path for unsupported shapes"
    )
    return _flash_local(q, k, v, key_mask, sm_scale)


def packed_flash_ok(S: int, hd: int, heads: int) -> bool:
    """True when a head-packed (transpose-free) kernel serves this shape —
    the preferred train-mode path.  S <= 1024 uses the whole-head kernel;
    longer sequences the blocked flash kernel (both with dropout support).

    Under tensor parallelism the kernel runs inside shard_map on the
    PER-SHARD head count, so lane-groupability is checked on that (e.g.
    heads=12, hd=32, model=2 -> local heads 6, head_group(6,32)=0 —
    unservable even though head_group(12,32)=4)."""
    from neko_tpu.ops import attention_kernel as whk
    from neko_tpu.ops import blocked_attention as blk

    model_shards = _model_shards(_active_mesh())
    if heads % model_shards != 0:
        return False
    local_heads = heads // model_shards
    if not flash_supported() or whk.head_group(local_heads, hd) <= 0:
        return False
    return whk.supported(S, hd, None) or blk.supported(S, hd, local_heads)


def _model_shards(mesh) -> int:
    return dict(mesh.shape).get("model", 1) if mesh is not None else 1


def _kernel_local_bsd(q, k, v, key_mask, seed, *, heads, sm_scale, dropout_rate, axes=()):
    from neko_tpu.ops import attention_kernel as whk
    from neko_tpu.ops import blocked_attention as blk

    start, end = whk.mask_bounds_from_key_mask(key_mask)
    if dropout_rate > 0.0:
        for i, name in enumerate(axes):
            seed = seed + jax.lax.axis_index(name) * (100_003 + i)
    S, hd = q.shape[1], q.shape[-1] // heads
    if whk.supported(S, hd, None):
        return whk.whole_head_attention_bsd(
            q, k, v, start, end, seed,
            heads=heads, sm_scale=sm_scale, dropout_rate=dropout_rate,
        )
    return blk.blocked_attention_bsd(
        q, k, v, start, end, seed,
        heads=heads, sm_scale=sm_scale, dropout_rate=dropout_rate,
    )


def tpu_flash_attention_bsd(
    q, k, v, key_mask, *, heads, dropout_seed=None, dropout_rate=0.0
):
    """Head-packed whole-head attention: q/k/v and the result stay in
    [B, S, H*hd] layout end to end (head h at minor columns [h*hd, (h+1)*hd)),
    so the train path needs NO [B,H,S,hd] relayout copies.  shard_mapped over
    an active ('data','model') mesh with heads sharded along the minor dim
    (the same head split as the bhsd path — TP-identical math).

    Caller must check `packed_flash_ok(S, hd, heads)` first."""
    hd = q.shape[-1] // heads
    sm_scale = hd ** -0.5
    if dropout_rate <= 0.0:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    mesh = _active_mesh()
    if mesh is None or mesh.size == 1:
        return _kernel_local_bsd(
            q, k, v, key_mask, dropout_seed,
            heads=heads, sm_scale=sm_scale, dropout_rate=dropout_rate,
        )

    from jax import shard_map

    model_shards = _model_shards(mesh)
    assert heads % model_shards == 0, (
        f"heads={heads} not divisible by model axis {model_shards}"
    )
    axes = tuple(mesh.axis_names)
    fn = shard_map(
        functools.partial(
            _kernel_local_bsd,
            heads=heads // model_shards,
            sm_scale=sm_scale,
            dropout_rate=dropout_rate,
            axes=axes,
        ),
        mesh=mesh,
        in_specs=(
            P("data", None, "model"),
            P("data", None, "model"),
            P("data", None, "model"),
            P("data", None),
            P(),
        ),
        out_specs=P("data", None, "model"),
        check_vma=False,
    )
    return fn(q, k, v, key_mask, dropout_seed)


def flash_dropout_supported(S: int, hd: int) -> bool:
    """True when the flash path can apply attention-weight dropout (the
    whole-head kernel handles the shape)."""
    from neko_tpu.ops import attention_kernel as whk

    return whk.supported(S, hd, None)


def tpu_flash_attention(q, k, v, key_mask, *, dropout_seed=None, dropout_rate=0.0):
    """Pallas attention, shard_mapped over an active ('data','model') mesh
    when one is in scope (attention is independent per batch x head, so no
    collectives are needed inside the kernel).

    dropout_rate > 0 requires `dropout_seed` (int32 [1]) and a shape the
    whole-head kernel supports (see flash_dropout_supported)."""
    sm_scale = q.shape[-1] ** -0.5
    if dropout_rate <= 0.0:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    mesh = _active_mesh()
    if mesh is None or mesh.size == 1:
        return _kernel_local(
            q, k, v, key_mask, dropout_seed, sm_scale, dropout_rate
        )

    from jax import shard_map

    axes = tuple(mesh.axis_names)
    fn = shard_map(
        functools.partial(
            _kernel_local, sm_scale=sm_scale, dropout_rate=dropout_rate,
            axes=axes,
        ),
        mesh=mesh,
        in_specs=(
            P("data", "model", None, None),
            P("data", "model", None, None),
            P("data", "model", None, None),
            P("data", None),
            P(),
        ),
        out_specs=P("data", "model", None, None),
        check_vma=False,
    )
    return fn(q, k, v, key_mask, dropout_seed)


def flash_shape_ok(S: int, hd: int, heads: int) -> bool:
    """The bundled kernel wants the sequence in >=128 lane-aligned blocks."""
    return S >= 128 and S % 128 == 0


def seq_shards() -> int:
    """Size of the 'seq' axis of the active mesh (1 when no mesh / no axis)."""
    from neko_tpu.parallel.mesh import seq_axis_size

    return seq_axis_size(_active_mesh())


def packed_ring_ok(S: int, hd: int, heads: int) -> bool:
    """True when the Pallas ring kernels (ops/ring_kernel.py) serve this
    sequence-sharded shape — the preferred long-context train path: flash
    block math inside every ring step, head-packed transpose-free layout."""
    from neko_tpu.ops import ring_kernel as rk

    mesh = _active_mesh()
    n = dict(mesh.shape).get("seq", 1) if mesh is not None else 1
    if n <= 1 or not flash_supported():
        return False
    model_shards = _model_shards(mesh)
    if heads % model_shards != 0 or S % n != 0:
        return False
    return rk.supported(S // n, hd, heads // model_shards)


def sequence_parallel_attention_bsd(
    q, k, v, key_mask, *, heads, dropout_seed=None, dropout_rate=0.0
):
    """Pallas ring attention in head-packed [B, S, H*hd] layout: batch on
    'data', heads (minor dim) on 'model', sequence blocks rotating around
    the 'seq' ICI ring with flash-kernel block math at every step
    (ops/ring_kernel.py).  Replaces the pure-XLA ring for supported shapes —
    no [B, H, S_l, S_l] score materialization, no relayout transposes.

    Caller must check `packed_ring_ok(S, hd, heads)` first."""
    from jax import shard_map

    from neko_tpu.ops import attention_kernel as whk
    from neko_tpu.ops import ring_kernel as rk

    mesh = _active_mesh()
    n = dict(mesh.shape)["seq"]
    model_shards = _model_shards(mesh)
    sm_scale = (q.shape[-1] // heads) ** -0.5
    if dropout_rate <= 0.0:
        dropout_seed = jnp.zeros((1,), jnp.int32)
    # GLOBAL contiguous key-validity bounds — computed once outside the
    # ring; nothing mask-shaped ever rotates
    start, end = whk.mask_bounds_from_key_mask(key_mask)

    def local(ql, kl, vl, st, en, seed):
        if dropout_rate > 0.0:
            # decorrelate the replicated seed across data/model shards (the
            # seq position is already unique through GLOBAL block ids)
            seed = seed + jax.lax.axis_index("data") * 100_003
            seed = seed + jax.lax.axis_index("model") * 100_004
        return rk.ring_attention_bsd(
            ql, kl, vl, st, en, seed,
            axis_name="seq", n_shards=n, heads=heads // model_shards,
            sm_scale=sm_scale, dropout_rate=dropout_rate,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", "seq", "model"),
            P("data", "seq", "model"),
            P("data", "seq", "model"),
            P("data"),
            P("data"),
            P(),
        ),
        out_specs=P("data", "seq", "model"),
        check_vma=False,
    )
    return fn(q, k, v, start, end, dropout_seed)


def sequence_parallel_attention(
    q, k, v, key_mask, *, dropout_key=None, dropout_rate=0.0
):
    """Ring attention over the active mesh's 'seq' axis: batch on 'data',
    heads on 'model', sequence blocks rotating around the 'seq' ring
    (ops/ring_attention.py).  The long-context training path — per-device
    attention memory is O((S/seq)^2) instead of O(S^2)."""
    from jax import shard_map

    from neko_tpu.ops.ring_attention import ring_attention

    mesh = _active_mesh()
    assert mesh is not None and dict(mesh.shape).get("seq", 1) > 1

    if dropout_rate <= 0.0:
        dropout_key = jax.random.key(0)

    def local(q, k, v, km, dk):
        if dropout_rate > 0.0:
            # decorrelate the replicated key across data/model shards; the
            # ring op folds in the seq position itself
            dk = jax.random.fold_in(dk, jax.lax.axis_index("data"))
            dk = jax.random.fold_in(dk, jax.lax.axis_index("model"))
        return ring_attention(
            q, k, v, axis_name="seq", key_mask=km,
            dropout_rate=dropout_rate, dropout_key=dk,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P("data", "model", "seq", None),
            P("data", "model", "seq", None),
            P("data", "model", "seq", None),
            P("data", "seq"),
            P(),
        ),
        out_specs=P("data", "model", "seq", None),
        check_vma=False,
    )
    return fn(q, k, v, key_mask, dropout_key)
