"""Ring attention: causal attention over a sequence-sharded axis.

A NEW capability relative to the reference, which handles long context purely
by truncation (SURVEY.md §5.7).  The sequence dimension is sharded over a
mesh axis; each device holds a block of queries and rotates key/value (and
key-padding mask) blocks around the ring with `ppermute` while accumulating a
numerically-stable online softmax — memory per device stays
O(S_local * S_local) and the rotation rides the ICI ring.

This is the blockwise/ring formulation (Liu et al., Ring Attention) in pure
JAX collectives, wrapped in `shard_map` with the sequence axis name.  It is
integrated into NekoModel: `Attention` dispatches here in train mode whenever
the active mesh has a 'seq' axis of size > 1 (models/transformer.py), so a
config like `context_len=8192, mesh_seq_axis=4` trains end to end.

Supports the packed batch's key-padding mask (left-padded sequences,
data/batch.py) and attention-weight dropout (reference
trajectory_gpt2.py:179,249): dropout is applied to the UNNORMALIZED exp
weights while the softmax denominator accumulates undropped mass — identical
to dropping the final normalized probabilities, since both are scaled by the
same row sum.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def _block(q32, q_pos, k_blk, v_blk, k_pos, mask_blk, m, l, acc, drop_key,
           dropout_rate):
    """One online-softmax accumulation against a single kv block."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    allowed = q_pos[:, None] >= k_pos[None, :]
    allowed = allowed[None, None]
    if mask_blk is not None:
        allowed = allowed & mask_blk[:, None, None, :]
    s = jnp.where(allowed, s, _NEG)

    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    p_v = p
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(drop_key, 1.0 - dropout_rate, p.shape)
        p_v = p * keep / (1.0 - dropout_rate)
    acc_new = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p_v, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention(
    q: jnp.ndarray,  # [B, H, S_local, hd] — this device's query block
    k: jnp.ndarray,  # [B, H, S_local, hd] — this device's key block
    v: jnp.ndarray,  # [B, H, S_local, hd]
    axis_name: str,
    sm_scale: Optional[float] = None,
    key_mask: Optional[jnp.ndarray] = None,  # bool [B, S_local], this device's block
    dropout_rate: float = 0.0,
    dropout_key: Optional[jnp.ndarray] = None,  # PRNG key, same on all devices
) -> jnp.ndarray:
    """Causal global attention over seq blocks laid out along `axis_name`.

    Device i owns global positions [i*S_local, (i+1)*S_local).  Returns this
    device's output block [B, H, S_local, hd].  Rows whose keys are all
    masked produce zeros (they are loss-masked upstream).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, S_local, hd = q.shape
    scale = hd ** -0.5 if sm_scale is None else sm_scale

    q32 = q.astype(jnp.float32) * scale
    q_pos = idx * S_local + jnp.arange(S_local)

    if dropout_rate > 0.0:
        assert dropout_key is not None, "dropout requires a PRNG key"
        # decorrelate shards: the key arrives replicated, fold in this
        # device's position on every mesh axis the caller names via axis_name
        # plus its own ring position handled per-step below
        dropout_key = jax.random.fold_in(dropout_key, idx)
    else:
        dropout_key = jax.random.key(0) if dropout_key is None else dropout_key

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, t):
        m, l, acc, k_blk, v_blk, mask_blk, src = carry
        k_pos = src * S_local + jnp.arange(S_local)
        # per-(query block, key block) dropout stream: key block identity is
        # `src`, deterministic given (seed, idx, src)
        dk = jax.random.fold_in(dropout_key, src)
        m, l, acc = _block(
            q32, q_pos, k_blk, v_blk, k_pos,
            mask_blk if key_mask is not None else None,
            m, l, acc, dk, dropout_rate,
        )
        # rotate kv (and mask) one hop around the ring; we then hold the
        # block of the device one position to the left (source decrements)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if key_mask is not None:
            mask_blk = jax.lax.ppermute(mask_blk, axis_name, perm)
        src_new = (src - 1) % n
        return (m, l, acc, k_blk, v_blk, mask_blk, src_new), None

    mask0 = key_mask if key_mask is not None else jnp.ones((B, S_local), bool)
    init = (
        jnp.full((B, H, S_local, 1), _NEG, jnp.float32),
        jnp.zeros((B, H, S_local, 1), jnp.float32),
        jnp.zeros((B, H, S_local, hd), jnp.float32),
        k,
        v,
        mask0,
        idx,
    )
    # n-1 rotate-and-accumulate steps, then one final accumulate without the
    # trailing ppermute (whose result would be discarded)
    carry, _ = jax.lax.scan(step, init, jnp.arange(n - 1))
    m, l, acc, k_blk, v_blk, mask_blk, src = carry
    k_pos = src * S_local + jnp.arange(S_local)
    dk = jax.random.fold_in(dropout_key, src)
    m, l, acc = _block(
        q32, q_pos, k_blk, v_blk, k_pos,
        mask_blk if key_mask is not None else None,
        m, l, acc, dk, dropout_rate,
    )
    # rows with zero attended mass (fully-masked queries) -> zeros, not NaN
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def sequence_sharded_attention(
    q, k, v, mesh, axis_name: str = "seq", key_mask=None,
    dropout_rate: float = 0.0, dropout_key=None,
):
    """Convenience wrapper: shard [B, H, S, hd] arrays over `axis_name` of
    `mesh` and run ring attention."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    if key_mask is None:
        key_mask = jnp.ones((q.shape[0], q.shape[2]), bool)
    if dropout_key is None:
        dropout_key = jax.random.key(0)
    fn = shard_map(
        lambda q, k, v, km, dk: ring_attention(
            q, k, v, axis_name=axis_name, key_mask=km,
            dropout_rate=dropout_rate, dropout_key=dk,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis_name), P()),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, key_mask, dropout_key)
