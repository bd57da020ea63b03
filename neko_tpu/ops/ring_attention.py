"""Ring attention: causal attention over a sequence-sharded axis.

A NEW capability relative to the reference, which handles long context purely
by truncation (SURVEY.md §5.7).  The sequence dimension is sharded over a
mesh axis; each device holds a block of queries and rotates key/value blocks
around the ring with `ppermute` while accumulating a numerically-stable
online softmax — memory per device stays O(S_local * S_local) and the
rotation rides the ICI ring.

This is the blockwise/ring formulation (Liu et al., Ring Attention) in pure
JAX collectives, meant to be wrapped in `shard_map` with the sequence axis
name, e.g.:

    mesh = Mesh(devices, ("seq",))
    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3,
        out_specs=P(None, None, "seq", None),
        check_rep=False,
    )(q, k, v)

Integration into NekoModel's training step (a 'seq' mesh axis alongside
'data'/'model') is roadmap work; this op + its multi-device tests establish
the collective pattern and numerics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e30


def ring_attention(
    q: jnp.ndarray,  # [B, H, S_local, hd] — this device's query block
    k: jnp.ndarray,  # [B, H, S_local, hd] — this device's key block
    v: jnp.ndarray,  # [B, H, S_local, hd]
    axis_name: str,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Causal global attention over seq blocks laid out along `axis_name`.

    Device i owns global positions [i*S_local, (i+1)*S_local).  Returns this
    device's output block [B, H, S_local, hd].
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, S_local, hd = q.shape
    scale = hd ** -0.5 if sm_scale is None else sm_scale

    q32 = q.astype(jnp.float32) * scale
    q_pos = idx * S_local + jnp.arange(S_local)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, l, acc, k_blk, v_blk, src = carry
        k_pos = src * S_local + jnp.arange(S_local)
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        allowed = q_pos[:, None] >= k_pos[None, :]
        s = jnp.where(allowed[None, None], s, _NEG)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

        # rotate kv one hop around the ring; we then hold the block of the
        # device one position to the left (source index decrements)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        src_new = (src - 1) % n
        return (m_new, l_new, acc_new, k_blk, v_blk, src_new), None

    init = (
        jnp.full((B, H, S_local, 1), _NEG, jnp.float32),
        jnp.zeros((B, H, S_local, 1), jnp.float32),
        jnp.zeros((B, H, S_local, hd), jnp.float32),
        k,
        v,
        idx,
    )
    # n-1 rotate-and-accumulate steps, then one final accumulate without the
    # trailing ppermute (whose result would be discarded)
    carry, _ = jax.lax.scan(step, init, None, length=n - 1)
    m, l, acc, k_blk, v_blk, src = carry
    k_pos = src * S_local + jnp.arange(S_local)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q32, k_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    allowed = q_pos[:, None] >= k_pos[None, :]
    s = jnp.where(allowed[None, None], s, _NEG)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def sequence_sharded_attention(q, k, v, mesh, axis_name: str = "seq"):
    """Convenience wrapper: shard [B, H, S, hd] arrays over `axis_name` of
    `mesh` and run ring attention."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v)
