"""Pallas-backed ring attention: TPU-grade sequence parallelism.

The pure-XLA ring (ops/ring_attention.py) materializes a full
[B, H, S_local, S_local] fp32 score matrix per ring step — at k=16k over 4
seq shards that is a 4k x 4k fp32 matrix per (batch, head), exactly the blow-
up the flash kernels exist to avoid.  This module runs the SAME ring schedule
(rotate kv blocks around the 'seq' ICI ring with ppermute) but computes each
(local-q, incoming-kv) block pair with flash-style Pallas kernels in the
head-packed [B, S_local, H*hd] layout, so per-program memory is
O(Bq*Bk + S_local*128) and the train path keeps the transpose-free layout
the packed kernels establish (see ops/blocked_attention.py).

Scheme per device (forward):
  * the device owns q/k/v blocks of global rows [idx*S_l, (idx+1)*S_l)
  * n ring steps; at step t it holds the kv block of device (idx - t) mod n
  * a Pallas kernel produces the block pair's UNNORMALIZED partial
    (acc = sum exp(s - m_blk) @ v, m_blk = running row max, l_blk = running
    row sum); an XLA elementwise combine merges (m, l, acc) across steps
    (the standard two-level flash reduction), and the final out = acc / l
  * causal masking runs on GLOBAL coordinates; kv blocks entirely in the
    future cost ~zero FLOPs (dynamic per-tile loop bounds)
  * key validity [start, end) is computed once globally from the packed
    input mask — no mask rotation on the ring at all

Backward is a second ring pass: dq accumulates locally; (dk, dv) partial
sums rotate WITH the kv block and arrive home after n hops.  The saved row
stats are the single logsumexp L = m + log l, so both backward kernels
reconstruct normalized probabilities as exp(s - L) — no (m, l) pair and no
recomputed forward.

Dropout follows the blocked kernel's contract (reference semantics
trajectory_gpt2.py:179,249): keep masks are regenerated from the on-chip
PRNG per (batch, head, GLOBAL q-block, GLOBAL k-block), so forward and both
backward kernels agree bit-exactly regardless of which ring step computes
the pair; the softmax normalizer deliberately excludes the keep mask.

The reference has no sequence parallelism of any kind — long context is
truncated (control_task.py:223, gato_policy.py:466-467); this whole module
is new TPU-native capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neko_tpu.ops.blocked_attention import BLOCK, _interpret, _keep_scale_blk

_NEG = -1e30


def block_size(S_local: int) -> int:
    return min(BLOCK, S_local)


def supported(S_local: int, hd: int, heads_local: int) -> bool:
    """Shapes the ring kernels serve.  S_local <= 8192 keeps the streamed
    kv block + double buffering inside the 16 MB scoped-VMEM limit (same
    accounting as the single-chip blocked kernel)."""
    from neko_tpu.ops.attention_kernel import head_group

    Bq = block_size(S_local)
    return (
        S_local % Bq == 0
        and S_local % 128 == 0
        and S_local <= 8192
        and hd <= 128
        and head_group(heads_local, hd) > 0
    )


def _iota2(n_rows, n_cols, dim):
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), dim)


def _scores_g(q, k_blk, r0g, c0g, start, end, sm_scale):
    """Masked scores for a (Bq, Bk) tile at GLOBAL offset (r0g, c0g)."""
    Bq, Bk = q.shape[0], k_blk.shape[0]
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * sm_scale
    rows = _iota2(Bq, Bk, 0) + r0g
    cols = _iota2(Bq, Bk, 1) + c0g
    ok = (cols <= rows) & (cols >= start) & (cols < end)
    return jnp.where(ok, s, _NEG)


def _dotf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _ring_fwd_kernel(
    offs_ref, kstart_ref, kend_ref, seed_ref, q_ref, k_ref, v_ref,
    o_ref, m_ref, l_ref,
    *, sm_scale, dropout_rate, hd, n_heads, nq_g, nk_g,
):
    """Partial flash update of the local q block against ONE kv block.

    offs = [q_off, k_off]: global row offset of this device's queries and of
    the incoming kv block.  Outputs are per-q-row UNNORMALIZED: acc relative
    to this block pair's running max m, plus (m, l) row stats."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    S_loc = k_ref.shape[1]
    Bk = block_size(S_loc)
    qoff, koff = offs_ref[0], offs_ref[1]
    start, end = kstart_ref[b], kend_ref[b]
    r0g = qoff + qi * Bq
    # causal upper bound: kv tiles whose first col is <= the last row
    nk_hi = jnp.clip((r0g + Bq - 1 - koff) // Bk + 1, 0, S_loc // Bk)
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]

        def body(ki, carry):
            m, l, acc = carry
            c0g = koff + ki * Bk
            k_blk = k_ref[0, pl.ds(ki * Bk, Bk), sl]
            v_blk = v_ref[0, pl.ds(ki * Bk, Bk), sl]
            s = _scores_g(q, k_blk, r0g, c0g, start, end, sm_scale)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                p = p * _keep_scale_blk(
                    seed_ref[0], b, hg * g + j,
                    r0g // Bq, c0g // Bk,          # GLOBAL block ids
                    n_heads, nq_g, nk_g, Bq, Bk, dropout_rate,
                )
            acc = acc * alpha + _dotf(p.astype(q.dtype), v_blk)
            return m_new, l, acc

        init = (
            jnp.full((Bq, 1), _NEG, jnp.float32),
            jnp.zeros((Bq, 1), jnp.float32),
            jnp.zeros((Bq, hd), jnp.float32),
        )
        m, l, acc = jax.lax.fori_loop(0, nk_hi, body, init)
        o_ref[0, :, sl] = acc
        m_ref[0, 0, j] = m[:, 0]
        l_ref[0, 0, j] = l[:, 0]


def _ring_dq_kernel(
    offs_ref, kstart_ref, kend_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    L_ref, delta_ref, dq_ref,
    *, sm_scale, dropout_rate, hd, n_heads, nq_g, nk_g,
):
    """dq partial from ONE kv block; p reconstructed as exp(s - L)."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    S_loc = k_ref.shape[1]
    Bk = block_size(S_loc)
    qoff, koff = offs_ref[0], offs_ref[1]
    start, end = kstart_ref[b], kend_ref[b]
    r0g = qoff + qi * Bq
    nk_hi = jnp.clip((r0g + Bq - 1 - koff) // Bk + 1, 0, S_loc // Bk)
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]
        do = do_ref[0, :, sl]
        L = L_ref[0, 0, j][:, None]
        delta = delta_ref[0, 0, j][:, None]

        def body(ki, dq):
            c0g = koff + ki * Bk
            k_blk = k_ref[0, pl.ds(ki * Bk, Bk), sl]
            v_blk = v_ref[0, pl.ds(ki * Bk, Bk), sl]
            s = _scores_g(q, k_blk, r0g, c0g, start, end, sm_scale)
            p = jnp.exp(s - L)
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                dp = dp * _keep_scale_blk(
                    seed_ref[0], b, hg * g + j,
                    r0g // Bq, c0g // Bk,
                    n_heads, nq_g, nk_g, Bq, Bk, dropout_rate,
                )
            ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
            return dq + _dotf(ds, k_blk)

        dq = jax.lax.fori_loop(
            0, nk_hi, body, jnp.zeros((Bq, hd), jnp.float32)
        )
        dq_ref[0, :, sl] = dq


def _ring_dkv_kernel(
    offs_ref, kstart_ref, kend_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    L_ref, delta_ref, dk_ref, dv_ref,
    *, sm_scale, dropout_rate, hd, n_heads, nq_g, nk_g,
):
    """dk/dv partials for the INCOMING kv block from the local q block."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    ki = pl.program_id(2)
    g = k_ref.shape[-1] // hd
    Bk = k_ref.shape[1]
    S_loc = q_ref.shape[1]
    Bq = block_size(S_loc)
    qoff, koff = offs_ref[0], offs_ref[1]
    start, end = kstart_ref[b], kend_ref[b]
    c0g = koff + ki * Bk
    # causal lower bound: q tiles at or after this kv tile's global offset
    nq_loc = S_loc // Bq
    qi_lo = jnp.clip((c0g - qoff) // Bq, 0, nq_loc)
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        k_blk = k_ref[0, :, sl]
        v_blk = v_ref[0, :, sl]

        def body(qi, carry):
            dk, dv = carry
            r0g = qoff + qi * Bq
            q = q_ref[0, pl.ds(qi * Bq, Bq), sl]
            do = do_ref[0, pl.ds(qi * Bq, Bq), sl]
            L = L_ref[0, 0, j, pl.ds(qi * Bq, Bq)][:, None]
            delta = delta_ref[0, 0, j, pl.ds(qi * Bq, Bq)][:, None]
            s = _scores_g(q, k_blk, r0g, c0g, start, end, sm_scale)
            p = jnp.exp(s - L)
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                ks = _keep_scale_blk(
                    seed_ref[0], b, hg * g + j,
                    r0g // Bq, c0g // Bk,
                    n_heads, nq_g, nk_g, Bq, Bk, dropout_rate,
                )
                y = p * ks
                dp = dp * ks
            else:
                y = p
            dv = dv + jax.lax.dot_general(
                y.astype(q.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
            dk = dk + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            return dk, dv

        dk, dv = jax.lax.fori_loop(
            qi_lo, nq_loc, body,
            (jnp.zeros((Bk, hd), jnp.float32), jnp.zeros((Bk, hd), jnp.float32)),
        )
        dk_ref[0, :, sl] = dk
        dv_ref[0, :, sl] = dv


def _grid_specs(S_loc, hd, g, Bq):
    blk = pl.BlockSpec(
        (1, Bq, g * hd), lambda b, h, i, *refs: (b, i, h),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(
        (1, S_loc, g * hd), lambda b, h, i, *refs: (b, 0, h),
        memory_space=pltpu.VMEM,
    )
    stat_blk = pl.BlockSpec(
        (1, 1, g, Bq), lambda b, h, i, *refs: (b, h, 0, i),
        memory_space=pltpu.VMEM,
    )
    stat_full = pl.BlockSpec(
        (1, 1, g, S_loc), lambda b, h, i, *refs: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return blk, full, stat_blk, stat_full


def _partial_fwd(q, k, v, offs, kstart, kend, seed,
                 heads, sm_scale, dropout_rate, nq_g, nk_g):
    from neko_tpu.ops.attention_kernel import head_group

    B, S_loc, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = block_size(S_loc)
    blk, full, stat_blk, _ = _grid_specs(S_loc, hd, g, Bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, heads // g, S_loc // Bq),
        in_specs=[blk, full, full],
        out_specs=[blk, stat_blk, stat_blk],
    )
    return pl.pallas_call(
        functools.partial(
            _ring_fwd_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads, nq_g=nq_g, nk_g=nk_g,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, S_loc, D), jnp.float32),
            jax.ShapeDtypeStruct((B, heads // g, g, S_loc), jnp.float32),
            jax.ShapeDtypeStruct((B, heads // g, g, S_loc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(offs, kstart, kend, seed, q, k, v)


def _partial_dq(q, k, v, do, L, delta, offs, kstart, kend, seed,
                heads, sm_scale, dropout_rate, nq_g, nk_g):
    from neko_tpu.ops.attention_kernel import head_group

    B, S_loc, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = block_size(S_loc)
    blk, full, stat_blk, _ = _grid_specs(S_loc, hd, g, Bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, heads // g, S_loc // Bq),
        in_specs=[blk, full, full, blk, stat_blk, stat_blk],
        out_specs=blk,
    )
    return pl.pallas_call(
        functools.partial(
            _ring_dq_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads, nq_g=nq_g, nk_g=nk_g,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S_loc, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(offs, kstart, kend, seed, q, k, v, do, L, delta)


def _partial_dkv(q, k, v, do, L, delta, offs, kstart, kend, seed,
                 heads, sm_scale, dropout_rate, nq_g, nk_g):
    from neko_tpu.ops.attention_kernel import head_group

    B, S_loc, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bk = block_size(S_loc)
    blk, full, _, stat_full = _grid_specs(S_loc, hd, g, Bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, heads // g, S_loc // Bk),
        in_specs=[full, blk, blk, full, stat_full, stat_full],
        out_specs=[blk, blk],
    )
    return pl.pallas_call(
        functools.partial(
            _ring_dkv_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads, nq_g=nq_g, nk_g=nk_g,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, S_loc, D), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(offs, kstart, kend, seed, q, k, v, do, L, delta)


def _bc_rows(x, hd):
    """Row stats [B, H//g, g, S_loc] -> [B, S_loc, H*hd] broadcast."""
    B, Hg, g, S = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(B, S, Hg * g)
    return jnp.repeat(x, hd, axis=-1)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def _ring_attention_packed(
    q, k, v, kstart, kend, seed, axis_name, n, heads, sm_scale, dropout_rate
):
    out, _ = _ring_fwd(
        q, k, v, kstart, kend, seed, axis_name, n, heads, sm_scale,
        dropout_rate,
    )
    return out


def _ring_fwd(q, k, v, kstart, kend, seed, axis_name, n, heads, sm_scale,
              dropout_rate):
    from neko_tpu.ops.attention_kernel import head_group

    B, S_loc, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = block_size(S_loc)
    nq_g = nk_g = (n * S_loc) // Bq
    idx = jax.lax.axis_index(axis_name)
    qoff = idx * S_loc

    m = jnp.full((B, heads // g, g, S_loc), _NEG, jnp.float32)
    l = jnp.zeros((B, heads // g, g, S_loc), jnp.float32)
    acc = jnp.zeros((B, S_loc, D), jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]
    k_blk, v_blk, src = k, v, idx
    for t in range(n):
        koff = src * S_loc
        offs = jnp.stack([qoff, koff]).astype(jnp.int32)
        o_p, m_p, l_p = _partial_fwd(
            q, k_blk, v_blk, offs, kstart, kend, seed,
            heads, sm_scale, dropout_rate, nq_g, nk_g,
        )
        m_new = jnp.maximum(m, m_p)
        a1 = jnp.exp(m - m_new)
        a2 = jnp.exp(m_p - m_new)
        l = l * a1 + l_p * a2
        acc = acc * _bc_rows(a1, hd) + o_p * _bc_rows(a2, hd)
        m = m_new
        if t < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            src = (src - 1) % n
    out = (acc / jnp.maximum(_bc_rows(l, hd), 1e-30)).astype(q.dtype)
    # logsumexp row stats for the backward pass; fully-masked rows keep _NEG
    L = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), _NEG)
    return out, L


def _ring_vjp_fwd(q, k, v, kstart, kend, seed, axis_name, n, heads, sm_scale,
                  dropout_rate):
    out, L = _ring_fwd(
        q, k, v, kstart, kend, seed, axis_name, n, heads, sm_scale,
        dropout_rate,
    )
    return out, (q, k, v, kstart, kend, seed, out, L)


def _ring_vjp_bwd(axis_name, n, heads, sm_scale, dropout_rate, res, do):
    from neko_tpu.ops.attention_kernel import head_group

    q, k, v, kstart, kend, seed, out, L = res
    B, S_loc, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = block_size(S_loc)
    nq_g = nk_g = (n * S_loc) // Bq
    idx = jax.lax.axis_index(axis_name)
    qoff = idx * S_loc

    # delta = rowsum(do * out) per (b, h, row), in the stats layout
    delta = (
        (do.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, S_loc, heads, hd)
        .sum(-1)
        .transpose(0, 2, 1)
        .reshape(B, heads // g, g, S_loc)
    )

    perm = [(i, (i + 1) % n) for i in range(n)]
    dq = jnp.zeros((B, S_loc, D), jnp.float32)
    dk_blk = jnp.zeros((B, S_loc, D), jnp.float32)
    dv_blk = jnp.zeros((B, S_loc, D), jnp.float32)
    k_blk, v_blk, src = k, v, idx
    for t in range(n):
        koff = src * S_loc
        offs = jnp.stack([qoff, koff]).astype(jnp.int32)
        dq_p = _partial_dq(
            q, k_blk, v_blk, do, L, delta, offs, kstart, kend, seed,
            heads, sm_scale, dropout_rate, nq_g, nk_g,
        )
        dq = dq + dq_p
        dk_p, dv_p = _partial_dkv(
            q, k_blk, v_blk, do, L, delta, offs, kstart, kend, seed,
            heads, sm_scale, dropout_rate, nq_g, nk_g,
        )
        dk_blk = dk_blk + dk_p
        dv_blk = dv_blk + dv_p
        # rotate the kv block AND its gradient accumulators together: after
        # n hops the accumulated (dk, dv) are back at the block's owner
        dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
        if t < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
            src = (src - 1) % n
    return (
        dq.astype(q.dtype),
        dk_blk.astype(k.dtype),
        dv_blk.astype(v.dtype),
        None,
        None,
        None,
    )


_ring_attention_packed.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


def ring_attention_bsd(
    q, k, v, kstart, kend, seed=None, *, axis_name, n_shards, heads,
    sm_scale=None, dropout_rate=0.0,
):
    """Ring attention over `axis_name` in head-packed [B, S_local, H*hd]
    layout.  q/k/v are this device's sequence blocks; kstart/kend are the
    GLOBAL contiguous key-validity bounds per batch row (int32 [B]).  Must
    run inside shard_map with `axis_name` in scope; `n_shards` is the static
    ring size.  Check `supported(S_local, hd, heads)` first."""
    if sm_scale is None:
        sm_scale = (q.shape[-1] // heads) ** -0.5
    if seed is None:
        assert dropout_rate == 0.0, "dropout requires an explicit seed"
        seed = jnp.zeros((1,), jnp.int32)
    return _ring_attention_packed(
        q, k, v, kstart, kend, seed, axis_name, n_shards, heads, sm_scale,
        dropout_rate,
    )
