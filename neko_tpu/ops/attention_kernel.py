"""Whole-head Pallas attention kernel (forward + custom-VJP backward).

Specialized for this framework's workload: Gato-style models have SMALL heads
(768d/24h -> head_dim 32) and moderate context (k <= 1024).  A whole head's
score matrix is then only S*S*4 = 4 MB — it fits in VMEM, so the classic
flash-attention online-softmax machinery (block loops, m/l stats arrays,
multi-pass backward) is pure overhead.  This kernel runs one grid program per
(batch, head): load q/k/v for the head (3 x 64 KB), compute the full masked
softmax in VMEM, write the output.  The backward recomputes probabilities and
produces dq/dk/dv in a single program as well.

Masking exploits the packer's guarantee that padding is CONTIGUOUS (left-pad
for training, right-pad for decode prefill): validity is `pad_start <= col <
pad_end` per batch row, passed as two scalar-prefetch vectors instead of the
[B, S] segment-id arrays the generic kernel streams.

Two layouts:

* `whole_head_attention` — classic [B, H, S, hd] arrays, one (batch, head)
  program per grid cell.  Used by paths that already hold transposed q/k/v
  (ring attention shards, tests).
* `whole_head_attention_bsd` — head-packed [B, S, H*hd] arrays: a group of
  g = 128//hd heads (Pallas wants 128-divisible minor block dims) is blocked
  straight out of the projection's natural output layout, so the train path
  never materializes a [B,H,S,hd] transpose.  Eliminating those relayout
  copies (split + 3x transpose fwd, mirrored bwd) was worth ~9% of the
  768d/6L train step.

Measured on v5e (B=16, H=24, S=1024, hd=32, bf16) vs the bundled
jax.experimental flash kernel with tuned 512-blocks:
fwd+bwd 13.1 ms -> 6.5 ms per layer (bhsd), ~5.0 ms head-packed.

Falls back to the generic flash path when S*S*4 would overflow VMEM
(S > 2048) — see neko_tpu/ops/attention.py for dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _mask(scores, start, end, S):
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ok = (col <= row) & (col >= start) & (col < end)
    return jnp.where(ok, scores, _NEG)


def _softmax(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _dot(a, b):
    """Standard [m,k]x[k,n] matmul with fp32 accumulation.

    Precision is pinned to DEFAULT: a global
    jax_default_matmul_precision='highest' would request fp32-precision
    passes on bf16 operands, which Mosaic rejects ('Bad lhs type')."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _keep_scale(seed, b, h, n_h, S, dropout_rate):
    """Regenerate the per-(batch, head) dropout keep/scale matrix.

    Deterministic given (seed, b, h) so the backward kernel reproduces the
    exact mask the forward applied (reference applies attn_pdrop on both its
    manual and SDPA paths, trajectory_gpt2.py:179,249).

    8 random bits per element: one u32 word serves FOUR mask entries
    (bitcast expands the sublane dim), quartering the in-kernel PRNG work —
    mask generation was ~1.4 ms/layer/step at the flagship config.  P(drop)
    is quantized to round(rate*256)/256 and survivors are rescaled by the
    REALIZED keep probability, so the expectation is exactly preserved —
    the same documented tradeoff as the residual-dropout path
    (ops/dropout.py)."""
    pltpu.prng_seed(seed, b * n_h + h)
    q = min(int(round(dropout_rate * 256)), 255)
    bits = pltpu.bitcast(pltpu.prng_random_bits((S // 4, S)), jnp.uint8)
    # Mosaic has no u8 compare; widen (1 VPU convert vs 4x PRNG words saved)
    keep = (bits.astype(jnp.int32) >= q).astype(jnp.float32)
    return keep * (1.0 / (1.0 - q / 256.0))


def _mask_blk(scores, start, end, r0, c0):
    """Causal + validity mask for a block at GLOBAL offset (r0, c0)."""
    R, C = scores.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) + r0
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1) + c0
    ok = (col <= row) & (col >= start) & (col < end)
    return jnp.where(ok, scores, _NEG)


def _n_split(S: int) -> int:
    """Causal row-split factor: each row block must stay 128-aligned.

    n=4 skips 37.5% of the score/value matmul FLOPs, n=2 skips 25%;
    measured n=4 is the win at S=1024 (the extra per-block softmax setup is
    small against 12.5% fewer MXU flops on hd=32's 25%-utilized array)."""
    if S % 512 == 0:
        return 4
    if S % 256 == 0:
        return 2
    return 1


def _attn_fwd_body(q, k, v, start, end, seed, b, h, n_h, *, sm_scale, dropout_rate):
    """Shared forward math on a (S, hd) head: masked softmax attention.

    For 128-aligned row blocks the computation splits causally into n row
    bands: rows [iR, (i+1)R) can only attend keys [0, (i+1)R), so the
    strictly-upper blocks of the score/value matmuls — pure masked work in
    the full-matrix formulation — are skipped (37.5% of attention FLOPs at
    n=4).  The dropout mask is still generated whole and sliced, so masks
    stay BIT-IDENTICAL to the unsplit path (and to the bhsd layout)."""
    S = q.shape[-2]
    ks = (
        _keep_scale(seed, b, h, n_h, S, dropout_rate)
        if dropout_rate > 0.0
        else None
    )
    n = _n_split(S)
    if n == 1:
        scores = _mask(_dot(q, k.T) * sm_scale, start, end, S)
        p = _softmax(scores)
        if ks is not None:
            p = p * ks
        return _dot(p.astype(q.dtype), v)
    R = S // n
    outs = []
    for i in range(n):
        w = (i + 1) * R  # this row band attends keys [0, w)
        s_i = _mask_blk(_dot(q[i * R:w], k[:w].T) * sm_scale, start, end, i * R, 0)
        p_i = _softmax(s_i)
        if ks is not None:
            p_i = p_i * ks[i * R:w, :w]
        outs.append(_dot(p_i.astype(q.dtype), v[:w]))
    return jnp.concatenate(outs, axis=0)


def _blk_grads(q, do, k, v, start, end, r0, ks, *, sm_scale, in_dtype):
    """dq/dk/dv of one (q rows at global offset r0) x (k cols at 0) block."""
    s = _mask_blk(_dot(q, k.T) * sm_scale, start, end, r0, 0)
    p = _softmax(s)
    y = p * ks if ks is not None else p
    dv = _dot(y.astype(in_dtype).T, do)
    dp = _dot(do, v.T)
    if ks is not None:
        dp = dp * ks
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * sm_scale).astype(in_dtype)
    dq = _dot(ds, k)
    dk = _dot(ds.T, q)
    return dq, dk, dv


def _attn_bwd_body(q, k, v, do, start, end, seed, b, h, n_h, *, sm_scale, dropout_rate):
    """Shared backward math on a (S, hd) head: recompute p, produce dq/dk/dv.
    Same n-way causal row split as the forward."""
    S = q.shape[-2]
    ks = (
        _keep_scale(seed, b, h, n_h, S, dropout_rate)
        if dropout_rate > 0.0
        else None
    )
    n = _n_split(S)
    if n == 1:
        return _blk_grads(
            q, do, k, v, start, end, 0, ks,
            sm_scale=sm_scale, in_dtype=q.dtype,
        )
    R = S // n
    dqs = []
    dk = None
    dv = None
    # iterate widest band first so the (S, hd) accumulators exist up front
    for i in reversed(range(n)):
        w = (i + 1) * R
        dq_i, dk_i, dv_i = _blk_grads(
            q[i * R:w], do[i * R:w], k[:w], v[:w], start, end, i * R,
            ks[i * R:w, :w] if ks is not None else None,
            sm_scale=sm_scale, in_dtype=q.dtype,
        )
        dqs.append(dq_i)
        if dk is None:
            dk, dv = dk_i, dv_i  # i == n-1: full (S, hd)
        else:
            pad = jnp.zeros((S - w, dk_i.shape[-1]), dk_i.dtype)
            dk = dk + jnp.concatenate([dk_i, pad], axis=0)
            dv = dv + jnp.concatenate([dv_i, pad], axis=0)
    return jnp.concatenate(dqs[::-1], axis=0), dk, dv


def _fwd_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
    *, sm_scale, dropout_rate,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    o = _attn_fwd_body(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
        start_ref[b], end_ref[b], seed_ref[0], b, h, pl.num_programs(1),
        sm_scale=sm_scale, dropout_rate=dropout_rate,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, sm_scale, dropout_rate,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    dq, dk, dv = _attn_bwd_body(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0],
        start_ref[b], end_ref[b], seed_ref[0], b, h, pl.num_programs(1),
        sm_scale=sm_scale, dropout_rate=dropout_rate,
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _fwd_kernel_bsd(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
    *, sm_scale, dropout_rate, hd, n_heads,
):
    """Head-packed forward: refs hold a (1, S, g*hd) group of g heads; heads
    are sliced along lanes (Pallas wants 128-divisible minor block dims, so a
    single hd=32 head can't be its own block)."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    g = q_ref.shape[-1] // hd
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        o = _attn_fwd_body(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
            start_ref[b], end_ref[b], seed_ref[0], b, hg * g + j, n_heads,
            sm_scale=sm_scale, dropout_rate=dropout_rate,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel_bsd(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    dq_ref, dk_ref, dv_ref, *, sm_scale, dropout_rate, hd, n_heads,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    g = q_ref.shape[-1] // hd
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        dq, dk, dv = _attn_bwd_body(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], do_ref[0, :, sl],
            start_ref[b], end_ref[b], seed_ref[0], b, hg * g + j, n_heads,
            sm_scale=sm_scale, dropout_rate=dropout_rate,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _specs(B, H, S, hd):
    # with scalar prefetch, index maps receive the scalar refs as trailing args
    qspec = pl.BlockSpec(
        (1, 1, S, hd), lambda b, h, *refs: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return qspec


def _pallas_fwd(q, k, v, start, end, seed, sm_scale, dropout_rate):
    B, H, S, hd = q.shape
    spec = _specs(B, H, S, hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(start, end, seed, q, k, v)


def _pallas_bwd(q, k, v, do, start, end, seed, sm_scale, dropout_rate):
    B, H, S, hd = q.shape
    spec = _specs(B, H, S, hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, H),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(start, end, seed, q, k, v, do)


def head_group(heads: int, hd: int) -> int:
    """Heads per program for the packed layout: smallest group whose lane
    width is 128-divisible (Pallas block-minor requirement) or the full row."""
    D = heads * hd
    if D <= 128:
        return heads
    if 128 % hd != 0:
        return 0  # unsupported
    g = 128 // hd
    return g if heads % g == 0 else 0


def _specs_bsd(S, hd, g):
    """Blocks into head-packed [B, S, H*hd]: a group of g heads (g*hd lanes)
    per program along the minor dim — no [B,H,S,hd] transpose ever exists."""
    return pl.BlockSpec(
        (1, S, g * hd), lambda b, h, *refs: (b, 0, h),
        memory_space=pltpu.VMEM,
    )


def _pallas_fwd_bsd(q, k, v, start, end, seed, heads, sm_scale, dropout_rate):
    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    assert g > 0, f"unsupported head-packed shape heads={heads} hd={hd}"
    spec = _specs_bsd(S, hd, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel_bsd, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(start, end, seed, q, k, v)


def _pallas_bwd_bsd(q, k, v, do, start, end, seed, heads, sm_scale, dropout_rate):
    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    assert g > 0, f"unsupported head-packed shape heads={heads} hd={hd}"
    spec = _specs_bsd(S, hd, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
    )
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel_bsd, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(start, end, seed, q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _whole_head_attention_bsd(
    q, k, v, start, end, seed, heads, sm_scale, dropout_rate
):
    return _pallas_fwd_bsd(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )


def _vjp_fwd_bsd(q, k, v, start, end, seed, heads, sm_scale, dropout_rate):
    out = _pallas_fwd_bsd(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )
    return out, (q, k, v, start, end, seed)


def _vjp_bwd_bsd(heads, sm_scale, dropout_rate, res, do):
    q, k, v, start, end, seed = res
    dq, dk, dv = _pallas_bwd_bsd(
        q, k, v, do, start, end, seed, heads, sm_scale, dropout_rate
    )
    return dq, dk, dv, None, None, None


_whole_head_attention_bsd.defvjp(_vjp_fwd_bsd, _vjp_bwd_bsd)


def whole_head_attention_bsd(
    q, k, v, start, end, seed=None, *, heads, sm_scale=None, dropout_rate=0.0
):
    """Head-packed-layout whole-head attention.

    q, k, v: [B, S, H*hd] with head h's features at columns
    [h*hd, (h+1)*hd) — the natural output layout of a Dense projection — so
    the kernel blocks along the minor dim and NO [B, H, S, hd] transpose is
    ever materialized (those relayout copies were ~6% of the 768d/6L train
    step).  Returns [B, S, H*hd] in the same layout, directly consumable by
    the output projection.  Masking/dropout semantics are identical to
    `whole_head_attention` (same per-(batch, head) keep mask).
    """
    if sm_scale is None:
        sm_scale = (q.shape[-1] // heads) ** -0.5
    if seed is None:
        assert dropout_rate == 0.0, "dropout requires an explicit seed"
        seed = jnp.zeros((1,), jnp.int32)
    return _whole_head_attention_bsd(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def whole_head_attention(
    q, k, v, start, end, seed=None, sm_scale=None, dropout_rate=0.0
):
    """Causal attention with contiguous key validity [start, end) per batch.

    q, k, v: [B, H, S, hd]; start/end: int32 [B].  Returns [B, H, S, hd].

    dropout_rate > 0 applies attention-weight dropout (reference
    trajectory_gpt2.py:179,249) with the on-chip PRNG; `seed` is an int32 [1]
    array and the mask is deterministic given (seed, batch, head) so the
    custom backward regenerates it exactly.  seed=None (allowed only with
    dropout_rate == 0) supplies a dummy.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if seed is None:
        assert dropout_rate == 0.0, "dropout requires an explicit seed"
        seed = jnp.zeros((1,), jnp.int32)
    return _pallas_fwd(q, k, v, start, end, seed, sm_scale, dropout_rate)


def _vjp_fwd(q, k, v, start, end, seed, sm_scale, dropout_rate):
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if seed is None:
        assert dropout_rate == 0.0, "dropout requires an explicit seed"
        seed = jnp.zeros((1,), jnp.int32)
    out = _pallas_fwd(q, k, v, start, end, seed, sm_scale, dropout_rate)
    return out, (q, k, v, start, end, seed)


def _vjp_bwd(sm_scale, dropout_rate, res, do):
    q, k, v, start, end, seed = res
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    dq, dk, dv = _pallas_bwd(
        q, k, v, do, start, end, seed, sm_scale, dropout_rate
    )
    return dq, dk, dv, None, None, None


whole_head_attention.defvjp(_vjp_fwd, _vjp_bwd)


def dropout_keep_scale(seed, B: int, H: int, S: int, dropout_rate: float):
    """Materialize the exact keep/scale matrices the kernels apply — test
    support for verifying the dropout fwd/bwd against an XLA reference that
    uses the identical mask.  Returns fp32 [B, H, S, S]."""

    def kern(seed_ref, o_ref):
        b, h = pl.program_id(0), pl.program_id(1)
        o_ref[0, 0] = _keep_scale(
            seed_ref[0], b, h, pl.num_programs(1), S, dropout_rate
        )

    spec = pl.BlockSpec(
        (1, 1, S, S), lambda b, h, *refs: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, H), in_specs=[], out_specs=spec
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, S), jnp.float32),
    )(seed)


def supported(S: int, hd: int, dtype) -> bool:
    """Whole-head scores (S*S fp32) + blocks must fit comfortably in VMEM."""
    return S <= 1024 and S % 128 == 0 and hd <= 128


def mask_bounds_from_key_mask(key_mask: jnp.ndarray):
    """Contiguous validity [start, end) per row from a bool [B, S] mask.

    The packer always produces contiguous runs (left- or right-padding); for
    safety the caller should only use this on packer-produced masks.
    """
    S = key_mask.shape[-1]
    idx = jnp.arange(S)
    any_valid = key_mask.any(axis=-1)
    start = jnp.where(
        any_valid, jnp.argmax(key_mask, axis=-1), S
    ).astype(jnp.int32)
    rev = key_mask[:, ::-1]
    end = jnp.where(
        any_valid, S - jnp.argmax(rev, axis=-1), 0
    ).astype(jnp.int32)
    return start, end
