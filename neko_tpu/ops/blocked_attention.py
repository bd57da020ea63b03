"""Blocked flash attention (online softmax) with on-chip PRNG dropout.

Long-context companion to the whole-head kernel (ops/attention_kernel.py):
for S <= 1024 a head's full score matrix fits VMEM and the whole-head kernel
wins; beyond that this kernel tiles queries into Bq-row blocks and streams
key/value blocks with the classic flash-attention running (m, l, acc)
update, so per-program VMEM is O(Bq*Bk + S*hd) instead of O(S^2).  Unlike
the bundled jax.experimental flash kernel, it applies attention-weight
dropout (reference semantics: trajectory_gpt2.py:179,249) — the keep mask is
regenerated from the on-chip PRNG per (batch, head, q-block, k-block), so
the backward kernels reproduce the forward's mask exactly in any loop order.

Layout is head-packed [B, S, H*hd] (see whole_head_attention_bsd): heads are
blocked in groups of g = 128//hd along the minor dim straight out of the qkv
projection, no [B,H,S,hd] transpose exists.

Masking: causal + contiguous key validity [start, end) per batch row
(scalar-prefetched), matching the packer's contiguous-padding guarantee.

Backward: the forward saves the row stats m (running max) and l (softmax
normalizer); delta = rowsum(do * o) is computed in XLA.  For S <= FUSED_MAX
one FUSED kernel produces dq, dk AND dv in a single banded sweep: the grid's
sequential q-block dim revisits full-sequence dk/dv output blocks (index map
constant in qi), so Mosaic keeps them VMEM-resident and each (qi, ki) tile
computes the score matrix ONCE — 5 dots per tile (s, dp, dq, dk, dv) versus
the classic three-pass scheme's 7 (s and dp recomputed in both the dq and
the dkv kernel).  Measured on v5e at the k=2048 train shape this cut the
backward from 8.69 to ~6 ms/layer.  Beyond FUSED_MAX the resident fp32
dk/dv (+ full k/v copies) exceed the 16 MB scoped-VMEM budget and the
original three-pass kernels take over (dq loops k blocks; dkv loops q
blocks).  Dropout is applied to the UNNORMALIZED exp(s - m) — the
normalizer l deliberately excludes the keep mask, which is exactly
`softmax(s) * keep/keep_prob`, the whole-head kernel's (and the
reference's) semantics.

FLOPs skip the strictly-upper-triangular blocks (dynamic fori_loop bounds),
~2x at large S.

Measured on v5e (B=8, H=24, S=2048, hd=32, bf16): fwd+bwd 14.6 ms vs the
bundled jax.experimental flash kernel's 19.9 ms (which has no dropout and
needs the [B,H,S,hd] transposes this layout avoids).  Net effect at model
level: a 768d/6L k=2048 bs8 train step with dropout 0.1 runs at 97.5k
tokens/sec/chip — previously impossible on one chip (the XLA fallback
materializes [B,H,S,S] and OOMs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

BLOCK = 512
# Forward-only q-block size (None -> BLOCK).  The fwd kernel's k/v are
# VMEM-resident across the sequential q dim (index maps constant in qi), so
# its floor-vs-ceiling gap is per-(Bq,Bk)-tile fixed overhead — a taller
# fwd q-block halves the tile count at the price of computing more of the
# causally-masked band (coarser diagonal granularity).  Dropout masks stay
# on the (BLOCK, BLOCK) logical grid regardless (sub-tiles stacked), so
# the backward kernels reproduce the identical PRNG stream.  MEASURED A
# LOSS on chip (runs/blocked_qb_r5_s2048.json): qb1024 fwd 5.69 vs prod
# 5.08 ms/layer — the coarser diagonal's extra in-band FLOPs cost more
# than the per-tile overhead saved — and qb2048 fails Mosaic compile.
# Stays None in production; kept (bit-exact, tested) as the recorded
# rejection.  Bench override via tools/bench_blocked_variants.
FWD_QBLOCK = None
# fused single-pass backward cap: the kernel holds full-sequence fp32 dk/dv
# accumulators + full bf16 k/v copies resident in VMEM per (batch, head
# group) — ~12 MB at S=4096 (within the 16 MB scoped budget), ~24 MB at
# S=8192 (over).  TPU-verified: S=2048 with and without dropout, S=4096
# both ways — WITH dropout the full-tile kernel overflowed scoped VMEM
# (Mosaic crash, runs/blocked_variants_r5_s4096.json); the q-row
# sub-tiled variant (q_sub=2 below) halves the fp32 tile temporaries,
# replays the identical PRNG stream, and serves that shape.
FUSED_MAX = 4096
# q-row sub-tiling threshold for the fused backward under dropout (tests
# lower it to force the sub-tiled path at interpret-mode shapes); FUSED_QSUB
# overrides the automatic choice outright (tests/bench)
FUSED_QSUB_MIN_S = 4096
FUSED_QSUB = None


def _interpret() -> bool:
    """Run the pallas_calls in interpret mode off-TPU so the exact algorithm
    is testable in the CPU suite (the model never dispatches here on CPU —
    attention.packed_flash_ok gates on flash_supported())."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def supported(S: int, hd: int, heads: int) -> bool:
    """Shapes this kernel serves: block-divisible S, lane-groupable heads.

    The S cap is TPU-VERIFIED, not theoretical: on v5e (hd=32, H=24, bf16,
    dropout) fwd+bwd compiles and runs at S=2048 (18.7 ms, B=8),
    S=4096 (12.6 ms, B=1) and S=8192 (24.5 ms, B=1), while S=16384 fails
    Mosaic compile — the dkv pass streams full q+do+k+v copies whose
    double-buffered VMEM footprint exceeds the 16 MB scoped limit.  Longer
    contexts are the ring path's job (ops/ring_kernel.py over a 'seq' mesh
    axis, same per-shard cap)."""
    from neko_tpu.ops.attention_kernel import head_group

    return (
        S % BLOCK == 0
        and S <= 8192
        and hd <= 128
        and head_group(heads, hd) > 0
    )


def _iota2(n_rows, n_cols, dim):
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), dim)


def _block_scores(q, k_blk, r0, c0, start, end, sm_scale):
    """Masked scores for a (Bq, Bk) tile at absolute offset (r0, c0)."""
    Bq, Bk = q.shape[0], k_blk.shape[0]
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * sm_scale
    rows = _iota2(Bq, Bk, 0) + r0
    cols = _iota2(Bq, Bk, 1) + c0
    ok = (cols <= rows) & (cols >= start) & (cols < end)
    return jnp.where(ok, s, _NEG)


def _keep_scale_rows(seed, b, h, qi, ki, n_heads, nq, nk, Bk, row0, rows,
                     dropout_rate):
    """Rows [row0, row0+rows) of the logical (BLOCK, Bk) mask tile.

    The PRNG stream is per logical tile (seeded by (b, h, qi, ki)), so a
    kernel that sub-tiles the q rows must draw the FULL tile's bits and
    slice — row0/rows static — to replay the exact bits the forward
    applied.  The wasted draw is one u32 word per 4 masked-out entries
    (PRNG measured at 0.07 ms/step on the whole flagship mask load)."""
    blk_id = ((b * n_heads + h) * nq + qi) * nk + ki
    pltpu.prng_seed(seed, blk_id)
    q8 = min(int(round(dropout_rate * 256)), 255)
    bits = pltpu.bitcast(pltpu.prng_random_bits((BLOCK // 4, Bk)), jnp.uint8)
    sub = bits[row0:row0 + rows, :]
    keep = (sub.astype(jnp.int32) >= q8).astype(jnp.float32)
    return keep * (1.0 / (1.0 - q8 / 256.0))


def _keep_scale_blk(seed, b, h, qi, ki, n_heads, nq, nk, Bq, Bk, dropout_rate):
    """Deterministic keep/scale tile for (batch, head, q-block, k-block) —
    every kernel (fwd, dq, dkv) regenerates the identical mask from the same
    seed tuple regardless of its own loop order.  Mosaic allows at most two
    seed words, so the (b, h, qi, ki) coordinates fold into one int32 (unique
    while B*H*nq*nk < 2^31 — e.g. 16*24*32*32 ~ 4e5).  nq is passed
    explicitly (not derived from nk) so fwd/bwd masks stay aligned even if
    the q/k block sizes ever diverge."""
    blk_id = ((b * n_heads + h) * nq + qi) * nk + ki
    pltpu.prng_seed(seed, blk_id)
    # 8 random bits per element (one u32 word -> 4 mask entries via the
    # sublane-expanding bitcast): 4x less PRNG work; P(drop) quantized to
    # round(rate*256)/256 with survivors rescaled by the REALIZED keep
    # probability — exactly unbiased (same tradeoff as ops/dropout.py)
    q8 = min(int(round(dropout_rate * 256)), 255)
    bits = pltpu.bitcast(pltpu.prng_random_bits((Bq // 4, Bk)), jnp.uint8)
    # Mosaic has no u8 compare; widen (1 VPU convert vs 4x PRNG words saved)
    keep = (bits.astype(jnp.int32) >= q8).astype(jnp.float32)
    return keep * (1.0 / (1.0 - q8 / 256.0))


def _dotf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _fwd_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref,
    o_ref, m_ref, l_ref,
    *, sm_scale, dropout_rate, hd, n_heads,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]          # may be a multiple of BLOCK (FWD_QBLOCK)
    S = k_ref.shape[1]
    Bk = BLOCK
    nsub = Bq // BLOCK           # logical BLOCK-row sub-tiles per q block
    nq = S // BLOCK              # dropout-mask grid stays (BLOCK, BLOCK):
    nk = S // Bk                 # bwd kernels replay the identical stream
    start, end = start_ref[b], end_ref[b]
    r0 = qi * Bq
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]

        def body(ki, carry):
            m, l, acc = carry
            c0 = ki * Bk
            k_blk = k_ref[0, pl.ds(c0, Bk), sl]
            v_blk = v_ref[0, pl.ds(c0, Bk), sl]
            s = _block_scores(q, k_blk, r0, c0, start, end, sm_scale)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                keep = [
                    _keep_scale_blk(
                        seed_ref[0], b, hg * g + j, qi * nsub + r, ki,
                        n_heads, nq, nk, BLOCK, Bk, dropout_rate,
                    )
                    for r in range(nsub)
                ]
                p = p * (
                    keep[0] if nsub == 1
                    else jnp.concatenate(keep, axis=0)
                )
            acc = acc * alpha + _dotf(p.astype(q.dtype), v_blk)
            return m_new, l, acc

        init = (
            jnp.full((Bq, 1), _NEG, jnp.float32),
            jnp.zeros((Bq, 1), jnp.float32),
            jnp.zeros((Bq, hd), jnp.float32),
        )
        # causal: rows [r0, r0+Bq) see k blocks 0 .. (r0+Bq)/Bk - 1
        m, l, acc = jax.lax.fori_loop(0, (qi + 1) * (Bq // Bk), body, init)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
        m_ref[0, 0, j] = m[:, 0]
        l_ref[0, 0, j] = l[:, 0]


def _dq_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    m_ref, l_ref, delta_ref, dq_ref,
    *, sm_scale, dropout_rate, hd, n_heads,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    S = k_ref.shape[1]
    Bk = BLOCK
    nq = S // Bq
    nk = S // Bk
    start, end = start_ref[b], end_ref[b]
    r0 = qi * Bq
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]
        do = do_ref[0, :, sl]
        m = m_ref[0, 0, j][:, None]
        l = l_ref[0, 0, j][:, None]
        delta = delta_ref[0, 0, j][:, None]

        def body(ki, dq):
            c0 = ki * Bk
            k_blk = k_ref[0, pl.ds(c0, Bk), sl]
            v_blk = v_ref[0, pl.ds(c0, Bk), sl]
            s = _block_scores(q, k_blk, r0, c0, start, end, sm_scale)
            p = jnp.exp(s - m) / l
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                dp = dp * _keep_scale_blk(
                    seed_ref[0], b, hg * g + j, qi, ki,
                    n_heads, nq, nk, Bq, Bk, dropout_rate,
                )
            ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
            return dq + _dotf(ds, k_blk)

        dq = jax.lax.fori_loop(
            0, qi + 1, body, jnp.zeros((Bq, hd), jnp.float32)
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _bwd_fused_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    m_ref, l_ref, delta_ref, dq_ref, dk_ref, dv_ref,
    *, sm_scale, dropout_rate, hd, n_heads, q_sub=1,
):
    """Single banded sweep producing dq, dk, dv.

    Grid (B, H//g, nq) with the LAST dim sequential: dk/dv output blocks
    map to the same full-sequence block for every qi, so they accumulate
    in VMEM across the sweep (zeroed at qi == 0) and each (qi, ki) tile
    computes s/p/dp once.  Accumulators are fp32 (bf16 accumulation across
    up to nq partial sums would lose gradient bits); the caller casts.

    q_sub > 1 processes each (Bq, Bk) tile as q_sub static row sub-tiles:
    every fp32 temporary (s/p/dp/ds/mask) shrinks to (Bq/q_sub, Bk), which
    is what fits S=4096 + dropout under the scoped-VMEM budget on top of
    the resident fp32 dk/dv accumulators.  The dropout stream stays on the
    logical (BLOCK, Bk) tile grid (_keep_scale_rows draws the full tile
    and slices statically), so forward and backward replay identical
    bits; the fori_loop trip count is unchanged (the sub-tiles of the
    diagonal tile pay the same masked-half FLOPs the full tile did)."""
    b = pl.program_id(0)
    hg = pl.program_id(1)
    qi = pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    S = k_ref.shape[1]
    Bk = BLOCK
    nq = S // Bq
    nk = S // Bk
    assert Bq % q_sub == 0
    Bs = Bq // q_sub
    start, end = start_ref[b], end_ref[b]

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        for hh in range(q_sub):
            qsl = slice(hh * Bs, (hh + 1) * Bs)
            q = q_ref[0, qsl, sl]
            do = do_ref[0, qsl, sl]
            m = m_ref[0, 0, j][qsl][:, None]
            l = l_ref[0, 0, j][qsl][:, None]
            delta = delta_ref[0, 0, j][qsl][:, None]
            r0 = qi * Bq + hh * Bs

            def body(ki, dq):
                c0 = ki * Bk
                k_blk = k_ref[0, pl.ds(c0, Bk), sl]
                v_blk = v_ref[0, pl.ds(c0, Bk), sl]
                s = _block_scores(q, k_blk, r0, c0, start, end, sm_scale)
                p = jnp.exp(s - m) / l
                dp = jax.lax.dot_general(
                    do, v_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                if dropout_rate > 0.0:
                    if q_sub == 1:
                        ks = _keep_scale_blk(
                            seed_ref[0], b, hg * g + j, qi, ki,
                            n_heads, nq, nk, Bq, Bk, dropout_rate,
                        )
                    else:
                        ks = _keep_scale_rows(
                            seed_ref[0], b, hg * g + j, qi, ki,
                            n_heads, nq, nk, Bk, hh * Bs, Bs,
                            dropout_rate,
                        )
                    y = p * ks
                    dp = dp * ks
                else:
                    y = p
                ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
                dv_ref[0, pl.ds(c0, Bk), sl] = dv_ref[
                    0, pl.ds(c0, Bk), sl
                ] + jax.lax.dot_general(
                    y.astype(q.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                dk_ref[0, pl.ds(c0, Bk), sl] = dk_ref[
                    0, pl.ds(c0, Bk), sl
                ] + jax.lax.dot_general(
                    ds, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                return dq + _dotf(ds, k_blk)

            dq = jax.lax.fori_loop(
                0, qi + 1, body, jnp.zeros((Bs, hd), jnp.float32)
            )
            dq_ref[0, qsl, sl] = dq.astype(dq_ref.dtype)


def _dkv_kernel(
    start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
    m_ref, l_ref, delta_ref, dk_ref, dv_ref,
    *, sm_scale, dropout_rate, hd, n_heads,
):
    b = pl.program_id(0)
    hg = pl.program_id(1)
    ki = pl.program_id(2)
    g = k_ref.shape[-1] // hd
    Bk = k_ref.shape[1]
    S = q_ref.shape[1]
    Bq = BLOCK
    nq = S // Bq
    nk = S // Bk
    start, end = start_ref[b], end_ref[b]
    c0 = ki * Bk
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        k_blk = k_ref[0, :, sl]
        v_blk = v_ref[0, :, sl]

        def body(qi, carry):
            dk, dv = carry
            r0 = qi * Bq
            q = q_ref[0, pl.ds(r0, Bq), sl]
            do = do_ref[0, pl.ds(r0, Bq), sl]
            m = m_ref[0, 0, j, pl.ds(r0, Bq)][:, None]
            l = l_ref[0, 0, j, pl.ds(r0, Bq)][:, None]
            delta = delta_ref[0, 0, j, pl.ds(r0, Bq)][:, None]
            s = _block_scores(q, k_blk, r0, c0, start, end, sm_scale)
            p = jnp.exp(s - m) / l
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            if dropout_rate > 0.0:
                ks = _keep_scale_blk(
                    seed_ref[0], b, hg * g + j, qi, ki,
                    n_heads, nq, nk, Bq, Bk, dropout_rate,
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

        # causal: k block ki only receives grads from q blocks qi >= ki
        dk, dv = jax.lax.fori_loop(
            ki, nq, body,
            (jnp.zeros((Bk, hd), jnp.float32), jnp.zeros((Bk, hd), jnp.float32)),
        )
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _grid_specs(B, S, D, hd, g, Bq):
    """(q-block spec, full-sequence spec, row-stat spec) for grid
    (B, H//g, S//Bq)."""
    blk = pl.BlockSpec(
        (1, Bq, g * hd), lambda b, h, i, *refs: (b, i, h),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(
        (1, S, g * hd), lambda b, h, i, *refs: (b, 0, h),
        memory_space=pltpu.VMEM,
    )
    # row stats live as [B, H//g, g, S]: the (g, S-block) trailing dims make
    # a legal VMEM tile (second-minor == full dim g) and each program's
    # (b, hg, qi) block is unique
    stat_blk = pl.BlockSpec(
        (1, 1, g, Bq), lambda b, h, i, *refs: (b, h, 0, i),
        memory_space=pltpu.VMEM,
    )
    stat_full = pl.BlockSpec(
        (1, 1, g, S), lambda b, h, i, *refs: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return blk, full, stat_blk, stat_full


def _pallas_fwd(q, k, v, start, end, seed, heads, sm_scale, dropout_rate):
    from neko_tpu.ops.attention_kernel import head_group

    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = FWD_QBLOCK if (FWD_QBLOCK and S % FWD_QBLOCK == 0) else BLOCK
    blk, full, stat_blk, _ = _grid_specs(B, S, D, hd, g, Bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g, S // Bq),
        in_specs=[blk, full, full],
        out_specs=[blk, stat_blk, stat_blk],
    )
    out, m, l = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, heads // g, g, S), jnp.float32),
            jax.ShapeDtypeStruct((B, heads // g, g, S), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(start, end, seed, q, k, v)
    return out, m, l


def _pallas_dq(q, k, v, do, m, l, delta, start, end, seed,
               heads, sm_scale, dropout_rate):
    from neko_tpu.ops.attention_kernel import head_group

    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = BLOCK
    blk, full, stat_blk, _ = _grid_specs(B, S, D, hd, g, Bq)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g, S // Bq),
        in_specs=[blk, full, full, blk, stat_blk, stat_blk, stat_blk],
        out_specs=blk,
    )
    return pl.pallas_call(
        functools.partial(
            _dq_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(start, end, seed, q, k, v, do, m, l, delta)


def _pallas_bwd_fused(q, k, v, do, m, l, delta, start, end, seed,
                      heads, sm_scale, dropout_rate):
    from neko_tpu.ops.attention_kernel import head_group

    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bq = BLOCK
    blk, full, stat_blk, _ = _grid_specs(B, S, D, hd, g, Bq)
    # fp32 full-sequence accumulators, revisited across the sequential qi
    # dim (index map constant in i) — Mosaic keeps them VMEM-resident
    acc_full = pl.BlockSpec(
        (1, S, g * hd), lambda b, h, i, *refs: (b, 0, h),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g, S // Bq),
        in_specs=[blk, full, full, blk, stat_blk, stat_blk, stat_blk],
        out_specs=[blk, acc_full, acc_full],
    )
    # S=4096 + dropout: the full-tile fp32 temporaries (s/p/dp/mask at
    # (512, 512)) on top of the 8 MB of resident accumulators + k/v copies
    # overflow scoped VMEM (Mosaic compile crash,
    # runs/blocked_variants_r5_s4096.json) — sub-tile the q rows so the
    # temporaries halve while the dropout stream stays bit-identical
    q_sub = FUSED_QSUB or (
        2 if (dropout_rate > 0.0 and S >= FUSED_QSUB_MIN_S) else 1
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads, q_sub=q_sub,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(start, end, seed, q, k, v, do, m, l, delta)
    return dq, dk.astype(q.dtype), dv.astype(q.dtype)


def _pallas_dkv(q, k, v, do, m, l, delta, start, end, seed,
                heads, sm_scale, dropout_rate):
    from neko_tpu.ops.attention_kernel import head_group

    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    Bk = BLOCK
    blk, full, _, stat_full = _grid_specs(B, S, D, hd, g, Bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, heads // g, S // Bk),
        in_specs=[full, blk, blk, full, stat_full, stat_full, stat_full],
        out_specs=[blk, blk],
    )
    return pl.pallas_call(
        functools.partial(
            _dkv_kernel, sm_scale=sm_scale, dropout_rate=dropout_rate,
            hd=hd, n_heads=heads,
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(start, end, seed, q, k, v, do, m, l, delta)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _blocked_attention(q, k, v, start, end, seed, heads, sm_scale, dropout_rate):
    out, _, _ = _pallas_fwd(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )
    return out


def _vjp_fwd(q, k, v, start, end, seed, heads, sm_scale, dropout_rate):
    out, m, l = _pallas_fwd(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )
    return out, (q, k, v, start, end, seed, m, l, out)


def _vjp_bwd(heads, sm_scale, dropout_rate, res, do):
    from neko_tpu.ops.attention_kernel import head_group

    q, k, v, start, end, seed, m, l, out = res
    B, S, D = q.shape
    hd = D // heads
    g = head_group(heads, hd)
    # delta = rowsum(do * o) per (b, h, s): elementwise in the packed layout,
    # then laid out like the m/l row stats ([B, H//g, g, S]) for prefetching
    delta = (
        (do.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, S, heads, hd)
        .sum(-1)
        .transpose(0, 2, 1)
        .reshape(B, heads // g, g, S)
    )
    # Chip-measured gate (runs/blocked_variants_r5_s{2048,4096}.json): the
    # fused kernel wins wherever it compiles — S=2048: 62.9 vs 84.1 ms/6L
    # with dropout; S=4096 nodrop: 179 vs 266.  At S=4096 WITH dropout the
    # full-tile kernel crashed Mosaic (fp32 temporaries + PRNG mask on top
    # of the resident accumulators overflow scoped VMEM); the q-row
    # sub-tiled variant (_pallas_bwd_fused q_sub=2, identical PRNG stream
    # by full-tile draw + static row slice) fits and serves that shape —
    # chip-verified compile/run + 3-pass gradient parity
    # (tests/test_blocked_attention.py::test_fused_qsub_dropout_tpu) and
    # measured faster (runs/blocked_variants_r5_s4096_qsub.json).
    if S <= FUSED_MAX:
        dq, dk, dv = _pallas_bwd_fused(
            q, k, v, do, m, l, delta, start, end, seed,
            heads, sm_scale, dropout_rate,
        )
        return dq, dk, dv, None, None, None
    dq = _pallas_dq(
        q, k, v, do, m, l, delta, start, end, seed,
        heads, sm_scale, dropout_rate,
    )
    dk, dv = _pallas_dkv(
        q, k, v, do, m, l, delta, start, end, seed,
        heads, sm_scale, dropout_rate,
    )
    return dq, dk, dv, None, None, None


_blocked_attention.defvjp(_vjp_fwd, _vjp_bwd)


def dropout_keep_scale(seed, B: int, heads: int, S: int, dropout_rate: float):
    """Materialize the exact keep/scale matrices the blocked kernels apply —
    test support (mirrors attention_kernel.dropout_keep_scale).  Returns
    fp32 [B, H, S, S] assembled from the per-(b, h, q-block, k-block) tiles."""
    Bq = Bk = BLOCK
    nq, nk = S // Bq, S // Bk

    def kern(seed_ref, o_ref):
        b, h = pl.program_id(0), pl.program_id(1)
        for qi in range(nq):
            for ki in range(nk):
                o_ref[0, 0, qi * Bq:(qi + 1) * Bq, ki * Bk:(ki + 1) * Bk] = (
                    _keep_scale_blk(
                        seed_ref[0], b, h, qi, ki,
                        heads, nq, nk, Bq, Bk, dropout_rate,
                    )
                )

    spec = pl.BlockSpec(
        (1, 1, S, S), lambda b, h, *refs: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B, heads), in_specs=[], out_specs=spec
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, heads, S, S), jnp.float32),
        interpret=_interpret(),
    )(seed)


def blocked_attention_bsd(
    q, k, v, start, end, seed=None, *, heads, sm_scale=None, dropout_rate=0.0
):
    """Blocked flash attention in head-packed [B, S, H*hd] layout.

    Same contract as whole_head_attention_bsd (causal, contiguous key
    validity [start, end), optional on-chip-PRNG dropout) but VMEM-bounded
    for long sequences (S up to 8k per chip, TPU-verified).  The dropout mask is seeded
    per (batch, head, q-block, k-block); it is NOT bit-identical to the
    whole-head kernel's mask — both are valid iid Bernoulli masks.
    """
    if sm_scale is None:
        sm_scale = (q.shape[-1] // heads) ** -0.5
    if seed is None:
        assert dropout_rate == 0.0, "dropout requires an explicit seed"
        seed = jnp.zeros((1,), jnp.int32)
    return _blocked_attention(
        q, k, v, start, end, seed, heads, sm_scale, dropout_rate
    )
