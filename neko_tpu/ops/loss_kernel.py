"""Fused loss-head forward: logits matmul + online logsumexp + target gather.

The gathered-CE forward (ops/losses.py::_chunk_nll_fwd) computes a [N, V]
fp32 logits matrix (V = 52,480 padded vocab) with one einsum, then reads it
back twice — a logsumexp reduction and a take_along_axis gather.  At the
flagship config that materializes ~1.5 GB of fp32 to HBM and re-reads it,
~2.3 ms/step of pure bandwidth on top of the compute-bound matmul (xprof
table, PROFILE.md).  The reference's loss path materializes full [B, S, V]
logits and hands them to torch CE (gato_policy.py:344-355).

This kernel never materializes the logits: grid (row blocks x vocab blocks),
each program computes a [Nb, Vb] logits tile on the MXU and folds it into
running (max, sumexp, target-logit) accumulators in VMEM scratch; the final
vocab block writes logz = m + log(s) and the gathered target logit.  The
backward pass is unchanged (ops/losses.py::_chunk_nll_bwd — it needs the
recomputed softmax anyway and its matmuls run at 77-96% of MXU peak).

STATUS: built, verified (exact target logits, logz to 7e-6 at flagship
shapes on the real chip), and REJECTED on measurement — 1.545 ms vs XLA's
1.461 ms per 2048-row call at D=768, V=52480 bf16.  The forward is
compute-bound at this arithmetic intensity (~55-60% of MXU peak both
ways): XLA already overlaps the [C, V] fp32 materialization with the
matmul, and the kernel's per-tile exp/max/sum VPU work contends with its
own MXU pipeline.  Kept with its parity tests (tests/test_loss_kernel.py)
as the measured record; ops/losses.py dispatches to the XLA path.

The target gather is expressed as sum(where(col == t, logits, 0), axis=-1)
— a masked row-reduction instead of a per-row dynamic index, which Mosaic
cannot prove legal for single-sublane dynamic stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _dot(a, b):
    """[m,k]x[k,n] fp32-accumulating matmul, DEFAULT precision (Mosaic
    rejects fp32-precision passes on bf16 operands)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _nll_fwd_kernel(
    t_ref, x_ref, w_ref, logz_ref, tl_ref, m_scr, s_scr, tl_scr,
    *, valid_vocab, n_vblocks, vb,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr[...], _NEG)
        s_scr[...] = jnp.zeros_like(s_scr[...])
        tl_scr[...] = jnp.zeros_like(tl_scr[...])

    logits = _dot(x_ref[...], w_ref[...])  # [Nb, Vb] fp32
    nb = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, vb), 1) + j * vb
    if valid_vocab is not None:
        logits = jnp.where(col < valid_vocab, logits, _NEG)

    # target logit: exact-match masked row-sum (each row's target hits at
    # most one vocab block; masked-out columns contribute 0)
    hit = col == t_ref[...]  # t block [Nb, 1] broadcasts over lanes
    tl_scr[...] = tl_scr[...] + jnp.sum(
        jnp.where(hit, logits, 0.0), axis=-1, keepdims=True
    )

    m_old = m_scr[...]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    s_scr[...] = s_scr[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    m_scr[...] = m_new

    @pl.when(j == n_vblocks - 1)
    def _fin():
        logz_ref[...] = m_scr[...] + jnp.log(s_scr[...])
        tl_ref[...] = tl_scr[...]


def _interpret() -> bool:
    """Interpret mode off-TPU so the exact algorithm runs in the CPU suite
    (the loss path never dispatches here on CPU — fused_supported() gates)."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def _pick_vb(V: int) -> int:
    """Largest 128-multiple vocab block <= ~1536 that divides V."""
    best = 0
    for mult in range(1, V // 128 + 1):
        vb = 128 * mult
        if vb > 1536:
            break
        if V % vb == 0:
            best = vb
    return best


def fused_supported(N: int, D: int, V: int) -> bool:
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    vb = _pick_vb(V)
    if vb == 0 or N % 256 != 0 or D % 128 != 0:
        return False
    # VMEM: logits tile + double-buffered W blocks + x block (+ scratch)
    nb = min(N, 1024)
    vmem = nb * vb * 4 + 2 * D * vb * 2 + nb * D * 2 + 3 * nb * 4
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("valid_vocab",))
def fused_logz_tl(x, t, W, valid_vocab=None):
    """(logz, target_logit) per row, without materializing [N, V] logits.

    x: [N, D] activations (bf16 ok), t: [N] i32 target ids (pre-clipped to
    valid vocab), W: [D, V] head weights in x.dtype.  Returns fp32 [N], [N].
    """
    N, D = x.shape
    V = W.shape[-1]
    vb = _pick_vb(V)
    nb = min(N, 1024)
    assert vb and N % nb == 0 and (nb % 256 == 0 or nb == N)
    n_vblocks = V // vb
    grid = (N // nb, n_vblocks)

    kernel = functools.partial(
        _nll_fwd_kernel, valid_vocab=valid_vocab, n_vblocks=n_vblocks, vb=vb,
    )
    logz, tl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0)),   # t
            pl.BlockSpec((nb, D), lambda i, j: (i, 0)),   # x
            pl.BlockSpec((D, vb), lambda i, j: (0, j)),   # W
        ],
        out_specs=[
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((nb, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(t[:, None].astype(jnp.int32), x, W)
    return logz[:, 0], tl[:, 0]
