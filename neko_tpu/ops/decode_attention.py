"""Manual-DMA decode-step cache attention (the serving-path kernel).

Per generated token the decode step attends ONE query per (batch, head) to
the whole KV cache.  The XLA path runs this as two einsums over the cache
(`bhqd,bhkd->bhqk` then `bhqk,bhkd->bhqd` with S_q=1) which the profile
measured at only ~175 GB/s — two full passes over the cache at ~21% of the
chip's HBM bandwidth dominate decode latency (~0.84 ms of a 1.21 ms token
step at the bench_decode config).

Two earlier Pallas designs were built and rejected with measurements
(README "Roadmap"): a read-only kernel makes XLA COPY both caches every
scan iteration (custom calls can't alias the carry unless told to), and a
VMEM-blocked aliased-update kernel pays a full-block write-back per token.
This design keeps what each rejection taught:

* the caches stay in ANY memory space (HBM) and are passed through with
  IDENTITY input->output aliasing, so the decode scan's carry flows through
  the kernel without defensive copies and without any block write-back —
  the kernel never writes them (the one-row append stays an in-place XLA
  scatter on the donated carry, upstream of the kernel);
* each program DMAs its head-group's cache slice to VMEM ONCE and computes
  scores + softmax + value reduction in a single pass — one cache read per
  token instead of the einsum pair's two.

(A row-granular in-kernel DMA append was also tried: Mosaic requires VMEM
DMA slices to be 128-lane aligned, and a (GH, hd=32) new-row slice is not —
the XLA scatter is already in-place on the donated buffer, so nothing is
lost.)

STATUS: built, verified bf16-exact vs the XLA reference
(tests/test_decode_attention.py), and REJECTED on measurement — it is NOT
wired into the decode dispatch.  On this v5e runtime the HBM->VMEM manual
DMA streams the cache at only ~137-147 GB/s regardless of how many copies
are in flight (1/2/3/6 concurrent chunks measured identical,
tools/measure_decode_dma.py), while the two-einsum XLA path already moves
~179 GB/s of effective cache traffic — the binding constraint is the
per-stream DMA rate, not the number of passes, so the one-pass design
cannot win here.  Kept as the documented third design of the decode-kernel
investigation (README "Roadmap") and as a working example of the
ANY-memspace + identity-aliasing pattern.

(For the record: decode growth is contiguous [start, index], S_q == 1; the
reference has no KV cache at all — it re-runs the full context per
generated token, gato_policy.py:444-445, 586-587.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def head_group(H: int) -> int:
    return 8 if H % 8 == 0 else 1


def supported(B: int, H: int, S: int, hd: int) -> bool:
    """VMEM: 2 scratch caches of (GH, S, hd) bf16 must fit comfortably."""
    GH = head_group(H)
    return (
        hd in (32, 64, 128)
        and S % 128 == 0
        and 2 * GH * S * hd * 2 <= 8 * 1024 * 1024
    )


def _kernel(
    idx_ref, start_ref,                      # scalar prefetch: i32 [B]
    q_ref,                                   # VMEM (1, GH, hd)
    kc_ref, vc_ref,                          # ANY [B, H, S, hd] (updated)
    o_ref,                                   # VMEM (1, GH, hd)
    kc_out, vc_out,                          # ANY, alias kc_ref/vc_ref; never written
    k_scr, v_scr, sem_k, sem_v,
    *, sm_scale,
):
    del kc_out, vc_out
    b = pl.program_id(0)
    hg = pl.program_id(1)
    GH = q_ref.shape[1]
    S = k_scr.shape[1]
    idx = idx_ref[b]
    start = start_ref[b]
    h0 = hg * GH

    # one full read of this head-group's cache slice (already contains the
    # new token's row at `idx`)
    rk = pltpu.make_async_copy(kc_ref.at[b, pl.ds(h0, GH)], k_scr, sem_k)
    rv = pltpu.make_async_copy(vc_ref.at[b, pl.ds(h0, GH)], v_scr, sem_v)
    rk.start()
    rv.start()
    rk.wait()
    rv.wait()

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = (pos >= start) & (pos <= idx)
    for h in range(GH):
        qh = (q_ref[0, h][None, :].astype(jnp.float32) * sm_scale).astype(
            k_scr.dtype
        )                                                          # [1, hd]
        s = jax.lax.dot_general(
            qh, k_scr[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )                                                          # [1, S]
        s = jnp.where(valid, s, _NEG)
        m = jnp.max(s)
        p = jnp.exp(s - m)                                         # [1, S]
        l = jnp.sum(p)
        acc = jax.lax.dot_general(
            p.astype(v_scr.dtype), v_scr[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )[0]                                                       # [hd]
        o_ref[0, h] = (acc / l).astype(o_ref.dtype)


def decode_cache_attention(
    q,        # [B, H, hd] this step's queries
    k_cache,  # [B, H, S, hd] INCLUDING the new token's row at index[b]
    v_cache,  # [B, H, S, hd]
    index,    # i32 [B]: position of the newest token (inclusive)
    start,    # i32 [B]: first valid cache position (left-pad offset)
    *,
    sm_scale=None,
):
    """Single-pass cache attention over rows [start[b], index[b]].

    Returns (out [B, H, hd], k_cache, v_cache) — the caches pass through
    UNCHANGED but identity-aliased, so a lax.scan carrying them through this
    call keeps them in place instead of copying 2x cache bytes per token.
    """
    B, H, S, hd = k_cache.shape
    if sm_scale is None:
        sm_scale = hd ** -0.5
    GH = head_group(H)
    vmem3 = pl.BlockSpec(
        (1, GH, hd), lambda b, hg, *refs: (b, hg, 0),
        memory_space=pltpu.VMEM,
    )
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // GH),
        in_specs=[vmem3, anyspec, anyspec],
        out_specs=[vmem3, anyspec, anyspec],
        scratch_shapes=[
            pltpu.VMEM((GH, S, hd), k_cache.dtype),
            pltpu.VMEM((GH, S, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, kc, vc = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, hd), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        # inputs indexed after the scalar-prefetch args: 2=q 3=k_cache
        # 4=v_cache -> identity-alias the caches to outputs 1 and 2
        input_output_aliases={3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(index, start, q, k_cache, v_cache)
    return out, kc, vc
