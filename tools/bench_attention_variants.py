#!/usr/bin/env python
"""Stripped-variant attention benchmark: attribute the whole-head kernel's
gap to the hd=32 MXU ceiling (PROFILE.md: 18.8 ms/step ceiling, ~24 ms
measured -> ~67% of ceiling; VERDICT r3 #3 demands the floor be MEASURED).

Each variant strips one feature from the production head-packed kernel
(ops/attention_kernel.py) at the flagship shape (B=16, H=24, S=1024, hd=32,
bf16, bsd layout), fwd and bwd timed separately:

  prod        full kernel: n=4 causal split + validity mask + dropout 0.1
  nodrop      prod minus dropout (isolates PRNG + keep-mask multiply)
  nomask      nodrop minus the mask select (iota compares remain skipped);
              WRONG RESULTS (no causal/validity) — timing floor only
  nosplit     nomask without the n=4 row split: one full S x S matmul +
              softmax + pv per head — the classic whole-matrix formulation
  nosoftmax   nosplit minus softmax: qk^T then pv only — the pure-MXU
              floor for this shape (what the 18.8 ms/step ceiling models,
              paying the full S^2 since there is no split)
  vrow        nodrop with the experimental cheap mask: 1D validity row
              vector broadcast + causal compare only on the diagonal
              R x R sub-block (candidate optimization)
  banddrop    prod but dropout masks generated PER BAND (only the 0.625
              of the matrix the split touches) instead of whole-matrix

All variants are compiled into ONE process run (Mosaic compile through the
tunnel is minutes per process — batch everything, CLAUDE.md).  Timing is
median of --iters jitted calls, synced by pulling a scalar to host.

Usage: python tools/bench_attention_variants.py [--iters 15] [--json out]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neko_tpu.ops.attention_kernel import (  # noqa: F401
    _dot,
    _keep_scale,
    _mask_blk,
    _softmax,
    _specs_bsd,
)

B, H, S, HD = 16, 24, 1024, 32
SM = HD ** -0.5
N_LAYERS = 6


# --------------------------------------------------------------- variants
def _band_keep_scale(seed, b, h, n_h, band, rows, cols, rate):
    """Per-band mask: seeds (seed, b*n_h+h, band are folded into one word:
    prng_seed takes at most 2 words on this Mosaic)."""
    pltpu.prng_seed(seed, (b * n_h + h) * 8 + band)
    q = min(int(round(rate * 256)), 255)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((rows // 4, cols)), jnp.uint8
    )
    keep = (bits.astype(jnp.int32) >= q).astype(jnp.float32)
    return keep * (1.0 / (1.0 - q / 256.0))


def _vrow_mask(scores, start, end, r0, c0, diag_from):
    """Cheap mask: validity as a broadcast (1, C) row vector; causal as a
    2D compare only on columns >= diag_from (the diagonal R x R block)."""
    R, C = scores.shape
    col1 = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + c0
    okv = (col1 >= start) & (col1 < end)
    scores = jnp.where(okv, scores, -1e30)
    if diag_from == 0:
        # whole block needs the causal compare (band 0); a zero-width
        # scores[:, :0] slice is an illegal Mosaic type — skip the concat
        row = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) + r0
        col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1) + c0
        return jnp.where(col <= row, scores, -1e30)
    if diag_from < C:
        D = C - diag_from
        row = jax.lax.broadcasted_iota(jnp.int32, (R, D), 0) + r0
        col = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1) + c0 + diag_from
        diag = jnp.where(col <= row, scores[:, diag_from:], -1e30)
        scores = jnp.concatenate([scores[:, :diag_from], diag], axis=1)
    return scores


def _fwd_body_variant(q, k, v, start, end, seed, b, h, n_h, *, variant):
    Sq = q.shape[-2]
    if variant == "nosoftmax":
        s = _dot(q, k.T) * SM
        return _dot(s.astype(q.dtype), v)
    if variant == "nosplit":
        p = _softmax(_dot(q, k.T) * SM)
        return _dot(p.astype(q.dtype), v)

    n = 4
    R = Sq // n
    drop = variant in ("prod", "banddrop")
    ks = (
        _keep_scale(seed, b, h, n_h, Sq, 0.1)
        if variant == "prod"
        else None
    )
    outs = []
    for i in range(n):
        w = (i + 1) * R
        s_i = _dot(q[i * R:w], k[:w].T) * SM
        if variant in ("prod", "nodrop", "banddrop"):
            s_i = _mask_blk(s_i, start, end, i * R, 0)
        elif variant == "vrow":
            s_i = _vrow_mask(s_i, start, end, i * R, 0, i * R)
        # nomask: no select at all
        p_i = _softmax(s_i)
        if drop:
            m = (
                ks[i * R:w, :w]
                if variant == "prod"
                else _band_keep_scale(seed, b, h, n_h, i, R, w, 0.1)
            )
            p_i = p_i * m
        outs.append(_dot(p_i.astype(q.dtype), v[:w]))
    return jnp.concatenate(outs, axis=0)


def _bwd_body_variant(q, k, v, do, start, end, seed, b, h, n_h, *, variant):
    Sq = q.shape[-2]

    def blk(qb, dob, kb, vb, r0, ksb, masker):
        s = masker(_dot(qb, kb.T) * SM)
        p = _softmax(s)
        y = p * ksb if ksb is not None else p
        dv = _dot(y.astype(q.dtype).T, dob)
        dp = _dot(dob, vb.T)
        if ksb is not None:
            dp = dp * ksb
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * SM).astype(q.dtype)
        return _dot(ds, kb), _dot(ds.T, qb), dv

    if variant in ("nosplit", "nosoftmax"):
        # the truly-unsplit backward holds s/p/dp/ds at S x S fp32 (4 x 4 MB)
        # live at once and blows the 16 MB scoped-VMEM limit (measured: the
        # compile fails at 18.75 M).  Band the ROWS at full width instead —
        # identical FLOPs (full S^2, no causal narrowing), bounded live set —
        # so these floors remain the "pay the whole matrix" cost model.
        n = 4
        R = Sq // n
        dqs, dk, dv = [], None, None
        for i in range(n):
            if variant == "nosoftmax":
                masker, soft = (lambda s: s), False
            else:
                masker, soft = (lambda s: s), True
            qb, dob = q[i * R:(i + 1) * R], do[i * R:(i + 1) * R]
            if soft:
                dq_i, dk_i, dv_i = blk(qb, dob, k, v, i * R, None, masker)
            else:
                s = _dot(qb, k.T) * SM
                dv_i = _dot(s.astype(q.dtype).T, dob)
                ds = (_dot(dob, v.T) * SM).astype(q.dtype)
                dq_i, dk_i = _dot(ds, k), _dot(ds.T, qb)
            dqs.append(dq_i)
            dk = dk_i if dk is None else dk + dk_i
            dv = dv_i if dv is None else dv + dv_i
        return jnp.concatenate(dqs, axis=0), dk, dv

    n = 4
    R = Sq // n
    ks = (
        _keep_scale(seed, b, h, n_h, Sq, 0.1)
        if variant == "prod"
        else None
    )
    dqs, dk, dv = [], None, None
    for i in reversed(range(n)):
        w = (i + 1) * R
        if variant in ("prod", "nodrop", "banddrop"):
            masker = lambda s, i=i: _mask_blk(s, start, end, i * R, 0)
        elif variant == "vrow":
            masker = lambda s, i=i: _vrow_mask(s, start, end, i * R, 0, i * R)
        else:
            masker = lambda s: s
        if variant == "prod":
            ksb = ks[i * R:w, :w]
        elif variant == "banddrop":
            ksb = _band_keep_scale(seed, b, h, n_h, i, R, w, 0.1)
        else:
            ksb = None
        dq_i, dk_i, dv_i = blk(q[i * R:w], do[i * R:w], k[:w], v[:w], i * R, ksb, masker)
        dqs.append(dq_i)
        if dk is None:
            dk, dv = dk_i, dv_i
        else:
            pad = jnp.zeros((Sq - w, dk_i.shape[-1]), dk_i.dtype)
            dk = dk + jnp.concatenate([dk_i, pad], axis=0)
            dv = dv + jnp.concatenate([dv_i, pad], axis=0)
    return jnp.concatenate(dqs[::-1], axis=0), dk, dv


def _fwd_kernel(start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *, variant):
    b, hg = pl.program_id(0), pl.program_id(1)
    g = q_ref.shape[-1] // HD
    for j in range(g):
        sl = slice(j * HD, (j + 1) * HD)
        o = _fwd_body_variant(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
            start_ref[b], end_ref[b], seed_ref[0], b, hg * g + j, H,
            variant=variant,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, variant):
    b, hg = pl.program_id(0), pl.program_id(1)
    g = q_ref.shape[-1] // HD
    for j in range(g):
        sl = slice(j * HD, (j + 1) * HD)
        dq, dk, dv = _bwd_body_variant(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
            do_ref[0, :, sl], start_ref[b], end_ref[b], seed_ref[0],
            b, hg * g + j, H, variant=variant,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def make_fwd(variant, iters):
    """Chained device-side loop: each iteration's OUTPUT becomes the next
    iteration's q, so XLA can neither CSE nor hoist the pallas call, and the
    ~30 ms tunnel dispatch+sync wall is paid ONCE per `iters` kernel runs
    (the per-call harness measured every variant at 28-32 ms — pure wall)."""
    g = 128 // HD
    spec = _specs_bsd(S, HD, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B, H // g),
        in_specs=[spec] * 3, out_specs=spec,
    )
    call = pl.pallas_call(
        functools.partial(_fwd_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, H * HD), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    def fn(q, k, v, start, end, seed):
        def step(qc, _):
            out = call(start, end, seed, qc, k, v)
            # renormalize so nosoftmax's unnormalized outputs don't walk off
            # to inf/NaN over the chain (timing is value-independent, but
            # keep the chain honest); one VPU pass, negligible vs the kernel
            return (out * 0.001).astype(qc.dtype), ()
        qf, _ = jax.lax.scan(step, q, None, length=iters)
        return qf[0, 0, 0].astype(jnp.float32)

    return jax.jit(fn)


def make_bwd(variant, iters):
    g = 128 // HD
    spec = _specs_bsd(S, HD, g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B, H // g),
        in_specs=[spec] * 4, out_specs=[spec] * 3,
    )
    call = pl.pallas_call(
        functools.partial(_bwd_kernel, variant=variant),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, S, H * HD), jnp.bfloat16)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )

    def fn(q, k, v, do, start, end, seed):
        def step(qc, _):
            dq, dk, dv = call(start, end, seed, qc, k, v, do)
            return (dq * 0.001).astype(qc.dtype), ()
        qf, _ = jax.lax.scan(step, q, None, length=iters)
        return qf[0, 0, 0].astype(jnp.float32)

    return jax.jit(fn)


def timed(fn, args, iters):
    float(fn(*args))  # compile + first run
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    # min of 3 chained runs: the wall is additive noise, never negative
    return min(ts) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--iters", type=int, default=50,
        help="scan length: kernel invocations per dispatched chain",
    )
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--variants", nargs="+",
        default=["prod", "nodrop", "nomask", "nosplit", "nosoftmax",
                 "vrow", "banddrop"],
    )
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    D = H * HD
    q = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    do = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    start = jnp.asarray(rng.randint(0, 64, B), jnp.int32)
    end = jnp.full((B,), S, jnp.int32)
    seed = jnp.asarray([7], jnp.int32)

    dev = jax.devices()[0].device_kind
    print(f"device: {dev}  shape B={B} H={H} S={S} hd={HD} bf16 bsd", flush=True)
    results = {}

    def flush_json():
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"device": dev, "results": results}, f, indent=1)

    for variant in args.variants:
        # per-variant isolation: one Mosaic compile failure must not lose
        # the other variants' numbers (stdout also flushed per line — a
        # prior run died mid-list and every timing evaporated with it)
        try:
            fwd = timed(
                make_fwd(variant, args.iters),
                (q, k, v, start, end, seed), args.iters,
            )
            bwd = timed(
                make_bwd(variant, args.iters),
                (q, k, v, do, start, end, seed), args.iters,
            )
        except Exception as e:  # noqa: BLE001
            results[variant] = {"error": str(e).split("\n")[0][:300]}
            print(f"{variant:>10}: FAILED {results[variant]['error']}", flush=True)
            flush_json()
            continue
        step = (fwd + bwd) * N_LAYERS
        results[variant] = {
            "fwd_ms": round(fwd, 3), "bwd_ms": round(bwd, 3),
            "per_step_6L_ms": round(step, 2),
        }
        print(
            f"{variant:>10}: fwd {fwd:7.3f} ms  bwd {bwd:7.3f} ms  "
            f"-> 6L step {step:6.2f} ms", flush=True,
        )
        flush_json()

    if args.json:
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
