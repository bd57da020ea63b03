#!/usr/bin/env python
"""Stripped-variant benchmark for the BLOCKED flash kernel at long context.

VERDICT r4 #2: give the k>=2048 blocked kernel (ops/blocked_attention.py)
the same floor treatment the S=1024 whole-head kernel got
(tools/bench_attention_variants.py): block-size sweep, feature strips, and
the banded MXU ceiling at this shape — then close or prove the gap.

Default shape: the k=2048 train step's (B=8, H=24, S=2048, hd=32, bf16,
head-packed bsd).  Variants:

  prod        production kernel, BLOCK as given: causal banding + validity
              mask + dropout 0.1, fused single-pass backward
  3pass       prod with the pre-round-5 three-pass backward (dq kernel +
              dkv kernel; s/p/dp computed twice) — the r4 baseline
  nodrop      prod minus dropout
  floor       pure-MXU banded floor: same block loop structure, 2 dots fwd
              (qk^T, (s)v) / 5 dots bwd, NO exp/max/mask/divide — what the
              hd=32 MXU ceiling models, paying only the causal band
  blk256/512/1024  prod at those q/k block sizes (BLOCK sweep)

Timing: each variant is a device-side lax.scan chain of --iters calls
(output feeds the next call's q) so the tunnel dispatch wall is paid once
per chain; fwd and fwd+bwd chains timed separately, bwd = difference.
All variants compile in ONE process (Mosaic compile through the tunnel is
minutes per process — CLAUDE.md).

Usage: python tools/bench_blocked_variants.py [--S 2048] [--iters 30]
       [--json runs/blocked_variants_r5.json]
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

import neko_tpu.ops.blocked_attention as ba

B, H, HD = 8, 24, 32
SM = HD ** -0.5
N_LAYERS = 6


# ------------------------------------------------------------- MXU ceiling
def banded_ceiling_ms(S, peak_flops):
    """Per-layer fwd/bwd ms at the hd=32 MXU ceiling, paying only the
    causal band (block-granular: nq(nq+1)/2 of nq^2 tiles)."""
    nq = S // ba.BLOCK
    band = (nq * (nq + 1) / 2) / (nq * nq)
    tile_flops = 2 * B * H * (S * S * band) * HD  # one [S,S]x[S,hd]-class dot
    mxu_eff = HD / 128.0  # systolic-array depth utilization at hd=32
    fwd = 2 * tile_flops / (peak_flops * mxu_eff) * 1e3
    bwd = 5 * tile_flops / (peak_flops * mxu_eff) * 1e3
    return fwd, bwd


# ----------------------------------------------------- pure-MXU floor kernels
def _floor_fwd_kernel(start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref,
                      o_ref, *, hd):
    b, hg, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    Bk = ba.BLOCK
    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]

        def body(ki, acc):
            c0 = ki * Bk
            k_blk = k_ref[0, pl.ds(c0, Bk), sl]
            v_blk = v_ref[0, pl.ds(c0, Bk), sl]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * SM
            return acc + jax.lax.dot_general(
                s.astype(q.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(
            0, qi + 1, body, jnp.zeros((Bq, hd), jnp.float32)
        )
        o_ref[0, :, sl] = (acc * 1e-3).astype(o_ref.dtype)


def _floor_bwd_kernel(start_ref, end_ref, seed_ref, q_ref, k_ref, v_ref,
                      do_ref, dq_ref, dk_ref, dv_ref, *, hd):
    b, hg, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    g = q_ref.shape[-1] // hd
    Bq = q_ref.shape[1]
    Bk = ba.BLOCK

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    for j in range(g):
        sl = slice(j * hd, (j + 1) * hd)
        q = q_ref[0, :, sl]
        do = do_ref[0, :, sl]

        def body(ki, dq):
            c0 = ki * Bk
            k_blk = k_ref[0, pl.ds(c0, Bk), sl]
            v_blk = v_ref[0, pl.ds(c0, Bk), sl]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * SM
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (dp * SM).astype(q.dtype)
            y = s.astype(q.dtype)
            dv_ref[0, pl.ds(c0, Bk), sl] = dv_ref[
                0, pl.ds(c0, Bk), sl
            ] + jax.lax.dot_general(
                y, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_ref[0, pl.ds(c0, Bk), sl] = dk_ref[
                0, pl.ds(c0, Bk), sl
            ] + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return dq + jax.lax.dot_general(
                ds, k_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dq = jax.lax.fori_loop(
            0, qi + 1, body, jnp.zeros((Bq, hd), jnp.float32)
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _floor_fwd(q, k, v, start, end, seed):
    from neko_tpu.ops.attention_kernel import head_group

    B_, S, D = q.shape
    g = head_group(H, HD)
    blk, full, _, _ = ba._grid_specs(B_, S, D, HD, g, ba.BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B_, H // g, S // ba.BLOCK),
        in_specs=[blk, full, full], out_specs=blk,
    )
    return pl.pallas_call(
        functools.partial(_floor_fwd_kernel, hd=HD),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(start, end, seed, q, k, v)


def _floor_bwd(q, k, v, do, start, end, seed):
    from neko_tpu.ops.attention_kernel import head_group

    B_, S, D = q.shape
    g = head_group(H, HD)
    blk, full, _, _ = ba._grid_specs(B_, S, D, HD, g, ba.BLOCK)
    acc_full = pl.BlockSpec(
        (1, S, g * HD), lambda b, h, i, *refs: (b, 0, h),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B_, H // g, S // ba.BLOCK),
        in_specs=[blk, full, full, blk],
        out_specs=[blk, acc_full, acc_full],
    )
    return pl.pallas_call(
        functools.partial(_floor_bwd_kernel, hd=HD),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(start, end, seed, q, k, v, do)


# --------------------------------------------------------------- harnesses
def chain_fwd(call, iters):
    def fn(q, k, v, start, end, seed):
        def step(qc, _):
            out = call(qc, k, v, start, end, seed)
            return (out * 0.001).astype(qc.dtype), ()

        qf, _ = jax.lax.scan(step, q, None, length=iters)
        return qf[0, 0, 0].astype(jnp.float32)

    return jax.jit(fn)


def chain_grad(loss_call, iters):
    # Differentiate w.r.t. q AND k AND v: with grad(q) only, XLA
    # dead-code-eliminates the 3-pass scheme's separate dk/dv kernel and the
    # "backward" measurement collapses to the dq kernel alone (the fused
    # single-pass kernel, one pallas_call, cannot be split) — the bug that
    # made 3pass look 1.5 ms/layer faster than its own in-train trace.
    # dk/dv fold into the carried q so nothing is DCE-able.
    def fn(q, k, v, start, end, seed):
        g = jax.grad(loss_call, argnums=(0, 1, 2))

        def step(qc, _):
            dq, dk, dv = g(qc, k, v, start, end, seed)
            return ((dq + dk + dv) * 0.001).astype(qc.dtype), ()

        qf, _ = jax.lax.scan(step, q, None, length=iters)
        return qf[0, 0, 0].astype(jnp.float32)

    return jax.jit(fn)


def timed(fn, args, iters):
    float(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--variants", nargs="+",
        default=["prod", "3pass", "nodrop", "floor", "blk256", "blk1024"],
    )
    args = ap.parse_args()
    S = args.S

    rng = np.random.RandomState(0)
    D = H * HD
    q = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)
    start = jnp.asarray(rng.randint(0, 64, B), jnp.int32)
    end = jnp.full((B,), S, jnp.int32)
    seed = jnp.asarray([7], jnp.int32)

    dev = jax.devices()[0].device_kind
    peak = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12,
            "TPU v6 lite": 918e12}.get(dev, 197e12)
    print(f"device: {dev}  B={B} H={H} S={S} hd={HD} bf16 bsd", flush=True)

    results = {}

    def flush_json():
        if args.json:
            cf, cb = banded_ceiling_ms(S, peak)
            with open(args.json, "w") as f:
                json.dump({
                    "device": dev, "B": B, "H": H, "S": S, "hd": HD,
                    "banded_mxu_ceiling_ms_per_layer": {
                        "fwd": round(cf, 3), "bwd": round(cb, 3),
                        "step_6L": round((cf + cb) * N_LAYERS, 2),
                    },
                    "results": results,
                }, f, indent=1)

    def run_variant(name, block, dropout, fused, fwd_qblock=None, qsub=None):
        old_block, old_fused = ba.BLOCK, ba.FUSED_MAX
        old_qb, old_qsub = ba.FWD_QBLOCK, ba.FUSED_QSUB
        ba.BLOCK = block
        ba.FWD_QBLOCK = fwd_qblock
        ba.FUSED_QSUB = qsub
        ba.FUSED_MAX = ba.FUSED_MAX if fused else 0
        try:
            rate = 0.1 if dropout else 0.0

            def call(qc, kk, vv, st, en, sd):
                return ba.blocked_attention_bsd(
                    qc, kk, vv, st, en, sd, heads=H, dropout_rate=rate,
                )

            def loss(qc, kk, vv, st, en, sd):
                return call(qc, kk, vv, st, en, sd).astype(jnp.float32).sum() * 1e-6

            fwd = timed(chain_fwd(call, args.iters),
                        (q, k, v, start, end, seed), args.iters)
            both = timed(chain_grad(loss, args.iters),
                         (q, k, v, start, end, seed), args.iters)
            return fwd, both
        finally:
            ba.BLOCK, ba.FUSED_MAX = old_block, old_fused
            ba.FWD_QBLOCK, ba.FUSED_QSUB = old_qb, old_qsub

    for variant in args.variants:
        try:
            if variant == "floor":
                fwd = timed(
                    chain_fwd(
                        lambda qc, kk, vv, st, en, sd: _floor_fwd(
                            qc, kk, vv, st, en, sd
                        ),
                        args.iters,
                    ),
                    (q, k, v, start, end, seed), args.iters,
                )
                do = jnp.asarray(rng.randn(B, S, D), jnp.bfloat16)

                def bwd_only(qc, kk, vv, st, en, sd):
                    dq, dk, dv = _floor_bwd(qc, kk, vv, do, st, en, sd)
                    return dq

                bwd = timed(chain_fwd(
                    lambda qc, kk, vv, st, en, sd: bwd_only(
                        qc, kk, vv, st, en, sd
                    ),
                    args.iters,
                ), (q, k, v, start, end, seed), args.iters)
                both = fwd + bwd
            elif variant == "prod":
                fwd, both = run_variant(variant, 512, True, True)
            elif variant == "3pass":
                fwd, both = run_variant(variant, 512, True, False)
            elif variant == "nodrop":
                fwd, both = run_variant(variant, 512, False, True)
            elif variant.startswith("qsub"):
                # q-row sub-tiled fused backward (the S=4096+dropout VMEM
                # fix) forced on at this S: smaller fp32 tile temporaries
                # vs more, smaller VPU/MXU ops
                fwd, both = run_variant(
                    variant, 512, True, True, qsub=int(variant[4:])
                )
            elif variant.startswith("qb"):
                # taller FWD-only q block (bwd kernels stay at BLOCK);
                # dropout masks stay on the (BLOCK, BLOCK) logical grid
                fwd, both = run_variant(
                    variant, 512, True, True, fwd_qblock=int(variant[2:])
                )
            elif variant.startswith("blk"):
                fwd, both = run_variant(variant, int(variant[3:]), True, True)
            else:
                raise ValueError(variant)
        except Exception as e:  # noqa: BLE001
            results[variant] = {"error": str(e).split("\n")[0][:300]}
            print(f"{variant:>8}: FAILED {results[variant]['error']}", flush=True)
            flush_json()
            continue
        bwd = both - fwd
        step = (fwd + bwd) * N_LAYERS
        results[variant] = {
            "fwd_ms": round(fwd, 3), "bwd_ms": round(bwd, 3),
            "per_step_6L_ms": round(step, 2),
        }
        print(
            f"{variant:>8}: fwd {fwd:7.3f}  bwd {bwd:7.3f}  "
            f"-> 6L step {step:7.2f} ms", flush=True,
        )
        flush_json()

    cf, cb = banded_ceiling_ms(S, peak)
    print(
        f"banded hd=32 MXU ceiling: fwd {cf:.3f} bwd {cb:.3f} ms/layer "
        f"-> 6L {((cf + cb) * N_LAYERS):.2f} ms",
        flush=True,
    )
    flush_json()
    if args.json:
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
