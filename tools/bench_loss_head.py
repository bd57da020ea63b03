#!/usr/bin/env python
"""Chip microbench: the gathered-CE loss head at flagship shape.

VERDICT r4 #6 named "chase the loss head's 77%-of-peak dot" (the backward's
dx = dlogits @ W^T at 153 TF/s vs c_fc's 91%) as a ledger attack.  The head
is three [Nt, V]-class dots per chunk (fwd logits, bwd recompute + dx + dW,
ops/losses.py::_chunk_nll) — this sweeps the knobs XLA actually exposes:

  chunk_size   C in {1024, 2048, 4096, Nt}: fewer/larger dots per step
  dlogits_f32  keep dlogits fp32 into dx/dW (skip the bf16 convert)

measured as fwd+bwd of the whole gathered loss at the bench mixture's
target budget (Nt=12288, V=52480, D=768, bf16 hidden) over a lax.scan chain
(tunnel dispatch paid once).  The winner becomes losses.py's default;
losers are recorded in PROFILE.md's ledger.

Usage: python tools/bench_loss_head.py [--iters 30] [--json runs/loss_head_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import neko_tpu.ops.losses as losses

B, S, D, V, VALID = 16, 1024, 768, 52480, 52256
NT = 12288  # flagship bench target budget (bench.py::tgt_budget)


def chain_loss(loss_fn, iters):
    def fn(hidden, kernel, pos, tgt):
        def step(carry, _):
            h, w = carry
            val, (dh, dw) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                h, w, pos, tgt
            )
            # fold grads into the carry so nothing is DCE-able
            return (h + dh.astype(h.dtype) * 1e-3,
                    w + dw.astype(w.dtype) * 1e-3), val

        (h, w), vals = jax.lax.scan(
            step, (hidden, kernel), None, length=iters
        )
        return vals.sum() + h.ravel()[0].astype(jnp.float32)

    return jax.jit(fn)


def timed(fn, args, iters):
    float(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nt", type=int, default=NT)
    args = ap.parse_args()
    nt = args.nt

    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(B, S, D) * 0.05, jnp.bfloat16)
    kernel = jnp.asarray(rng.randn(D, V) * 0.02, jnp.float32)
    pos = jnp.stack(
        [
            jnp.asarray(rng.randint(0, B, nt), jnp.int32),
            jnp.asarray(rng.randint(0, S, nt), jnp.int32),
        ],
        axis=1,
    )
    tgt = jnp.asarray(rng.randint(0, VALID, nt), jnp.int32)

    flops = 3 * 2.0 * nt * V * D  # fwd + recompute + dx (+dW ~= same class)
    results = {}
    for C in (1024, 2048, 4096, nt):
        def loss_fn(h, w, p, t, C=C):
            return losses.gathered_masked_xent(
                h, w, p, t, valid_vocab=VALID, chunk_size=C
            )

        try:
            ms = timed(
                chain_loss(loss_fn, args.iters),
                (hidden, kernel, pos, tgt), args.iters,
            )
        except Exception as e:  # noqa: BLE001
            results[f"C{C}"] = {"error": str(e).split("\n")[0][:300]}
            print(f"C={C:>6}: FAILED {results[f'C{C}']['error']}", flush=True)
            continue
        results[f"C{C}"] = {"ms": round(ms, 3)}
        print(
            f"C={C:>6}: {ms:7.3f} ms fwd+bwd  "
            f"(~{flops / (ms * 1e-3) / 1e12:.0f} TF/s incl. non-dot work)",
            flush=True,
        )

    if args.json:
        results.update(nt=nt, V=V, D=D)
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
