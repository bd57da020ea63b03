#!/usr/bin/env python
"""Chip microbench: optax AdamW chain vs fused single-pass updates.

VERDICT r4 #6 named "fuse the AdamW update into one kernel to cut the
4.8 ms `add` row's HBM trips" as an attack on the flagship MFU ledger.
This measures, on the REAL flagship parameter tree (768d/6L + embeddings +
image embedder, ~85M fp32 params):

  optax   clip_by_global_norm + optax.adamw + apply_updates — exactly
          train_state.py::make_optimizer's chain
  jnp     ops/fused_adamw.py::fused_adamw_update (one jnp expression per
          leaf: no transform-boundary `updates` materialization)
  pallas  same, large leaves through the single-pass pallas kernel

Timing: device-side lax.scan chain of --iters updates carrying each
variant's native state with fixed grads — the tunnel dispatch wall is paid
once per chain (CLAUDE.md: per-call microbenches through the tunnel are
unreliable).  Parity: each fused backend is checked against optax to fp32
round-off before timing.

Usage: python tools/bench_adamw.py [--iters 50] [--json runs/adamw_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # host-only smoke: force cpu BEFORE backend init (env vars are
    # overridden by the axon harness — CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import optax

from neko_tpu.ops import fused_adamw as fa

LR, B1, B2, EPS, WD, CLIP = 1e-4, 0.9, 0.95, 1e-8, 0.1, 1.0


def flagship_params():
    from bench import CONFIGS, build_batch
    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.models.policy import NekoModel

    shape = CONFIGS["flagship"]
    cfg = ModelConfig(
        embed_dim=shape["embed_dim"], layers=shape["layers"],
        heads=shape["heads"], dropout=0.1, context_len=1024,
        max_patches=(1024 // 38) * 36, dtype="bfloat16",
    )
    packer = SequencePacker(cfg)
    arrays = build_batch(packer, cfg, shape["batch_per_chip"])
    batch = to_device_batch(arrays)
    model = NekoModel(cfg)
    params = jax.jit(
        lambda r, b: model.init({"params": r}, b)["params"]
    )(jax.random.key(0), batch)
    return params


def chain(step_fn, init_carry, iters):
    def fn(carry, grads):
        def step(c, _):
            return step_fn(c, grads), ()

        c, _ = jax.lax.scan(step, carry, None, length=iters)
        return jax.tree.leaves(c)[0].ravel()[0].astype(jnp.float32)

    return jax.jit(fn), init_carry


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
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--json", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="synthetic small tree (CPU smoke test)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the cpu platform (handled at import)")
    args = ap.parse_args()

    if args.tiny:
        k = jax.random.key(0)
        params = {
            "w": jax.random.normal(k, (512, 1024), jnp.float32) * 0.02,
            "b": jnp.zeros((1024,), jnp.float32),
            "emb": jax.random.normal(k, (300, 256), jnp.float32) * 0.02,
        }
    else:
        params = flagship_params()
    n_params = sum(x.size for x in jax.tree.leaves(params))
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    print(f"flagship param tree: {n_params/1e6:.1f}M params, "
          f"{nbytes/1e6:.0f} MB", flush=True)
    key = jax.random.key(1)
    leaves, tdef = jax.tree.flatten(params)
    gl = [
        jax.random.normal(k, x.shape, jnp.float32) * 1e-3
        for k, x in zip(jax.random.split(key, len(leaves)), leaves)
    ]
    grads = tdef.unflatten(gl)

    # ---- variants: (init_carry, step(carry, grads) -> carry)
    tx = optax.chain(
        optax.clip_by_global_norm(CLIP),
        optax.adamw(learning_rate=LR, b1=B1, b2=B2, eps=EPS, weight_decay=WD),
    )

    def optax_step(carry, g):
        p, st = carry
        upd, st = tx.update(g, st, p)
        return optax.apply_updates(p, upd), st

    def fused_step(use_pallas):
        def f(carry, g):
            p, st = carry
            new_p, st = fa.fused_adamw_update(
                p, g, st, lr=LR, b1=B1, b2=B2, eps=EPS, wd=WD,
                max_norm=CLIP, use_pallas=use_pallas,
            )
            return new_p, st
        return f

    def carriers():
        return {
            "optax": (optax_step, (params, tx.init(params))),
            "jnp": (fused_step(False),
                    (params, fa.init_fused_adamw_state(params))),
            "pallas": (fused_step(True),
                       (params, fa.init_fused_adamw_state(params))),
        }

    variants = carriers()

    # ---- parity (one step vs optax)
    results = {}
    sf, c0 = variants["optax"]
    ref_p = jax.jit(sf)(c0, grads)[0]
    for name in ("jnp", "pallas"):
        sf, c0 = variants[name]
        got_p = jax.jit(sf)(c0, grads)[0]
        err = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b.astype(jnp.float32))))
            for a, b in zip(jax.tree.leaves(ref_p), jax.tree.leaves(got_p))
        )
        results[f"parity_max_abs_err_{name}"] = err
        print(f"parity {name}: max |dp| vs optax = {err:.3e}", flush=True)
        assert err < 1e-6, f"{name} diverges from optax"

    # ---- timing
    for name, (sf, c0) in variants.items():
        try:
            fn, carry = chain(sf, c0, args.iters)
            ms = timed(fn, (carry, grads), args.iters)
            results[name + "_ms"] = round(ms, 3)
            gbps = 7 * nbytes / (ms * 1e-3) / 1e9
            print(f"{name:>6}: {ms:7.3f} ms/update  "
                  f"({gbps:.0f} GB/s effective over 7 passes)", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name + "_error"] = str(e).split("\n")[0][:300]
            print(f"{name:>6}: FAILED {results[name + '_error']}", flush=True)

    if args.json:
        results.update(n_params=n_params, param_bytes=nbytes,
                       iters=args.iters)
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
