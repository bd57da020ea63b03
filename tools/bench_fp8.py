#!/usr/bin/env python
"""Measure fp8(e4m3) weight serving on the real chip.

    python tools/bench_fp8.py [--config medium] [--kv_quant] [--skip_micro]

Two measurements:

1. `convert-rate` microbench — effective HBM stream rate when a matvec's
   weight operand is (a) plain bf16, (b) int8 dequantized into the dot,
   (c) fp8-e4m3 dequantized into the dot.  PROFILE.md pinned the int8
   convert path at ~110-130 GB/s of source bytes vs ~190 GB/s for plain
   bf16 at the decode matvec shape; this answers whether the chip's fp8
   convert streams faster (it has native e4m3 convert paths the int8
   plane lacks).  Rates are in SOURCE GB/s — compare time-per-weight:
   fp8 wins when rate_fp8 > rate_bf16 / 2.

2. `decode e2e` — Generator tokens/sec at the serving config, plain bf16
   weights vs `weight_dtype='fp8'` (dequant inside the scan body,
   inference/quant.py), median of --reps runs (tunnel jitter swings a
   3-run mean by >40%, CLAUDE.md).

All device calls are jitted (un-jitted pallas/tunnel calls execute
op-by-op, ~500x slower).  One script run covers every variant: compiles
through the tunnel cost minutes per process.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _median_time(fn, reps):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def micro(reps, d=4096, D=8192, total_mb=512):
    """Matvec weight-stream rates: bf16 vs int8->bf16 vs fp8->bf16.

    Shape mimics the decode matvec: x[1, d] @ W[d, D] with the weight
    read dominating.  Two harness hazards, both hit and fixed on-chip:

    * one timed call per matvec measures only the ~30 ms tunnel round
      trip (a 64 MB matvec is ~0.1 ms) — so `iters` matvecs run inside
      ONE jitted fori_loop per timed call;
    * a loop over the SAME weight gets CSE'd even behind
      `lax.optimization_barrier` (measured: total time constant in
      `iters`, implying >HBM-peak rates) — so each iteration
      dynamic-slices a DIFFERENT weight from a pool sized >> VMEM
      (`total_mb`), making the per-iteration HBM stream unavoidable,
      and the constant dispatch overhead is cancelled by timing two
      iteration counts and taking the slope."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = max(4, int(total_mb * 1e6 / (d * D * 2)))
    w = jax.random.normal(jax.random.key(0), (n, d, D), jnp.float32) \
        / float(np.sqrt(d))
    x = jax.random.normal(jax.random.key(1), (1, d), jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-30)
    wi = jnp.round(w / scale[:, None, :]).astype(jnp.int8)
    scale8 = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 448.0, 1e-30)
    wf8 = jnp.clip(w / scale8[:, None, :], -448, 448) \
        .astype(jnp.float8_e4m3fn)
    sb = scale.astype(jnp.bfloat16)
    s8b = scale8.astype(jnp.bfloat16)

    def loop(dot):
        # the weight pool is an ARGUMENT, not a closure: jit bakes
        # closed-over concrete arrays into the HLO as constants, and a
        # 512 MB constant blows the tunnel's remote_compile request
        # limit (HTTP 413)
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(x, iters, *ws):
            def body(i, acc):
                sl = [lax.dynamic_index_in_dim(w_, i % n, 0, keepdims=False)
                      for w_ in ws]
                return acc + dot(x, *sl).astype(jnp.float32)
            return lax.fori_loop(0, iters, body, jnp.float32(0.0))
        return run

    run_bf16 = loop(lambda x, w_: (x @ w_).sum())
    run_i8 = loop(lambda x, w_, s_: ((x @ w_.astype(jnp.bfloat16))
                                     * s_[None, :]).sum())
    run_f8 = loop(lambda x, w_, s_: ((x @ w_.astype(jnp.bfloat16))
                                     * s_[None, :]).sum())

    i1, i2 = 128, 384
    out = {}
    for name, fn, ws, src_bytes in [
        ("bf16", run_bf16, (wb,), d * D * 2),
        ("int8", run_i8, (wi, sb), d * D),
        ("fp8_e4m3", run_f8, (wf8, s8b), d * D),
    ]:
        t1 = _median_time(lambda: float(fn(x, i1, *ws)), reps)
        t2 = _median_time(lambda: float(fn(x, i2, *ws)), reps)
        t = (t2 - t1) / (i2 - i1)
        out[name] = {
            "ms": round(t * 1e3, 4),
            "source_GBps": round(src_bytes / t / 1e9, 1),
            "bf16_equiv_GBps": round(d * D * 2 / t / 1e9, 1),
        }
    return out


def e2e(cli):
    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel

    arch = (dict(embed_dim=1536, layers=12, heads=12)
            if cli.config == "medium"
            else dict(embed_dim=768, layers=6, heads=24))
    cfg = ModelConfig(
        dropout=0.0, context_len=1024, max_patches=0, dtype="bfloat16",
        kv_cache_dtype="int8" if cli.kv_quant else "native", **arch,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    init = packer.pack_batch(
        [{"text": list(rng.randint(1, cfg.text_tokens, size=8))}]
    )
    init.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(init)
    )["params"]
    ts = cfg.token_space
    start, end = ts.start("text"), ts.end("text")
    prompt = {"text": list(rng.randint(1, cfg.text_tokens,
                                       size=cli.prompt_len))}

    out = {}
    ref_tokens = None
    for name, wd in [("bf16", None), ("fp8", "fp8")]:
        gen = Generator(model, params, packer, weight_dtype=wd)

        def run():
            (toks,) = gen.generate_batch(
                [prompt], max_new_tokens=cli.gen, start=start, end=end,
                return_logits=False,
            )
            return np.asarray(toks)

        toks = run()  # compile + correctness capture
        if ref_tokens is None:
            ref_tokens = toks
        agree = float((toks == ref_tokens).mean())
        t = _median_time(run, cli.reps)
        out[name] = {
            "tokens_per_sec": round(cli.gen / t, 1),
            "ms_per_token": round(t / cli.gen * 1e3, 3),
            "greedy_agreement_vs_bf16": round(agree, 3),
        }
        del gen
    out["speedup"] = round(
        out["fp8"]["tokens_per_sec"] / out["bf16"]["tokens_per_sec"], 3
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="flagship",
                   choices=["flagship", "medium"])
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--gen", type=int, default=128)
    p.add_argument("--prompt_len", type=int, default=512)
    p.add_argument("--reps", type=int, default=11)
    p.add_argument("--skip_micro", action="store_true")
    p.add_argument("--skip_e2e", action="store_true")
    cli = p.parse_args()

    out = {"config": cli.config, "kv_cache":
           "int8" if cli.kv_quant else "native"}
    if not cli.skip_micro:
        out["convert_rate"] = micro(cli.reps)
    if not cli.skip_e2e:
        out["decode_e2e"] = e2e(cli)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
