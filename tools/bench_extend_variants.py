#!/usr/bin/env python
"""Why does a spec-decode verify round cost ~2x a 1-token decode step?

Both stream the same bytes per call (weights + KV cache + LM head), so the
K+1-token extend_step should cost ~1.1x the 1-token decode_step — yet
bench_spec measured 2.0x, which is the whole spec-decode margin.  This tool
times the candidate explanations on the real chip, each as a jitted
64-call scan chain (output feeds the next call, so nothing CSEs and the
tunnel dispatch wall is paid once per chain — CLAUDE.md conventions):

  decode    1-token decode_step (the baseline the spec round competes with)
  extend1   extend_step K=1, append mode — same work as decode, different
            path: [B,K]-indexed cache scatter + [B,K,Sc] bias + K-wide head
  extend5   extend_step K=5 (the k=4 verify round's actual forward)
  scat / dus  raw cache-write microbench: 6 x [1,24,1024,32] bf16 updates
            via general scatter (.at[rows[:,None],:,wpos]) vs per-row
            dynamic_update_slice — isolates the write-path cost

Usage: python tools/bench_extend_variants.py [--reps 9] [--chain 64]
Writes runs/extend_variants_r4.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=9)
    p.add_argument("--chain", type=int, default=64)
    cli = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel

    cfg = ModelConfig(
        embed_dim=768, layers=6, heads=24, dropout=0.0, context_len=1024,
        max_patches=0, dtype="bfloat16",
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    P_LEN = 512
    arrays = packer.pack_batch(
        [{"text": list(rng.randint(1, cfg.text_tokens, size=P_LEN))}],
        pad_side="right",
    )
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    gen = Generator(model, params, packer)
    emb0 = gen._embed_batch(params, to_device_batch(arrays))
    mask = np.zeros((1, cfg.context_len), bool)
    mask[0, :P_LEN] = True
    _, cache0 = gen._prefill(params, emb0, jnp.asarray(mask))
    ts = cfg.token_space
    start = ts.start("text")
    CH = cli.chain

    def timed(fn, *args):
        out = fn(*args)  # compile
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )
        times = []
        for _ in range(cli.reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return float(np.median(times)) * 1e3  # ms per chain

    # ---- decode: CH 1-token steps --------------------------------------
    @jax.jit
    def decode_chain(params, cache, tok, pos):
        def body(carry, _):
            cache, tok, pos = carry
            emb = model.apply(
                {"params": params}, tok[:, None],
                method=NekoModel.embed_tokens,
            )
            logits, vars_ = model.apply(
                {"params": params, "cache": cache}, emb, pos,
                method=NekoModel.decode_step, mutable=["cache"],
            )
            tok = (jnp.argmax(logits[:, 0], -1) % 128 + start).astype(
                jnp.int32
            )
            return (vars_["cache"], tok, pos + 1), ()
        carry, _ = jax.lax.scan(body, (cache, tok, pos), length=CH)
        return carry[1]

    # ---- extendK: CH K-token append rounds (pos advances by 1, like a
    # parked spec row — stays in context for any CH) ----------------------
    def extend_chain(K):
        @jax.jit
        def chain(params, cache, tok, pos):
            def body(carry, _):
                cache, tok, pos = carry
                toks = jnp.tile(tok[:, None], (1, K))
                emb = model.apply(
                    {"params": params}, toks,
                    method=NekoModel.embed_tokens,
                )
                logits, vars_ = model.apply(
                    {"params": params, "cache": cache}, emb, pos,
                    method=NekoModel.extend_step, mutable=["cache"],
                )
                tok = (jnp.argmax(logits[:, -1], -1) % 128 + start).astype(
                    jnp.int32
                )
                return (vars_["cache"], tok, pos + 1), ()
            carry, _ = jax.lax.scan(body, (cache, tok, pos), length=CH)
            return carry[1]
        return chain

    tok0 = jnp.full((1,), start, jnp.int32)
    pos0 = jnp.full((1,), P_LEN, jnp.int32)

    res = {}
    res["decode_ms"] = timed(decode_chain, params, cache0, tok0, pos0)
    res["extend1_ms"] = timed(extend_chain(1), params, cache0, tok0, pos0)
    res["extend5_ms"] = timed(extend_chain(5), params, cache0, tok0, pos0)

    # ---- raw cache-write microbench ------------------------------------
    H, Sc, hd, L = cfg.heads, cfg.context_len, cfg.head_dim, cfg.layers
    caches = [
        jnp.zeros((1, H, Sc, hd), jnp.bfloat16) for _ in range(2 * L)
    ]
    newkv = jnp.ones((1, 5, H, hd), jnp.bfloat16)
    rows = jnp.arange(1)

    @jax.jit
    def scat_chain(caches, pos):
        def body(carry, _):
            caches, pos = carry
            wpos = pos[:, None] + jnp.arange(5)[None, :]
            caches = [
                c.at[rows[:, None], :, wpos].set(
                    newkv + c[0, 0, 0, 0]
                ) for c in caches
            ]
            return (caches, pos + 1), ()
        carry, _ = jax.lax.scan(body, (caches, pos), length=CH)
        return carry[0][0]

    @jax.jit
    def dus_chain(caches, pos):
        def body(carry, _):
            caches, pos = carry
            nk = (newkv + caches[0][0, 0, 0, 0]).transpose(0, 2, 1, 3)
            caches = [
                jax.lax.dynamic_update_slice(c, nk, (0, 0, pos[0], 0))
                for c in caches
            ]
            return (caches, pos + 1), ()
        carry, _ = jax.lax.scan(body, (caches, pos), length=CH)
        return carry[0][0]

    res["scat_ms"] = timed(scat_chain, caches, pos0)
    res["dus_ms"] = timed(dus_chain, caches, pos0)

    out = {
        "device": jax.devices()[0].device_kind,
        "chain": CH,
        "per_call_ms": {k: round(v / CH, 4) for k, v in res.items()},
        "extend5_over_decode": round(res["extend5_ms"] / res["decode_ms"], 3),
        "extend1_over_decode": round(res["extend1_ms"] / res["decode_ms"], 3),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "runs", "extend_variants_r4.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
