#!/usr/bin/env python
"""Secondary benchmark: autoregressive decode latency/throughput.

(The driver's headline metric is bench.py; this measures the serving path.)
Flagship config, batch 8, prompt 512 tokens, 64 generated tokens:
prints prefill latency, per-token decode latency, and decode tokens/sec.
For scale: the reference re-runs the FULL context per generated token with
no KV cache (gato_policy.py:444-445), i.e. its per-token cost equals our
prefill cost.

`--kv_quant` serves from an int8 per-row-quantized KV cache
(ModelConfig.kv_cache_dtype='int8'): ~1.15x tokens/sec measured — see
PROFILE.md "Serving decode step" for the op-level attribution.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.data.batch import to_device_batch

    import sys

    kv = "int8" if "--kv_quant" in sys.argv else "native"
    # --config medium: Gato-medium shape (1536d/12L, hd=128) — the serving
    # analogue of bench.py --config medium's architecture-ceiling claim:
    # hd=128 cache matvecs contract the MXU full-depth, so the per-token
    # cost is set by bytes, not by the hd=32 stream-rate wall (PROFILE.md)
    medium = "medium" in sys.argv[1:] or "--config=medium" in sys.argv[1:]
    if medium:
        arch = dict(embed_dim=1536, layers=12, heads=12)
    else:
        arch = dict(embed_dim=768, layers=6, heads=24)
    cfg = ModelConfig(
        dropout=0.0, context_len=1024, max_patches=0, dtype="bfloat16",
        kv_cache_dtype=kv, **arch,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    B, P_LEN, GEN = 8, 512, 64
    examples = [
        {"text": list(rng.randint(1, cfg.text_tokens, size=P_LEN))}
        for _ in range(B)
    ]
    arrays = packer.pack_batch(examples)
    arrays.pop("lengths")
    params = model.init({"params": jax.random.key(0)}, to_device_batch(arrays))[
        "params"
    ]
    gen = Generator(model, params, packer)
    ts = cfg.token_space

    def run():
        return gen.generate_batch(
            examples, max_new_tokens=GEN,
            start=ts.start("text"), end=ts.end("text"),
            return_logits=False,  # serving path: only token ids leave the chip
        )

    def run1():
        return gen.generate_batch(
            examples, max_new_tokens=1,
            start=ts.start("text"), end=ts.end("text"),
            return_logits=False,
        )

    run()   # compile full scan
    run1()  # compile 1-token variant
    # Per-run medians: the axon tunnel adds multi-ms dispatch jitter, so
    # a 3-run mean over a ~80 ms workload swung >40% run to run.
    n_runs = 10
    dts, pres = [], []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        (toks,) = run()
        dts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run1()
        pres.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    prefill = float(np.median(pres))

    per_token_ms = (dt - prefill) / (GEN - 1) * 1000
    print(
        json.dumps(
            {
                "metric": "batched_decode",
                "config": f"{cfg.embed_dim}d{cfg.layers}L",
                "kv_cache_dtype": kv,
                "batch": B,
                "prompt_len": P_LEN,
                "prefill_ms": round(prefill * 1000, 1),
                "per_token_ms": round(per_token_ms, 2),
                "decode_tokens_per_sec": round(B * 1000 / per_token_ms),
            }
        )
    )


if __name__ == "__main__":
    main()
