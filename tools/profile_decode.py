"""Op-level profile of the serving decode scan (bench_decode config).

Answers "where does the ~1 ms/token go?" so the next serving lever is
chosen from measurement, not projection: cache attention vs body matmuls
vs LM head vs scan bookkeeping.  Usage:

    python tools/profile_decode.py [--kv_quant] [--trace-dir DIR] [--reuse]

Numbers print as ms per traced call (2 calls x 64 generated tokens each);
divide by 128 for per-token.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace(trace_dir, kv):
    import numpy as np
    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel

    cfg = ModelConfig(
        embed_dim=768, layers=6, heads=24, dropout=0.0,
        context_len=1024, max_patches=0, dtype="bfloat16",
        kv_cache_dtype=kv,
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
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    gen = Generator(model, params, packer)
    ts = cfg.token_space

    def run():
        return gen.generate_batch(
            examples, max_new_tokens=GEN,
            start=ts.start("text"), end=ts.end("text"), return_logits=False,
        )

    (toks,) = run()  # compile
    np.asarray(toks)
    jax.profiler.start_trace(trace_dir)
    for _ in range(2):
        (toks,) = run()
        np.asarray(toks)
    jax.profiler.stop_trace()
    print(f"traced 2 calls x {GEN} tokens, kv={kv}; trace in {trace_dir}")


if __name__ == "__main__":
    from profile_report import report

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/neko_profile_decode")
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--reuse", action="store_true")
    a = ap.parse_args()
    if not a.reuse:
        trace(a.trace_dir, "int8" if a.kv_quant else "native")
    report(a.trace_dir)
