#!/usr/bin/env python
"""Measure neko-tpu on the SAME host CPU as tools/measure_reference_baseline.py.

Gives the like-for-like (same-silicon) framework comparison: identical model
config, identical batch mixture, 1 host CPU — the only variable is the
framework (torch eager + python packing vs host packer + XLA-compiled step).
Writes SELF_MEASURED_CPU.json; bench.py combines it with
BASELINE_MEASURED.json into `vs_reference_same_host`.
"""

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = 3


def main(dtype: str = "float32"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    import sys

    sys.path.insert(0, REPO)
    from bench import build_batch

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.parallel import sharding as shd
    from neko_tpu.parallel.mesh import create_mesh
    from neko_tpu.training.train_state import OptimizerConfig, TrainContext

    mesh = create_mesh(model=1)
    ctx_ts_img = 1024 // 38
    cfg = ModelConfig(
        embed_dim=768, layers=6, heads=24, dropout=0.1, context_len=1024,
        max_patches=ctx_ts_img * 36, dtype=dtype,
    )
    opt = OptimizerConfig(
        learning_rate=1e-4, init_lr=1e-7, warmup_steps=100,
        training_steps=10_000,
    )
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    packer = SequencePacker(cfg)
    batch_size = 16
    arrays = build_batch(packer, cfg, batch_size)
    batch = shd.shard_batch(mesh, to_device_batch(arrays))
    state = ctx.init_state(batch)

    state, loss = ctx.train_step(state, batch)  # compile + warmup
    float(loss)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss = ctx.train_step(state, batch)
    float(loss)
    dt = time.perf_counter() - t0

    tokens_per_sec = batch_size * cfg.context_len * STEPS / dt
    result = {
        "self_cpu_tokens_per_sec": round(tokens_per_sec, 2),
        "seconds_per_step": round(dt / STEPS, 3),
        "steps_measured": STEPS,
        "config": {"embed_dim": 768, "layers": 6, "heads": 24,
                   "context_len": 1024, "batch_size": batch_size,
                   "dtype": dtype},
        "hardware": {"device": "cpu", "cpu_count": os.cpu_count()},
    }
    with open(os.path.join(REPO, "SELF_MEASURED_CPU.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    # fp32 default: precision-matched to the torch-fp32 reference run
    # (bf16 is emulated on CPU and would handicap the XLA side)
    ap.add_argument("--dtype", default="float32")
    main(ap.parse_args().dtype)
