#!/usr/bin/env python
"""GPipe envelope measurement: realized bubble + activation memory vs n_micro.

VERDICT r3 #5: make the dp x pp envelope an engineering datum.  On the
8-virtual-device CPU mesh this measures, for a fixed global batch:

* step time vs n_micro, fitted against the GPipe bubble model
  t(n) = w * (n + s - 1) + c   (w = per-microbatch tick work; each of the
  n + s - 1 ticks runs one microbatch through one stage, so the bubble
  fraction is (s-1)/(n+s-1): more microbatches = smaller bubble but the
  same total tick count per microbatch of work)

  NOTE on reading t(n): at fixed GLOBAL batch, larger n means SMALLER
  microbatches, so w ~ W/n and t(n) ~ W * (n + s - 1)/n + c falls with n.

* compiled temp memory (XLA memory_analysis) vs n_micro — the GPipe
  all-forward/all-backward schedule keeps every in-flight microbatch's
  stage activations live, so temp bytes grow with the tick count; this
  prints the measured slope so the --pipeline_microbatches tradeoff
  (bubble down, activation memory up) is quantified, not asserted.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/measure_pipeline.py
(force-cpu is applied in-process; the env var only provisions devices.)
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from neko_tpu.config import ModelConfig  # noqa: E402
from neko_tpu.data.batch import to_device_batch  # noqa: E402
from neko_tpu.data.packing import SequencePacker  # noqa: E402
from neko_tpu.parallel import sharding as shd  # noqa: E402
from neko_tpu.parallel.mesh import create_mesh  # noqa: E402
from neko_tpu.training.train_state import (  # noqa: E402
    OptimizerConfig,
    TrainContext,
)

CFG = ModelConfig(
    embed_dim=128, layers=8, heads=4, dropout=0.0, context_len=256,
    max_patches=2, dtype="float32", text_tokens=512,
    continuous_tokens=128, discrete_tokens=128,
)
B = 16  # global batch, fixed across n_micro
STAGES = 4


def make_batch():
    p = SequencePacker(CFG)
    rng = np.random.RandomState(0)
    examples = [
        {"text": list(rng.randint(1, 500, size=CFG.context_len - 1))}
        for _ in range(B)
    ]
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    return to_device_batch(arrays)


def main():
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    mesh = create_mesh(data=2, pipe=STAGES)
    batch = shd.shard_batch(mesh, make_batch())

    rows = []
    for n_micro in (2, 4, 8):
        opt = OptimizerConfig(
            learning_rate=1e-3, init_lr=1e-5, warmup_steps=5,
            training_steps=100, pipeline_microbatches=n_micro,
        )
        ctx = TrainContext(CFG, opt, mesh, seed=0)
        state = ctx.init_state(batch)
        # AOT-compile to read the memory analysis of the very step we time
        compiled = ctx.train_step_lowered(state, batch).compile()
        mem = compiled.memory_analysis()
        temp_mb = (mem.temp_size_in_bytes / 2**20) if mem else float("nan")
        state, loss = ctx.train_step(state, batch)
        float(loss)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            state, loss = ctx.train_step(state, batch)
            float(loss)
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        rows.append({"n_micro": n_micro, "step_s": round(t, 4),
                     "temp_mb": round(temp_mb, 1),
                     "ticks": n_micro + STAGES - 1,
                     "bubble_model": round((STAGES - 1) / (n_micro + STAGES - 1), 3)})
        print(rows[-1])

    # fit t = w_tick * ticks + c using the two extreme points, then compare
    # the middle point against the prediction (how well GPipe's linear tick
    # model explains the measurement)
    (r0, r1, r2) = rows
    # per-tick work scales with microbatch size: ticks * (B/n) normalized
    # t(n) = W/n * (n + s - 1) + c  ->  use x = (n+s-1)/n
    x = [(r["ticks"]) / r["n_micro"] for r in rows]
    y = [r["step_s"] for r in rows]
    W = (y[0] - y[2]) / (x[0] - x[2])
    c = y[0] - W * x[0]
    pred_mid = W * x[1] + c
    err = abs(pred_mid - y[1]) / y[1]
    summary = {
        "mesh": {"data": 2, "pipe": STAGES},
        "rows": rows,
        "fit": {
            "W_full_batch_s": round(W, 4), "overhead_s": round(c, 4),
            "midpoint_rel_err": round(err, 3),
        },
        "memory_slope_mb_per_tick": round(
            (rows[-1]["temp_mb"] - rows[0]["temp_mb"])
            / (rows[-1]["ticks"] - rows[0]["ticks"]), 1,
        ) if rows[-1]["temp_mb"] == rows[-1]["temp_mb"] else None,
    }
    print(json.dumps(summary))
    out = os.path.join(
        os.path.dirname(__file__), "..", "runs", "pipeline_envelope.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
