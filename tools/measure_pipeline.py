#!/usr/bin/env python
"""Pipeline envelope measurement: bubble + activation memory, BOTH regimes.

VERDICT r3 #5 / r4 #7: make the dp x pp envelope an engineering datum, in
the two regimes that matter:

A. FIXED GLOBAL BATCH (the single-host tuning knob): more microbatches =
   smaller bubble fraction but smaller microbatches.  Step time fitted
   against the GPipe tick model t(n) = W/n * (n + s - 1) + c.

B. FIXED MICROBATCH SIZE (the scale-out regime: global batch grows with
   n_micro — where GPipe's all-forward/all-backward activation residency
   actually bites).  Here GPipe keeps every in-flight microbatch's
   activations live across the fwd/bwd boundary (temp memory ~ n_micro)
   while 1F1B retires each microbatch's backward as soon as its forward
   leaves the last stage (temp memory ~ n_stages, flat in n_micro).  This
   regime is the build/no-build datum for the 1F1B schedule
   (parallel/pipeline.py::pipelined_loss_1f1b): measured per-microbatch
   temp slopes below decide it with numbers.

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
STAGES = 4


def make_batch(b):
    p = SequencePacker(CFG)
    rng = np.random.RandomState(0)
    examples = [
        {"text": list(rng.randint(1, 500, size=CFG.context_len - 1))}
        for _ in range(b)
    ]
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    return to_device_batch(arrays)


def measure(mesh, b, n_micro, schedule, timed_steps=7):
    opt = OptimizerConfig(
        learning_rate=1e-3, init_lr=1e-5, warmup_steps=5,
        training_steps=100, pipeline_microbatches=n_micro,
        pipeline_schedule=schedule,
    )
    ctx = TrainContext(CFG, opt, mesh, seed=0)
    batch = shd.shard_batch(mesh, make_batch(b))
    state = ctx.init_state(batch)
    # AOT-compile to read the memory analysis of the very step we time
    compiled = ctx.train_step_lowered(state, batch).compile()
    mem = compiled.memory_analysis()
    temp_mb = (mem.temp_size_in_bytes / 2**20) if mem else float("nan")
    state, loss = ctx.train_step(state, batch)
    float(loss)
    ts = []
    for _ in range(timed_steps):
        t0 = time.perf_counter()
        state, loss = ctx.train_step(state, batch)
        float(loss)
        ts.append(time.perf_counter() - t0)
    return {
        "schedule": schedule, "B": b, "n_micro": n_micro,
        "step_s": round(statistics.median(ts), 4),
        "temp_mb": round(temp_mb, 1),
    }


def main():
    assert len(jax.devices()) >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    mesh = create_mesh(data=2, pipe=STAGES)

    # ---------------- regime A: fixed global batch (bubble-model fit)
    B = 16
    rows_a = []
    for n_micro in (2, 4, 8):
        r = measure(mesh, B, n_micro, "gpipe")
        r["ticks"] = n_micro + STAGES - 1
        r["bubble_model"] = round((STAGES - 1) / (n_micro + STAGES - 1), 3)
        rows_a.append(r)
        print(r)
    x = [r["ticks"] / r["n_micro"] for r in rows_a]
    y = [r["step_s"] for r in rows_a]
    W = (y[0] - y[2]) / (x[0] - x[2])
    c = y[0] - W * x[0]
    err = abs((W * x[1] + c) - y[1]) / y[1]

    # ---------------- regime B: fixed microbatch, growing global batch
    BM = 4  # global rows per microbatch (2 per 'data' shard), held fixed
    rows_b = []
    for n_micro in (2, 4, 8):
        for schedule in ("gpipe", "1f1b"):
            r = measure(mesh, BM * n_micro, n_micro, schedule)
            rows_b.append(r)
            print(r)

    def slope(schedule):
        pts = [r for r in rows_b if r["schedule"] == schedule]
        return (pts[-1]["temp_mb"] - pts[0]["temp_mb"]) / (
            pts[-1]["n_micro"] - pts[0]["n_micro"]
        )

    g_slope, i_slope = slope("gpipe"), slope("1f1b")
    decision = {
        "gpipe_temp_mb_per_microbatch": round(g_slope, 1),
        "1f1b_temp_mb_per_microbatch": round(i_slope, 1),
        "verdict": (
            "1F1B built and kept: GPipe temp memory grows "
            f"~{g_slope:.1f} MB per extra in-flight microbatch in the "
            f"fixed-microbatch regime vs ~{i_slope:.1f} MB for 1F1B — the "
            "schedule pays whenever n_micro must exceed ~2*stages to "
            "amortize the bubble at scale"
            if g_slope > max(4 * abs(i_slope), 1.0)
            else "1F1B does not pay at this scale: temp slopes comparable"
        ),
    }
    print(json.dumps(decision))

    summary = {
        "mesh": {"data": 2, "pipe": STAGES},
        "fixed_global_batch": {
            "rows": rows_a,
            "fit": {
                "W_full_batch_s": round(W, 4), "overhead_s": round(c, 4),
                "midpoint_rel_err": round(err, 3),
            },
        },
        "fixed_microbatch": {
            "rows_per_microbatch": BM,
            "rows": rows_b,
            "decision": decision,
        },
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
