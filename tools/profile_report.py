"""Op-level profile of the bench train step -> PROFILE.md table.

Traces the flagship compiled train step (bench.py config) with
jax.profiler, post-processes the xplane with xprof's framework_op_stats,
and aggregates device time by op category.  This is the attribution the
MFU number needs: peak-FLOPs MFU says how busy the MXU is, this says where
the rest of the wall time goes.

Usage: python tools/profile_report.py [--trace-dir DIR] [--reuse]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace(trace_dir, config="flagship"):
    import time

    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.parallel import sharding as shd
    from neko_tpu.parallel.mesh import create_mesh
    from neko_tpu.training.train_state import OptimizerConfig, TrainContext
    from bench import CONFIGS, build_batch

    shape = CONFIGS[config]
    context_len = shape.get("context_len", 1024)
    ctx_ts_img = context_len // 38
    cfg = ModelConfig(embed_dim=shape["embed_dim"], layers=shape["layers"],
                      heads=shape["heads"], dropout=0.1,
                      context_len=context_len, max_patches=ctx_ts_img * 36,
                      dtype="bfloat16")
    opt = OptimizerConfig(learning_rate=1e-4, init_lr=1e-7,
                          warmup_steps=100, training_steps=10_000)
    mesh = create_mesh(model=1)
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    packer = SequencePacker(cfg)
    arrays = build_batch(packer, cfg, shape["batch_per_chip"])
    batch = shd.shard_batch(mesh, to_device_batch(arrays))
    state = ctx.init_state(batch)
    for _ in range(3):
        state, loss = ctx.train_step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(5):
        state, loss = ctx.train_step(state, batch)
    float(loss)
    step_ms = (time.perf_counter() - t0) / 5 * 1000
    jax.profiler.start_trace(trace_dir)
    for _ in range(5):
        state, loss = ctx.train_step(state, batch)
    float(loss)
    jax.profiler.stop_trace()
    print(f"step: {step_ms:.1f} ms; trace in {trace_dir}")
    return step_ms


def report(trace_dir, step_ms=None):
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert files, f"no xplane under {trace_dir}"
    # a trace dir accumulates one session subdir per start_trace; feeding
    # mixed sessions to the converter yields a None table — newest only
    files = [max(files, key=os.path.getmtime)]
    data, _ = rtd.xspace_to_tool_data(files, "framework_op_stats", {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    # framework_op_stats returns a DataTable json: first element has cols/rows
    table = rows[0] if isinstance(rows, list) else rows
    cols = [c["id"] for c in table["cols"]]
    out = []
    for r in table["rows"]:
        vals = dict(zip(cols, [c["v"] for c in r["c"]]))
        if vals.get("host_or_device") != "Device":
            continue
        out.append(vals)
    total = sum(float(v.get("total_self_time", 0) or 0) for v in out)
    n_steps = 5
    out.sort(key=lambda v: -float(v.get("total_self_time", 0) or 0))
    print(f"\ndevice self-time total: {total/1e3/n_steps:.2f} ms/step")
    print(f"{'op':72s} {'type':16s} {'ms/step':>8s} {'%':>6s} "
          f"{'GFLOP/s':>9s} {'GB/s':>7s} {'bound':>8s}")
    agg = {}
    for v in out:
        t = float(v.get("total_self_time", 0) or 0)
        cat = str(v.get("type", "?"))
        agg[cat] = agg.get(cat, 0.0) + t
    for v in out[:35]:
        t = float(v.get("total_self_time", 0) or 0)
        name = str(v.get("operation", "?"))
        # strip the jit(step_fn)/ prefix chains for readability
        name = name.replace("jit(step_fn)/", "").replace("jvp(NekoModel)/", "")
        name = name.replace("transpose(", "T(")
        print(f"{name[-72:]:72s} {str(v.get('type','?'))[:16]:16s} "
              f"{t/1e3/n_steps:8.3f} {t/total*100:6.1f} "
              f"{float(v.get('measured_flop_rate',0) or 0):9.0f} "
              f"{float(v.get('measured_memory_bw',0) or 0):7.1f} "
              f"{str(v.get('bound_by','?')):>8s}")
    print("\nby op type:")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:30s} {t/1e3/n_steps:8.3f} ms/step {t/total*100:6.1f}%")
    return out, agg, total


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--config", default="flagship",
                    help="bench.py config name (flagship/medium/long)")
    ap.add_argument("--reuse", action="store_true",
                    help="skip tracing; analyze an existing trace dir")
    a = ap.parse_args()
    trace_dir = a.trace_dir or f"/tmp/neko_profile_r3_{a.config}"
    ms = None
    if not a.reuse:
        ms = trace(trace_dir, a.config)
    report(trace_dir, ms)
