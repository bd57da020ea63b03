#!/usr/bin/env python
"""Rollout-cache benchmark: control-eval wall time, ring KV cache vs re-pack.

Times ControlTask.evaluate on a synthetic continuous env (8 obs dims, 2
action dims — MuJoCo-like geometry) at the flagship 768d/6L config with a
full-context prompt, so every env step slides the window:

  * rollout_cache=False — the re-pack path: re-tokenize + O(S^2) re-prefill
    per env step (the reference's evaluation shape, control_task.py:144-159)
  * rollout_cache=True  — the ring KV cache: one compiled
    extend(tokens_per_timestep) + action-decode call per env step

Prints one JSON line with both wall times and the speedup.
"""

import json
import time


def main():
    import jax

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.envs.setup_env import load_env_dataset
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.tasks.control import ControlTask

    cfg = ModelConfig(
        embed_dim=768, layers=6, heads=24, dropout=0.0, context_len=1024,
        max_patches=0, dtype="bfloat16",
    )
    horizon = 64
    env, ds = load_env_dataset(
        "neko-synth-continuous-v0", {"n_episodes": 8, "horizon": horizon}
    )
    task = ControlTask("synth", env, ds, context_len=cfg.context_len, seed=0)

    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch(task.sample_batch(1, {}, max_tokens=cfg.context_len))
    arrays.pop("lengths")
    params = model.init(
        {"params": jax.random.key(0)}, to_device_batch(arrays)
    )["params"]
    gen = Generator(model, params, packer)

    def run(rollout_cache, n_iterations=2):
        env.reset(seed=11)
        t0 = time.perf_counter()
        task.evaluate(
            gen, n_iterations=n_iterations, deterministic=True,
            rollout_cache=rollout_cache,
        )
        return time.perf_counter() - t0

    # warm both compile caches, then measure
    run(True, 1)
    run(False, 1)
    t_cached = run(True)
    t_repack = run(False)

    steps = 2 * horizon
    print(json.dumps({
        "metric": "control_eval_wall_time",
        "config": "768d/6L k=1024, full-context prompt, 2 episodes x 64 steps",
        "repack_ms_per_env_step": round(1000 * t_repack / steps, 1),
        "rollout_cache_ms_per_env_step": round(1000 * t_cached / steps, 1),
        "speedup": round(t_repack / t_cached, 2),
    }))


if __name__ == "__main__":
    main()
