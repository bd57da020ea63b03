#!/usr/bin/env python
"""Inference walkthrough: load a checkpoint and use every predict API.

The reference ships exploratory notebooks (dev_notebooks/, misc/*.ipynb);
this is the script equivalent, runnable offline end to end:

    python examples/inference.py                 # trains a tiny model first
    python examples/inference.py --model_path models/<exp>  # existing ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default=None,
                   help="experiment dir or checkpoint_<N> dir; default: "
                        "train a tiny model on synthetic data first")
    p.add_argument("--cpu", action=argparse.BooleanOptionalAction, default=True,
                   help="run on CPU (--no-cpu uses the default accelerator)")
    cli = p.parse_args()

    import jax

    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")

    model_path = cli.model_path
    if model_path is None:
        print("=== training a tiny model on synthetic data (~2 min) ===")
        from neko_tpu.cli.train import run, validate_args
        from neko_tpu.training.arguments import TrainingArgs

        args = TrainingArgs(
            cpu=True,
            control_datasets=["neko-synth-continuous-v0"],
            text_prop=0.5,
            text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
            embed_dim=64, layers=2, heads=4, batch_size=8,
            sequence_length=128, training_steps=30, log_eval_freq=30,
            warmup_steps=5, mixed_precision="no", dropout=0.0,
            eval_episodes=0, eval_text_num_examples=2,
            save_model=True, save_dir="/tmp/neko_example",
        )
        validate_args(args)
        trainer = run(args)
        model_path = trainer.exp_dir

    # ---- load the checkpoint the way eval.py does -------------------------
    from neko_tpu.cli.build import build_context
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.utils.checkpoint import (
        latest_checkpoint, load_args_dict, load_checkpoint,
    )

    ckpt = model_path
    if os.path.isdir(ckpt) and not os.path.basename(ckpt).startswith("checkpoint_"):
        ckpt = latest_checkpoint(ckpt)
        assert ckpt, f"no checkpoint_* under {model_path}"
    exp_dir = os.path.dirname(ckpt)
    saved = load_args_dict(exp_dir)
    known = {f for f in TrainingArgs.__dataclass_fields__}
    args = TrainingArgs(**{k: v for k, v in saved.items() if k in known})
    args.cpu = True
    ctx, tasks = build_context(args)

    packer = SequencePacker(ctx.model_cfg)
    arrays = packer.pack_batch([{"text": [0]}])
    arrays.pop("lengths")
    state = ctx.init_state(to_device_batch(arrays))
    state = load_checkpoint(ckpt, jax.tree.map(lambda x: x, state))
    gen = Generator(ctx.model, state.params, packer)
    ts = ctx.model_cfg.token_space
    print(f"loaded {ckpt} (step {int(state.step)})")

    # ---- 1. text continuation --------------------------------------------
    prompt = [12, 42, 7]
    logits, tokens = gen.predict_text({"text": prompt}, max_length=8)
    print(f"predict_text({prompt}) -> {list(tokens)}")

    # ---- 2. control action (continuous) ----------------------------------
    obs = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    act = np.zeros((3, 2), np.float32)
    action = gen.predict_control(
        {"continuous_obs": obs, "continuous_actions": act},
        action_kind="continuous", action_tokens=2,
    )
    print(f"predict_control(continuous) -> {action}")

    # ---- 3. batched generation -------------------------------------------
    toks, _ = gen.generate_batch(
        [{"text": [1, 2]}, {"text": [3, 4, 5]}],
        max_new_tokens=4, start=ts.start("text"), end=ts.end("text"),
    )
    print(f"generate_batch -> {toks.tolist()}")

    # stochastic decoding with nucleus/top-k/temperature (reference has
    # only argmax + plain multinomial; defaults reproduce those exactly)
    _, toks_s = gen.predict_text(
        {"text": prompt}, max_length=8, deterministic=False,
        temperature=0.8, top_k=50, top_p=0.95,
    )
    print(f"predict_text (T=0.8, top_k=50, top_p=0.95) -> {list(toks_s)}")

    # lossless speculative decoding: identical tokens, fewer device rounds
    # (the per-token KV-stream cost is paid once per 1+K verified tokens)
    toks_spec, rounds = gen.generate_spec(
        {"text": prompt}, max_new_tokens=8,
        start=ts.start("text"), end=ts.end("text"), speculate_k=4,
    )
    print(f"generate_spec -> {toks_spec.tolist()} in {rounds} rounds")

    # draft-model speculation: a smaller model proposes, the target
    # verifies (still lossless).  Here: the target's own first layer as a
    # zero-training self-draft (serve.py --self_draft_layers)
    if ctx.model_cfg.layers > 1:
        draft = gen.truncated_draft(1)
        toks_d, rounds_d = gen.generate_spec_draft(
            {"text": prompt}, draft, max_new_tokens=8,
            start=ts.start("text"), end=ts.end("text"), speculate_k=4,
        )
        print(f"generate_spec_draft -> {toks_d.tolist()} "
              f"in {rounds_d} rounds")

    # ---- 4. live env rollout ----------------------------------------------
    from neko_tpu.envs.setup_env import load_env_dataset
    from neko_tpu.tasks.control import ControlTask

    env, ds = load_env_dataset("neko-synth-continuous-v0", {"horizon": 8})
    task = ControlTask("demo", env, ds, context_len=args.sequence_length, seed=0)
    metrics = task.evaluate(gen, n_iterations=2, parallel_episodes=2)
    print(f"rollout metrics -> {metrics}")

    # ---- 5. serving options ----------------------------------------------
    # int8 KV cache (~1.15x decode tokens/sec, README "Serving"): same
    # params, quantized cache storage
    import dataclasses

    from neko_tpu.models.policy import NekoModel

    cfg8 = dataclasses.replace(ctx.model_cfg, kv_cache_dtype="int8")
    gen8 = Generator(NekoModel(cfg8), state.params, packer)
    _, toks8 = gen8.predict_text({"text": prompt}, max_length=8)
    print(f"predict_text (int8 KV cache) -> {list(toks8)}")

    # fp8 weight-only serving (eval.py/serve.py --serve_weight_dtype fp8):
    # matmul kernels stored as e4m3 + per-channel scales, dequantized
    # inside the decode loop — half the weight bytes per generated token
    genf8 = Generator(ctx.model, state.params, packer, weight_dtype="fp8")
    _, toksf8 = genf8.predict_text({"text": prompt}, max_length=8)
    print(f"predict_text (fp8 weights) -> {list(toksf8)}")

    # continuous batching (serve.py --continuous_slots): requests join a
    # RUNNING decode loop; greedy outputs are token-identical to
    # generate_batch.  Engine primitives shown directly:
    st = gen.engine_init(2)
    st = gen.engine_admit(st, 0, {"text": prompt})
    ones = np.ones(2, np.float32)
    toks_e, st = gen.engine_chunk(
        st, n_steps=8, start=ts.start("text"), end=ts.end("text"),
        det=np.ones(2, bool), temp=ones, top_p=ones,
    )
    print(f"continuous engine slot 0 -> {toks_e[0].tolist()}")

    # tensor-parallel serving spans a Mesh when multiple devices exist
    # (Generator(..., mesh=create_mesh(model=N)); eval.py --mesh_model_axis)
    if len(jax.devices()) % 2 == 0 and ctx.model_cfg.heads % 2 == 0:
        from neko_tpu.parallel.mesh import create_mesh

        gen_tp = Generator(
            ctx.model, state.params, packer, mesh=create_mesh(model=2)
        )
        _, toks_tp = gen_tp.predict_text({"text": prompt}, max_length=8)
        print(f"predict_text (TP x2) -> {list(toks_tp)}")


if __name__ == "__main__":
    sys.exit(main())
