#!/usr/bin/env python
"""Training walkthrough: mixtures, EMA, exact resume, reference export.

Runnable offline end to end (synthetic control env + synthetic text):

    python examples/training.py

Covers what the reference documents only as README command lines
(/root/reference/README.md:55-82), plus the capabilities it lacks:
exact optimizer-state resume, EMA shadow params, and exporting the
trained run back to a reference-loadable .pt.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="/tmp/neko_training_example")
    cli = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli.train import run, validate_args
    from neko_tpu.training.arguments import TrainingArgs

    # ---- 1. mixture training (50% text / 50% control), EMA on -------------
    # The flag surface is the reference's TrainingArgs (arguments.py:5-138);
    # ema_decay / save_dir-relative resume are TPU-rebuild extensions.
    common = dict(
        cpu=True,
        control_datasets=["neko-synth-continuous-v0"],
        text_prop=0.5,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        embed_dim=64, layers=2, heads=4, batch_size=8,
        sequence_length=128, warmup_steps=5, mixed_precision="no",
        dropout=0.0, eval_episodes=1, eval_text_num_examples=2,
        save_model=True, save_dir=cli.save_dir, ema_decay=0.95,
    )
    args = TrainingArgs(training_steps=20, log_eval_freq=10, **common)
    validate_args(args)
    print("=== phase 1: train 20 steps (mixture, EMA) ===")
    trainer = run(args)
    exp_dir = trainer.exp_dir
    ckpt = os.path.join(exp_dir, "checkpoint_20")
    print(f"checkpointed: {ckpt}")

    # ---- 2. exact resume: finishes at training_steps, not 20+N ------------
    # Orbax restores params + AdamW moments + step + RNG (the reference's
    # --init_checkpoint is weights-only, resume is approximate there).
    print("=== phase 2: resume to step 30 ===")
    args2 = TrainingArgs(
        training_steps=30, log_eval_freq=10, resume_from=ckpt, **common
    )
    validate_args(args2)
    trainer2 = run(args2)
    print(f"resumed run dir: {trainer2.exp_dir}")

    # ---- 3. evaluate the EMA shadow ---------------------------------------
    print("=== phase 3: eval.py --use_ema ===")
    from neko_tpu.cli import evaluate

    logs = evaluate.run(argparse.Namespace(
        model_path=trainer2.exp_dir, eval_episodes=1, eval_mode=None,
        promptless_eval=None, eval_text_num_examples=2,
        eval_text_log_examples=None, top_k=None, cpu=True,
        eval_parallel_episodes=None, kv_cache_dtype=None,
        control_datasets=None, render=False, mesh_model_axis=None,
        temperature=None, sample_top_k=None, sample_top_p=None,
        use_ema=True,
    ))
    assert any(k.startswith("evaluation/") for k in logs)

    # ---- 4. export for the reference framework ----------------------------
    print("=== phase 4: export a reference-loadable .pt ===")
    from neko_tpu.cli.build import (
        build_context, load_state_for, resolve_checkpoint_and_args,
    )
    from neko_tpu.models.export_reference import save_reference_checkpoint

    ckpt_path, rargs = resolve_checkpoint_and_args(
        trainer2.exp_dir, {"cpu": True}
    )
    ctx, _ = build_context(rargs, tasks=[])
    state, _ = load_state_for(ctx, ckpt_path)
    out = os.path.join(cli.save_dir, "reference_checkpoint.pt")
    save_reference_checkpoint(out, state.params, ctx.model_cfg)
    print(f"wrote {out} — loadable by the reference's eval.py")


if __name__ == "__main__":
    main()
