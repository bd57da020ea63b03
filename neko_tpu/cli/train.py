"""`neko-train` / `python train.py` — the training entry point.

Flag surface matches the reference train.py (including its startup sanity
asserts, train.py:166-172); the run itself is the TPU-native pipeline.
"""

from __future__ import annotations

import datetime
from typing import Optional

from neko_tpu.cli.build import build_context
from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.training.trainer import Trainer
from neko_tpu.utils.typed_argparser import TypedArgumentParser


def run(args: TrainingArgs) -> Trainer:
    import jax

    ctx, tasks = build_context(args)

    exp_name = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S") + "_neko"
    trainer = Trainer(ctx, tasks, exp_name, args)
    trainer.init_state()

    if args.pretrained_lm is not None:
        from neko_tpu.models.import_gpt2 import load_pretrained_gpt2
        from neko_tpu.parallel import sharding as shd

        # import works on the canonical per-layer layout; re-stack for
        # stage-local PP storage afterwards (identity off pipeline meshes)
        host_params = jax.device_get(ctx.unstack_params(trainer.state.params))
        new_params, _ = load_pretrained_gpt2(host_params, args.pretrained_lm)
        new_params = jax.device_put(
            new_params, shd.param_shardings(ctx.mesh, new_params)
        )
        trainer.state = trainer.state.replace(
            params=ctx.stack_params(new_params)
        )

    if args.init_checkpoint is not None:
        if args.init_checkpoint.endswith(".pt"):
            # migrate a reference (GatoPolicy) torch checkpoint directly
            from neko_tpu.models.import_reference import load_reference_checkpoint
            from neko_tpu.parallel import sharding as shd

            host = jax.device_get(ctx.unstack_params(trainer.state.params))
            params = load_reference_checkpoint(
                args.init_checkpoint, host, ctx.model_cfg
            )
            params = jax.device_put(
                params, shd.param_shardings(ctx.mesh, params)
            )
            print(f"migrated reference checkpoint {args.init_checkpoint}")
        else:
            from neko_tpu.utils.checkpoint import load_params_only

            abstract = ctx.canonical_abstract(trainer.state)
            params = load_params_only(args.init_checkpoint, abstract)
        trainer.state = trainer.state.replace(params=ctx.stack_params(params))

    if args.resume_from is not None:
        import os

        from neko_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

        path = args.resume_from
        if os.path.isdir(path) and not os.path.basename(path).startswith("checkpoint_"):
            found = latest_checkpoint(path)
            assert found, f"no checkpoint_* under {path}"
            path = found
        # checkpoints are canonical per-layer; restore into that layout and
        # reshard to stage-local stacked storage on pipeline meshes
        trainer.state = ctx.from_canonical_state(
            load_checkpoint(path, ctx.canonical_abstract(trainer.state))
        )
        trainer.steps = int(trainer.state.step)
        # restore the host data-stream state (sampler RNGs) so the resumed
        # run replays the uninterrupted run's example stream bit-for-bit
        from neko_tpu.utils.host_state import load_host_state_for

        host = load_host_state_for(path, trainer.proc_index)
        if host is not None:
            trainer.load_host_state(host)
            print(f"resumed full train state from {path} at step "
                  f"{trainer.steps} (host sampler state restored — exact)")
        else:
            print(f"resumed device train state from {path} at step "
                  f"{trainer.steps} (no host_state sidecar: the data "
                  f"stream restarts from the seed — approximate resume)")

    n_params = sum(x.size for x in jax.tree.leaves(trainer.state.params))
    print(f"devices: {jax.devices()}")
    print(f"mesh: {dict(ctx.mesh.shape)}")
    print(f"parameters: {n_params:,}")

    trainer.train()
    return trainer


def validate_args(args: TrainingArgs) -> None:
    """Reference train.py:166-172 startup asserts."""
    assert 0.0 <= args.text_prop <= 1.0
    assert 0.0 <= args.caption_prop <= 1.0
    assert 0.0 <= args.vqa_prop <= 1.0
    assert args.text_prop + args.caption_prop + args.vqa_prop <= 1.0, (
        "text/caption/vqa proportions must sum to <= 1"
    )
    control_prop = 1 - args.text_prop - args.caption_prop - args.vqa_prop
    if control_prop > 1e-6:
        assert args.control_datasets, (
            "control data proportion > 0 but no --control_datasets specified"
        )
    if args.text_prop > 0:
        assert args.text_datasets and args.text_datasets_paths, (
            "text proportion > 0 but no --text_datasets/--text_datasets_paths"
        )
    assert args.training_steps >= args.log_eval_freq, (
        "training_steps must be >= log_eval_freq"
    )
    if args.lora:
        assert args.pretrained_lm is not None, "--lora requires --pretrained_lm"


def main(argv: Optional[list] = None) -> None:
    parser = TypedArgumentParser(TrainingArgs)
    (args,) = parser.parse_args_into_dataclasses(argv)
    validate_args(args)
    run(args)


if __name__ == "__main__":
    main()
