"""Export a trained neko-tpu checkpoint as a reference-format `.pt`.

    python tools/export_checkpoint.py --model_path models/<exp>/ \
        --out checkpoint_ref.pt [--no_merge_lora] [--wte_rows 50257]

Loads the Orbax checkpoint (latest under an experiment dir, or an explicit
checkpoint_<N> dir) with its adjacent args.json, converts the params pytree
into the reference GatoPolicy state_dict (models/export_reference.py), and
torch.saves it — the exact artifact the reference's save_model writes
(/root/reference/gato/utils/utils.py:19-32), loadable by its eval.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="checkpoint_<N> dir, or an exp dir (latest used)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--no_merge_lora", action="store_true",
                   help="keep the base c_attn kernel instead of folding "
                        "LoRA adapters in (adapters are then dropped)")
    p.add_argument("--wte_rows", type=int, default=1,
                   help="rows of the fork's unused transformer.wte: 1 for a "
                        "fresh GatoPolicy, 50257 for --pretrained_lm builds")
    cli = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli.build import (
        build_context,
        load_state_for,
        resolve_checkpoint_and_args,
    )
    from neko_tpu.models.export_reference import save_reference_checkpoint

    ckpt, args = resolve_checkpoint_and_args(cli.model_path, {"cpu": True})
    ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt)
    state, _ = load_state_for(ctx, ckpt)

    save_reference_checkpoint(
        cli.out, state.params, ctx.model_cfg,
        merge_lora=not cli.no_merge_lora, wte_rows=cli.wte_rows,
    )
    print(f"wrote {cli.out} (from {ckpt}, step {int(state.step)})")


if __name__ == "__main__":
    main()
