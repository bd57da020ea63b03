"""Quantify serving-quantization quality on a TRAINED model (not random
params): int8 KV cache, fp8 weights, or both stacked.

tests/test_kv_quant.py and tests/test_fp8_weights.py pin the numeric error
of the quantized math; this tool measures the metric-level effect on a
model trained on the synthetic tasks, with the same harness as
tools/compare_ring_exact.py:

* text: CE of generated-token logits vs the true continuation
  (the reference's text metric, text_task.py:98-102)
* control: episode returns over identical seeded episode streams

Variants via --variants (comma list of native,int8,fp8,fp8+int8); deltas
are reported against `native`.  Results recorded in PARITY.md ("int8 KV
cache", "fp8 weight-only serving").
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--text_examples", type=int, default=16)
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--targets", type=int, default=64)
    ap.add_argument("--variants", type=str, default="native,int8",
                    help="comma list of native,int8,fp8,fp8+int8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    k = 192
    targs = TrainingArgs(
        cpu=True,
        sequence_length=k,
        embed_dim=128, layers=2, heads=4,
        batch_size=8,
        text_prop=0.5,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        control_datasets=["neko-synth-continuous-v0"],
        training_steps=args.steps, log_eval_freq=args.steps,
        eval_episodes=0, eval_text_num_examples=0,
        mixed_precision="no", save_model=False, log_jsonl=False,
        dropout=0.0,
    )
    ctx, tasks = B.build_context(targs)
    trainer = Trainer(ctx, tasks, "kv_quant_cmp", targs)
    print(f"training {args.steps} steps on synthetic text+control ...")
    trainer.train()
    state = trainer.state
    cfg8 = dataclasses.replace(ctx.model_cfg, kv_cache_dtype="int8")
    recipes = {
        "native": (ctx.model, None),
        "int8": (NekoModel(cfg8), None),
        "fp8": (ctx.model, "fp8"),
        "fp8+int8": (NekoModel(cfg8), "fp8"),
    }
    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    assert variants[0] == "native", "deltas are reported against 'native'"
    gens = {
        name: Generator(recipes[name][0], state.params, trainer.packer,
                        weight_dtype=recipes[name][1])
        for name in variants
    }

    ts = ctx.model_cfg.token_space
    text_task = trainer.text_tasks[0]
    control_task = trainer.control_tasks[0]

    # ---------------- text: CE vs true continuation, both cache dtypes
    rng = np.random.RandomState(123)
    rows = text_task._data["test"]
    losses = {n: [] for n in gens}
    for _ in range(args.text_examples):
        ids = []
        while len(ids) < k - 8 + args.targets:
            ids += text_task.text_tokenizer.encode(rows[rng.randint(len(rows))]) + [
                text_task.text_tokenizer.encode(" and")[0]
            ]
        prompt = ids[: k - 8]
        target = ids[k - 8 : k - 8 + args.targets]
        for name, gen in gens.items():
            toks, windows = gen.generate(
                {"text": prompt},
                max_new_tokens=len(target),
                start=ts.start("text"), end=ts.end("text"),
                deterministic=True,
            )
            lg = np.asarray(windows, np.float64)
            lg = lg - lg.max(-1, keepdims=True)
            logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
            nll = -logp[np.arange(len(target)), np.asarray(target)]
            losses[name].append(nll.mean())
    nat = np.mean(losses["native"])
    print(f"text ({args.text_examples} ex, {args.targets} gen tokens, "
          f"ctx {k}):")
    print(f"  native   loss {nat:.4f}  ppl {np.exp(nat):.2f}")
    for name in gens:
        if name == "native":
            continue
        q = np.mean(losses[name])
        print(f"  {name:8s} loss {q:.4f}  ppl {np.exp(q):.2f}  "
              f"delta ({name} - native) {q - nat:+.4f}")

    # ---------------- control: returns, both cache dtypes
    rets = {}
    for name, gen in gens.items():
        control_task.env.reset(seed=7)
        m = control_task.evaluate(
            gen,
            n_iterations=args.episodes,
            deterministic=True,
            promptless_eval=True,
        )
        rets[name] = m["mean_return"]
        print(f"control {name}: mean_return {m['mean_return']:.3f} "
              f"(ep_len {m['mean_episode_len']:.1f})")
    for name in gens:
        if name == "native":
            continue
        print(f"control delta ({name} - native) "
              f"{rets[name] - rets['native']:+.3f}")


if __name__ == "__main__":
    main()
