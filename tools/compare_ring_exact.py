"""Quantify the post-eviction ring-decode deviation (ring vs exact window).

The rollout cache evicts whole timesteps from a RING KV buffer: entries that
survive eviction keep key/value vectors computed when the evicted context was
still present (TransformerXL-style memory), whereas the reference re-packs
the trimmed window and recomputes everything per token
(gato_policy.py:466-467, control_task.py:154-155).  Pre-wrap the two paths
are bit-equal (tests/test_rollout_cache.py); this tool measures the
LONG-HORIZON effect of the deviation, since the ring path is the default:

* text: autoregressive generation far past the window wrap on a trained
  model; CE of the generated-token logits vs the true continuation
  (the reference's text metric, text_task.py:98-102) under ring vs
  exact-window decode
* control: episode returns with rollout_cache=True (ring eviction) vs
  rollout_cache=False (re-pack per step) on a horizon that overflows the
  context several times

Trains a small model on the synthetic tasks first (CPU-friendly), or pass
--model_path to reuse a checkpoint.  Results recorded in PARITY.md
("Ring-decode deviation").
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--text_examples", type=int, default=16)
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--targets", type=int, default=96)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
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
    trainer = Trainer(ctx, tasks, "ring_exact_cmp", targs)
    print(f"training {args.steps} steps on synthetic text+control ...")
    trainer.train()
    state = trainer.state
    gen = Generator(ctx.model, state.params, trainer.packer)

    ts = ctx.model_cfg.token_space
    text_task = trainer.text_tasks[0]
    control_task = trainer.control_tasks[0]

    # ---------------- text: CE vs true continuation, both decode paths
    rng = np.random.RandomState(123)
    rows = text_task._data["test"]
    losses = {"ring": [], "exact": []}
    n_done = 0
    i = 0
    while n_done < args.text_examples and i < len(rows) * 4:
        # concatenate rows until the prompt nearly fills the context so the
        # continuation overflows it several times over
        ids = []
        while len(ids) < k - 8 + args.targets:
            ids += text_task.text_tokenizer.encode(rows[rng.randint(len(rows))]) + [
                text_task.text_tokenizer.encode(" and")[0]
            ]
        i += 1
        prompt = ids[: k - 8]
        target = ids[k - 8 : k - 8 + args.targets]
        for name, exact in (("ring", False), ("exact", True)):
            toks, windows = gen.generate(
                {"text": prompt},
                max_new_tokens=len(target),
                start=ts.start("text"), end=ts.end("text"),
                deterministic=True, exact_window=exact,
            )
            lg = np.asarray(windows, np.float64)  # [n, window]
            lg = lg - lg.max(-1, keepdims=True)
            logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
            nll = -logp[np.arange(len(target)), np.asarray(target)]
            losses[name].append(nll.mean())
        n_done += 1
    ring_l, exact_l = np.mean(losses["ring"]), np.mean(losses["exact"])
    print(
        f"text ({n_done} ex, {args.targets} gen tokens, ctx {k}):\n"
        f"  ring  loss {ring_l:.4f}  ppl {np.exp(ring_l):.2f}\n"
        f"  exact loss {exact_l:.4f}  ppl {np.exp(exact_l):.2f}\n"
        f"  delta (ring - exact) {ring_l - exact_l:+.4f}"
    )

    # ---------------- control: returns, ring cache vs re-pack
    rets = {}
    for name, use_cache in (("ring", True), ("exact", False)):
        # identical episode stream for both paths: seeding the env once
        # deterministically re-bases the RNG the per-episode resets advance
        control_task.env.reset(seed=7)
        m = control_task.evaluate(
            gen,
            n_iterations=args.episodes,
            deterministic=True,
            promptless_eval=True,
            rollout_cache=use_cache,
        )
        rets[name] = m["mean_return"]
        print(f"control {name}: mean_return {m['mean_return']:.3f} "
              f"(ep_len {m['mean_episode_len']:.1f})")
    print(f"control delta (ring - exact) {rets['ring'] - rets['exact']:+.3f}")


if __name__ == "__main__":
    main()
