#!/usr/bin/env python
"""Measure speculative-decoding ACCEPTANCE on a trained checkpoint.

    python tools/measure_spec_acceptance.py \
        --model_path models/<exp> [--k 4] [--gen 48] [--n_prompts 6]

tokens/round (the acceptance-driven quantity) is HARDWARE-INDEPENDENT —
the device only sets the cost of a round — so this runs fine on CPU
while wall-clock speedups (tools/bench_spec.py) need the chip.  Reports,
per prompt class (in-distribution synthetic-corpus text vs random ids):

  * prompt-lookup speculation (generate_spec)
  * self-draft speculation at each truncation depth
    (Generator.truncated_draft(n) for n in --draft_layers)

Speedup model: spec wall time ~ rounds * (round cost); for prompt-lookup
a round costs ~1 target chunk (so speedup ~ tokens/round); for an
n-of-L self-draft a round adds ~K draft steps at n/L of a target step
(speedup ~ tokens_per_round / (1 + K*n/L) on a compute-bound device,
better on a bandwidth-bound one where the draft streams fewer bytes).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--gen", type=int, default=48)
    p.add_argument("--n_prompts", type=int, default=6)
    p.add_argument("--prompt_len", type=int, default=128)
    p.add_argument("--draft_layers", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--cpu", action="store_true", default=True)
    cli = p.parse_args()

    import jax

    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")

    from neko_tpu.cli.build import (
        build_context, load_state_for, resolve_checkpoint_and_args,
    )
    from neko_tpu.inference.generator import Generator
    from neko_tpu.tasks.text import TextTask

    ckpt_path, args = resolve_checkpoint_and_args(cli.model_path, {})
    args.cpu = cli.cpu
    ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt_path)
    state, packer = load_state_for(ctx, ckpt_path)
    gen = Generator(ctx.model, state.params, packer)
    ts = ctx.model_cfg.token_space
    start, end = ts.start("text"), ts.end("text")

    # in-distribution prompts from the corpus the checkpoint trained on
    text = TextTask(
        args.text_datasets, args.text_datasets_paths,
        context_length=args.sequence_length,
        tokenizer_model=args.tokenizer_model_name, seed=0,
    )
    rng = np.random.RandomState(0)
    rows = text._data["train"]
    # prompt + gen + K + 1 must fit the context (spec decode has no ring)
    cli.prompt_len = min(
        cli.prompt_len, ctx.model_cfg.context_len - cli.gen - cli.k - 2
    )
    prompts = {"corpus": [], "random": []}
    for i in range(cli.n_prompts):
        ids = []
        while len(ids) < cli.prompt_len:
            ids += text.text_tokenizer.encode(rows[rng.randint(len(rows))])
        prompts["corpus"].append({"text": ids[: cli.prompt_len]})
        prompts["random"].append({"text": list(
            rng.randint(1, ts.text_tokens, size=cli.prompt_len))})

    drafts = {f"self_draft_L{n}": gen.truncated_draft(n)
              for n in cli.draft_layers
              if 1 <= n < ctx.model_cfg.layers}

    out = {"model_path": cli.model_path, "k": cli.k, "gen": cli.gen,
           "layers": ctx.model_cfg.layers}
    for cls, ps in prompts.items():
        rounds_lookup, rounds_draft = [], {n: [] for n in drafts}
        for prompt in ps:
            ref, = gen.generate_batch(
                [prompt], max_new_tokens=cli.gen, start=start, end=end,
                return_logits=False)
            ref = list(np.asarray(ref)[0])
            toks, r = gen.generate_spec(
                prompt, max_new_tokens=cli.gen, start=start, end=end,
                speculate_k=cli.k)
            assert list(toks) == ref, "lookup lossless violated"
            rounds_lookup.append(r)
            for name, d in drafts.items():
                toks, r = gen.generate_spec_draft(
                    prompt, d, max_new_tokens=cli.gen, start=start,
                    end=end, speculate_k=cli.k)
                assert list(toks) == ref, f"{name} lossless violated"
                rounds_draft[name].append(r)
        res = {"prompt_lookup": {
            "tokens_per_round": round(
                cli.gen / float(np.mean(rounds_lookup)), 2),
            "rounds": [int(r) for r in rounds_lookup],
        }}
        for name in drafts:
            tpr = cli.gen / float(np.mean(rounds_draft[name]))
            n = int(name.rsplit("L", 1)[1])
            res[name] = {
                "tokens_per_round": round(tpr, 2),
                # compute-bound speedup bound (bandwidth-bound is better)
                "speedup_bound_compute": round(
                    tpr / (1 + cli.k * n / ctx.model_cfg.layers), 2),
                "rounds": [int(r) for r in rounds_draft[name]],
            }
        out[cls] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
