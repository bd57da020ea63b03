#!/usr/bin/env python
"""Measure speculative decoding vs plain greedy decode on the real chip.

    python tools/bench_spec.py [--config medium] [--kv_quant] [--k 4]

Reports median wall tokens/sec and tokens/round for generate_spec against
the plain one-token-per-step decode, on two prompt classes:

  * `cyclic`: the greedy continuation repeats — acceptance near K (the
    speedup upper bound for this chip/config)
  * `random`: arbitrary prompt on a random-init model — acceptance is
    incidental (the overhead floor: one K+1-token extend per round)

Spec decode is LOSSLESS (tests/test_spec_decode.py), so the comparison is
purely about device rounds: the decode step is bandwidth-bound on the KV
cache streams (PROFILE.md), and a round streams the cache once for 1+K
verified candidates.

`--steady` additionally measures the STEADY-STATE loop cost: one device
program per decode loop (prefill/pack/embed excluded, tunnel dispatch paid
once), which is what the continuous-batching engine pays per token after
admission.  At --gen 128 the full generate() wall is dominated by the
fixed per-call cost (~55 ms of prefill + embed + dispatch on this tunnel),
which hides the loop-level speedup the serving path realizes.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="flagship",
                   choices=["flagship", "medium"])
    p.add_argument("--kv_quant", action="store_true")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--gen", type=int, default=128)
    p.add_argument("--prompt_len", type=int, default=512)
    p.add_argument("--reps", type=int, default=11)
    p.add_argument("--model_path", type=str, default=None,
                   help="restore a trained checkpoint instead of random "
                        "init (draft acceptance is only meaningful on "
                        "trained weights)")
    p.add_argument("--draft_layers", type=int, default=0,
                   help="> 0: ALSO benchmark draft-model speculation with "
                        "the target's own first N layers as the draft "
                        "(Generator.truncated_draft)")
    p.add_argument("--draft_path", type=str, default=None,
                   help="checkpoint of a separately TRAINED (smaller) draft "
                        "model sharing the token space — benchmarks the "
                        "classic two-model scheme (generate_spec_draft, "
                        "same as serve.py --draft_model_path); excludes "
                        "--draft_layers")
    p.add_argument("--corpus", action="store_true",
                   help="add a 'corpus' prompt drawn from the synthetic "
                        "text corpus (tasks/text.py) — in-distribution for "
                        "checkpoints trained on --text_datasets synthetic, "
                        "so draft/lookup acceptance is meaningful")
    p.add_argument("--steady", action="store_true",
                   help="also measure the steady-state loop cost (one "
                        "device program per decode loop, prefill excluded) "
                        "at --steady_gen tokens")
    p.add_argument("--steady_gen", type=int, default=768)
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON result to this path")
    cli = p.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel

    arch = (dict(embed_dim=1536, layers=12, heads=12)
            if cli.config == "medium"
            else dict(embed_dim=768, layers=6, heads=24))
    cfg = ModelConfig(
        dropout=0.0, context_len=1024, max_patches=0, dtype="bfloat16",
        kv_cache_dtype="int8" if cli.kv_quant else "native", **arch,
    )
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    init = packer.pack_batch(
        [{"text": list(rng.randint(1, cfg.text_tokens, size=8))}]
    )
    init.pop("lengths")
    if cli.model_path:
        # trained weights: build from the checkpoint's own args (overrides
        # the --config arch) — acceptance rates only mean something here
        from neko_tpu.cli.build import (
            build_context, load_state_for, resolve_checkpoint_and_args,
        )

        ckpt_path, args = resolve_checkpoint_and_args(cli.model_path, {})
        ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt_path)
        state, packer = load_state_for(ctx, ckpt_path)
        model, params, cfg = ctx.model, state.params, ctx.model_cfg
    else:
        params = model.init(
            {"params": jax.random.key(0)}, to_device_batch(init)
        )["params"]
    gen = Generator(model, params, packer)
    assert not (cli.draft_path and cli.draft_layers), (
        "--draft_path and --draft_layers are exclusive"
    )
    if cli.draft_path:
        from neko_tpu.cli.build import (
            build_context, load_state_for, resolve_checkpoint_and_args,
        )

        d_ckpt, d_args = resolve_checkpoint_and_args(cli.draft_path, {})
        d_ctx, _ = build_context(d_args, tasks=[], ckpt_path=d_ckpt)
        d_state, d_packer = load_state_for(d_ctx, d_ckpt)
        assert d_ctx.model_cfg.vocab_size == cfg.vocab_size, (
            "draft and target must share the token space"
        )
        draft = Generator(d_ctx.model, d_state.params, d_packer)
    elif cli.draft_layers:
        draft = gen.truncated_draft(cli.draft_layers)
    else:
        draft = None
    ts = cfg.token_space
    start, end = ts.start("text"), ts.end("text")

    prompts = {
        "cyclic": {"text": [5, 9] * (cli.prompt_len // 2)},
        "random": {"text": list(
            rng.randint(1, cfg.text_tokens, size=cli.prompt_len)
        )},
    }
    if cli.corpus:
        # in-distribution prompt: the deterministic synthetic corpus,
        # tokenized exactly as training did (byte fallback offline)
        from neko_tpu.tasks.text import _synthetic_corpus
        from neko_tpu.tokenizers.text import get_text_tokenizer

        tok = get_text_tokenizer("gpt2")
        ids = tok.encode(" ".join(_synthetic_corpus()))[:cli.prompt_len]
        prompts["corpus"] = {"text": [int(t) for t in ids]}

    out = {"config": cli.config, "k": cli.k, "gen": cli.gen,
           "kv_cache": cfg.kv_cache_dtype}
    def check_lossless(spec_toks, plain_toks, plain_logits, what):
        """Token-for-token equality, modulo bf16-resolution logit ties.

        The 1-token decode forward and the K+1-token verify forward run
        different matmul shapes, so their bf16 hidden states differ by a
        few ulps — where the model's true top-2 margin is inside that
        noise, the two forwards can argmax differently.  That is argmax
        instability at the numeric floor, not a losslessness violation:
        on a random-init model the divergence sites tie BIT-EXACTLY
        (thousands of the 52k logits collide in bf16), and on trained
        weights the measured flip margins are 1 ulp of the logit scale
        (e.g. gap 0.0625 at |logit| ~ 10).  Anything beyond a few ulps
        means the verify path computed a genuinely different
        distribution, and the assert fires."""
        spec_toks = np.asarray(spec_toks)
        plain_toks = np.asarray(plain_toks)
        n = min(len(spec_toks), len(plain_toks))
        L = np.asarray(plain_logits, np.float32)
        if L.ndim == 3:
            L = L[0]
        flips = 0
        for i in range(n):
            p, s = int(plain_toks[i]), int(spec_toks[i])
            if p == s:
                continue
            gap = abs(float(L[i, p]) - float(L[i, s]))
            # 4 bf16 ulps (2^-8 mantissa steps) at the logit magnitude
            tol = 4 * 2.0 ** -8 * max(
                1.0, abs(float(L[i, p])), abs(float(L[i, s]))
            )
            assert gap <= tol, (
                f"{what}: real divergence at {i}: plain {p} vs spec {s}, "
                f"logit gap {gap} > {tol:.4f} (4 ulps)"
            )
            flips += 1
            break  # past the first tie-flip the sequences legitimately differ
        return flips

    for name, prompt in prompts.items():
        # plain greedy decode (the scan streams the cache once per token)
        (plain,), plain_logits = gen.generate_batch(
            [prompt], max_new_tokens=cli.gen, start=start, end=end,
            return_logits=True,
        )  # correctness capture (logits variant compiles separately)
        gen.generate_batch(
            [prompt], max_new_tokens=cli.gen, start=start, end=end,
            return_logits=False,
        )  # compile the timed variant
        times = []
        for _ in range(cli.reps):
            t0 = time.perf_counter()
            toks, = gen.generate_batch(
                [prompt], max_new_tokens=cli.gen, start=start, end=end,
                return_logits=False,
            )
            np.asarray(toks)  # host sync
            times.append(time.perf_counter() - t0)
        plain_s = float(np.median(times))

        spec, rounds = gen.generate_spec(
            prompt, max_new_tokens=cli.gen, start=start, end=end,
            speculate_k=cli.k,
        )  # compile
        tie_flips = check_lossless(spec, np.asarray(plain), plain_logits,
                                   "spec")
        times = []
        for _ in range(cli.reps):
            t0 = time.perf_counter()
            spec, rounds = gen.generate_spec(
                prompt, max_new_tokens=cli.gen, start=start, end=end,
                speculate_k=cli.k,
            )
            times.append(time.perf_counter() - t0)
        spec_s = float(np.median(times))

        out[name] = {
            "plain_tokens_per_sec": round(cli.gen / plain_s, 1),
            "spec_tokens_per_sec": round(cli.gen / spec_s, 1),
            "speedup": round(plain_s / spec_s, 3),
            "tokens_per_round": round(cli.gen / rounds, 2),
            "rounds": int(rounds),
            "tie_flips": tie_flips,
        }

        if draft is not None:
            dspec, dr = gen.generate_spec_draft(
                prompt, draft, max_new_tokens=cli.gen, start=start,
                end=end, speculate_k=cli.k,
            )  # compile
            check_lossless(dspec, np.asarray(plain), plain_logits, "draft")
            times = []
            for _ in range(cli.reps):
                t0 = time.perf_counter()
                dspec, dr = gen.generate_spec_draft(
                    prompt, draft, max_new_tokens=cli.gen, start=start,
                    end=end, speculate_k=cli.k,
                )
                times.append(time.perf_counter() - t0)
            d_s = float(np.median(times))
            out[name]["draft"] = {
                "path": cli.draft_path,
                "layers": cli.draft_layers,
                "tokens_per_sec": round(cli.gen / d_s, 1),
                "speedup": round(plain_s / d_s, 3),
                "tokens_per_round": round(cli.gen / dr, 2),
                "rounds": int(dr),
            }
    if cli.steady:
        import jax.numpy as jnp

        # Steady state: time the decode LOOPS as single device programs on
        # a shared prefilled cache — the per-call fixed cost (pack, embed,
        # prefill, tunnel dispatch) is excluded, matching what the serving
        # engine pays per token once a request is admitted.
        GEN = cli.steady_gen
        p_len = 128
        if cli.corpus:
            # in-distribution steady prompt for trained checkpoints —
            # acceptance (and therefore the realized speedup) is
            # meaningless on the cyclic prompt there
            prompt = {"text": prompts["corpus"]["text"][:p_len]}
        else:
            prompt = {"text": [5, 9] * (p_len // 2)}
        arrays = packer.pack_batch([prompt], pad_side="right")
        arrays.pop("lengths")
        P = gen.params
        batch = to_device_batch(arrays)
        emb = gen._embed_batch(P, batch)
        mask = np.zeros((1, cfg.context_len), bool)
        mask[0, :p_len] = True
        logits0, cache0 = gen._prefill(P, emb, jnp.asarray(mask))
        pos = jnp.asarray([p_len], jnp.int32)
        last = logits0[jnp.arange(1), pos - 1]
        key = jax.random.key(1)
        hist = jnp.asarray(
            np.zeros((1, cfg.context_len + cli.k + 1), np.int32)
        ).at[0, :p_len].set(jnp.asarray(arrays["tokens"][0][:p_len]))

        def med(f):
            r = f()
            np.asarray(jax.tree_util.tree_leaves(r)[0])  # compile + sync
            ts_ = []
            for _ in range(cli.reps):
                t0 = time.perf_counter()
                r = f()
                np.asarray(jax.tree_util.tree_leaves(r)[0])
                ts_.append(time.perf_counter() - t0)
            return float(np.median(ts_)) * 1e3

        def spec_loop():
            return gen._spec_decode(
                P, cache0, last, hist, pos, key, n_steps=GEN, start=start,
                end=end, K=cli.k, ngram=2, deterministic=True,
                temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
            )

        def dec_loop():
            return gen._decode_scan(
                P, cache0, last, pos, pos * 0 + 1, key, None, None,
                n_steps=GEN, start=start, end=end, deterministic=True,
                with_pos=False, return_logits=False, ring=False,
                temperature=1.0, top_k=0, top_p=1.0, use_top_p=False,
            )[0]

        t_dec = med(dec_loop)
        _, rounds = spec_loop()
        rounds = int(rounds)
        t_spec = med(spec_loop)
        out["steady"] = {
            "gen": GEN,
            "rounds": rounds,
            "decode_ms_per_token": round(t_dec / GEN, 4),
            "spec_ms_per_round": round(t_spec / rounds, 4),
            "tokens_per_round": round(GEN / rounds, 2),
            "spec_ms_per_token": round(t_spec / GEN, 4),
            "steady_speedup": round(t_dec / t_spec, 3),
        }

        if draft is not None:
            # steady-state DRAFT-MODEL loop: both caches prefilled, one
            # compiled device program (what serving pays per admitted
            # request with --draft_model_path)
            _, cache_d0 = draft._prefill(
                draft.params, draft._embed_batch(draft.params, batch),
                jnp.asarray(mask),
            )
            dfn = gen._get_spec_draft(draft.model)

            def draft_loop():
                return dfn(
                    P, draft.params, cache0, cache_d0, last, pos, key,
                    n_steps=GEN, start=start, end=end, K=cli.k,
                    deterministic=True, temperature=1.0, top_k=0,
                    top_p=1.0, use_top_p=False,
                )

            _, drounds = draft_loop()
            drounds = int(drounds)
            t_draft = med(draft_loop)
            out["steady"]["draft"] = {
                "rounds": drounds,
                "tokens_per_round": round(GEN / drounds, 2),
                "ms_per_round": round(t_draft / drounds, 4),
                "ms_per_token": round(t_draft / GEN, 4),
                "steady_speedup": round(t_dec / t_draft, 3),
            }

    print(json.dumps(out))
    if cli.out:
        with open(cli.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
