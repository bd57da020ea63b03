#!/usr/bin/env python
"""Serving throughput/latency: coalescing worker vs continuous batching.

    python tools/bench_serving.py [--config medium] [--clients 8]
        [--requests 32] [--max_new 32] [--tiny]

Spins up the in-process HTTP server (serving/server.py) twice — once with
the micro-batch coalescing worker only, once with --continuous_slots —
and fires the same closed-loop client load at both (each of N client
threads posts its next request as soon as the previous answers; prompt
lengths and generation lengths are drawn from a fixed seeded mix, so
both modes see identical work).  Reports requests/sec, generated
tokens/sec, and p50/p95 request latency as one JSON line.

What the comparison isolates: the coalescing worker groups only
same-knob requests that arrive within one batching window and holds new
arrivals until the whole batch finishes; the continuous engine admits
them into the running decode loop (serving/continuous.py).  Outputs are
greedy and token-identical either way — this measures scheduling only.

Run on the real chip (median-of-... rules from CLAUDE.md apply: tunnel
jitter is large; use --rounds 3+ and compare medians).  --tiny runs a
seconds-scale CPU functional check of the harness itself.
"""

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _post(url, payload, timeout=600):
    req = urllib.request.Request(
        url + "/v1/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def run_load(url, jobs, clients):
    """Closed-loop: `clients` threads drain a shared job list."""
    lock = threading.Lock()
    it = iter(jobs)
    lat = []
    tokens = [0]
    errors = [0]

    def worker():
        while True:
            with lock:
                job = next(it, None)
            if job is None:
                return
            t0 = time.perf_counter()
            try:
                out = _post(url, job)
                n = len(out["tokens"])
            except Exception:  # noqa: BLE001
                with lock:
                    errors[0] += 1
                continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                tokens[0] += n

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    return {
        "wall_s": round(wall, 3),
        "requests_per_sec": round(len(lat) / wall, 2),
        "gen_tokens_per_sec": round(tokens[0] / wall, 1),
        "p50_latency_s": round(statistics.median(lat), 3) if lat else None,
        "p95_latency_s": round(lat[int(0.95 * (len(lat) - 1))], 3)
        if lat else None,
        "p99_latency_s": round(lat[int(0.99 * (len(lat) - 1))], 3)
        if lat else None,
        "errors": errors[0],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="flagship",
                   choices=["flagship", "medium"])
    p.add_argument("--tiny", action="store_true",
                   help="seconds-scale CPU functional check")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--max_new", type=int, default=32)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--prompt_len", type=int, default=256)
    p.add_argument("--rounds", type=int, default=1,
                   help="timed passes per mode; the reported pass is the "
                        "one with median wall time (tunnel jitter rules, "
                        "CLAUDE.md)")
    p.add_argument("--model_path", type=str, default=None,
                   help="serve a TRAINED checkpoint instead of the "
                        "random-init --config arch (speculation acceptance "
                        "only means something on trained weights)")
    p.add_argument("--corpus", action="store_true",
                   help="draw prompts from the synthetic text corpus "
                        "(random windows) instead of uniform-random ids — "
                        "in-distribution for checkpoints trained on "
                        "--text_datasets synthetic")
    p.add_argument("--spec_k", type=int, default=0,
                   help="> 0: ALSO benchmark a third mode, "
                        "'continuous_spec' (--continuous_spec_k): the "
                        "engine decodes with ADAPTIVE prompt-lookup verify "
                        "rounds (plain chunks below --spec_threshold)")
    p.add_argument("--spec_threshold", type=int, default=48,
                   help="adaptive engine: verify rounds only while some "
                        "row wants >= this many more tokens")
    p.add_argument("--mixed", action="store_true",
                   help="mixed workload (VERDICT r4 #3 done criterion): "
                        "half the requests generate max_new tokens, half "
                        "a short burst (max_new // 8) — the adaptive "
                        "engine must match-or-beat BOTH pure modes")
    p.add_argument("--out", type=str, default=None,
                   help="also write the JSON result to this path")
    cli = p.parse_args()

    import jax

    if cli.tiny:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.policy import NekoModel
    from neko_tpu.serving.server import NekoServer

    if cli.tiny:
        arch = dict(embed_dim=32, layers=2, heads=2, context_len=64,
                    text_tokens=128, continuous_tokens=32,
                    discrete_tokens=16, dtype="float32",
                    attention_impl="xla")
        cli.prompt_len = min(cli.prompt_len, 16)
        cli.max_new = min(cli.max_new, 8)
    else:
        arch = dict(context_len=1024, dtype="bfloat16", **(
            dict(embed_dim=1536, layers=12, heads=12)
            if cli.config == "medium"
            else dict(embed_dim=768, layers=6, heads=24)))
    rng = np.random.RandomState(0)
    if cli.model_path:
        from neko_tpu.cli.build import (
            build_context, load_state_for, resolve_checkpoint_and_args,
        )

        ckpt_path, args = resolve_checkpoint_and_args(
            cli.model_path, {"cpu": True} if cli.tiny else {})
        ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt_path)
        state, packer = load_state_for(ctx, ckpt_path)
        model, params, cfg = ctx.model, state.params, ctx.model_cfg
    else:
        cfg = ModelConfig(dropout=0.0, max_patches=0, **arch)
        model = NekoModel(cfg)
        packer = SequencePacker(cfg)
        init = packer.pack_batch(
            [{"text": list(rng.randint(1, cfg.text_tokens, size=8))}])
        init.pop("lengths")
        params = model.init(
            {"params": jax.random.key(0)}, to_device_batch(init))["params"]

    # identical seeded workload for every mode: varied prompt + length mix
    corpus_ids = None
    if cli.corpus:
        from neko_tpu.tasks.text import _synthetic_corpus
        from neko_tpu.tokenizers.text import get_text_tokenizer

        tok = get_text_tokenizer("gpt2")
        corpus_ids = tok.encode(" ".join(_synthetic_corpus()))
    jobs = []
    for i in range(cli.requests):
        L = int(rng.randint(cli.prompt_len // 2, cli.prompt_len + 1))
        if corpus_ids is not None:
            o = int(rng.randint(0, max(1, len(corpus_ids) - L)))
            text = [int(t) for t in corpus_ids[o : o + L]]
        else:
            text = [int(t) for t in rng.randint(1, cfg.text_tokens, L)]
        if cli.mixed and i % 2 == 1:
            want = int(rng.randint(
                max(1, cli.max_new // 16), max(2, cli.max_new // 8) + 1))
        else:
            want = int(
                rng.randint(max(1, cli.max_new // 2), cli.max_new + 1))
        jobs.append({"text": text, "max_new_tokens": want})

    out = {"config": "tiny" if cli.tiny else cli.config,
           "model_path": cli.model_path, "corpus": cli.corpus,
           "clients": cli.clients, "requests": cli.requests,
           "slots": cli.slots, "chunk": cli.chunk, "spec_k": cli.spec_k,
           "mixed": cli.mixed, "spec_threshold": cli.spec_threshold}
    modes = [
        ("coalesce", dict(max_batch=cli.slots)),
        ("continuous", dict(continuous_slots=cli.slots,
                            continuous_chunk=cli.chunk)),
    ]
    if cli.spec_k > 0:
        # 'continuous_spec_always': threshold 0 — every chunk is a verify
        # round (the round-4 behavior; what the adaptive mode must beat on
        # short/mixed traffic).  'continuous_spec': the adaptive default.
        modes.append(
            ("continuous_spec_always", dict(
                continuous_slots=cli.slots, continuous_chunk=cli.chunk,
                continuous_spec_k=cli.spec_k,
                continuous_spec_threshold=0)))
        modes.append(
            ("continuous_spec", dict(
                continuous_slots=cli.slots, continuous_chunk=cli.chunk,
                continuous_spec_k=cli.spec_k,
                continuous_spec_threshold=cli.spec_threshold)))
    for mode, kwargs in modes:
        gen = Generator(model, params, packer)
        with NekoServer(gen, port=0, **kwargs) as srv:
            host, port = srv.address[0], srv.address[1]
            url = f"http://{host}:{port}"
            # warm-up: run the FULL workload once so every compile variant
            # (pow2 buckets, batch-size groups) exists before timing — a
            # long-lived server has them cached; we measure scheduling,
            # not compilation
            run_load(url, jobs, cli.clients)
            passes = [run_load(url, jobs, cli.clients)
                      for _ in range(cli.rounds)]
            passes.sort(key=lambda r: r["wall_s"])
            out[mode] = passes[len(passes) // 2]
        del gen
    out["speedup_tokens"] = round(
        out["continuous"]["gen_tokens_per_sec"]
        / max(out["coalesce"]["gen_tokens_per_sec"], 1e-9), 3)
    if cli.spec_k > 0:
        out["spec_over_continuous"] = round(
            out["continuous_spec"]["gen_tokens_per_sec"]
            / max(out["continuous"]["gen_tokens_per_sec"], 1e-9), 3)
        out["adaptive_over_always_spec"] = round(
            out["continuous_spec"]["gen_tokens_per_sec"]
            / max(out["continuous_spec_always"]["gen_tokens_per_sec"],
                  1e-9), 3)
        # VERDICT r4 #3 done criterion: adaptive >= max(plain, always-spec)
        best = max(out["continuous"]["gen_tokens_per_sec"],
                   out["continuous_spec_always"]["gen_tokens_per_sec"])
        out["adaptive_over_best_pure"] = round(
            out["continuous_spec"]["gen_tokens_per_sec"] / max(best, 1e-9),
            3)
    print(json.dumps(out))
    if cli.out:
        with open(cli.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
