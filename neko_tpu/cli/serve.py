"""`neko-serve` / `python serve.py` — HTTP inference server.

Loads a checkpoint exactly like eval.py (args.json restore + CLI overrides),
builds a Generator (optionally tensor-parallel / int8-KV), and serves the
JSON API from neko_tpu/serving/server.py.  The reference ships a serving
Docker image but no server; this is the entrypoint that image was missing.
"""

from __future__ import annotations

import argparse
from typing import Optional


def build_generator(cli, model_path=None):
    """Checkpoint -> Generator (the eval.py restore path, minus tasks)."""
    from neko_tpu.cli.build import (
        build_context,
        load_state_for,
        resolve_checkpoint_and_args,
    )
    from neko_tpu.inference.generator import Generator

    ckpt_path, args = resolve_checkpoint_and_args(
        model_path or cli.model_path,
        {k: getattr(cli, k, None)
         for k in ("cpu", "kv_cache_dtype", "compilation_cache")},
    )
    ctx, _ = build_context(args, tasks=[], ckpt_path=ckpt_path)
    state, packer = load_state_for(ctx, ckpt_path)
    params = state.params
    if getattr(cli, "use_ema", False):
        assert state.ema_params is not None, (
            "checkpoint has no EMA shadow (train with --ema_decay > 0)"
        )
        params = state.ema_params

    mesh = None
    if cli.mesh_model_axis and cli.mesh_model_axis > 1:
        from neko_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(model=cli.mesh_model_axis)
    return Generator(
        ctx.model, params, packer, mesh=mesh,
        temperature=1.0 if cli.temperature is None else cli.temperature,
        top_k=0 if cli.sample_top_k is None else cli.sample_top_k,
        top_p=1.0 if cli.sample_top_p is None else cli.sample_top_p,
        weight_dtype=getattr(cli, "serve_weight_dtype", None),
    )


def main(argv: Optional[list] = None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True,
                   help="checkpoint_<N> dir, or an exp dir (latest used)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8,
                   help="micro-batch cap: concurrent compatible requests "
                        "coalesce into one decode call")
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--cpu", action="store_true", default=None)
    p.add_argument("--mesh_model_axis", type=int, default=None,
                   help="tensor-parallel serving degree")
    p.add_argument("--kv_cache_dtype", type=str, default=None,
                   choices=["native", "int8"])
    p.add_argument("--serve_weight_dtype", type=str, default=None,
                   choices=["bf16", "fp8"],
                   help="fp8: serve the matmul kernels as e4m3 + "
                        "per-channel scales (inference/quant.py)")
    p.add_argument("--temperature", type=float, default=None)
    p.add_argument("--sample_top_k", type=int, default=None)
    p.add_argument("--sample_top_p", type=float, default=None)
    p.add_argument("--use_ema", action="store_true", default=False,
                   help="serve the EMA shadow params")
    p.add_argument("--continuous_slots", type=int, default=0,
                   help="> 0: continuous batching for plain generate "
                        "requests over this many cache slots "
                        "(serving/continuous.py)")
    p.add_argument("--continuous_chunk", type=int, default=8,
                   help="decode tokens per engine device call")
    p.add_argument("--continuous_spec_k", type=int, default=0,
                   help="> 0: ADAPTIVE prompt-lookup speculation in the "
                        "continuous engine — per device call it picks "
                        "verify rounds (advance 1..K+1/row, 3.71x "
                        "steady-state) or plain chunks, per the "
                        "spec_threshold policy; sampled rows use the "
                        "per-row rejection rule (distribution-exact)")
    p.add_argument("--continuous_spec_threshold", type=int, default=48,
                   help="run verify rounds only while some active row "
                        "still wants >= this many tokens (short bursts "
                        "are admission-bound and lose ~19%% to spec's "
                        "costlier call — PROFILE.md serving tables)")
    p.add_argument("--draft_model_path", type=str, default=None,
                   help="checkpoint of a (smaller) draft model sharing the "
                        "token space: speculative requests then verify "
                        "real draft proposals (generate_spec_draft)")
    p.add_argument("--self_draft_layers", type=int, default=None,
                   help="draft = the target's own first N layers "
                        "(Generator.truncated_draft — no second "
                        "checkpoint); excludes --draft_model_path")
    p.add_argument("--compilation_cache", type=str, default=None,
                   help="persistent XLA/Mosaic compile-cache dir: server "
                        "restarts skip every already-seen compile "
                        "(cold flagship serving pays minutes of compiles)")
    p.add_argument("--request_timeout", type=float, default=120.0,
                   help="per-request wall cap (s) before a 504; raise for "
                        "COLD processes whose first request of a shape "
                        "family pays the compile, or pre-warm with "
                        "--compilation_cache")
    cli = p.parse_args(argv)

    from neko_tpu.serving.server import NekoServer

    gen = build_generator(cli)
    assert not (cli.draft_model_path and cli.self_draft_layers), (
        "--draft_model_path and --self_draft_layers are exclusive"
    )
    draft = (build_generator(cli, model_path=cli.draft_model_path)
             if cli.draft_model_path else None)
    if cli.self_draft_layers:
        draft = gen.truncated_draft(cli.self_draft_layers)
    server = NekoServer(
        gen, host=cli.host, port=cli.port,
        max_batch=cli.max_batch, batch_window_ms=cli.batch_window_ms,
        continuous_slots=cli.continuous_slots,
        continuous_chunk=cli.continuous_chunk,
        continuous_spec_k=cli.continuous_spec_k,
        continuous_spec_threshold=cli.continuous_spec_threshold,
        draft_generator=draft,
        request_timeout=cli.request_timeout,
    ).start()
    host, port = server.address[0], server.address[1]
    print(f"serving on http://{host}:{port} "
          f"(POST /v1/generate, /v1/action; GET /healthz)")
    try:
        server._serve_thread.join()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
