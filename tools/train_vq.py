#!/usr/bin/env python
"""Train the VQ-VAE image tokenizer (models/vq.py) offline.

    python tools/train_vq.py --out /tmp/vq_ckpt [--steps 500]
        [--dataset neko-synth-image-v0] [--codebook 512] [--cpu]

Collects frames from a control dataset's episodes (synthetic image env by
default — zero external deps), trains the VQ-VAE, reports recon MSE +
codebook perplexity, and saves {params, codebook, cfg} with Orbax.  Use
the checkpoint via `neko_tpu.envs.vq_wrapper` (wrap an image env /
re-encode an episode dataset) — the RoboCat-style discrete image
pipeline the reference's wishlist names (misc/todo.md).
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_vq(path):
    """-> (VQVAE model, params, codebook)."""
    import jax
    import orbax.checkpoint as ocp

    from neko_tpu.models.vq import VQConfig, VQVAE

    with open(os.path.join(path, "vq_config.json")) as fh:
        cfg = VQConfig(**json.load(fh))
    model = VQVAE(cfg)
    # abstract target from a dummy init
    dummy = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "codebook": jax.random.key(1)},
            np.zeros((1, cfg.downscale * 2, cfg.downscale * 2, cfg.channels),
                     np.float32),
        )
    )
    restored = ocp.StandardCheckpointer().restore(
        os.path.join(path, "state"), dummy
    )
    return model, restored["params"], restored["codebook"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--dataset", default="neko-synth-image-v0")
    p.add_argument("--episodes", type=int, default=32)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--codebook", type=int, default=512)
    p.add_argument("--code_dim", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    cli = p.parse_args()

    import jax

    if cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    import optax
    import orbax.checkpoint as ocp

    from neko_tpu.envs.setup_env import load_env_dataset
    from neko_tpu.envs.vq_wrapper import _to_float_rgb
    from neko_tpu.models.vq import VQConfig, VQVAE, make_train_step

    _, dataset = load_env_dataset(cli.dataset, {"n_episodes": cli.episodes})
    frames = []
    for i in range(dataset.total_episodes):
        for o in np.asarray(dataset.get_episode(i).observations):
            frames.append(_to_float_rgb(o))
    frames = np.stack(frames)
    print(f"{len(frames)} frames {frames.shape[1:]} from {cli.dataset}")

    cfg = VQConfig(codebook_size=cli.codebook, code_dim=cli.code_dim,
                   hidden=cli.hidden)
    model = VQVAE(cfg)
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "codebook": jax.random.key(1)}, frames[:2]
    )
    params, codebook = variables["params"], variables["codebook"]
    opt = optax.adam(cli.lr)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)

    npr = np.random.RandomState(0)
    first = last = None
    for i in range(cli.steps):
        idx = npr.randint(0, len(frames), size=cli.batch)
        rng, sub = jax.random.split(rng)
        params, codebook, opt_state, m = step(
            params, codebook, opt_state, frames[idx], sub
        )
        if i == 0:
            first = float(m["recon_mse"])
        if i % max(1, cli.steps // 5) == 0 or i == cli.steps - 1:
            print(f"step {i}: recon_mse {float(m['recon_mse']):.5f} "
                  f"perplexity {float(m['perplexity']):.1f}")
        last = float(m["recon_mse"])
    print(f"recon_mse {first:.5f} -> {last:.5f}")

    os.makedirs(cli.out, exist_ok=True)
    with open(os.path.join(cli.out, "vq_config.json"), "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(cli.out, "state")),
        {"params": params, "codebook": codebook},
        force=True,
    )
    ckptr.wait_until_finished()
    ckptr.close()
    print(f"saved {cli.out}")


if __name__ == "__main__":
    main()
