#!/usr/bin/env python
"""World-model walkthrough: VQ image codes + observation-prediction loss.

Composes three capabilities the reference's wishlist names but never
built (misc/todo.md: "RoboCat style VQGAN image tokenization",
"implement other spaces"), all offline on CPU:

1. train a VQ-VAE on an image env's frames (models/vq.py)
2. wrap the env: image obs -> MultiDiscrete code grids
   (envs/vq_wrapper.py), re-encode its offline dataset
3. train the generalist model on the codes WITH --observation_loss,
   so observation tokens are loss targets (RoboCat's recipe)
4. roll the WORLD MODEL: given [obs | SEP | action], autoregressively
   predict the NEXT timestep's observation codes and decode them back
   to an image; report code accuracy and pixel MSE vs the env's actual
   next frame.

    python examples/world_model.py          # ~5-10 min on CPU
"""

import os
import sys

# control-only demo: the byte-fallback text tokenizer is sufficient, so skip
# HF hub lookups entirely (they cost minutes of retries without network)
os.environ.setdefault("HF_HUB_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import optax

    from neko_tpu.cli import build as B
    from neko_tpu.envs.synthetic import (
        SyntheticImageEnv, collect_expert_dataset,
    )
    from neko_tpu.envs.vq_wrapper import (
        VQImageCodec, VQObservationWrapper, encode_episode_dataset,
        _to_float_rgb,
    )
    from neko_tpu.inference.generator import Generator
    from neko_tpu.models.vq import VQConfig, VQVAE, make_train_step
    from neko_tpu.tasks.control import ControlTask
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    # ---- 1. train the VQ tokenizer on env frames -------------------------
    env = SyntheticImageEnv()
    ds = collect_expert_dataset(env, n_episodes=16, env_id="img")
    frames = np.stack([
        _to_float_rgb(o)
        for i in range(ds.total_episodes)
        for o in np.asarray(ds.get_episode(i).observations)
    ])
    cfg = VQConfig(codebook_size=64, code_dim=16, hidden=32)
    vq = VQVAE(cfg)
    variables = vq.init(
        {"params": jax.random.key(0), "codebook": jax.random.key(1)},
        frames[:2],
    )
    params, codebook = variables["params"], variables["codebook"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(vq, opt)
    rng, npr = jax.random.key(2), np.random.RandomState(0)
    for i in range(200):
        rng, sub = jax.random.split(rng)
        params, codebook, opt_state, m = step(
            params, codebook, opt_state,
            frames[npr.randint(0, len(frames), 32)], sub,
        )
    print(f"VQ trained: recon_mse {float(m['recon_mse']):.5f}")
    codec = VQImageCodec(vq, params, codebook)

    # ---- 2. image env -> MultiDiscrete code env ---------------------------
    wrapped = VQObservationWrapper(env, codec)
    vq_ds = encode_episode_dataset(ds, codec, env_id="vq-img")
    grid = wrapped.grid
    n_codes = grid[0] * grid[1]
    print(f"obs space: {n_codes} codes/frame, grid {grid}")

    # ---- 3. world-model training (--observation_loss) --------------------
    task = ControlTask("vq-img", wrapped, vq_ds, context_len=192, seed=0)
    targs = TrainingArgs(
        cpu=True, sequence_length=192, embed_dim=64, layers=2, heads=2,
        batch_size=8, text_prop=0.0, control_datasets=["vq-img"],
        text_datasets=[], text_datasets_paths=[],
        training_steps=200, log_eval_freq=50, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
        observation_loss=True, warmup_steps=20, learning_rate=3e-3,
    )
    ctx, _ = B.build_context(targs, tasks=[task])
    trainer = Trainer(ctx, [task], "world_model", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    ts = ctx.model_cfg.token_space

    # ---- 4. roll the world model (Generator.imagine) ----------------------
    # history of real timesteps, then DREAM: autoregressively predict the
    # next K frames' codes given the episode's real actions, each predicted
    # frame fed back as history
    ep = vq_ds.get_episode(0)
    H, K = 6, 3
    hist = {
        "discrete_obs": ep.observations[:H].astype(np.int32),
        "discrete_actions": np.asarray(ep.actions[:H], np.int32).reshape(
            H, -1),
    }
    acts = np.asarray(ep.actions[H : H + K], np.int32).reshape(K, -1)
    dream = gen.imagine(hist, acts, obs_nvec=[cfg.codebook_size] * n_codes)
    true_codes = np.asarray(ep.observations[H : H + K], np.int64)
    acc = float((dream[0] == true_codes[0]).mean())
    pred_img = codec.decode(dream[:1].astype(np.int64), grid)[0]
    true_img = codec.decode(true_codes[:1], grid)[0]
    mse = float(np.mean((pred_img - true_img) ** 2))
    print(f"dreamed {K} frames; next-frame code accuracy {acc:.2f}, "
          f"decoded-pixel MSE {mse:.5f}")
    print("world model OK" if acc > 1.0 / cfg.codebook_size else
          "world model under-trained (raise --training_steps)")


if __name__ == "__main__":
    sys.exit(main())
