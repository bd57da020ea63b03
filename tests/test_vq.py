"""VQ-VAE image tokenizer + RoboCat-style discrete-image control.

On the reference's wishlist (misc/todo.md "could try RoboCat style VQGAN
image tokenization") but never built there — its only image path is
patch embeddings.  models/vq.py quantizes frames to code grids;
envs/vq_wrapper.py turns an image env into a MultiDiscrete-obs env the
existing control machinery trains on (and, unlike patch embeddings, the
codes are predictable tokens).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from neko_tpu.envs.synthetic import (
    SyntheticImageEnv,
    collect_expert_dataset,
)
from neko_tpu.envs.vq_wrapper import (
    VQImageCodec,
    VQObservationWrapper,
    encode_episode_dataset,
)
from neko_tpu.models.vq import VQConfig, VQVAE, make_train_step


def _frames(n=256, seed=0):
    env = SyntheticImageEnv()
    rng = np.random.RandomState(seed)
    out = []
    obs, _ = env.reset(seed=seed)
    while len(out) < n:
        out.append(np.repeat(obs[..., None], 3, -1).astype(np.float32) / 255.0)
        obs, _, _, trunc, _ = env.step(int(rng.randint(3)))
        if trunc:
            obs, _ = env.reset(seed=seed + len(out))
    return np.stack(out)


@pytest.fixture(scope="module")
def trained_vq():
    cfg = VQConfig(codebook_size=64, code_dim=16, hidden=32)
    model = VQVAE(cfg)
    frames = _frames(192)
    variables = model.init(
        {"params": jax.random.key(0), "codebook": jax.random.key(1)},
        frames[:2],
    )
    params, codebook = variables["params"], variables["codebook"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    rng = jax.random.key(2)
    npr = np.random.RandomState(0)
    first = last = None
    for i in range(80):
        rng, sub = jax.random.split(rng)
        batch = frames[npr.randint(0, len(frames), 32)]
        params, codebook, opt_state, m = step(
            params, codebook, opt_state, batch, sub)
        if i == 0:
            first = float(m["recon_mse"])
        last = float(m["recon_mse"])
    return model, params, codebook, frames, (first, last)


def test_vq_learns(trained_vq):
    _, _, codebook, _, (first, last) = trained_vq
    assert last < 0.5 * first, (first, last)
    assert np.isfinite(np.asarray(codebook["embedding"])).all()


def test_encode_decode_shapes_and_ranges(trained_vq):
    model, params, codebook, frames, _ = trained_vq
    codec = VQImageCodec(model, params, codebook)
    codes = codec.encode(frames[:4])
    h, w = codec.grid_for(frames.shape[1:3])
    assert codes.shape == (4, h * w)
    assert codes.min() >= 0 and codes.max() < model.cfg.codebook_size
    # deterministic
    np.testing.assert_array_equal(codes, codec.encode(frames[:4]))
    rec = codec.decode(codes, (h, w))
    assert rec.shape == (4, frames.shape[1], frames.shape[2], 3)
    # reconstruction from codes alone beats predicting the mean frame
    mean_mse = float(np.mean((frames[:4] - frames.mean(0)) ** 2))
    rec_mse = float(np.mean((rec - frames[:4]) ** 2))
    assert rec_mse < mean_mse


def test_straight_through_gradients(trained_vq):
    """The quantizer passes gradients to the ENCODER (straight-through)."""
    model, params, codebook, frames, _ = trained_vq

    def loss(p):
        (_, m), _ = model.apply(
            {"params": p, "codebook": codebook}, frames[:2], train=True,
            mutable=["codebook"], rngs={"codebook": jax.random.key(0)},
        )
        return m["loss"]

    grads = jax.grad(loss)(params)
    enc = jax.tree.leaves(grads["encoder"])
    assert any(float(jnp.abs(g).max()) > 0 for g in enc)


def test_wrapper_and_control_training(trained_vq):
    """Image env -> MultiDiscrete codes -> the existing control task
    trains on them and rolls out through live env steps."""
    from neko_tpu.cli import build as B
    from neko_tpu.inference.generator import Generator
    from neko_tpu.tasks.control import ControlTask
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    model, params, codebook, _, _ = trained_vq
    codec = VQImageCodec(model, params, codebook)
    env = SyntheticImageEnv()
    wrapped = VQObservationWrapper(env, codec)
    K = model.cfg.codebook_size
    assert list(np.asarray(wrapped.observation_space.nvec)) == [K] * 16
    ds = collect_expert_dataset(env, n_episodes=8, env_id="img")
    vq_ds = encode_episode_dataset(ds, codec, env_id="vq-img")
    assert vq_ds.get_episode(0).observations.shape[1] == 16

    task = ControlTask("vq-img", wrapped, vq_ds, context_len=192, seed=0)
    assert task.obs_str == "discrete_obs"
    assert task.observation_tokens == 16
    assert task.tokens_per_timestep == 18

    targs = TrainingArgs(
        cpu=True, sequence_length=192, embed_dim=32, layers=1, heads=2,
        batch_size=8, text_prop=0.0, control_datasets=["vq-img"],
        text_datasets=[], text_datasets_paths=[],
        training_steps=2, log_eval_freq=2, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=False, dropout=0.0,
    )
    ctx, _ = B.build_context(targs, tasks=[task])
    trainer = Trainer(ctx, [task], "vq_smoke", targs)
    trainer.train()
    gen = Generator(ctx.model, trainer.state.params, trainer.packer)
    m = task.evaluate(gen, n_iterations=1, deterministic=True,
                      promptless_eval=True)
    assert np.isfinite(m["mean_return"])
    assert m["mean_episode_len"] > 0
