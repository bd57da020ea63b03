"""Stochastic depth (drop-path) — `ModelConfig.stochastic_depth` /
`--stochastic_depth`.

On the reference's own wishlist (misc/todo.md "things to add: stochastic
depth") but never built there.  Residual branches drop per EXAMPLE with a
linearly depth-ramped rate (layer 0 never drops), survivors scaled by
1/keep; eval/decode paths (deterministic=True) are bit-identical to
sd=0.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.policy import NekoModel

CFG = ModelConfig(
    embed_dim=32, layers=3, heads=2, dropout=0.0, context_len=32,
    max_patches=0, dtype="float32", attention_impl="xla",
    text_tokens=64, continuous_tokens=32, discrete_tokens=16,
)


def _setup(cfg):
    model = NekoModel(cfg)
    packer = SequencePacker(cfg)
    arrays = packer.pack_batch(
        [{"text": [1, 2, 3, 4]}, {"text": [9, 8, 7]}]
    )
    arrays.pop("lengths")
    batch = to_device_batch(arrays)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    return model, params, batch


def test_eval_path_unaffected():
    """deterministic=True forwards are bit-identical with sd on or off
    (generation/eval never see drop-path)."""
    model0, params, batch = _setup(CFG)
    cfg_sd = dataclasses.replace(CFG, stochastic_depth=0.5)
    model_sd = NekoModel(cfg_sd)
    l0 = model0.apply({"params": params}, batch, deterministic=True)[0]
    l1 = model_sd.apply({"params": params}, batch, deterministic=True)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_train_mode_drops_and_is_seed_dependent():
    cfg_sd = dataclasses.replace(CFG, stochastic_depth=0.9)
    model_sd = NekoModel(cfg_sd)
    model0, params, batch = _setup(CFG)
    rngs1 = {"dropout": jax.random.key(1), "patch_pos": jax.random.key(2)}
    rngs2 = {"dropout": jax.random.key(3), "patch_pos": jax.random.key(2)}
    base = model0.apply(
        {"params": params}, batch, deterministic=False, rngs=rngs1
    )[0]
    a = model_sd.apply(
        {"params": params}, batch, deterministic=False, rngs=rngs1
    )[0]
    b = model_sd.apply(
        {"params": params}, batch, deterministic=False, rngs=rngs2
    )[0]
    # at 90% max rate some branch dropped: train logits differ from sd=0
    assert not np.allclose(np.asarray(a), np.asarray(base))
    # and across dropout seeds
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()


def test_expectation_roughly_unbiased():
    """Averaged over many dropout draws, drop-path logits approach the
    deterministic forward (the 1/keep scaling is the unbiasedness
    mechanism; at L=3 and max rate 0.4 the Monte-Carlo mean should land
    within a loose tolerance)."""
    cfg_sd = dataclasses.replace(CFG, stochastic_depth=0.4)
    model_sd = NekoModel(cfg_sd)
    _, params, batch = _setup(CFG)
    det = np.asarray(
        model_sd.apply({"params": params}, batch, deterministic=True)[0]
    )
    acc = np.zeros_like(det)
    R = 200
    for r in range(R):
        acc += np.asarray(model_sd.apply(
            {"params": params}, batch, deterministic=False,
            rngs={"dropout": jax.random.key(r),
                  "patch_pos": jax.random.key(0)},
        )[0])
    mean = acc / R
    # drop-path is unbiased per-BRANCH, not per-network (composition is
    # nonlinear), so compare loosely: the MC mean must sit far closer to
    # the deterministic forward than a single draw does
    single = np.asarray(model_sd.apply(
        {"params": params}, batch, deterministic=False,
        rngs={"dropout": jax.random.key(1), "patch_pos": jax.random.key(0)},
    )[0])
    err_mean = np.abs(mean - det).mean()
    err_single = np.abs(single - det).mean()
    assert err_mean < 0.5 * err_single


def test_train_step_runs_with_flag(tmp_path):
    """End-to-end: a compiled train step with --stochastic_depth runs and
    logs finite losses."""
    import json
    import os

    from neko_tpu.cli import build as B
    from neko_tpu.training.arguments import TrainingArgs
    from neko_tpu.training.trainer import Trainer

    targs = TrainingArgs(
        cpu=True, sequence_length=64, embed_dim=32, layers=3, heads=2,
        batch_size=8, text_prop=1.0,
        text_datasets=["synthetic"], text_datasets_paths=["synthetic"],
        control_datasets=[],
        training_steps=6, log_eval_freq=6, eval_episodes=0,
        eval_text_num_examples=0, mixed_precision="no",
        save_model=False, log_jsonl=True, save_dir=str(tmp_path),
        dropout=0.0, stochastic_depth=0.3,
    )
    ctx, tasks = B.build_context(targs)
    assert ctx.model_cfg.stochastic_depth == 0.3
    trainer = Trainer(ctx, tasks, "sd_smoke", targs)
    trainer.train()
    assert trainer.steps == 6
    jl = os.path.join(str(tmp_path), "sd_smoke", "metrics.jsonl")
    losses = [m["training/train_loss_mean"]
              for m in map(json.loads, open(jl))
              if "training/train_loss_mean" in m]
    assert losses and np.isfinite(losses).all()
