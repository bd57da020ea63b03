"""Trainer integration tests: mixture sizes, control assignment, full loop
with prefetch, checkpoint save/resume — all synthetic, CPU."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from neko_tpu.cli.build import build_context
from neko_tpu.training.arguments import TrainingArgs
from neko_tpu.training.trainer import Trainer


def make_args(tmp_path, **kw):
    defaults = dict(
        cpu=True,
        control_datasets=["neko-synth-continuous-v0"],
        text_datasets=["synthetic"],
        text_datasets_paths=["synthetic"],
        text_prop=0.5,
        embed_dim=32,
        layers=1,
        heads=2,
        batch_size=8,
        sequence_length=64,
        training_steps=4,
        log_eval_freq=2,
        warmup_steps=2,
        eval_episodes=1,
        eval_text_num_examples=1,
        mixed_precision="no",
        dropout=0.0,
        save_dir=str(tmp_path),
        use_wandb=False,
        log_jsonl=True,
        seed=0,
    )
    defaults.update(kw)
    return TrainingArgs(**defaults)


def make_trainer(tmp_path, **kw):
    args = make_args(tmp_path, **kw)
    ctx, tasks = build_context(args)
    return Trainer(ctx, tasks, "test_exp", args)


def test_mixture_sizes_sum(tmp_path):
    tr = make_trainer(tmp_path, text_prop=0.3)
    for _ in range(20):
        sizes = tr._mixture_sizes()
        assert sum(sizes.values()) == tr.args.batch_size
        assert sizes["caption"] == 0 and sizes["vqa"] == 0
        assert sizes["text"] in (2, 3)  # 0.3*8 = 2.4 -> 2 (+maybe residual)


def test_control_batch_assignment(tmp_path):
    tr = make_trainer(tmp_path, text_prop=0.0)
    examples = tr.sample_control_batch(8)
    assert len(examples) == 8
    for ex in examples:
        assert "continuous_obs" in ex and "continuous_actions" in ex


def test_full_training_loop_with_eval_and_checkpoint(tmp_path):
    tr = make_trainer(tmp_path, save_model=True, save_mode="last")
    tr.train()
    assert tr.steps == 4
    exp_dir = os.path.join(str(tmp_path), "test_exp")
    assert os.path.exists(os.path.join(exp_dir, "args.json"))
    assert os.path.exists(os.path.join(exp_dir, "checkpoint_4"))
    assert os.path.exists(os.path.join(exp_dir, "metrics.jsonl"))
    # metrics include reference-namespaced keys
    import json

    lines = [json.loads(l) for l in open(os.path.join(exp_dir, "metrics.jsonl"))]
    keys = set().union(*(set(l) for l in lines))
    assert "training/train_loss_mean" in keys
    assert "evaluation/text/perplexity" in keys
    assert any(k.startswith("evaluation/neko-synth") for k in keys)


def test_checkpoint_resume_round_trip(tmp_path):
    from neko_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint

    tr = make_trainer(tmp_path, save_model=True, save_mode="last")
    tr.train()
    before = jax.device_get(tr.state.params)

    tr2 = make_trainer(tmp_path)
    tr2.init_state()
    path = latest_checkpoint(os.path.join(str(tmp_path), "test_exp"))
    state = load_checkpoint(path, jax.tree.map(lambda x: x, tr2.state))
    assert int(state.step) == 4
    after = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_patch_budget_zero_without_image_tasks(tmp_path):
    tr = make_trainer(tmp_path)
    assert tr.patch_budget == 0
    arrays = tr.sample_arrays()
    assert "patches" not in arrays


def test_patch_budget_with_image_control(tmp_path):
    tr = make_trainer(
        tmp_path,
        control_datasets=["neko-synth-image-v0"],
        text_prop=0.5,
    )
    # image task: 1 patch/ts, tokens_per_ts=3, ctx 64 -> 21 ts -> 21 patches
    # worst case (4+1 control examples) -> 105, rounded up to 256
    assert tr.patch_budget == 256
    arrays = tr.sample_arrays()
    assert arrays["patches"].shape[0] == 256


def test_budget_remainder_lands_on_one_component(tmp_path):
    """Static budgets add the multinomial remainder to the single costliest
    component, not every component (_mixture_sizes hands the WHOLE remainder
    to exactly one component per step).  The old +3-everywhere bound pushed
    the flagship mixture's target budget past the dense-loss cutoff and cost
    ~20 ms/step of chunked-loss remat on the chip (r4 trainer-run trace)."""
    tr = make_trainer(
        tmp_path,
        control_datasets=["neko-synth-image-v0"],
        text_prop=0.3,
        sequence_length=256,
    )
    base, remainder = tr._component_counts()
    bs = tr.args.batch_size
    assert base["text"] == int(0.3 * bs) and base["caption"] == 0
    assert base["control"] == int(0.7 * bs)
    assert remainder == bs - base["text"] - base["control"]
    # every realizable mixture stays within the computed budgets
    per_patch = max(t.required_patches for t in tr.control_tasks)
    for _ in range(30):
        sizes = tr._mixture_sizes()
        assert sizes["control"] * per_patch <= tr.patch_budget
    # target budget: remainder counts once, on the costlier component —
    # strictly tighter than remainder-on-all
    S = tr.args.sequence_length
    loose = 0
    per_row_text = S - 1
    per_row_ctrl = max(
        t.context_timesteps * t.action_tokens for t in tr.control_tasks
    )
    loose += (base["text"] + remainder) * per_row_text
    loose += (base["control"] + remainder) * per_row_ctrl
    loose = -(-loose // 256) * 256
    assert 0 < tr.target_budget <= loose


def test_remainder_steps_not_dropped(tmp_path):
    """training_steps not divisible by log_eval_freq: the tail still runs
    (VERDICT.md round-2 trainer polish)."""
    tr = make_trainer(tmp_path, training_steps=5, log_eval_freq=2)
    tr.train()
    assert tr.steps == 5
    assert int(tr.state.step) == 5


def test_lr_logged_from_optimizer_step(tmp_path):
    """Under gradient accumulation the schedule advances per OPTIMIZER step;
    the logged LR must match the step the update actually uses."""
    tr = make_trainer(
        tmp_path, gradient_accumulation_steps=2, training_steps=4,
        log_eval_freq=4, warmup_steps=4,
    )
    tr.init_state()
    lrs = []
    for _ in range(4):
        tr.steps += 1
        _, logs = tr.train_step()
        lrs.append(logs["training/learning_rate"])
    # micro-steps 1,2 -> optimizer step 0; micro-steps 3,4 -> optimizer step 1
    assert lrs[0] == lrs[1] == tr.ctx.current_lr(0)
    assert lrs[2] == lrs[3] == tr.ctx.current_lr(1)
    assert lrs[2] != lrs[0]


def test_multihost_flag_calls_distributed_initialize(tmp_path, monkeypatch):
    """--multihost must call jax.distributed.initialize() before first
    device use (cli/build.py::select_platform)."""
    from neko_tpu.cli.build import select_platform

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: calls.append(1)
    )
    select_platform(make_args(tmp_path, multihost=True))
    assert len(calls) == 1

    select_platform(make_args(tmp_path, multihost=False))
    assert len(calls) == 1  # not called without --multihost
