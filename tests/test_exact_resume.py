"""Exact resume: a run resumed at step N reproduces the uninterrupted run's
example stream AND loss trajectory bit-for-bit — including across the
emergency-checkpoint path, and with in-loop evaluation enabled.

The reference resumes approximately by design (weights only,
/root/reference/gato/utils/utils.py:19-32); here the Orbax checkpoint
restores the device state and a host_state sidecar restores every sampler
RNG at the consumed-batch boundary (utils/host_state.py).
"""

import json
import os

import jax
import numpy as np
import pytest

from neko_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint
from neko_tpu.utils.host_state import load_host_state_for

from tests.test_trainer import make_args

from neko_tpu.cli.build import build_context
from neko_tpu.training.trainer import Trainer


def make_named_trainer(tmp_path, exp_name, **kw):
    args = make_args(tmp_path, **kw)
    ctx, tasks = build_context(args)
    return Trainer(ctx, tasks, exp_name, args)


def _install_stream_recorder(tr, record):
    """Record a hash of every sampled batch, in production order."""
    orig = tr._sample_arrays_locked

    def wrapped():
        arrays = orig()
        record.append(hash(arrays["tokens"].tobytes()))
        return arrays

    tr._sample_arrays_locked = wrapped


def _per_step_losses(exp_dir):
    lines = [json.loads(l) for l in open(os.path.join(exp_dir, "metrics.jsonl"))]
    return [l["training/train_loss_mean"] for l in lines if "training/train_loss_mean" in l]


COMMON = dict(
    training_steps=6,
    log_eval_freq=1,  # one metrics line per step -> per-step losses
    eval_episodes=1,
    eval_text_num_examples=1,
    log_jsonl=True,
)


def _resume_trainer(tmp_path, exp_name, from_exp_dir, **kw):
    """The cli/train.py --resume_from sequence, inline."""
    tr = make_named_trainer(tmp_path, exp_name, **kw)
    tr.init_state()
    path = latest_checkpoint(from_exp_dir)
    assert path is not None
    tr.state = load_checkpoint(path, jax.tree.map(lambda x: x, tr.state))
    tr.steps = int(tr.state.step)
    host = load_host_state_for(path, tr.proc_index)
    assert host is not None, "host_state sidecar missing — resume not exact"
    tr.load_host_state(host)
    return tr


def test_resume_bitwise_loss_and_stream(tmp_path):
    # A: uninterrupted 6 steps (recorder installed after init_state so
    # stream_a[k] is the batch consumed at step k+1, not the shape-init draw)
    tr_a = make_named_trainer(tmp_path, "exp_a", **COMMON)
    tr_a.init_state()
    stream_a = []
    _install_stream_recorder(tr_a, stream_a)
    tr_a.train()
    losses_a = _per_step_losses(tr_a.exp_dir)
    assert len(losses_a) == 6

    # B1: 2 steps + checkpoint
    tr_b1 = make_named_trainer(
        tmp_path, "exp_b1",
        **{**COMMON, "training_steps": 2, "save_model": True, "save_mode": "last"},
    )
    tr_b1.train()
    losses_b1 = _per_step_losses(tr_b1.exp_dir)
    assert losses_b1 == losses_a[:2]

    # B2: resume at step 2, train to 6
    tr_b2 = _resume_trainer(tmp_path, "exp_b2", tr_b1.exp_dir, **COMMON)
    assert tr_b2.steps == 2
    stream_b2 = []
    _install_stream_recorder(tr_b2, stream_b2)
    tr_b2.train()
    losses_b2 = _per_step_losses(tr_b2.exp_dir)

    # bit-equal loss trajectory on steps 3..6
    assert losses_b2 == losses_a[2:6]
    # identical example stream: B2's first produced batches == A's batches
    # 3.. (production order == consumption order with 1 worker; the
    # prefetcher may produce extras past the last consumed step)
    n = min(len(stream_b2), len(stream_a) - 2)
    assert n >= 4
    assert stream_b2[:n] == stream_a[2 : 2 + n]


def test_emergency_checkpoint_resume_exact(tmp_path):
    class Preempt(RuntimeError):
        pass

    # A: uninterrupted 6 steps (no eval, exercise the pure train path too)
    quiet = {**COMMON, "eval_episodes": 0, "eval_text_num_examples": 0}
    tr_a = make_named_trainer(tmp_path, "em_a", **quiet)
    tr_a.train()
    losses_a = _per_step_losses(tr_a.exp_dir)

    # B: killed entering step 4 -> emergency checkpoint at step 3
    tr_b = make_named_trainer(
        tmp_path, "em_b", **{**quiet, "save_model": True}
    )
    orig = tr_b.ctx.train_step
    calls = {"n": 0}

    def dying_step(state, batch):
        if calls["n"] == 3:
            raise Preempt("simulated preemption")
        calls["n"] += 1
        return orig(state, batch)

    tr_b.ctx.train_step = dying_step
    with pytest.raises(Preempt):
        tr_b.train()
    assert int(tr_b.state.step) == 3

    # resume from the emergency checkpoint; steps 4..6 must match A
    tr_c = _resume_trainer(tmp_path, "em_c", tr_b.exp_dir, **quiet)
    assert tr_c.steps == 3
    tr_c.train()
    losses_c = _per_step_losses(tr_c.exp_dir)
    assert losses_c == losses_a[3:6]


def test_eval_does_not_perturb_training_stream(tmp_path):
    """In-loop evaluation draws from separate eval_rng streams: the training
    example stream is identical with eval on and off."""
    tr_on = make_named_trainer(tmp_path, "ev_on", **COMMON)
    s_on = []
    _install_stream_recorder(tr_on, s_on)
    tr_on.train()

    tr_off = make_named_trainer(
        tmp_path, "ev_off",
        **{**COMMON, "eval_episodes": 0, "eval_text_num_examples": 0},
    )
    s_off = []
    _install_stream_recorder(tr_off, s_off)
    tr_off.train()

    n = min(len(s_on), len(s_off))
    assert n >= 6
    assert s_on[:n] == s_off[:n]
    # and the losses themselves match
    assert _per_step_losses(tr_on.exp_dir) == _per_step_losses(tr_off.exp_dir)


def test_host_state_roundtrip_unit(tmp_path):
    """collect/restore reproduces identical draws for both RNG families."""
    from neko_tpu.utils import host_state as hs

    class T:
        name = "t"
        host_state = __import__("neko_tpu.tasks.base", fromlist=["Task"]).Task.host_state
        load_host_state = __import__("neko_tpu.tasks.base", fromlist=["Task"]).Task.load_host_state

    t1, t2 = T(), T()
    t1.rng = np.random.RandomState(7)
    t2.rng = np.random.default_rng(9)
    trainer_rng = np.random.default_rng(3)
    for r in (t1.rng, t2.rng, trainer_rng):
        r.integers(10, size=5) if hasattr(r, "integers") else r.randint(10, size=5)

    snap = hs.collect(trainer_rng, [t1, t2])
    a = (trainer_rng.integers(1000, size=8).tolist(),
         t1.rng.randint(1000, size=8).tolist(),
         t2.rng.integers(1000, size=8).tolist())
    hs.restore(snap, trainer_rng, [t1, t2])
    b = (trainer_rng.integers(1000, size=8).tolist(),
         t1.rng.randint(1000, size=8).tolist(),
         t2.rng.integers(1000, size=8).tolist())
    assert a == b

    # persistence round-trips through pickle
    hs.save_host_state(str(tmp_path), 5, snap, 0)
    os.makedirs(os.path.join(str(tmp_path), "checkpoint_5"), exist_ok=True)
    loaded = hs.load_host_state_for(os.path.join(str(tmp_path), "checkpoint_5"), 0)
    hs.restore(loaded, trainer_rng, [t1, t2])
    c = (trainer_rng.integers(1000, size=8).tolist(),
         t1.rng.randint(1000, size=8).tolist(),
         t2.rng.integers(1000, size=8).tolist())
    assert c == b
