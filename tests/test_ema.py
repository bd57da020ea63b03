"""EMA of params (--ema_decay): shadow copy updated inside the compiled
train step, riding the TrainState through checkpoints.

A capability the reference lacks.  Pinned here: the closed-form EMA math,
checkpoint round-trip of the shadow, backward compatibility of PRE-EMA
checkpoints (ema_params=None is a leafless pytree node), sharding of the
shadow leaves, and the eval.py --use_ema selection."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from neko_tpu.parallel.mesh import create_mesh, single_device_mesh
from neko_tpu.training.train_state import OptimizerConfig, TrainContext
from tests.test_sharding import CFG, OPT, make_batch

EMA_OPT = dataclasses.replace(OPT, ema_decay=0.5)


def _leaf(params):
    return np.asarray(params["transformer"]["ln_f"]["scale"], np.float64)


def test_ema_math_closed_form():
    mesh = single_device_mesh()
    ctx = TrainContext(CFG, EMA_OPT, mesh, seed=0)
    batch = make_batch(4)
    state = ctx.init_state(batch)
    # EMA starts as a copy of the init params
    np.testing.assert_array_equal(_leaf(state.ema_params), _leaf(state.params))

    expect = _leaf(state.params)
    for _ in range(3):
        state, _ = ctx.train_step(state, batch)
        expect = expect * 0.5 + _leaf(state.params) * 0.5
    np.testing.assert_allclose(_leaf(state.ema_params), expect, atol=1e-6)
    # the shadow lags the live params
    assert not np.allclose(_leaf(state.ema_params), _leaf(state.params))


def test_ema_decays_once_per_optimizer_update():
    """Under gradient accumulation the shadow decays per OPTIMIZER update,
    not per micro-step (d^k compounding)."""
    mesh = single_device_mesh()
    opt = dataclasses.replace(OPT, ema_decay=0.5,
                              gradient_accumulation_steps=2)
    ctx = TrainContext(CFG, opt, mesh, seed=0)
    batch = make_batch(4)
    state = ctx.init_state(batch)
    e0 = _leaf(state.ema_params)

    # micro-step 1 (no optimizer update): params AND ema unchanged
    state, _ = ctx.train_step(state, batch)
    np.testing.assert_array_equal(_leaf(state.ema_params), e0)
    # micro-step 2 (boundary): exactly ONE decay toward the new params
    state, _ = ctx.train_step(state, batch)
    expect = e0 * 0.5 + _leaf(state.params) * 0.5
    np.testing.assert_allclose(_leaf(state.ema_params), expect, atol=1e-6)


def test_ema_disabled_is_none():
    mesh = single_device_mesh()
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    state = ctx.init_state(make_batch(4))
    assert state.ema_params is None
    state, _ = ctx.train_step(state, make_batch(4))
    assert state.ema_params is None


def test_ema_shadow_is_sharded():
    mesh = create_mesh(data=4, model=2)
    ctx = TrainContext(CFG, EMA_OPT, mesh, seed=0)
    state = ctx.init_state(make_batch(8))
    from jax.sharding import PartitionSpec as P

    emb = state.ema_params["embed_token"]["embedding"]
    assert emb.sharding.spec == P("model", None)


def test_ema_checkpoint_round_trip(tmp_path):
    from neko_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    mesh = single_device_mesh()
    ctx = TrainContext(CFG, EMA_OPT, mesh, seed=0)
    batch = make_batch(4)
    state = ctx.init_state(batch)
    state, _ = ctx.train_step(state, batch)
    path = save_checkpoint(str(tmp_path / "exp"), state, step=1)

    fresh = ctx.init_state(batch)
    restored = load_checkpoint(path, jax.tree.map(lambda x: x, fresh))
    np.testing.assert_array_equal(
        _leaf(restored.ema_params), _leaf(state.ema_params)
    )
    np.testing.assert_array_equal(_leaf(restored.params), _leaf(state.params))


def test_pre_ema_layout_restores(tmp_path):
    """Checkpoints written before TrainState grew `ema_params` (their tree
    metadata has no such entry) must keep restoring when EMA is off."""
    import orbax.checkpoint as ocp

    from neko_tpu.utils.checkpoint import load_checkpoint

    mesh = single_device_mesh()
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    batch = make_batch(4)
    state = ctx.init_state(batch)
    state, _ = ctx.train_step(state, batch)
    # write the LEGACY field layout: a plain dict without ema_params —
    # exactly what the pre-EMA flax.struct TrainState serialized to
    legacy = {
        "step": state.step, "params": state.params,
        "opt_state": state.opt_state, "seed": state.seed,
    }
    path = str(tmp_path / "checkpoint_1")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, legacy, force=True)
    ckptr.wait_until_finished()

    restored = load_checkpoint(
        path, jax.tree.map(lambda x: x, ctx.init_state(batch))
    )
    assert int(restored.step) == 1
    assert restored.ema_params is None
    np.testing.assert_array_equal(_leaf(restored.params), _leaf(state.params))


_RUN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "2026-08-16_21-15-36_neko",
)


@pytest.mark.skipif(
    not os.path.isdir(_RUN_DIR),
    reason="local pre-EMA run artifact not present (models/ is gitignored)",
)
def test_pre_ema_run_artifact_restores():
    """Same property against a real pre-EMA training-run artifact, when
    this machine still has one."""
    from neko_tpu.cli.build import (
        build_context,
        load_state_for,
        resolve_checkpoint_and_args,
    )

    ckpt, args = resolve_checkpoint_and_args(_RUN_DIR, {"cpu": True})
    ctx, _ = build_context(args, tasks=[])
    state, _ = load_state_for(ctx, ckpt)
    assert int(state.step) > 0
    assert state.ema_params is None


def test_resume_continues_ema(tmp_path):
    """Resume from an EMA checkpoint keeps updating the restored shadow."""
    from neko_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    mesh = single_device_mesh()
    ctx = TrainContext(CFG, EMA_OPT, mesh, seed=0)
    batch = make_batch(4)
    state = ctx.init_state(batch)
    state, _ = ctx.train_step(state, batch)
    path = save_checkpoint(str(tmp_path / "exp"), state, step=1)

    ctx2 = TrainContext(CFG, EMA_OPT, mesh, seed=0)
    restored = load_checkpoint(
        path, jax.tree.map(lambda x: x, ctx2.init_state(batch))
    )
    before = _leaf(restored.ema_params)
    restored, _ = ctx2.train_step(restored, batch)
    after = _leaf(restored.ema_params)
    assert not np.allclose(before, after)
    expect = before * 0.5 + _leaf(restored.params) * 0.5
    np.testing.assert_allclose(after, expect, atol=1e-6)
