"""Mesh / sharding / pjit train-step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.parallel import sharding as shd
from neko_tpu.training.train_state import OptimizerConfig, TrainContext

CFG = ModelConfig(
    embed_dim=32,
    layers=2,
    heads=4,
    dropout=0.0,
    context_len=32,
    max_patches=2,
    dtype="float32",
    text_tokens=256,
    continuous_tokens=64,
    discrete_tokens=64,
)

OPT = OptimizerConfig(
    learning_rate=1e-3,
    init_lr=1e-5,
    warmup_steps=5,
    training_steps=100,
)


def make_batch(batch_size=8):
    p = SequencePacker(CFG)
    examples = []
    rng = np.random.RandomState(0)
    for i in range(batch_size):
        if i % 2 == 0:
            examples.append({"text": list(rng.randint(1, 200, size=5))})
        else:
            examples.append(
                {
                    "continuous_obs": rng.randn(3, 2).astype(np.float32),
                    "continuous_actions": rng.randn(3, 1).astype(np.float32),
                }
            )
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    return to_device_batch(arrays)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = create_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "seq": 1, "model": 2}
    mesh = create_mesh(model=2)
    assert dict(mesh.shape) == {"data": 4, "seq": 1, "model": 2}
    mesh = create_mesh(seq=4)
    assert dict(mesh.shape) == {"data": 2, "seq": 4, "model": 1}


def test_param_pspec_rules():
    path = lambda *names: tuple(
        jax.tree_util.DictKey(n) for n in names
    )
    v2 = np.zeros((4, 8))
    assert shd.param_pspec(path("embed_token", "embedding"), v2) == P("model", None)
    assert shd.param_pspec(path("transformer", "h_0", "attn", "c_attn", "kernel"), v2) == P(None, "model")
    assert shd.param_pspec(path("transformer", "h_0", "mlp", "c_proj", "kernel"), v2) == P("model", None)
    assert shd.param_pspec(path("transformer", "ln_f", "scale"), np.zeros(8)) == P()
    assert shd.param_pspec(path("predict_token", "kernel"), v2) == P(None, "model")


def test_train_step_dp_tp():
    """Full sharded train step on a 4x2 mesh: loss decreases, params sharded."""
    mesh = create_mesh(data=4, model=2)
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    batch = make_batch(8)
    state = ctx.init_state(batch)

    # embedding table really is sharded over the model axis
    emb_sharding = state.params["embed_token"]["embedding"].sharding
    assert emb_sharding.spec == P("model", None)
    qkv = state.params["transformer"]["h_0"]["attn"]["c_attn"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")

    losses = []
    for _ in range(10):
        state, loss = ctx.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 10


def test_dp_matches_single_device():
    """The sharded step computes the same loss as a 1-device step."""
    batch = make_batch(8)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx1 = TrainContext(CFG, OPT, mesh1, seed=0)
    state1 = ctx1.init_state(batch)

    mesh8 = create_mesh(data=4, model=2)
    ctx8 = TrainContext(CFG, OPT, mesh8, seed=0)
    state8 = ctx8.init_state(batch)

    for i in range(3):
        state1, loss1 = ctx1.train_step(state1, batch)
        state8, loss8 = ctx8.train_step(state8, batch)
        np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-4)


def test_seq_parallel_train_step_matches_unsharded():
    """Sequence-parallel (ring attention) training: a ('data':2,'seq':4) mesh
    step computes the same loss trajectory as the single-device step —
    VERDICT.md round-2 item #2 (long-context capability, integrated)."""
    batch = make_batch(8)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx1 = TrainContext(CFG, OPT, mesh1, seed=0)
    state1 = ctx1.init_state(batch)

    mesh_sp = create_mesh(data=2, seq=4, model=1)
    assert CFG.context_len % 4 == 0
    ctx_sp = TrainContext(CFG, OPT, mesh_sp, seed=0)
    state_sp = ctx_sp.init_state(batch)

    for _ in range(3):
        state1, loss1 = ctx1.train_step(state1, batch)
        state_sp, loss_sp = ctx_sp.train_step(state_sp, batch)
        np.testing.assert_allclose(float(loss1), float(loss_sp), rtol=2e-4)


def test_seq_parallel_with_tensor_parallel():
    """All three axes at once: ('data':2,'seq':2,'model':2)."""
    batch = make_batch(8)
    mesh = create_mesh(data=2, seq=2, model=2)
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    state = ctx.init_state(batch)
    losses = []
    for _ in range(5):
        state, loss = ctx.train_step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_seq_parallel_dropout_runs_and_varies():
    """With dropout > 0 the ring path applies attention dropout: identical
    params with different per-step RNG seeds give different losses."""
    cfg = CFG.replace(dropout=0.2)
    batch = make_batch(8)
    mesh = create_mesh(data=2, seq=4, model=1)
    ctx = TrainContext(cfg, OPT, mesh, seed=0)
    state = ctx.init_state(batch)
    losses = []
    for seed in (1, 2):
        # deep-copy: train_step donates its input state buffers
        s = jax.tree_util.tree_map(jnp.copy, state).replace(
            seed=jnp.uint32(seed)
        )
        _, loss = ctx.train_step(s, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) > 1e-7, losses


def test_schedule_matches_reference_semantics():
    from neko_tpu.training.schedulers import linear_warmup_cosine_decay

    sched = linear_warmup_cosine_decay(
        base_lr=1e-4, init_lr=1e-7, min_lr=1e-5,
        warmup_steps=10, total_steps=110, cosine_decay=True,
    )
    # warmup endpoints
    np.testing.assert_allclose(float(sched(0)), 1e-7, rtol=1e-6)
    np.testing.assert_allclose(
        float(sched(5)), 1e-7 + (1e-4 - 1e-7) * 0.5, rtol=1e-5
    )
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    # midpoint of cosine: (base+min)/2
    np.testing.assert_allclose(float(sched(60)), (1e-4 + 1e-5) / 2, rtol=1e-4)
    # end: min_lr
    np.testing.assert_allclose(float(sched(110)), 1e-5, rtol=1e-4)
    # past the end stays clamped at min_lr
    np.testing.assert_allclose(float(sched(500)), 1e-5, rtol=1e-4)
