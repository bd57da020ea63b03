"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) on the CPU mesh.

The reference's only pipeline artifact is HF GPT-2's vestigial
`parallelize(device_map)` dead code (trajectory_gpt2.py:559-589) — never
invoked.  parallel/pipeline.py is a real GPipe schedule; these tests pin
it to the sequential transformer bit-for-bit-in-semantics: same loss,
same training trajectory, dropout still active per microbatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.policy import NekoModel
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.parallel.pipeline import pipe_axis_size, pipelined_loss
from neko_tpu.training.train_state import OptimizerConfig, TrainContext

CFG = ModelConfig(
    embed_dim=32,
    layers=4,          # divisible by pipe=4 and pipe=2
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
    pipeline_microbatches=2,
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


def test_pipe_mesh_shape():
    mesh = create_mesh(pipe=4)
    assert dict(mesh.shape) == {"data": 2, "pipe": 4}
    assert pipe_axis_size(mesh) == 4
    assert pipe_axis_size(create_mesh(data=4, model=2)) == 1
    # pipe x tp composes on a ('data', 'pipe', 'model') mesh
    mesh3 = create_mesh(data=2, pipe=2, model=2)
    assert dict(mesh3.shape) == {"data": 2, "pipe": 2, "model": 2}
    # seq does not compose with pipe
    with pytest.raises(AssertionError):
        create_mesh(seq=2, pipe=2, data=2)


def test_pipeline_composes_with_tensor_parallel():
    """dp x pp x tp: the pipelined step is manual only over 'pipe'
    (shard_map axis_names), so GSPMD lays the Megatron 'model' shardings
    inside each stage.  Loss must match the sequential single-device
    forward, and training must track the dp-x-pp-only trajectory."""
    batch = make_batch(8)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    _, seq_loss = model.apply(
        {"params": params}, batch, compute_loss=True, deterministic=True
    )

    mesh = create_mesh(data=2, pipe=2, model=2)
    with mesh:
        pipe_loss = jax.jit(
            lambda p, b: pipelined_loss(
                model, p, b, mesh=mesh, n_micro=2, deterministic=True
            )
        )(params, batch)
    np.testing.assert_allclose(
        float(seq_loss), float(pipe_loss), rtol=2e-5
    )

    from neko_tpu.parallel import sharding as shd

    mesh_ref = create_mesh(data=2, pipe=4)
    ctx_ref = TrainContext(CFG, OPT, mesh_ref, seed=0)
    s_ref = ctx_ref.init_state(shd.shard_batch(mesh_ref, make_batch(8)))
    ctx_tp = TrainContext(CFG, OPT, mesh, seed=0)
    s_tp = ctx_tp.init_state(shd.shard_batch(mesh, make_batch(8)))
    for _ in range(3):
        s_ref, l_ref = ctx_ref.train_step(
            s_ref, shd.shard_batch(mesh_ref, make_batch(8))
        )
        s_tp, l_tp = ctx_tp.train_step(
            s_tp, shd.shard_batch(mesh, make_batch(8))
        )
        np.testing.assert_allclose(float(l_ref), float(l_tp), rtol=2e-5)


def test_pipeline_bf16_trains_on_cpu_backend():
    """bf16 psums over the manual 'pipe' axis lower to all-reduces with
    copy-rooted reduction regions; XLA:CPU's AllReducePromotion pass
    CHECK-crashes cloning those ("Invalid binary instruction opcode copy").
    pipeline_hidden routes the manual-axis psums through fp32 — this test
    is the regression guard (the crash is a process ABORT, so before the
    fix this killed the whole pytest run)."""
    cfg = ModelConfig(
        embed_dim=32, layers=4, heads=4, dropout=0.0, context_len=32,
        max_patches=2, dtype="bfloat16", text_tokens=256,
        continuous_tokens=64, discrete_tokens=64,
    )
    p = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    examples = [{"text": list(rng.randint(1, 200, size=5))} for _ in range(8)]
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    from neko_tpu.parallel import sharding as shd

    for data, pipe, model in ((4, 2, 1), (2, 2, 2)):
        mesh = create_mesh(data=data, pipe=pipe, model=model)
        ctx = TrainContext(cfg, OPT, mesh, seed=0)
        batch = shd.shard_batch(mesh, to_device_batch(arrays))
        state = ctx.init_state(batch)
        state, loss = ctx.train_step(state, batch)
        assert np.isfinite(float(loss))


def test_pipelined_loss_matches_sequential():
    """Deterministic pipelined loss == the sequential forward's loss."""
    batch = make_batch(8)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]

    _, seq_loss = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True
    )

    mesh = create_mesh(data=2, pipe=4)
    for n_micro in (1, 2, 4):
        pipe_loss = jax.jit(
            lambda p, b: pipelined_loss(
                model, p, b, mesh=mesh, n_micro=n_micro, deterministic=True
            )
        )(params, batch)
        np.testing.assert_allclose(
            float(seq_loss), float(pipe_loss), rtol=2e-5,
            err_msg=f"n_micro={n_micro}",
        )


def test_pipeline_train_step_matches_single_device():
    """3 optimizer steps on a ('data':2,'pipe':4) mesh track the 1-device
    trajectory — forward AND backward through the ppermute schedule."""
    batch = make_batch(8)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx1 = TrainContext(CFG, OPT, mesh1, seed=0)
    state1 = ctx1.init_state(batch)

    mesh_pp = create_mesh(data=2, pipe=4)
    ctx_pp = TrainContext(CFG, OPT, mesh_pp, seed=0)
    state_pp = ctx_pp.init_state(batch)

    for _ in range(3):
        state1, loss1 = ctx1.train_step(state1, batch)
        state_pp, loss_pp = ctx_pp.train_step(state_pp, batch)
        np.testing.assert_allclose(float(loss1), float(loss_pp), rtol=2e-4)


def test_pipeline_dropout_runs_and_varies():
    """Dropout stays active inside the pipelined stack: different seeds give
    different losses, same seed reproduces."""
    cfg = CFG.replace(dropout=0.2)
    batch = make_batch(8)
    mesh = create_mesh(data=2, pipe=4)
    ctx = TrainContext(cfg, OPT, mesh, seed=0)
    state = ctx.init_state(batch)
    losses = []
    for seed in (1, 2, 1):
        s = jax.tree_util.tree_map(jnp.copy, state).replace(
            seed=jnp.uint32(seed)
        )
        _, loss = ctx.train_step(s, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) > 1e-7, losses
    np.testing.assert_allclose(losses[0], losses[2], rtol=1e-6)


def test_pipeline_with_remat_matches():
    """Gradient checkpointing inside the stage scan: same loss as without."""
    batch = make_batch(8)
    mesh = create_mesh(data=2, pipe=4)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    plain = jax.jit(
        lambda p, b: pipelined_loss(
            model, p, b, mesh=mesh, n_micro=2, deterministic=True
        )
    )(params, batch)
    model_r = NekoModel(CFG.replace(remat=True))
    rem = jax.jit(
        lambda p, b: pipelined_loss(
            model_r, p, b, mesh=mesh, n_micro=2, deterministic=True
        )
    )(params, batch)
    np.testing.assert_allclose(float(plain), float(rem), rtol=1e-6)


def test_pipeline_composes_with_fsdp():
    """dp x pp x fsdp: stage-local storage shards the body over 'pipe' AND
    ZeRO-3 shards it over 'data' on top — each device holds
    stage_layers/data_shards of body params + moments.  Loss trajectory
    must match the non-fsdp pipeline path, and the stacked leaf must carry
    BOTH axes (the tiny CFG stays below FSDP_MIN_SIZE, so use a wider
    one)."""
    from neko_tpu.parallel import sharding as shd

    cfg = CFG.replace(embed_dim=128, layers=4, heads=4)
    p = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    examples = [
        {"text": list(rng.randint(1, 200, size=5))} for _ in range(8)
    ]
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    batch = to_device_batch(arrays)

    mesh = create_mesh(data=2, pipe=4)
    ctx_r = TrainContext(cfg, OPT, mesh, seed=0)
    s_r = ctx_r.init_state(shd.shard_batch(mesh, batch))
    ctx_f = TrainContext(cfg, OPT, mesh, seed=0, fsdp=True)
    s_f = ctx_f.init_state(shd.shard_batch(mesh, batch))

    kern = s_f.params["transformer"]["h_stack"]["mlp"]["c_fc"]["kernel"]
    flat = [
        a for e in kern.sharding.spec if e is not None
        for a in (e if isinstance(e, tuple) else (e,))
    ]
    assert "data" in flat and "pipe" in flat, kern.sharding.spec

    for _ in range(3):
        s_r, l_r = ctx_r.train_step(s_r, shd.shard_batch(mesh, batch))
        s_f, l_f = ctx_f.train_step(s_f, shd.shard_batch(mesh, batch))
        np.testing.assert_allclose(float(l_r), float(l_f), rtol=2e-5)


# ------------------------------------------------- stage-local parameters

def _body_bytes_per_device(state, mesh):
    """Max per-device bytes held for the transformer body (params + both
    AdamW moments + EMA when present)."""
    import collections

    per_dev = collections.defaultdict(int)

    def walk(tree):
        for leaf in jax.tree.leaves(tree):
            for sh in leaf.addressable_shards:
                per_dev[sh.device.id] += sh.data.size * sh.data.dtype.itemsize

    walk(state.params["transformer"])
    for leaf_tree in jax.tree.leaves(
        state.opt_state, is_leaf=lambda x: isinstance(x, dict)
    ):
        if isinstance(leaf_tree, dict) and "transformer" in leaf_tree:
            walk(leaf_tree["transformer"])
    if state.ema_params is not None:
        walk(state.ema_params["transformer"])
    return max(per_dev.values())


def test_stage_local_param_memory():
    """VERDICT r4 weak #6 / next #4: on a 'pipe' mesh each device holds
    ~1/pp of the body's params AND AdamW moments AND the EMA shadow —
    previously everything was replicated over 'pipe'."""
    import dataclasses

    batch = make_batch(8)
    opt = dataclasses.replace(OPT, ema_decay=0.99)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    s1 = TrainContext(CFG, opt, mesh1, seed=0).init_state(batch)
    replicated = _body_bytes_per_device(s1, mesh1)

    mesh = create_mesh(data=2, pipe=4)
    ctx = TrainContext(CFG, opt, mesh, seed=0)
    s = ctx.init_state(batch)
    # the stacked body leaf is sharded over 'pipe'
    kern = s.params["transformer"]["h_stack"]["mlp"]["c_fc"]["kernel"]
    assert kern.sharding.spec[0] == "pipe", kern.sharding.spec
    stage_local = _body_bytes_per_device(s, mesh)
    # body = stack (1/4 per stage) + ln_f (replicated, tiny)
    assert stage_local < 0.30 * replicated, (stage_local, replicated)

    # the step still trains and the storage stays stage-local afterwards
    s, loss = ctx.train_step(s, batch)
    assert np.isfinite(float(loss))
    assert _body_bytes_per_device(s, mesh) < 0.30 * replicated


def test_stage_local_checkpoint_canonical_roundtrip(tmp_path):
    """Checkpoints stay byte-compatible across meshes: a pipeline run's
    checkpoint is the canonical per-layer tree, loadable on a single
    device; and the canonical<->stacked reshards are exact inverses."""
    import os

    from neko_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    batch = make_batch(8)
    mesh = create_mesh(data=2, pipe=4)
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    s = ctx.init_state(batch)
    s, _ = ctx.train_step(s, batch)

    canonical = ctx.to_canonical_state(s)
    assert "h_0" in canonical.params["transformer"]
    assert "h_stack" not in canonical.params["transformer"]
    path = save_checkpoint(str(tmp_path), canonical, 1)

    # 1) restore on a single-device mesh: the layout any non-pipe run uses
    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx1 = TrainContext(CFG, OPT, mesh1, seed=0)
    s1 = ctx1.init_state(batch)
    restored = load_checkpoint(path, jax.tree.map(lambda x: x, s1))
    assert int(restored.step) == 1

    # 2) restore INTO the pipeline mesh via the canonical template and
    #    re-stack — bit-identical to the live stage-local state
    back = ctx.from_canonical_state(
        load_checkpoint(path, ctx.canonical_abstract(s))
    )
    for a, b in zip(jax.tree.leaves(s.params), jax.tree.leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 3) round-trip identity: stack(unstack(s)) == s
    rt = ctx.from_canonical_state(canonical)
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage_local_eval_matches(tmp_path):
    """ctx.unstack_params feeds the sequential eval/Generator path: the
    eval_step loss on the pipe mesh equals the single-device eval loss."""
    batch = make_batch(8)
    mesh = create_mesh(data=2, pipe=4)
    ctx = TrainContext(CFG, OPT, mesh, seed=0)
    s = ctx.init_state(batch)
    l_pipe = float(ctx.eval_step(s, batch))

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    ctx1 = TrainContext(CFG, OPT, mesh1, seed=0)
    s1 = ctx1.init_state(batch)
    l_one = float(ctx1.eval_step(s1, batch))
    np.testing.assert_allclose(l_pipe, l_one, rtol=2e-5)

    # unstacked params match the canonical init bit-for-bit
    up = ctx.unstack_params(s.params)
    for a, b in zip(jax.tree.leaves(up), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_guards():
    """Indivisible layers / composed model axis are rejected loudly."""
    batch = make_batch(8)
    cfg3 = CFG.replace(layers=3)
    model = NekoModel(cfg3)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    mesh = create_mesh(data=2, pipe=4)
    with pytest.raises(AssertionError, match="divisible"):
        pipelined_loss(
            model, params, batch, mesh=mesh, n_micro=2, deterministic=True
        )


# ---------------------------------------------------------------- 1F1B

def _opt_1f1b():
    import dataclasses

    return dataclasses.replace(OPT, pipeline_schedule="1f1b")


def test_1f1b_loss_matches_sequential():
    """Deterministic 1F1B loss == the sequential forward's loss, every
    n_micro (including n_micro=1, the all-bubble edge)."""
    from neko_tpu.parallel.pipeline import pipelined_loss_1f1b

    batch = make_batch(8)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    _, seq_loss = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True
    )
    mesh = create_mesh(data=2, pipe=4)
    for n_micro in (1, 2, 4):
        l = jax.jit(
            lambda p, b: pipelined_loss_1f1b(
                model, p, b, mesh=mesh, n_micro=n_micro, deterministic=True
            )
        )(params, batch)
        np.testing.assert_allclose(
            float(seq_loss), float(l), rtol=2e-5, err_msg=f"n_micro={n_micro}"
        )


def test_1f1b_grads_match_sequential():
    """The hand-written interleaved backward is EXACT: every parameter
    gradient (transformer stack via the stacked-tree transpose, ln_f +
    head via the last-stage accumulators, embeddings via the emb
    cotangent) matches jax.grad through the sequential model."""
    from neko_tpu.parallel.pipeline import pipelined_loss_1f1b

    batch = make_batch(8)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]

    def seq_loss(p):
        _, l = model.apply(
            {"params": p}, batch, compute_loss=True, deterministic=True
        )
        return l

    g_seq = jax.grad(seq_loss)(params)
    mesh = create_mesh(data=2, pipe=4)
    with mesh:
        g_pipe = jax.jit(
            jax.grad(
                lambda p: pipelined_loss_1f1b(
                    model, p, batch, mesh=mesh, n_micro=2, deterministic=True
                )
            )
        )(params)

    flat_s = jax.tree_util.tree_flatten_with_path(g_seq)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(g_pipe)[0]
    assert len(flat_s) == len(flat_p)
    for (ks, a), (kp, b) in zip(flat_s, flat_p):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-8)
        rel = np.abs(a - b).max() / denom
        assert rel < 1e-4, f"{jax.tree_util.keystr(ks)}: rel={rel:.3e}"


def test_1f1b_train_step_matches_gpipe():
    """3 optimizer steps WITH dropout: the 1F1B trajectory tracks GPipe's
    (same per-(microbatch, layer) dropout fold, same step key)."""
    cfg = CFG.replace(dropout=0.1)
    batch = make_batch(8)
    mesh = create_mesh(data=2, pipe=4)
    ctx_g = TrainContext(cfg, OPT, mesh, seed=0)
    s_g = ctx_g.init_state(batch)
    ctx_i = TrainContext(cfg, _opt_1f1b(), mesh, seed=0)
    s_i = ctx_i.init_state(batch)
    for _ in range(3):
        s_g, l_g = ctx_g.train_step(s_g, batch)
        s_i, l_i = ctx_i.train_step(s_i, batch)
        np.testing.assert_allclose(float(l_g), float(l_i), rtol=2e-5)


def test_1f1b_composes_with_tensor_parallel():
    """dp x pp x tp under the 1F1B schedule: manual only over 'pipe',
    GSPMD lays the Megatron 'model' shardings inside each stage of the
    interleaved scan (fwd ticks AND the vjp recompute in bwd ticks)."""
    from neko_tpu.parallel.pipeline import pipelined_loss_1f1b

    batch = make_batch(8)
    model = NekoModel(CFG)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    _, seq_loss = model.apply(
        {"params": params}, batch, compute_loss=True, deterministic=True
    )
    mesh = create_mesh(data=2, pipe=2, model=2)
    with mesh:
        l = jax.jit(
            lambda p, b: pipelined_loss_1f1b(
                model, p, b, mesh=mesh, n_micro=2, deterministic=True
            )
        )(params, batch)
    np.testing.assert_allclose(float(seq_loss), float(l), rtol=2e-5)


def test_1f1b_bf16_trains_on_cpu_backend():
    """Regression guard for the XLA:CPU AllReducePromotion abort: all
    1F1B cross-stage psums (loss, ln_f/head grads, emb grads) must route
    through fp32 — bf16 all-reduces over the manual axis CHECK-crash the
    CPU backend (see pipeline_hidden's body)."""
    cfg = ModelConfig(
        embed_dim=32, layers=4, heads=4, dropout=0.0, context_len=32,
        max_patches=2, dtype="bfloat16", text_tokens=256,
        continuous_tokens=64, discrete_tokens=64,
    )
    p = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    examples = [{"text": list(rng.randint(1, 200, size=5))} for _ in range(8)]
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    from neko_tpu.parallel import sharding as shd

    mesh = create_mesh(data=2, pipe=2, model=2)
    ctx = TrainContext(cfg, _opt_1f1b(), mesh, seed=0)
    batch = shd.shard_batch(mesh, to_device_batch(arrays))
    state = ctx.init_state(batch)
    state, loss = ctx.train_step(state, batch)
    assert np.isfinite(float(loss))
