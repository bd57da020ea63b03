"""--fsdp (ZeRO-3) parity: sharding params + optimizer state over 'data'
must not change the math.

The reference's only distribution is DDP replication via Accelerate
(/root/reference/train.py:26-40): every rank holds a full copy of params and
AdamW moments.  --fsdp is a TPU-native capability beyond that: large leaves
shard one dim over the 'data' mesh axis (parallel/sharding.py::
fsdp_param_pspec) and XLA emits the use-site all-gathers / gradient
reduce-scatters.  These tests prove (a) the train trajectory is numerically
identical to the replicated path, (b) the state actually shards (per-device
bytes drop ~data-fold), and (c) checkpoints interoperate across the two
layouts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.parallel import sharding as shd
from neko_tpu.parallel.mesh import create_mesh
from neko_tpu.training.train_state import OptimizerConfig, TrainContext


def _cfg():
    return ModelConfig(
        embed_dim=128,
        layers=2,
        heads=4,
        dropout=0.0,
        context_len=64,
        max_patches=0,
        dtype="float32",
        text_tokens=512,
        continuous_tokens=128,
        discrete_tokens=128,
    )


def _opt():
    return OptimizerConfig(
        learning_rate=1e-3, init_lr=1e-5, warmup_steps=2, training_steps=50
    )


def _batches(cfg, n_batches=3, per_batch=8, seed=0):
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_batches):
        examples = []
        for i in range(per_batch):
            if i % 2 == 0:
                examples.append({"text": list(rng.randint(1, 500, size=16))})
            else:
                examples.append(
                    {
                        "continuous_obs": rng.randn(3, 4).astype(np.float32),
                        "continuous_actions": rng.randn(3, 1).astype(np.float32),
                    }
                )
        arrays = packer.pack_batch(examples)
        arrays.pop("lengths")
        out.append(to_device_batch(arrays))
    return out


def _run(mesh, fsdp, batches, cfg, steps=3):
    ctx = TrainContext(cfg, _opt(), mesh, seed=0, fsdp=fsdp)
    state = ctx.init_state(shd.shard_batch(mesh, batches[0]))
    losses = []
    for i in range(steps):
        b = shd.shard_batch(mesh, batches[i % len(batches)])
        state, loss = ctx.train_step(state, b)
        losses.append(float(loss))
    return ctx, state, losses


def _device0_state_bytes(state) -> int:
    """Bytes of the train state resident on device 0."""
    d0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree.leaves(state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for s in leaf.addressable_shards:
            if s.device == d0:
                total += s.data.nbytes
    return total


@pytest.fixture(scope="module")
def runs():
    cfg = _cfg()
    batches = _batches(cfg)
    mesh = create_mesh(model=2)  # 8 devices -> data=4 x model=2
    ctx_rep, state_rep, losses_rep = _run(mesh, False, batches, cfg)
    ctx_fsdp, state_fsdp, losses_fsdp = _run(mesh, True, batches, cfg)
    return cfg, mesh, (ctx_rep, state_rep, losses_rep), (
        ctx_fsdp, state_fsdp, losses_fsdp
    )


def test_fsdp_loss_trajectory_matches_replicated(runs):
    _, _, (_, _, losses_rep), (_, _, losses_fsdp) = runs
    np.testing.assert_allclose(losses_fsdp, losses_rep, rtol=1e-5, atol=1e-6)


def test_fsdp_final_params_match_replicated(runs):
    # reduce-scatter vs all-reduce gradient summation order differs, and
    # AdamW's m/(sqrt(v)+eps) amplifies that fp noise early in training on
    # near-zero leaves — so compare at atol above the observed ~4e-6 noise
    # floor, far below any real divergence
    _, _, (_, state_rep, _), (_, state_fsdp, _) = runs
    rep = jax.tree.map(np.asarray, state_rep.params)
    fs = jax.tree.map(np.asarray, state_fsdp.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5),
        rep, fs,
    )


def test_fsdp_actually_shards_params_and_moments(runs):
    _, _, (_, state_rep, _), (_, state_fsdp, _) = runs
    kern = state_fsdp.params["transformer"]["h_0"]["mlp"]["c_fc"]["kernel"]
    flat_spec = [
        a for e in kern.sharding.spec if e is not None
        for a in (e if isinstance(e, tuple) else (e,))
    ]
    assert "data" in flat_spec, kern.sharding.spec
    # AdamW moments shard by the same suffix rules: find a moment leaf with
    # the kernel's shape and check its per-shard size shrank
    kern_shape = kern.shape
    moment_sharded = False
    for leaf in jax.tree.leaves(state_fsdp.opt_state):
        if getattr(leaf, "shape", None) == kern_shape:
            shard = leaf.addressable_shards[0]
            if shard.data.size < leaf.size:
                moment_sharded = True
    assert moment_sharded
    # the headline claim: per-device state bytes drop vs replicated
    rep_bytes = _device0_state_bytes(state_rep)
    fsdp_bytes = _device0_state_bytes(state_fsdp)
    assert fsdp_bytes < 0.55 * rep_bytes, (fsdp_bytes, rep_bytes)


def test_fsdp_checkpoint_interop(tmp_path, runs):
    """A checkpoint written from the fsdp layout restores into the
    replicated layout (and the values match) — the save path stores global
    arrays, so the on-disk format is layout-free."""
    from neko_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg, mesh, (ctx_rep, state_rep, _), (ctx_fsdp, state_fsdp, _) = runs
    path = save_checkpoint(str(tmp_path / "exp"), state_fsdp, 3, None)
    target = jax.tree.map(lambda x: x, state_rep)
    restored = load_checkpoint(path, target)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        jax.tree.map(np.asarray, restored.params),
        jax.tree.map(np.asarray, state_fsdp.params),
    )


def test_fsdp_pure_dp_mesh():
    """fsdp over a pure data mesh (data=8): the ZeRO-3 configuration the
    flag exists for — one step runs and the loss is finite."""
    cfg = _cfg()
    batches = _batches(cfg, n_batches=1)
    mesh = create_mesh()  # data=8
    _, state, losses = _run(mesh, True, batches, cfg, steps=1)
    assert np.isfinite(losses[0])
    emb = state.params["embed_token"]["embedding"]
    flat_spec = [
        a for e in emb.sharding.spec if e is not None
        for a in (e if isinstance(e, tuple) else (e,))
    ]
    assert "data" in flat_spec, emb.sharding.spec


def test_fsdp_spec_rules():
    """Unit checks on fsdp_param_pspec eligibility."""
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(model=2)  # data=4, model=2

    class Leaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    class K:
        def __init__(self, key):
            self.key = key

    path = (K("transformer"), K("h_0"), K("mlp"), K("c_fc"), K("kernel"))
    # large kernel [in, out(model)]: in-dim takes 'data'
    spec = shd.fsdp_param_pspec(path, Leaf((768, 3072)), mesh)
    assert spec == P("data", "model"), spec
    # small leaf: below FSDP_MIN_SIZE stays unsharded on data
    path_b = (K("transformer"), K("ln_f"), K("scale"))
    spec = shd.fsdp_param_pspec(path_b, Leaf((768,)), mesh)
    assert spec == P(), spec
    # indivisible dims stay as the base spec
    spec = shd.fsdp_param_pspec(path_b, Leaf((1027, 1027)), mesh)
    assert spec == P(), spec
