"""TPU-only tests for the authored whole-head Pallas attention kernel.

Run with: NEKO_TEST_TPU=1 python -m pytest tests/test_attention_tpu.py
(the default suite runs on CPU where pallas TPU kernels can't execute).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neko_tpu.ops.attention import xla_attention

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="pallas TPU kernel needs a TPU (set NEKO_TEST_TPU=1)",
)


def test_mask_bounds():
    from neko_tpu.ops.attention_kernel import mask_bounds_from_key_mask

    m = np.zeros((3, 8), bool)
    m[0, 2:8] = True   # left pad
    m[1, 0:5] = True   # right pad
    # row 2: fully invalid
    start, end = mask_bounds_from_key_mask(jnp.asarray(m))
    np.testing.assert_array_equal(np.asarray(start), [2, 0, 8])
    np.testing.assert_array_equal(np.asarray(end), [8, 5, 0])


@requires_tpu
@pytest.mark.parametrize("pad", ["left", "right", "none"])
def test_whole_head_kernel_matches_xla(pad):
    from neko_tpu.ops.attention_kernel import (
        mask_bounds_from_key_mask,
        whole_head_attention,
    )

    B, H, S, hd = 4, 4, 256, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32).astype(jnp.bfloat16)
    mask = np.ones((B, S), bool)
    if pad == "left":
        mask[:2, :50] = False
    elif pad == "right":
        mask[:2, 200:] = False
    km = jnp.asarray(mask)
    start, end = mask_bounds_from_key_mask(km)
    scale = hd ** -0.5

    out = jax.jit(
        lambda q, k, v: whole_head_attention(q, k, v, start, end, None, scale)
    )(q, k, v)
    ref = jax.jit(lambda q, k, v: xla_attention(q, k, v, km))(q, k, v)
    for b in range(B):
        valid = mask[b]
        np.testing.assert_allclose(
            np.asarray(out, np.float32)[b][:, valid],
            np.asarray(ref, np.float32)[b][:, valid],
            atol=1.5e-2,
        )


@requires_tpu
def test_whole_head_kernel_grads_match_xla():
    from neko_tpu.ops.attention_kernel import (
        mask_bounds_from_key_mask,
        whole_head_attention,
    )

    B, H, S, hd = 2, 2, 256, 32
    rng = np.random.RandomState(1)
    # fp32 inputs for a tight gradient comparison
    q = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, :30] = False
    km = jnp.asarray(mask)
    start, end = mask_bounds_from_key_mask(km)
    scale = hd ** -0.5
    w = km[:, None, :, None].astype(jnp.float32)

    g1 = jax.jit(jax.grad(
        lambda q, k, v: (
            (whole_head_attention(q, k, v, start, end, None, scale) * w) ** 2
        ).sum(), argnums=(0, 1, 2),
    ))(q, k, v)
    # the kernel pins matmul precision to DEFAULT (bf16 passes on MXU);
    # trace the reference the same way for an apples-to-apples comparison
    with jax.default_matmul_precision("default"):
        g2 = jax.jit(jax.grad(
            lambda q, k, v: ((xla_attention(q, k, v, km) * w) ** 2).sum(),
            argnums=(0, 1, 2),
        ))(q, k, v)
    for a, b in zip(g1, g2):
        scale_ref = np.abs(np.asarray(b)).max()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3 * max(scale_ref, 1.0)
        )


@requires_tpu
def test_whole_head_dropout_deterministic_and_varies():
    from neko_tpu.ops.attention_kernel import (
        mask_bounds_from_key_mask,
        whole_head_attention,
    )

    B, H, S, hd = 2, 2, 256, 32
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    km = jnp.ones((B, S), bool)
    start, end = mask_bounds_from_key_mask(km)
    scale = hd ** -0.5

    fn = jax.jit(
        lambda s: whole_head_attention(q, k, v, start, end, s, scale, 0.3)
    )
    s1 = jnp.asarray([7], jnp.int32)
    s2 = jnp.asarray([8], jnp.int32)
    a, a2, b = np.asarray(fn(s1)), np.asarray(fn(s1)), np.asarray(fn(s2))
    np.testing.assert_array_equal(a, a2)  # same seed -> same mask
    assert np.abs(a - b).max() > 1e-3     # different seed -> different mask
    nodrop = np.asarray(
        jax.jit(
            lambda: whole_head_attention(q, k, v, start, end, s1, scale, 0.0)
        )()
    )
    assert np.abs(a - nodrop).max() > 1e-3  # dropout actually perturbs


def test_head_group():
    from neko_tpu.ops.attention_kernel import head_group

    assert head_group(24, 32) == 4    # 4 heads -> 128 lanes
    assert head_group(4, 32) == 4     # whole row (D == 128)
    assert head_group(2, 32) == 2     # whole row (D == 64 == full dim)
    assert head_group(8, 64) == 2
    assert head_group(8, 128) == 1
    assert head_group(6, 32) == 0     # 6 % 4 != 0 -> unsupported
    assert head_group(12, 96) == 0    # 128 % 96 != 0 -> unsupported


@requires_tpu
@pytest.mark.parametrize("pad", ["left", "right", "none"])
def test_packed_bsd_kernel_matches_xla(pad):
    """Head-packed [B,S,H*hd] layout == XLA attention (fwd + grads)."""
    from neko_tpu.ops.attention import tpu_flash_attention_bsd

    B, H, S, hd = 4, 8, 256, 32
    D = H * hd
    rng = np.random.RandomState(4)
    q2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    k2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    v2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    mask = np.ones((B, S), bool)
    if pad == "left":
        mask[:2, :50] = False
    elif pad == "right":
        mask[:2, 200:] = False
    km = jnp.asarray(mask)
    w = km[:, :, None].astype(jnp.float32)

    def to_bhsd(x):
        return x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    def to_bsd(x):
        return x.transpose(0, 2, 1, 3).reshape(B, S, D)

    def ref(q2, k2, v2):
        return to_bsd(xla_attention(to_bhsd(q2), to_bhsd(k2), to_bhsd(v2), km))

    def new(q2, k2, v2):
        return tpu_flash_attention_bsd(q2, k2, v2, km, heads=H)

    with jax.default_matmul_precision("default"):
        a = jax.jit(ref)(q2, k2, v2)
    b = jax.jit(new)(q2, k2, v2)
    np.testing.assert_allclose(
        np.asarray(a * w), np.asarray(b * w), atol=2e-3
    )

    gb = jax.jit(jax.grad(
        lambda q2, k2, v2: ((new(q2, k2, v2) * w) ** 2).sum(), argnums=(0, 1, 2)
    ))(q2, k2, v2)
    with jax.default_matmul_precision("default"):
        ga = jax.jit(jax.grad(
            lambda q2, k2, v2: ((ref(q2, k2, v2) * w) ** 2).sum(),
            argnums=(0, 1, 2),
        ))(q2, k2, v2)
    for x, y in zip(ga, gb):
        scale_ref = np.abs(np.asarray(x)).max()
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), atol=3e-3 * max(scale_ref, 1.0)
        )


@requires_tpu
def test_packed_bsd_dropout_matches_bhsd_layout():
    """Same seed -> the SAME per-(batch,head) keep mask in both layouts, so
    the two kernels must agree element for element under dropout."""
    from neko_tpu.ops.attention_kernel import (
        mask_bounds_from_key_mask,
        whole_head_attention,
        whole_head_attention_bsd,
    )

    B, H, S, hd = 2, 8, 256, 32
    D = H * hd
    rate = 0.3
    rng = np.random.RandomState(5)
    q2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    k2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    v2 = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    km = jnp.ones((B, S), bool)
    start, end = mask_bounds_from_key_mask(km)
    seed = jnp.asarray([13], jnp.int32)
    scale = hd ** -0.5

    def to_bhsd(x):
        return x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    def to_bsd(x):
        return x.transpose(0, 2, 1, 3).reshape(B, S, D)

    old = jax.jit(lambda: to_bsd(whole_head_attention(
        to_bhsd(q2), to_bhsd(k2), to_bhsd(v2), start, end, seed, scale, rate
    )))()
    new = jax.jit(lambda: whole_head_attention_bsd(
        q2, k2, v2, start, end, seed, heads=H, sm_scale=scale,
        dropout_rate=rate,
    ))()
    np.testing.assert_allclose(
        np.asarray(old), np.asarray(new), atol=2e-3
    )


@requires_tpu
def test_model_train_step_packed_path_matches_xla():
    """MODEL-level guard for the head-packed train path: forward loss and
    parameter grads must match the XLA attention path (dropout off) —
    catches wiring bugs in SplitProj / dispatch that kernel-level tests
    can't see."""
    import dataclasses

    import numpy as np

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.models.policy import NekoModel

    def build(attention_impl):
        cfg = ModelConfig(
            embed_dim=128, layers=2, heads=4, dropout=0.0, context_len=256,
            max_patches=0, dtype="float32", text_tokens=512,
            continuous_tokens=64, discrete_tokens=64,
            attention_impl=attention_impl,
        )
        return NekoModel(cfg), cfg

    rng = np.random.RandomState(0)
    model_f, cfg = build("flash")
    model_x, _ = build("xla")
    packer = SequencePacker(cfg)
    examples = [
        {"text": list(rng.randint(1, 500, size=200))},
        {
            "continuous_obs": rng.randn(10, 4).astype(np.float32),
            "continuous_actions": rng.randn(10, 2).astype(np.float32),
        },
    ]
    arrays = packer.pack_batch(examples)
    arrays.pop("lengths")
    batch = to_device_batch(arrays)
    params = model_f.init({"params": jax.random.key(0)}, batch)["params"]

    def loss_fn(model):
        def f(params):
            _, loss = model.apply(
                {"params": params}, batch, deterministic=False,
                compute_loss=True,
                rngs={"dropout": jax.random.key(1),
                      "patch_pos": jax.random.key(2)},
            )
            return loss
        return f

    with jax.default_matmul_precision("default"):
        lx, gx = jax.jit(jax.value_and_grad(loss_fn(model_x)))(params)
    lf, gf = jax.jit(jax.value_and_grad(loss_fn(model_f)))(params)
    assert abs(float(lx) - float(lf)) < 2e-3
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(gf)
    )
    for path, vx in flat_x:
        vf = flat_f[jax.tree_util.keystr(path)]
        scale = max(float(np.abs(np.asarray(vx)).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(vf, np.float32), np.asarray(vx, np.float32),
            atol=2e-2 * scale, err_msg=jax.tree_util.keystr(path),
        )


@requires_tpu
def test_train_step_long_context_with_dropout_smoke():
    """k=2048 train step with dropout runs on one chip (blocked flash
    kernel) and produces a finite decreasing-ish loss."""
    import numpy as np

    from neko_tpu.config import ModelConfig
    from neko_tpu.data.batch import to_device_batch
    from neko_tpu.data.packing import SequencePacker
    from neko_tpu.parallel import sharding as shd
    from neko_tpu.parallel.mesh import create_mesh
    from neko_tpu.training.train_state import OptimizerConfig, TrainContext

    cfg = ModelConfig(
        embed_dim=128, layers=2, heads=4, dropout=0.1, context_len=2048,
        max_patches=0, dtype="bfloat16", text_tokens=512,
        continuous_tokens=64, discrete_tokens=64,
    )
    opt = OptimizerConfig(
        learning_rate=1e-3, init_lr=1e-5, warmup_steps=2, training_steps=50
    )
    mesh = create_mesh(model=1)
    ctx = TrainContext(cfg, opt, mesh, seed=0)
    packer = SequencePacker(cfg)
    rng = np.random.RandomState(0)
    examples = [
        {"text": list(rng.randint(1, 500, size=cfg.context_len - 1))}
        for _ in range(2)
    ]
    arrays = packer.pack_batch(examples)
    arrays.pop("lengths")
    batch = shd.shard_batch(mesh, to_device_batch(arrays))
    state = ctx.init_state(batch)
    losses = []
    for _ in range(5):
        state, loss = ctx.train_step(state, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # memorizing one batch must reduce loss


@requires_tpu
def test_whole_head_dropout_fwd_bwd_match_xla_with_same_mask():
    """The kernel's dropout fwd AND custom-VJP bwd must equal an XLA
    attention that applies the IDENTICAL keep/scale mask (exported via
    dropout_keep_scale)."""
    from neko_tpu.ops.attention_kernel import (
        dropout_keep_scale,
        mask_bounds_from_key_mask,
        whole_head_attention,
    )

    B, H, S, hd = 2, 2, 256, 32
    rate = 0.25
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, hd), jnp.float32)
    mask = np.ones((B, S), bool)
    mask[0, :30] = False
    km = jnp.asarray(mask)
    start, end = mask_bounds_from_key_mask(km)
    scale = hd ** -0.5
    seed = jnp.asarray([41], jnp.int32)
    ks = dropout_keep_scale(seed, B, H, S, rate)

    def ref(q, k, v):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        causal = jnp.tril(jnp.ones((S, S), jnp.bool_))
        allowed = causal[None, None] & km[:, None, None, :]
        logits = jnp.where(allowed, logits, -1e9)
        p = jax.nn.softmax(logits, axis=-1) * ks
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    w = km[:, None, :, None].astype(jnp.float32)
    out = jax.jit(
        lambda q, k, v: whole_head_attention(q, k, v, start, end, seed, scale, rate)
    )(q, k, v)
    with jax.default_matmul_precision("default"):
        out_ref = jax.jit(ref)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out * w), np.asarray(out_ref * w), atol=2e-3
    )

    g1 = jax.jit(jax.grad(
        lambda q, k, v: (
            (whole_head_attention(q, k, v, start, end, seed, scale, rate) * w)
            ** 2
        ).sum(), argnums=(0, 1, 2),
    ))(q, k, v)
    with jax.default_matmul_precision("default"):
        g2 = jax.jit(jax.grad(
            lambda q, k, v: ((ref(q, k, v) * w) ** 2).sum(), argnums=(0, 1, 2)
        ))(q, k, v)
    for a, b in zip(g1, g2):
        scale_ref = np.abs(np.asarray(b)).max()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3 * max(scale_ref, 1.0)
        )
