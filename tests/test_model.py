"""Model forward/loss/decode tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from neko_tpu.config import ModelConfig
from neko_tpu.data.batch import to_device_batch
from neko_tpu.data.packing import SequencePacker
from neko_tpu.models.policy import NekoModel, masked_next_token_loss

CFG = ModelConfig(
    embed_dim=32,
    layers=2,
    heads=2,
    dropout=0.1,
    context_len=32,
    max_patches=4,
    patch_size=16,
    dtype="float32",
    # tiny token space keeps CPU tests fast; offsets scale automatically
    text_tokens=256,
    continuous_tokens=64,
    discrete_tokens=64,
)


def make_batch(cfg=CFG, with_images=False):
    p = SequencePacker(cfg)
    examples = [
        {"text": [10, 11, 12, 13]},
        {
            "continuous_obs": np.array([[0.1, -0.2]] * 3, np.float32),
            "continuous_actions": np.array([[0.3]] * 3, np.float32),
        },
    ]
    if with_images:
        examples.append(
            {
                "images": np.random.RandomState(0)
                .randint(0, 255, (2, 16, 32, 3))
                .astype(np.float32),
                "discrete_actions": np.array([1, 2], np.int32),
            }
        )
    arrays = p.pack_batch(examples)
    arrays.pop("lengths")
    return to_device_batch(arrays)


def init_model(cfg=CFG, with_images=False):
    model = NekoModel(cfg)
    batch = make_batch(cfg, with_images)
    params = model.init(
        {"params": jax.random.key(0)}, batch, deterministic=True
    )["params"]
    return model, params, batch


def test_forward_shapes_and_loss():
    model, params, batch = init_model(with_images=True)
    logits, loss = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True,
        return_logits=True,
    )
    B, S = batch.tokens.shape
    assert logits.shape == (B, S, CFG.padded_vocab_size)
    assert logits.dtype == jnp.float32
    assert jnp.isfinite(loss)


def test_loss_masking_semantics():
    """Loss must only count positions where input[t] valid and target[t+1] is
    a target token — and equal the reference's flat masked mean."""
    B, S, V = 2, 8, 16
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(B, S, V).astype(np.float32))
    tokens = jnp.asarray(rng.randint(0, V, (B, S)))
    input_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    target_mask = jnp.asarray(rng.rand(B, S) > 0.5)

    got = masked_next_token_loss(logits, tokens, input_mask, target_mask)

    # reference-style computation with boolean indexing (numpy)
    lm = (
        np.asarray(input_mask)[:, :-1] * np.asarray(target_mask)[:, 1:]
    ).reshape(-1)
    ll = np.asarray(logits)[:, :-1].reshape(-1, V)[lm > 0]
    tt = np.asarray(tokens)[:, 1:].reshape(-1)[lm > 0]
    logz = np.log(np.exp(ll).sum(-1))
    ref = (logz - ll[np.arange(len(tt)), tt]).mean()
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_chunked_loss_matches_logits_loss():
    """The fused chunked-CE path must equal the explicit-logits loss."""
    model, params, batch = init_model(with_images=True)
    _, loss_logits = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True,
        return_logits=True,
    )
    _, loss_chunked = model.apply(
        {"params": params}, batch, deterministic=True, compute_loss=True,
    )
    np.testing.assert_allclose(
        float(loss_chunked), float(loss_logits), rtol=1e-5
    )

    # grads agree too
    def lf(p, return_logits):
        return model.apply(
            {"params": p}, batch, deterministic=True, compute_loss=True,
            return_logits=return_logits,
        )[1]

    g1 = jax.grad(lambda p: lf(p, True))(params)
    g2 = jax.grad(lambda p: lf(p, False))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dropout_rngs_change_output():
    model, params, batch = init_model()
    out1, _ = model.apply(
        {"params": params},
        batch,
        deterministic=False,
        rngs={"dropout": jax.random.key(1), "patch_pos": jax.random.key(2)},
    )
    out2, _ = model.apply(
        {"params": params},
        batch,
        deterministic=False,
        rngs={"dropout": jax.random.key(3), "patch_pos": jax.random.key(4)},
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_padding_invariance():
    """A left-padded sequence must produce the same last-token logits as the
    same content with less padding (structured positions make this safe)."""
    cfg = CFG.replace(dropout=0.0, max_patches=0)
    model = NekoModel(cfg)
    p = SequencePacker(cfg)
    ex = {"text": [5, 6, 7, 8, 9]}
    b_full = p.pack_batch([ex])
    b_full.pop("lengths")
    b_short = p.pack_batch([ex], seq_len=16)
    b_short.pop("lengths")
    params = model.init({"params": jax.random.key(0)}, to_device_batch(b_full))[
        "params"
    ]
    lg_full, _ = model.apply({"params": params}, to_device_batch(b_full))
    lg_short, _ = model.apply({"params": params}, to_device_batch(b_short))
    np.testing.assert_allclose(
        np.asarray(lg_full[0, -1]), np.asarray(lg_short[0, -1]), atol=2e-4
    )


def test_overfit_tiny_batch():
    """Loss decreases by >50% in 60 adam steps on a fixed tiny batch."""
    cfg = CFG.replace(dropout=0.0)
    model = NekoModel(cfg)
    batch = make_batch(cfg)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, loss = model.apply(
                {"params": p}, batch, deterministic=True, compute_loss=True
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_prefill_decode_matches_full_forward():
    """KV-cache decode must reproduce full-forward logits exactly."""
    cfg = CFG.replace(dropout=0.0, max_patches=0)
    model = NekoModel(cfg)
    p = SequencePacker(cfg)
    ids = [3, 1, 4, 1, 5, 9, 2, 6]
    arrays = p.pack_batch([{"text": ids}], pad_side="right")
    L = int(arrays.pop("lengths")[0])
    batch = to_device_batch(arrays)
    params = model.init({"params": jax.random.key(0)}, batch)["params"]

    full_logits, _ = model.apply({"params": params}, batch)

    # prefill on the first L-3 tokens, then decode the remaining 3 one by one
    n_pre = L - 3
    pre_arrays = p.pack_batch([{"text": ids}], pad_side="right")
    pre_arrays.pop("lengths")
    pre_mask = np.zeros_like(pre_arrays["input_mask"])
    pre_mask[0, :n_pre] = True
    pre_arrays["input_mask"] = pre_mask
    pre_batch = to_device_batch(pre_arrays)

    emb = model.apply(
        {"params": params}, pre_batch, method=lambda m, b: m.embed_batch(b)
    )
    pre_logits, cache = model.apply(
        {"params": params},
        emb,
        jnp.asarray(pre_mask),
        method=NekoModel.prefill,
        mutable=["cache"],
    )
    np.testing.assert_allclose(
        np.asarray(pre_logits[0, :n_pre]),
        np.asarray(full_logits[0, :n_pre]),
        atol=2e-4,
    )

    full_emb = model.apply(
        {"params": params}, batch, method=lambda m, b: m.embed_batch(b)
    )
    for i in range(n_pre, L):
        step_logits, cache = model.apply(
            {"params": params, **cache},
            full_emb[:, i : i + 1],
            jnp.array([i], jnp.int32),
            method=NekoModel.decode_step,
            mutable=["cache"],
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[0, 0]),
            np.asarray(full_logits[0, i]),
            atol=2e-4,
        )


def test_gathered_loss_matches_dense():
    """The gathered-target loss path equals the dense chunked path."""
    cfg = CFG.replace(dropout=0.0)
    model = NekoModel(cfg)
    p = SequencePacker(cfg)
    examples = [
        {"text": [10, 11, 12, 13]},
        {
            "continuous_obs": np.array([[0.1, -0.2]] * 3, np.float32),
            "continuous_actions": np.array([[0.3]] * 3, np.float32),
        },
        {
            "images": np.random.RandomState(0)
            .randint(0, 255, (2, 16, 32, 3))
            .astype(np.float32),
            "discrete_actions": np.array([1, 2], np.int32),
        },
    ]
    dense = p.pack_batch(examples)
    dense.pop("lengths")
    gathered = p.pack_batch(examples, target_budget=64)
    gathered.pop("lengths")
    b_dense = to_device_batch(dense)
    b_gath = to_device_batch(gathered)
    assert b_gath.loss_pos is not None and b_dense.loss_pos is None

    params = model.init({"params": jax.random.key(0)}, b_dense)["params"]
    _, l_dense = model.apply(
        {"params": params}, b_dense, deterministic=True, compute_loss=True
    )
    _, l_gath = model.apply(
        {"params": params}, b_gath, deterministic=True, compute_loss=True
    )
    np.testing.assert_allclose(float(l_gath), float(l_dense), rtol=1e-5)

    # grads agree too
    def lf(p, batch):
        return model.apply(
            {"params": p}, batch, deterministic=True, compute_loss=True
        )[1]

    g1 = jax.grad(lambda p: lf(p, b_dense))(params)
    g2 = jax.grad(lambda p: lf(p, b_gath))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
