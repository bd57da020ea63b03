"""Fused single-pass AdamW (ops/fused_adamw.py) == the optax chain.

The fused update replaces clip_by_global_norm + optax.adamw + apply_updates
(train_state.py::make_optimizer — the reference optimizer contract is
torch.optim.AdamW, train.py:127-133) with one elementwise pass per leaf.
Parity must hold to fp32 round-off on both backends, across steps (bias
correction depends on the carried count), and under the clip trigger.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from neko_tpu.ops import fused_adamw as fa

LR, B1, B2, EPS, WD, CLIP = 3e-4, 0.9, 0.95, 1e-8, 0.1, 1.0


def _tree(seed=0, scale=1.0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return {
        "w": jax.random.normal(ks[0], (96, 1024), jnp.float32) * 0.02,
        "b": jnp.ones((64,), jnp.float32) * 0.1,
        # non-multiple-of-1024 size: exercises the pallas pad/retile path
        "emb": jax.random.normal(ks[1], (70, 1000), jnp.float32) * 0.02,
        "g": jax.random.normal(ks[2], (7,), jnp.float32) * scale,
    }


def _optax_run(params, grads_seq, max_norm):
    tx = optax.chain(
        optax.clip_by_global_norm(max_norm),
        optax.adamw(learning_rate=LR, b1=B1, b2=B2, eps=EPS,
                    weight_decay=WD),
    )
    st = tx.init(params)
    for g in grads_seq:
        upd, st = tx.update(g, st, params)
        params = optax.apply_updates(params, upd)
    return params


def _fused_run(params, grads_seq, max_norm, use_pallas):
    st = fa.init_fused_adamw_state(params)
    step = jax.jit(
        lambda p, s, g: fa.fused_adamw_update(
            p, g, s, lr=LR, b1=B1, b2=B2, eps=EPS, wd=WD,
            max_norm=max_norm, use_pallas=use_pallas,
        )
    )
    for g in grads_seq:
        params, st = step(params, st, g)
    return params, st


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("gscale", [1e-3, 50.0])  # below / above the clip
def test_matches_optax_over_steps(use_pallas, gscale):
    params = _tree(0)
    grads_seq = [
        jax.tree.map(
            lambda p, i=i: jnp.full(p.shape, gscale * (0.5 + 0.1 * i),
                                    jnp.float32)
            * jnp.sign(p + 1e-9),
            params,
        )
        for i in range(3)
    ]
    want = _optax_run(params, grads_seq, CLIP)
    got, _ = _fused_run(params, grads_seq, CLIP, use_pallas)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        assert jnp.max(jnp.abs(a - b)) < 1e-6


def test_no_clip_matches():
    params = _tree(1)
    g = jax.tree.map(lambda p: p * 0.3, params)
    tx = optax.adamw(learning_rate=LR, b1=B1, b2=B2, eps=EPS,
                     weight_decay=WD)
    st = tx.init(params)
    upd, st = tx.update(g, st, params)
    want = optax.apply_updates(params, upd)
    got, _ = _fused_run(params, [g], None, False)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        assert jnp.max(jnp.abs(a - b)) < 1e-7


def test_state_count_advances():
    params = _tree(2)
    g = jax.tree.map(jnp.zeros_like, params)
    _, st = _fused_run(params, [g, g], CLIP, False)
    assert int(st.count) == 2
