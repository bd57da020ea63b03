"""Single-pass fused AdamW update (clip-scale + moments + bias correction +
weight decay + parameter apply) — VERDICT r4 #6's named attack on the
profiler's 4.8 ms `add` row, built and MEASURED (runs/adamw_r5.json,
flagship 124.7M-param fp32 tree on v5e):

    optax chain 2.291 ms | jnp fused 2.280 ms | pallas fused 8.700 ms

Verdict: XLA already fuses the optax transform chain into optimal per-leaf
loop fusions — the hypothesized transform-boundary `updates`
materialization does not survive XLA's fusion pass, so the jnp backend
merely TIES optax, and the pallas backend LOSES 4x (per-leaf grid launches
+ (128,1024) blocks forfeit fusion with neighboring ops).  The optimizer
update is ~2.3 ms of the ledger's 4.8 ms `add` row; the remainder is
residual adds in the model fwd/bwd.  The attack is closed: no unclaimed
AdamW fruit.  The module stays as the measurement record and as an opt-in
(--fused_adamw) equivalent path with bit-matched math
(tests/test_fused_adamw.py).

The chain is semantically one elementwise pass per leaf reading
(g, mu, nu, p) and writing (mu', nu', p'); this module provides the same
math as ONE update:

  g'  = g * clip_scale
  mu' = b1*mu + (1-b1)*g'
  nu' = b2*nu + (1-b2)*g'^2
  p'  = p - lr * (mu'/bc1 / (sqrt(nu'/bc2) + eps) + wd*p)

with bc1 = 1-b1^t, bc2 = 1-b2^t — matching optax.adamw's formula
(reference optimizer contract: torch.optim.AdamW, train.py:127-133) to
float32 round-off.  Two backends:

  * `fused_adamw_jnp` — one jnp expression per leaf; XLA emits one loop
    fusion per leaf and GSPMD partitions it like any elementwise op, so it
    works unchanged on sharded (TP/FSDP/PP) states.
  * `fused_adamw_pallas` — one pallas kernel per large leaf (flattened,
    (rows,1024)-tiled, donated in-place via input_output_aliases), jnp for
    small leaves.  Single-device meshes only (a pallas custom call is not
    GSPMD-partitionable); callers gate on mesh size.

tools/bench_adamw.py measures all three on the chip; training.train_state
wires the winner behind OptimizerConfig.fused_adamw.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    """Interpret-mode pallas off-TPU: the exact kernel algorithm runs in the
    CPU suite (callers additionally gate the pallas backend on mesh size)."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


# leaves below this many elements take the jnp path (kernel launch overhead
# beats the fusion win on biases/layernorms)
_PALLAS_MIN = 1 << 16
_LANES = 1024  # flattened leaves retile to (rows, 1024) fp32 (8,128)-aligned
# 0.5 MB fp32 per operand block: 7 operands (4 in + 3 out) double-buffered
# = 14 MB < the 16 MB scoped-VMEM limit (512 rows OOM'd at 28 MB on v5e)
_ROWS_PER_BLOCK = 128


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (matches optax.ScaleByAdamState)
    mu: Any
    nu: Any


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree.leaves(tree))
    )


def clip_scale_from_norm(gnorm, max_norm: float) -> jnp.ndarray:
    # optax.clip_by_global_norm semantics: scale = min(1, max_norm/||g||)
    return jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-16))


# --------------------------------------------------------------------- jnp
def _leaf_update_jnp(p, g, mu, nu, scale, lr, b1, b2, eps, wd, bc1, bc2):
    g = g.astype(jnp.float32) * scale
    mu = b1 * mu + (1.0 - b1) * g
    nu = b2 * nu + (1.0 - b2) * jnp.square(g)
    upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    p = p - lr * (upd + wd * p)
    return p, mu, nu


# ------------------------------------------------------------------ pallas
def _adamw_kernel(sc_ref, p_ref, g_ref, mu_ref, nu_ref,
                  po_ref, muo_ref, nuo_ref, *, b1, b2, eps, wd):
    # sc_ref: SMEM (1,4) fp32 [clip_scale, lr, bc1, bc2]
    scale, lr = sc_ref[0, 0], sc_ref[0, 1]
    bc1, bc2 = sc_ref[0, 2], sc_ref[0, 3]
    g = g_ref[...] * scale
    mu = b1 * mu_ref[...] + (1.0 - b1) * g
    nu = b2 * nu_ref[...] + (1.0 - b2) * g * g
    upd = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
    p = p_ref[...]
    po_ref[...] = p - lr * (upd + wd * p)
    muo_ref[...] = mu
    nuo_ref[...] = nu


def _leaf_update_pallas(p, g, mu, nu, scalars, b1, b2, eps, wd):
    """Flatten to (rows, 1024), pad the tail, one grid dim over row blocks.
    p/mu/nu are donated in-place (input_output_aliases)."""
    n = p.size
    shape, dtype = p.shape, p.dtype
    rows = -(-n // _LANES)
    pad = rows * _LANES - n

    def flat(x):
        x = x.reshape(-1).astype(jnp.float32)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows, _LANES)

    pf, gf, muf, nuf = flat(p), flat(g), flat(mu), flat(nu)
    rb = min(_ROWS_PER_BLOCK, rows)
    grid = (-(-rows // rb),)
    if rows % rb:
        extra = grid[0] * rb - rows
        pf, gf, muf, nuf = (
            jnp.pad(x, ((0, extra), (0, 0))) for x in (pf, gf, muf, nuf)
        )
    blk = pl.BlockSpec((rb, _LANES), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_adamw_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk, blk, blk, blk,
        ],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct(pf.shape, jnp.float32)] * 3,
        input_output_aliases={1: 0, 3: 1, 4: 2},  # p->p', mu->mu', nu->nu'
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=_interpret(),
    )(scalars, pf, gf, muf, nuf)
    po, muo, nuo = (x.reshape(-1)[:n].reshape(shape) for x in out)
    return po.astype(dtype), muo, nuo


# ------------------------------------------------------------------- trees
def _bias_corrections(count, b1, b2):
    t = (count + 1).astype(jnp.float32)
    return 1.0 - jnp.power(b1, t), 1.0 - jnp.power(b2, t)


def fused_adamw_update(
    params, grads, state: FusedAdamWState, *,
    lr, b1: float, b2: float, eps: float, wd: float,
    max_norm: Optional[float] = None,
    use_pallas: bool = False,
) -> Tuple[Any, FusedAdamWState]:
    """One fused AdamW step over the whole tree.  `lr` may be a traced
    scalar (schedule value).  Returns (new_params, new_state)."""
    bc1, bc2 = _bias_corrections(state.count, b1, b2)
    if max_norm is not None:
        scale = clip_scale_from_norm(global_norm(grads), max_norm)
    else:
        scale = jnp.float32(1.0)
    lr = jnp.asarray(lr, jnp.float32)

    if use_pallas:
        scalars = jnp.stack(
            [scale, lr, bc1, bc2]
        ).astype(jnp.float32).reshape(1, 4)

        def leaf(p, g, mu, nu):
            if p.size >= _PALLAS_MIN and p.dtype == jnp.float32:
                return _leaf_update_pallas(
                    p, g, mu, nu, scalars, b1, b2, eps, wd
                )
            return _leaf_update_jnp(
                p, g, mu, nu, scale, lr, b1, b2, eps, wd, bc1, bc2
            )
    else:
        def leaf(p, g, mu, nu):
            return _leaf_update_jnp(
                p, g, mu, nu, scale, lr, b1, b2, eps, wd, bc1, bc2
            )

    flat_p, tdef = jax.tree.flatten(params)
    flat_g = tdef.flatten_up_to(grads)
    flat_mu = tdef.flatten_up_to(state.mu)
    flat_nu = tdef.flatten_up_to(state.nu)
    new = [leaf(p, g, mu, nu)
           for p, g, mu, nu in zip(flat_p, flat_g, flat_mu, flat_nu)]
    new_p = tdef.unflatten([t[0] for t in new])
    new_mu = tdef.unflatten([t[1] for t in new])
    new_nu = tdef.unflatten([t[2] for t in new])
    return new_p, FusedAdamWState(state.count + 1, new_mu, new_nu)


def init_fused_adamw_state(params) -> FusedAdamWState:
    zeros = jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    return FusedAdamWState(
        count=jnp.zeros((), jnp.int32),
        mu=zeros,
        nu=jax.tree.map(jnp.copy, zeros),
    )
