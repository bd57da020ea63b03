"""fp8 (e4m3) weight-only quantization for the serving path.

Decode is HBM-bandwidth-bound on the weight streams (PROFILE.md): every
generated token re-reads all matmul kernels from HBM.  Serving already
halves that traffic by casting fp32 masters to bf16
(generator.py::_maybe_cast); this module halves it AGAIN by storing the
large matmul kernels as float8_e4m3fn with per-output-channel fp32 scales,
converting to the activation dtype only at the point of use.

Design notes (TPU/XLA-specific):

* dots stay in bf16 — int8 dot_generals are emulated on this chip (2x
  slower than bf16, see CLAUDE.md) and fp8 dots don't exist; the win is
  purely the halved HBM bytes of the operand stream, with the
  fp8->bf16 convert + scale multiply fused into the dot's operand read.
* dequantization must happen INSIDE the decode scan body: the weights are
  loop-invariant, so XLA's while-loop LICM would otherwise hoist the
  converts out of the loop and materialize a full bf16 copy — turning fp8
  serving back into bf16 serving.  `dequantize` therefore routes the
  quantized leaves through `lax.optimization_barrier`, which LICM/CSE will
  not move, pinning the converts in the loop so each iteration streams
  fp8 bytes.  (Callers place ONE dequantize at the top of a scan body;
  within-trace CSE then shares it across that body's matmuls.)
* e4m3fn has NO inf: overflow saturates to nan.  The quantizer maps each
  output channel's max |w| to FP8_MAX and clips before the cast, so the
  stored values are always finite.
* per-output-channel scales (one fp32 per column of a [in, out] kernel)
  cost 2 bytes/channel in the stream and keep the fp8 exponent range
  centred per channel; because fp8 is a floating format the *relative*
  step stays 2^-3 regardless of scale, so the scale's only job is
  range-fitting (no overflow, no subnormal underflow).
* only 2D matmul kernels are quantized (leaf name "kernel"): the token
  embedding table is read by GATHER — dequantizing it per decode step
  would stream the whole table to pick one row — and LayerNorms/biases
  are 1D noise.  LoRA adapters are excluded (low-rank deltas, tiny).

The reference has no quantized serving of any kind (its generation loops
re-run full fp32 forwards per token, gato_policy.py:434-470).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neko_tpu.parallel.sharding import param_pspec

# float8_e4m3fn: max finite value (no inf; overflow -> nan, hence the clip)
FP8_MAX = 448.0

# marker keys of a quantized leaf (chosen to collide with no flax param
# name: LayerNorm uses "scale", so the scale key here is "qscale")
_QKEY, _SKEY = "q8", "qscale"


def is_quantized_leaf(node: Any) -> bool:
    return isinstance(node, dict) and set(node.keys()) == {_QKEY, _SKEY}


def _eligible(path, x, min_size: int) -> bool:
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    if not names or names[-1] != "kernel":
        return False
    if any(n.startswith("lora") for n in names):
        return False
    if getattr(x, "ndim", 0) != 2 or x.size < min_size:
        return False
    return jnp.issubdtype(x.dtype, jnp.floating)


def quantize_weights(params, *, min_size: int = 1024):
    """Quantize eligible kernels to {q8: e4m3fn [in,out], qscale: f32 [out]}.

    Per-output-channel symmetric scaling: qscale[j] = max|W[:, j]| / 448,
    W_q = clip(W / qscale, ±448).  Dequant is exact at the channel max and
    has relative error <= 2^-4 elsewhere (e4m3 mantissa spacing).
    """

    def q(path, x):
        if not _eligible(path, x, min_size):
            return x
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=0)                 # [out]
        scale = jnp.maximum(amax / FP8_MAX, 1e-30)
        qv = jnp.clip(xf / scale[None, :], -FP8_MAX, FP8_MAX)
        return {
            _QKEY: qv.astype(jnp.float8_e4m3fn),
            _SKEY: scale,
        }

    return jax.tree_util.tree_map_with_path(q, params)


def dequantize(params, dtype, *, barrier: bool = True):
    """Materialize quantized leaves back to `dtype`; other leaves untouched.

    Idempotent on unquantized trees.  With barrier=True (the default) the
    fp8 arrays pass through lax.optimization_barrier first so a dequantize
    placed inside a lax.scan/while body STAYS there (see module docstring).
    """

    def dq(node):
        if not is_quantized_leaf(node):
            return node
        q, s = node[_QKEY], node[_SKEY]
        if barrier:
            q, s = jax.lax.optimization_barrier((q, s))
        return q.astype(dtype) * s.astype(dtype)[None, :]

    return jax.tree_util.tree_map(dq, params, is_leaf=is_quantized_leaf)


def quant_pspec(path, node):
    """PartitionSpec(s) for one node of a quantized tree.

    q8 keeps the kernel's own spec (same shape); qscale is per-output-
    channel, so it inherits the kernel spec's LAST axis entry.
    """
    names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
    from jax.sharding import PartitionSpec as P

    if names and names[-1] in (_QKEY, _SKEY):
        base = param_pspec(path[:-1], _Ndim2())
        if names[-1] == _QKEY:
            return base
        last = base[-1] if len(base) == 2 else None
        return P(last) if last is not None else P()
    return param_pspec(path, node)


class _Ndim2:
    ndim = 2


def quant_shardings(mesh, qparams):
    from jax.sharding import NamedSharding

    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(mesh, quant_pspec(p, v)), qparams
    )


def quantized_bytes(qparams) -> tuple:
    """(quantized_bytes, total_bytes) of a (possibly) quantized tree."""
    qb = tb = 0
    for path, x in jax.tree_util.tree_flatten_with_path(qparams)[0]:
        n = x.size * x.dtype.itemsize
        tb += n
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        if names and names[-1] in (_QKEY, _SKEY):
            qb += n
    return qb, tb
