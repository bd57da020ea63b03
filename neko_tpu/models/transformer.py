"""Decoder-only transformer core (GPT-2 style, no global position embedding).

TPU-native re-implementation of the behaviour of the reference's forked HF
GPT-2 (/root/reference/gato/transformers/trajectory_gpt2.py):

* pre-LN blocks: x + attn(ln_1(x)); x + mlp(ln_2(x))  (trajectory_gpt2.py:296-359)
* scaled dot-product causal attention with an additive key-padding mask
  (trajectory_gpt2.py:163-188, 663-679)
* optional GEGLU MLP: gelu(c_fc(x)) * gate(x) -> c_proj  (trajectory_gpt2.py:260-278)
* NO absolute position embedding — the reference deletes GPT-2's `wpe`
  (trajectory_gpt2.py:540,700-701); positions come from structured encodings
  upstream (inner-timestep + patch positions).

Differences by design (TPU-first):

* static shapes everywhere; the causal mask is computed inline and fused by
  XLA (or handled inside the Pallas flash-attention kernel) instead of a
  precomputed n_ctx x n_ctx buffer;
* a real KV cache for decode: `mode='prefill'` populates a [B, S] ring of
  keys/values, `mode='decode'` runs one-token steps — the reference plumbs a
  KV cache but never uses it, re-running the full context per generated token
  (gato_policy.py:444-445, 586-587);
* attention logits/softmax accumulate in fp32 while activations are bf16.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from neko_tpu.config import ModelConfig
from neko_tpu.ops.dropout import Dropout
from neko_tpu.ops.gelu import gelu_erf

_INIT = nn.initializers.normal(stddev=0.02)
_BIG_NEG = -1e9


def _dot_product_attention(q, k, v, bias, dropout_rng, dropout_rate, deterministic):
    """Reference XLA attention. q,k,v: [B, H, S_q, hd]; bias: broadcastable to
    [B, H, S_q, S_k] additive fp32."""
    hd = q.shape[-1]
    scale = hd ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    weights = weights.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _quant_rows(x):
    """Symmetric per-row int8 quantization: [..., hd] -> (int8, fp32 scale).

    scale = max|row| / 127; an all-zero row gets scale 0 and quantizes to
    zeros (the 1e-30 floor only guards the divide)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.round(xf / jnp.maximum(scale[..., None], 1e-30))
    return q.astype(jnp.int8), scale


def _quant_cache_attention(q, kq, ks, vq, vs, bias):
    """Decode attention over an int8 per-row-quantized KV cache.

    kq/vq: int8 [B, H, Sk, hd]; ks/vs: fp32 [B, H, Sk] row scales.  The
    int8->activation-dtype converts feed the einsums directly (halving
    the HBM bytes streamed per decode step vs a bf16 cache), and the row
    scales fold into arrays already materialized at [B, H, Sq, Sk] — the
    logits (key scales) and the softmax weights (value scales) — so no
    dequantized copy of the cache ever exists."""
    hd = q.shape[-1]
    # NOTE: pure int8 x int8 dots (quantize q and the value-scaled softmax
    # weights per row — exact scale folding, preferred_element_type=int32)
    # were measured at 2.07 ms/token vs 0.97 for this convert version: XLA
    # does not map these [B,H,1,S] matvec shapes onto a fast int8 MXU path
    # on this chip and emulates the wide-int accumulation instead.
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kq.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    logits = logits * (hd ** -0.5) * ks[:, :, None, :] + bias
    weights = jax.nn.softmax(logits, axis=-1)
    weights = (weights * vs[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, vq.astype(q.dtype))


class SplitProj(nn.Module):
    """Fused-parameter, split-output projection: one [D, n*features] kernel
    (param-compatible with `nn.Dense(n*features)` — same path, shape, init)
    applied as n separate slice-matmuls so each output lands as its own
    [B, S, features] array.

    Why: the train path feeds attention q/k/v to a head-packed Pallas kernel
    that blocks along the minor dim.  Producing q/k/v as separate matmul
    outputs (instead of one [B,S,3D] array + split + transpose) removes every
    relayout copy from the attention fwd AND bwd — autodiff of the weight
    slices writes disjoint ranges of one dW buffer, no concat."""

    features: int
    n: int = 3
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = _INIT
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        F, n = self.features, self.n
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], n * F), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (n * F,), self.param_dtype)
            if self.use_bias
            else None
        )
        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        outs = []
        for j in range(n):
            y = xd @ kd[:, j * F:(j + 1) * F]
            if bias is not None:
                y = y + bias[j * F:(j + 1) * F].astype(self.dtype)
            outs.append(y)
        return tuple(outs)


class Attention(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,           # [B, S, D] (S == 1 in decode mode)
        input_mask: jnp.ndarray,  # [B, S] bool; ignored in decode/extend mode
        *,
        deterministic: bool = True,
        mode: str = "train",      # 'train' | 'prefill' | 'decode' | 'extend'
        decode_index: Optional[jnp.ndarray] = None,  # int32[B]; decode/extend
        extend_clear: Optional[tuple] = None,  # (clear_start i32[B], clear_len, buffer_len)
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, S, D = x.shape
        H, hd = cfg.heads, cfg.head_dim
        dtype = cfg.activation_dtype

        q2, k2, v2 = SplitProj(
            D, kernel_init=_INIT, dtype=dtype, param_dtype=cfg.params_dtype,
            name="c_attn",
        )(x)
        if cfg.lora_r > 0:
            # LoRA on c_attn (peft's GPT-2 default target): B zero-init so the
            # adapter starts as identity; scale alpha/r
            a = nn.Dense(
                cfg.lora_r, use_bias=False,
                kernel_init=nn.initializers.he_uniform(),
                dtype=dtype, param_dtype=cfg.params_dtype, name="lora_a",
            )(x)
            a = nn.Dropout(cfg.lora_dropout, deterministic=deterministic)(a)
            dq, dk, dv = SplitProj(
                D, use_bias=False, kernel_init=nn.initializers.zeros,
                dtype=dtype, param_dtype=cfg.params_dtype, name="lora_b",
            )(a)
            s = cfg.lora_alpha / cfg.lora_r
            q2, k2, v2 = q2 + dq * s, k2 + dk * s, v2 + dv * s

        from neko_tpu.ops import attention as attn_ops

        dropout_active = not deterministic and cfg.dropout > 0.0
        use_seq_parallel = mode == "train" and attn_ops.seq_shards() > 1
        if (
            use_seq_parallel
            and cfg.attention_impl in ("auto", "flash")
            and attn_ops.packed_ring_ok(S, hd, H)
        ):
            # sequence-parallel fast path: Pallas flash kernels inside every
            # ring step, head-packed layout preserved (no transposes, no
            # [B,H,S_l,S_l] score materialization — ops/ring_kernel.py)
            seed = None
            rate = 0.0
            if dropout_active:
                rate = cfg.dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
            out2d = attn_ops.sequence_parallel_attention_bsd(
                q2, k2, v2, input_mask,
                heads=H, dropout_seed=seed, dropout_rate=rate,
            )
            return self._project_out(out2d, deterministic)
        use_packed = (
            mode == "train"
            and not use_seq_parallel
            and cfg.attention_impl in ("auto", "flash")
            and attn_ops.packed_flash_ok(S, hd, H)
        )
        if use_packed:
            # head-packed fast path: q/k/v stay [B, S, D]; the kernel blocks
            # heads along the minor dim — zero relayout copies fwd and bwd
            seed = None
            rate = 0.0
            if dropout_active:
                rate = cfg.dropout
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32,
                )
            out2d = attn_ops.tpu_flash_attention_bsd(
                q2, k2, v2, input_mask,
                heads=H, dropout_seed=seed, dropout_rate=rate,
            )
            return self._project_out(out2d, deterministic)

        q = q2.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        k = k2.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = v2.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        if mode == "extend":
            # Chunked append into the RING KV cache (rollout cache): K new
            # tokens enter at positions (decode_index + i) % buffer_len after
            # the evicted timestep slot [clear_start, clear_start+clear_len)
            # is masked out.  Because the transformer has NO absolute
            # position embedding (reference deletes GPT-2's wpe,
            # trajectory_gpt2.py:540,700-701) attention is permutation-
            # invariant over the cached key set, so ring eviction at timestep
            # granularity reproduces the reference's sliding-window re-pack
            # (control_task.py:154-155) EXACTLY — without the O(S^2)
            # re-prefill per env step.
            assert decode_index is not None
            Sc = cfg.context_len
            quant = cfg.kv_cache_dtype == "int8"
            cache_dtype = jnp.int8 if quant else dtype
            ck = self.variable(
                "cache", "key",
                lambda: jnp.zeros((B, H, Sc, hd), cache_dtype),
            )
            cv = self.variable(
                "cache", "value",
                lambda: jnp.zeros((B, H, Sc, hd), cache_dtype),
            )
            if quant:
                cks = self.variable(
                    "cache", "key_scale",
                    lambda: jnp.zeros((B, H, Sc), jnp.float32),
                )
                cvs = self.variable(
                    "cache", "value_scale",
                    lambda: jnp.zeros((B, H, Sc), jnp.float32),
                )
            cm = self.variable(
                "cache", "mask", lambda: jnp.zeros((B, Sc), jnp.bool_)
            )
            rows = jnp.arange(B)
            if extend_clear is None:
                # APPEND mode (speculative decoding's verify rounds):
                # positions are monotone (caller asserts no overflow, so no
                # ring wrap), prompts are right-padded (valid prefix [0, pos)),
                # and each round's writes [pos, pos+K) COVER the previous
                # round's stale rejected tail (pos advanced by accepted+1 <=
                # K+1, so pos_new + K >= pos_old + K + 1).  Validity for query
                # i is then the pure iota compare col <= pos + i — no
                # eviction scatter, no one_hot/cumsum chunk-causality mask.
                # Measured: the eviction machinery below made an extend(K+1)
                # round cost 2.25x a 1-token decode step, turning spec decode
                # into a 0.89x SLOWDOWN (runs/bench_spec_r4.json, pre-fix).
                wpos = decode_index[:, None] + jnp.arange(S)[None, :]
                mask_val = cm.value
                col = jax.lax.broadcasted_iota(jnp.int32, (1, S, Sc), 2)
                allowed = col <= wpos[:, :, None]                 # [B, K, Sc]
            else:
                clear_start, clear_len, buffer_len = extend_clear
                cidx = (
                    clear_start[:, None] + jnp.arange(clear_len)[None, :]
                ) % buffer_len
                mask_val = cm.value.at[rows[:, None], cidx].set(False)
                wpos = (
                    decode_index[:, None] + jnp.arange(S)[None, :]
                ) % buffer_len  # [B, K]
            new_k = k.transpose(0, 2, 1, 3)  # [B, K, H, hd]
            new_v = v.transpose(0, 2, 1, 3)
            if quant:
                new_k, ks_ = _quant_rows(new_k)
                new_v, vs_ = _quant_rows(new_v)
                cks.value = cks.value.at[rows[:, None], :, wpos].set(ks_)
                cvs.value = cvs.value.at[rows[:, None], :, wpos].set(vs_)
            ck.value = ck.value.at[rows[:, None], :, wpos].set(new_k)
            cv.value = cv.value.at[rows[:, None], :, wpos].set(new_v)
            if extend_clear is not None:
                mask_val = mask_val.at[rows[:, None], wpos].set(True)
                cm.value = mask_val
                # chunk-internal causality: query i may not attend chunk
                # tokens written after it (suffix-OR over one-hot positions)
                oh = jax.nn.one_hot(wpos, Sc, dtype=jnp.int32)    # [B, K, Sc]
                csum = jnp.cumsum(oh[:, ::-1], axis=1)[:, ::-1]
                future = (csum - oh) > 0
                allowed = mask_val[:, None, :] & ~future          # [B, K, Sc]
            bias = jnp.where(allowed[:, None], 0.0, _BIG_NEG).astype(
                jnp.float32
            )
            if quant:
                out = _quant_cache_attention(
                    q, ck.value, cks.value, cv.value, cvs.value, bias
                )
            else:
                out = _dot_product_attention(
                    q, ck.value, cv.value, bias, None, 0.0, True
                )
        elif mode == "decode":
            assert S == 1, "decode mode consumes one token at a time"
            quant = cfg.kv_cache_dtype == "int8"
            cache_dtype = jnp.int8 if quant else dtype
            ck = self.variable(
                "cache", "key",
                lambda: jnp.zeros((B, H, cfg.context_len, hd), cache_dtype),
            )
            cv = self.variable(
                "cache", "value",
                lambda: jnp.zeros((B, H, cfg.context_len, hd), cache_dtype),
            )
            if quant:
                cks = self.variable(
                    "cache", "key_scale",
                    lambda: jnp.zeros((B, H, cfg.context_len), jnp.float32),
                )
                cvs = self.variable(
                    "cache", "value_scale",
                    lambda: jnp.zeros((B, H, cfg.context_len), jnp.float32),
                )
            cm = self.variable(
                "cache", "mask", lambda: jnp.zeros((B, cfg.context_len), jnp.bool_)
            )
            rows = jnp.arange(B)
            new_k, new_v = k[:, :, 0], v[:, :, 0]  # [B, H, hd]
            if quant:
                new_k, ks_ = _quant_rows(new_k)
                new_v, vs_ = _quant_rows(new_v)
                cks.value = cks.value.at[rows, :, decode_index].set(ks_)
                cvs.value = cvs.value.at[rows, :, decode_index].set(vs_)
            ck.value = ck.value.at[rows, :, decode_index].set(new_k)
            cv.value = cv.value.at[rows, :, decode_index].set(new_v)
            cm.value = cm.value.at[rows, decode_index].set(True)
            bias = jnp.where(cm.value[:, None, None, :], 0.0, _BIG_NEG).astype(
                jnp.float32
            )
            if quant:
                out = _quant_cache_attention(
                    q, ck.value, cks.value, cv.value, cvs.value, bias
                )
            else:
                out = _dot_product_attention(
                    q, ck.value, cv.value, bias, None, 0.0, True
                )
        else:
            if mode == "prefill":
                if cfg.kv_cache_dtype == "int8":
                    # quantize what is STORED; the prefill attention below
                    # still runs on the full-precision local k/v, so
                    # prefill logits are unchanged by kv_cache_dtype
                    kq_, ks_ = _quant_rows(k)
                    vq_, vs_ = _quant_rows(v)
                    self.variable("cache", "key", lambda: kq_).value = kq_
                    self.variable("cache", "value", lambda: vq_).value = vq_
                    self.variable("cache", "key_scale", lambda: ks_).value = ks_
                    self.variable("cache", "value_scale", lambda: vs_).value = vs_
                    self.variable("cache", "mask", lambda: input_mask).value = input_mask
                else:
                    ck = self.variable("cache", "key", lambda: k)
                    cv = self.variable("cache", "value", lambda: v)
                    cm = self.variable("cache", "mask", lambda: input_mask)
                    ck.value, cv.value, cm.value = k, v, input_mask

            use_flash = (
                not use_seq_parallel
                and cfg.attention_impl in ("auto", "flash")
                and attn_ops.flash_supported()
                and attn_ops.flash_shape_ok(S, hd, H)
            )
            if use_flash and dropout_active and not attn_ops.flash_dropout_supported(S, hd):
                # the generic flash kernel can't apply attn dropout
                # (reference applies it in both paths, trajectory_gpt2.py:179,249)
                use_flash = False
            if use_seq_parallel:
                # sequence-parallel training: ring attention over the mesh's
                # 'seq' axis (long-context capability; the reference only
                # truncates, SURVEY.md §5.7)
                dk = self.make_rng("dropout") if dropout_active else None
                out = attn_ops.sequence_parallel_attention(
                    q, k, v, input_mask,
                    dropout_key=dk,
                    dropout_rate=cfg.dropout if dropout_active else 0.0,
                )
            elif use_flash:
                seed = None
                rate = 0.0
                if dropout_active:
                    rate = cfg.dropout
                    seed = jax.random.randint(
                        self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max,
                        dtype=jnp.int32,
                    )
                out = attn_ops.tpu_flash_attention(
                    q, k, v, input_mask, dropout_seed=seed, dropout_rate=rate
                )
            else:
                dropout_rng = None
                if dropout_active:
                    dropout_rng = self.make_rng("dropout")
                out = attn_ops.xla_attention(
                    q, k, v, input_mask,
                    dropout_rng=dropout_rng,
                    dropout_rate=cfg.dropout,
                    deterministic=deterministic,
                )

        out2d = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return self._project_out(out2d, deterministic)

    def _project_out(self, out2d, deterministic):
        """Shared tail: output projection + residual dropout on [B, S, D]."""
        cfg = self.cfg
        out = nn.Dense(
            cfg.embed_dim, kernel_init=_INIT, dtype=cfg.activation_dtype,
            param_dtype=cfg.params_dtype, name="c_proj",
        )(out2d)
        return Dropout(cfg.dropout)(out, deterministic=deterministic)


class MLP(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype = cfg.activation_dtype
        inner = 4 * cfg.embed_dim
        h = nn.Dense(
            inner, kernel_init=_INIT, dtype=dtype, param_dtype=cfg.params_dtype,
            name="c_fc",
        )(x)
        # 'gelu' = exact erf gelu (HF ACT2FN['gelu'], the reference's fresh-
        # model default), via the fast A&S erf (|err|<=1.5e-7; XLA's exact
        # erf cost 13 ms/step on TPU — see ops/gelu.py);
        # 'gelu_new' = tanh approximation (pretrained GPT-2)
        if cfg.activation_fn == "gelu_new":
            h = nn.gelu(h, approximate=True)
        else:
            h = gelu_erf(h)
        if cfg.activation_fn == "geglu":
            gate = nn.Dense(
                inner, kernel_init=_INIT, dtype=dtype,
                param_dtype=cfg.params_dtype, name="gate",
            )(x)
            h = h * gate
        h = nn.Dense(
            cfg.embed_dim, kernel_init=_INIT, dtype=dtype,
            param_dtype=cfg.params_dtype, name="c_proj",
        )(h)
        return Dropout(cfg.dropout)(h, deterministic=deterministic)


class Block(nn.Module):
    """One pre-LN transformer block.  `mode` / `deterministic` are module
    attributes (static per-apply) so `nn.remat` only ever sees array args."""

    cfg: ModelConfig
    deterministic: bool = True
    mode: str = "train"
    # stochastic-depth drop rate for THIS block (Transformer ramps it
    # linearly over depth; reference wishlist misc/todo.md)
    sd_rate: float = 0.0

    def _residual(self, x, branch):
        """x + branch, with per-EXAMPLE drop-path when training under
        stochastic depth: the branch is zeroed for a random subset of the
        batch and survivors are scaled by 1/keep so the expectation is
        unchanged (Huang et al. 2016).  Each residual branch draws its
        own mask."""
        if self.deterministic or self.sd_rate <= 0.0:
            return x + branch
        keep_p = 1.0 - self.sd_rate
        keep = jax.random.bernoulli(
            self.make_rng("dropout"), keep_p, (branch.shape[0], 1, 1)
        )
        return x + jnp.where(keep, branch / keep_p, 0.0).astype(branch.dtype)

    @nn.compact
    def __call__(self, x, input_mask, decode_index=None, extend_clear=None):
        cfg = self.cfg
        h = nn.LayerNorm(
            epsilon=1e-5, dtype=cfg.activation_dtype, param_dtype=cfg.params_dtype,
            name="ln_1",
        )(x)
        x = self._residual(x, Attention(cfg, name="attn")(
            h,
            input_mask,
            deterministic=self.deterministic,
            mode=self.mode,
            decode_index=decode_index,
            extend_clear=extend_clear,
        ))
        h = nn.LayerNorm(
            epsilon=1e-5, dtype=cfg.activation_dtype, param_dtype=cfg.params_dtype,
            name="ln_2",
        )(x)
        x = self._residual(
            x, MLP(cfg, name="mlp")(h, deterministic=self.deterministic)
        )
        return x


class Transformer(nn.Module):
    """Stack of pre-LN blocks + final LayerNorm."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        input_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
        mode: str = "train",
        decode_index=None,
        extend_clear=None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        block_cls = Block
        if cfg.remat and mode == "train":
            block_cls = nn.remat(Block, prevent_cse=False)
        for i in range(cfg.layers):
            # linear stochastic-depth ramp: layer 0 never drops, the last
            # layer drops at the configured max rate
            sd = cfg.stochastic_depth * i / max(cfg.layers - 1, 1)
            x = block_cls(
                cfg, deterministic=deterministic, mode=mode, sd_rate=sd,
                name=f"h_{i}",
            )(x, input_mask, decode_index, extend_clear)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=cfg.activation_dtype, param_dtype=cfg.params_dtype,
            name="ln_f",
        )(x)
        return x
